"""Stateful streaming operators over transcript/event streams.

Two Spark-native streaming capabilities beyond the ingest path:

- **Conversation assembly** (``sessionize_stream``): turns arrive over
  many micro-batches; per-``conv_id`` state (turn count, token total,
  first/last timestamp) is held in the state store via
  ``applyInPandasWithState`` and an updated conversation summary row is
  emitted whenever a batch touches the conversation.  The state survives
  across batches, so a conversation split over N micro-batches converges
  to the same summary a batch aggregation produces over the full data —
  that equivalence is the test contract (tests/test_streaming_stateful.py)
  and ``conversation_summary`` is the batch twin (also a driver-gate
  entry with a plain SQL oracle).
- **Watermarked windowed aggregation** (``events_windowed_stream``): the
  SAME ``F.window`` expression as the batch ``events_windowed`` entry,
  with a watermark for late data: append-mode emits a window only once
  the watermark passes its end, and rows arriving later than the
  watermark allows are dropped (pinned in tests by replaying a too-late
  row and asserting it does not change the emitted aggregate).

The reference is strictly batch (/root/reference/index.go:44-50 — no
incremental path); these operators are part of the engine's Spark-native
extension surface, mirroring how the ingest path extends the codec.

State is kept as integral epoch-microseconds (timestamp round-trips
through the state store vary by pandas version; integers don't).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("n_turns", LongType(), False),
        StructField("total_tokens", LongType(), False),
        StructField("first_ts", TimestampType(), True),
        StructField("last_ts", TimestampType(), True),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("n_turns", LongType(), False),
        StructField("total_tokens", LongType(), False),
        StructField("first_us", LongType(), False),
        StructField("last_us", LongType(), False),
    ]
)


def _session_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    from ..analyzer import tokenize_pandas

    if state.exists:
        n, tot, first_us, last_us = state.get
    else:
        n, tot, first_us, last_us = 0, 0, None, None
    for pdf in pdfs:
        if not len(pdf):
            continue
        n += len(pdf)
        tot += int(tokenize_pandas(pdf["text"]).map(len).sum())
        # NULL ts rows still count toward n_turns/total_tokens but are
        # skipped for first/last (NaT.astype(int64) is int64-min, which
        # would collapse first_ts to 1677) — the batch twin's F.min/F.max
        # skip NULLs the same way
        ts = pd.to_datetime(pdf["ts"]).dropna()
        if len(ts):
            us = ts.astype("int64") // 1000
            lo, hi = int(us.min()), int(us.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
    state.update((n, tot, first_us, last_us))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "n_turns": [n],
            "total_tokens": [tot],
            "first_ts": [pd.Timestamp(first_us * 1000) if first_us is not None else None],
            "last_ts": [pd.Timestamp(last_us * 1000) if last_us is not None else None],
        }
    )


def sessionize_stream(turns: DataFrame) -> DataFrame:
    """Streaming DataFrame of turns → updated conversation summaries.

    Update-mode stateful map: one output row per (batch, touched
    conversation); the latest row per conv_id is the current summary.
    State store shuffle key = conv_id (uniform; a conversation's state is
    a fixed-size tuple regardless of its length — no unbounded state).
    """
    return turns.groupBy("conv_id").applyInPandasWithState(
        _session_update,
        SESSION_OUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def conversation_summary(turns: DataFrame) -> DataFrame:
    """Batch twin of :func:`sessionize_stream` — the declarative
    aggregation the stateful operator must converge to (and the driver
    gate's oracle-checked form)."""
    from ..analyzer import tokens_col

    return turns.groupBy("conv_id").agg(
        F.count("*").cast("bigint").alias("n_turns"),
        # per-turn coalesce: NULL text counts 0 tokens (matching the
        # stream's fillna('') tokenizer) instead of nulling the sum for
        # an all-NULL conversation
        F.sum(F.coalesce(F.size(tokens_col("text")), F.lit(0)))
        .cast("bigint")
        .alias("total_tokens"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


def events_windowed_stream(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming form of the batch ``events_windowed`` entry: identical
    window/sum/count expressions plus a watermark.  In append mode a
    window is emitted once the watermark passes its end; rows later than
    the watermark are dropped (the late-data contract).

    One documented divergence from the batch twin: exact
    ``countDistinct`` is unsupported in streaming aggregations, so the
    stream reports ``approx_uniq_users`` (HLL) — the exact/approx pairing
    is the same trade the ANN path makes, and n_events/sum stay exact."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value") * 1e2).cast("bigint").alias("sum_value_cents"),
            F.approx_count_distinct("user_id").cast("bigint").alias("approx_uniq_users"),
        )
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value_cents",
            "approx_uniq_users",
        )
    )

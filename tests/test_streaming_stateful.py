"""Stateful streaming: conversation assembly (applyInPandasWithState) and
watermarked windowed aggregation with late-data drop semantics."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from search_spark.corpus import generate_pandas
from search_spark.streaming.sessionize import (
    conversation_summary,
    events_windowed_stream,
    sessionize_stream,
)

TURN_SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def _run_stream(spark, src_glob, make_sink_df, name, checkpoint):
    stream = spark.readStream.schema(TURN_SCHEMA).option("maxFilesPerTrigger", 1).parquet(
        src_glob
    )
    out = make_sink_df(stream)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_sessionize_converges_to_batch_summary(spark, tmp_path):
    """Conversations split MID-CONVERSATION across micro-batches: the
    state store must carry partial sessions across batches, and the final
    update per conv_id must equal the batch aggregation over all rows."""
    pdf = generate_pandas(30)
    # one NULL-text turn: stream (fillna) and batch (coalesce) must agree
    pdf.loc[pdf.index[0], "text"] = None
    # one NULL-ts turn: both sides must SKIP it for first/last_ts while
    # still counting it in n_turns/total_tokens (a NaT naively cast to
    # int64 is int64-min → a garbage 1677 timestamp)
    pdf.loc[pdf.index[1], "ts"] = pd.NaT
    # split by turn parity → every conversation spans both files/batches
    a = pdf[pdf["turn_idx"] % 2 == 0]
    b = pdf[pdf["turn_idx"] % 2 == 1]
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(a).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(b).coalesce(1).write.parquet(str(src / "f2"))

    _run_stream(
        spark, f"{src}/f*", sessionize_stream, "sess_updates", str(tmp_path / "cp")
    )
    updates = spark.sql("SELECT * FROM sess_updates")
    # latest update per conversation = the one with the max n_turns
    w = F.row_number().over(Window.partitionBy("conv_id").orderBy(F.desc("n_turns")))
    final = (
        updates.withColumn("rn", w).filter(F.col("rn") == 1).drop("rn")
    )
    got = {
        r["conv_id"]: (r["n_turns"], r["total_tokens"], r["first_ts"], r["last_ts"])
        for r in final.collect()
    }
    want = {
        r["conv_id"]: (r["n_turns"], r["total_tokens"], r["first_ts"], r["last_ts"])
        for r in conversation_summary(spark.createDataFrame(pdf)).collect()
    }
    assert got == want
    # ≥2 batches actually ran (each conv got ≥2 update rows)
    per_conv = updates.groupBy("conv_id").count().agg(F.min("count")).collect()[0][0]
    assert per_conv >= 2


EVENTS_SCHEMA = "ts timestamp, event_type string, user_id bigint, value double"


def test_watermark_drops_late_rows(spark, tmp_path):
    """Two-phase availableNow run with a shared checkpoint: phase 1
    advances the watermark; phase 2 replays a row OLDER than the watermark
    (dropped) plus a fresh row (counted)."""
    base = pd.Timestamp("2026-01-01 00:00:00")
    ph1 = pd.DataFrame(
        {
            "ts": [base, base + pd.Timedelta(minutes=30), base + pd.Timedelta(hours=3)],
            "event_type": ["click", "click", "click"],
            "user_id": [1, 2, 3],
            "value": [1.0, 1.0, 1.0],
        }
    )
    # watermark after phase 1 = 03:00 - 30min = 02:30 → the 00:00 window is closed
    late = pd.DataFrame(
        {
            "ts": [base + pd.Timedelta(minutes=45), base + pd.Timedelta(hours=4)],
            "event_type": ["click", "click"],
            "user_id": [4, 5],
            "value": [100.0, 1.0],
        }
    )
    src = tmp_path / "ev"
    src.mkdir()
    cp = str(tmp_path / "cp")

    out = str(tmp_path / "out")

    def run():
        stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(f"{src}/f*")
        q = (
            events_windowed_stream(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    spark.createDataFrame(ph1).coalesce(1).write.parquet(str(src / "f1"))
    run()
    spark.createDataFrame(late).coalesce(1).write.parquet(str(src / "f2"))
    run()

    rows = {
        r["window_start"]: (r["n_events"], r["sum_value_cents"])
        for r in spark.read.parquet(out).collect()
    }
    # the 00:00 window was emitted with phase-1 rows only; the late
    # value=100 row at 00:45 arrived after the watermark passed and is NOT
    # reflected anywhere
    assert rows["2026-01-01 00:00:00"] == (2, 200)
    assert all(v[1] != 10000 and v[1] != 10200 for v in rows.values())

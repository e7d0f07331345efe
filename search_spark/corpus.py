"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

The engine's primary input is an Iceberg/parquet table of multi-turn
conversation transcripts with columns
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` (BASELINE.json ``input_hint``).  No such table ships in
/root/testdata, so we synthesize one deterministically (seed=42): every row
is a pure function of the conversation ordinal, independent of partitioning,
so the same corpus is produced on 1 core or 1000 executors.

Two generators:

- :func:`gen_conv` / :func:`generate_pandas` — pure Python/pandas, for unit
  tests and the oracle.
- :func:`generate_spark` — ``spark.range(n_convs)`` → ``mapInPandas``; each
  task generates only its conv range, so the build parallelizes linearly and
  never materializes the corpus on the driver (the 10^12-turn story: the
  corpus would be a real Iceberg table, and this generator is only the test
  stand-in).

Analogue in the reference: the committed SICK sentence corpus
``dist/dataset.txt`` + golden ``dataset.bin`` with an asserted entry count
(/root/reference/index_test.go:31-42) — a fixed, known corpus with planted
known answers.  Our planted answers are ``needle{j}`` marker tokens.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SEED = 42
VOCAB_SIZE = 5000
ZIPF_S = 1.1
EPOCH = _dt.datetime(2026, 1, 1, 0, 0, 0)
NEEDLE_STRIDE = 17  # a needle is planted in every 17th conversation
TOOLS = ["search", "bash", "read"]

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# ~5,000-word vocabulary: deterministic pseudo-words.  A small head of real
# connective words makes head-term skew look like real text ("the" etc.).
_HEAD_WORDS = [
    "the", "a", "to", "and", "of", "in", "is", "it", "for", "on",
    "with", "as", "this", "that", "be", "are", "was", "or", "at", "by",
]


def _vocab() -> list[str]:
    words = list(_HEAD_WORDS)
    k = 0
    while len(words) < VOCAB_SIZE:
        words.append(f"w{k:04d}")
        k += 1
    return words


VOCAB = _vocab()

# Zipf(s) cumulative distribution over the vocab, rank-ordered.
_weights = 1.0 / np.power(np.arange(1, VOCAB_SIZE + 1, dtype=np.float64), ZIPF_S)
_CDF = np.cumsum(_weights / _weights.sum())


def n_turns(conv: int) -> int:
    """Turns in conversation ``conv`` — a pure function (U[2,12]-ish)."""
    h = (conv * 2654435761 + 12345) % (2**32)
    return 2 + h % 11


def conv_name(conv: int) -> str:
    return f"conv-{conv:06d}"


def needle_position(j: int) -> tuple[int, int]:
    """Where ``needle{j}`` is planted: (conv ordinal, turn_idx)."""
    conv = j * NEEDLE_STRIDE
    return conv, n_turns(conv) - 1


def gen_conv(conv: int) -> list[dict]:
    """All turns of conversation ``conv`` — deterministic, partition-independent."""
    rng = np.random.Generator(np.random.PCG64([SEED, conv]))
    turns = n_turns(conv)
    rows = []
    cid = conv_name(conv)
    for t in range(turns):
        n_tok = int(rng.integers(5, 61))
        toks = [VOCAB[i] for i in np.searchsorted(_CDF, rng.random(n_tok))]
        is_tool = t > 0 and rng.random() < 0.10
        if is_tool:
            role, tool = "tool", TOOLS[int(rng.integers(0, len(TOOLS)))]
        else:
            role, tool = ("user", None) if t % 2 == 0 else ("assistant", None)
        if conv % NEEDLE_STRIDE == 0 and t == turns - 1:
            toks.append(f"needle{conv // NEEDLE_STRIDE}")
        rows.append(
            {
                "conv_id": cid,
                "turn_idx": t,
                "role": role,
                "text": " ".join(toks),
                "tool": tool,
                "ts": EPOCH + _dt.timedelta(minutes=conv * 1440 + t),
            }
        )
    return rows


def generate_pandas(n_convs: int) -> pd.DataFrame:
    rows: list[dict] = []
    for c in range(n_convs):
        rows.extend(gen_conv(c))
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def generate_spark(spark: SparkSession, n_convs: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic generation: one task generates one conv range."""
    partitions = partitions or spark.sparkContext.defaultParallelism
    conv_ids = spark.range(0, n_convs, 1, min(partitions, max(1, n_convs)))

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out: list[dict] = []
            for c in b["id"].tolist():
                out.extend(gen_conv(int(c)))
            if out:
                df = pd.DataFrame(out)
                df["turn_idx"] = df["turn_idx"].astype("int32")
                yield df

    return conv_ids.mapInPandas(_gen, schema=TRANSCRIPT_SCHEMA)


# ---------------------------------------------------------------------------
# Deliberately skewed corpus (VERDICT r3 #5): the uniform generator above is
# near-Zipf but has no pathological key — this variant plants the two skew
# shapes a 100 TB transcript table actually exhibits, so the salted
# (term × doc-range) shuffle claim is validated under REAL skew, not assumed:
#
#   * one mega-conversation holding ``mega_frac`` (default 10%) of ALL turns,
#     its texts near-identical (shared prefix + per-turn suffix) — stresses
#     (a) doc-range salting of a single conv's postings and (b) the
#     connected-components keeper election with one giant near-dup cluster;
#   * one hot term (``skewterm``) planted in ``hot_frac`` (default 50%) of
#     ALL turns — stresses per-term posting-list bounding (the reference's
#     design cap is exactly this shape: /root/reference/README.md:30).
#
# Both generators stay pure functions of (conv ordinal, turn_idx) so the
# corpus is identical at any parallelism — required for the N-vs-4N runs.
# ---------------------------------------------------------------------------

SKEW_MEGA_CONV = 0  # the mega-conversation's ordinal
SKEW_HOT_TERM = "skewterm"


def _hot(conv: int, t: int, hot_frac: float) -> bool:
    h = ((conv * 1_000_003 + t) * 2654435761 + 97) % (2**32)
    return h / 2**32 < hot_frac


def skew_mega_turns(n_convs: int, mega_frac: float = 0.10) -> int:
    """Turns in the mega-conv so it is ``mega_frac`` of the TOTAL corpus."""
    normal = sum(n_turns(c) for c in range(1, n_convs))
    return max(2, int(normal * mega_frac / (1.0 - mega_frac)))


def gen_skew_conv(
    conv: int, n_convs: int, mega_frac: float = 0.10, hot_frac: float = 0.50
) -> list[dict]:
    """Skewed-corpus turns for conversation ``conv`` (pure function)."""
    if conv != SKEW_MEGA_CONV:
        rows = gen_conv(conv)
        for r in rows:
            if _hot(conv, r["turn_idx"], hot_frac):
                r["text"] = r["text"] + " " + SKEW_HOT_TERM
        return rows
    # mega-conv: near-identical turns — 14 shared tokens + 2 distinguishing
    base = "the merge window of a stream table is hashed by the fast scan"
    rows = []
    for t in range(skew_mega_turns(n_convs, mega_frac)):
        text = f"{base} v{t % 7} u{t:06d}"
        if _hot(conv, t, hot_frac):
            text += " " + SKEW_HOT_TERM
        rows.append(
            {
                "conv_id": conv_name(conv),
                "turn_idx": t,
                "role": "user" if t % 2 == 0 else "assistant",
                "text": text,
                "tool": None,
                "ts": EPOCH + _dt.timedelta(minutes=t),
            }
        )
    return rows


def generate_skewed_pandas(
    n_convs: int, mega_frac: float = 0.10, hot_frac: float = 0.50
) -> pd.DataFrame:
    rows: list[dict] = []
    for c in range(n_convs):
        rows.extend(gen_skew_conv(c, n_convs, mega_frac, hot_frac))
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def generate_skewed_spark(
    spark: SparkSession,
    n_convs: int,
    partitions: int | None = None,
    mega_frac: float = 0.10,
    hot_frac: float = 0.50,
) -> DataFrame:
    """Distributed skewed generation.  The mega-conv alone can exceed one
    task's fair share, so IT is generated by turn-range tasks (conv ordinal
    −1 sentinel rows carry a turn range) while normal convs use the same
    one-task-one-conv-range layout as :func:`generate_spark`."""
    partitions = partitions or spark.sparkContext.defaultParallelism
    mega_turns = skew_mega_turns(n_convs, mega_frac)
    # normal convs 1..n_convs-1 as ids ≥ 1; mega-conv turn-ranges as
    # negative ids -(1+range_idx), each covering `span` turns
    span = max(256, mega_turns // max(1, partitions))
    n_ranges = (mega_turns + span - 1) // span
    ids = spark.range(1, n_convs, 1, min(partitions, max(1, n_convs - 1))).union(
        spark.range(-n_ranges, 0, 1, n_ranges)
    )

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base = "the merge window of a stream table is hashed by the fast scan"
        for b in batches:
            out: list[dict] = []
            for raw in b["id"].tolist():
                c = int(raw)
                if c >= 1:
                    out.extend(gen_skew_conv(c, n_convs, mega_frac, hot_frac))
                    continue
                ridx = -c - 1  # mega-conv turn range
                for t in range(ridx * span, min((ridx + 1) * span, mega_turns)):
                    text = f"{base} v{t % 7} u{t:06d}"
                    if _hot(SKEW_MEGA_CONV, t, hot_frac):
                        text += " " + SKEW_HOT_TERM
                    out.append(
                        {
                            "conv_id": conv_name(SKEW_MEGA_CONV),
                            "turn_idx": t,
                            "role": "user" if t % 2 == 0 else "assistant",
                            "text": text,
                            "tool": None,
                            "ts": EPOCH + _dt.timedelta(minutes=t),
                        }
                    )
            if out:
                df = pd.DataFrame(out)
                df["turn_idx"] = df["turn_idx"].astype("int32")
                yield df

    return ids.mapInPandas(_gen, schema=TRANSCRIPT_SCHEMA)


# ---------------------------------------------------------------------------
# Transcripts derived from the driver's `documents` table.
#
# The driver's correctness gate (CORRECTNESS_r{N}.json) compares Spark
# queries against DuckDB SQL over the pre-registered /root/testdata views.
# To exercise the *transcript-shaped* pipeline under that gate, we derive a
# transcripts view from `documents` with transforms expressible identically
# in Spark and ANSI SQL: conv = doc_id // TURNS_PER_CONV, turn = doc_id %
# TURNS_PER_CONV.  Dense doc_id order == (conv_id, turn_idx) order by
# construction, which makes rank-identity assertions exact.
# ---------------------------------------------------------------------------

TURNS_PER_CONV = 8


def transcripts_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    conv = (F.col("doc_id") / TURNS_PER_CONV).cast("bigint")
    turn = F.pmod(F.col("doc_id"), F.lit(TURNS_PER_CONV)).cast("int")
    return docs.select(
        F.concat(F.lit("conv-"), F.lpad(conv.cast("string"), 6, "0")).alias("conv_id"),
        turn.alias("turn_idx"),
        F.when(turn % 2 == 0, F.lit("user")).otherwise(F.lit("assistant")).alias("role"),
        F.col("text"),
        F.when(F.pmod(F.col("doc_id"), F.lit(10)) == 7, F.lit("search")).alias("tool"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
    )


#: DuckDB CTE body mirroring :func:`transcripts_from_documents` (same names).
SQL_TRANSCRIPTS_FROM_DOCUMENTS = """
  SELECT
    'conv-' || lpad(CAST(doc_id // {tpc} AS VARCHAR), 6, '0') AS conv_id,
    CAST(doc_id % {tpc} AS INTEGER)                           AS turn_idx,
    CASE WHEN (doc_id % {tpc}) % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
    text,
    CASE WHEN doc_id % 10 = 7 THEN 'search' END               AS tool,
    TIMESTAMP '2026-01-01 00:00:00'                           AS ts
  FROM documents
""".format(tpc=TURNS_PER_CONV)

"""End-to-end training-corpus materialization — the composed pipeline a
100 TB pretraining run actually executes, built entirely from the
engine's own oracle-pinned stages:

  transcripts
    → per-turn quality scoring        (functions/textstats, JVM-only)
    → quality filter                  (composite ≥ threshold)
    → exact-dedup keeper              (md5(text) groups, first survivor
                                       under (conv_id, turn_idx) wins)
    → split assignment                (operators/splits, conv-coherent)
    → per-split sequence packing      (operators/packing, two-phase
                                       prefix sum per split)

Every stage is deterministic and SQL-mirrorable, so the WHOLE pipeline
has one DuckDB oracle (oracle_sql.materialize_sql) — the composition is
verified end-to-end, not just stage by stage.

Plan shape: quality+filter are narrow; the dedup keeper is one hash
shuffle on md5(text); split is a narrow projection; packing is one range
shuffle per split (splits are O(3)).  Nothing driver-sized except the
P-row prefix-sum bases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..analyzer import tokens_col
from ..functions.textstats import quality_cols
from .packing import pack_sequences
from .splits import DEFAULT_SALT, split_col

#: default composite-quality floor (micro units) — tuned to drop the
#: degenerate tail, not the median
DEFAULT_MIN_QUALITY = 100_000


def quality_stage(
    transcripts: DataFrame, min_quality_micro: int = DEFAULT_MIN_QUALITY
) -> DataFrame:
    """Stage 1: per-turn quality scoring + composite floor (narrow, JVM-only)."""
    toks = tokens_col("text")
    q = quality_cols(F.col("text"), toks)
    scored = transcripts.select(
        "conv_id", "turn_idx", "text", q["quality_micro"].alias("quality_micro")
    )
    return scored.filter(F.col("quality_micro") >= min_quality_micro)


def dedup_keeper_stage(kept: DataFrame) -> DataFrame:
    """Stage 2: exact-dedup keeper among survivors — first
    (conv_id, turn_idx) per md5(text) group wins (one hash shuffle)."""
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy("conv_id", "turn_idx")
    return (
        kept.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def split_stage(
    uniq: DataFrame,
    weights: dict[str, float] | None = None,
    salt: str = DEFAULT_SALT,
) -> DataFrame:
    """Stage 3: conv-coherent split assignment (narrow projection)."""
    return uniq.withColumn("split", split_col(F.col("conv_id"), weights, salt))


def materialize_training_corpus(
    transcripts: DataFrame,
    budget: int = 256,
    min_quality_micro: int = DEFAULT_MIN_QUALITY,
    weights: dict[str, float] | None = None,
    salt: str = DEFAULT_SALT,
    cache_handle: list | None = None,
) -> DataFrame:
    """(conv_id, turn_idx, split, seq_id, n_tokens, quality_micro) for
    every surviving turn — the train-ready assignment table.

    ``cache_handle=[]`` receives the packing stage's persisted ranged
    layout for the caller to unpersist after materializing (the
    assign_doc_ids contract)."""
    assigned = split_stage(
        dedup_keeper_stage(quality_stage(transcripts, min_quality_micro)),
        weights,
        salt,
    )
    # per-split packing in ONE range shuffle: offsets (and seq_ids) reset
    # per split — a training sequence never spans splits — via
    # pack_sequences' reset_col (range key (split, conv_id, turn_idx),
    # per-(partition, split) bases)
    return pack_sequences(
        assigned, budget, reset_col="split", cache_handle=cache_handle
    ).select("conv_id", "turn_idx", "split", "seq_id", "n_tokens", "quality_micro")


def materialize_summary(materialized: DataFrame) -> DataFrame:
    """Audit rollup per split: (split, n_seqs, n_turns, n_tokens)."""
    return materialized.groupBy("split").agg(
        F.countDistinct("seq_id").cast("bigint").alias("n_seqs"),
        F.count("*").cast("bigint").alias("n_turns"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )

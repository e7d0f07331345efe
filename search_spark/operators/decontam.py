"""Eval-set decontamination: n-gram overlap between a training corpus
and a (small) evaluation suite.

Standard LLM-data hygiene: a training document is contaminated if it
shares ≥ ``min_hits`` distinct ``w``-gram shingles with any eval item
(w is conventionally 8-13; the default here is 8).  The Spark-first
plan exploits the size asymmetry — eval suites are thousands of rows,
the corpus is the 100 TB side:

1. shingle the EVAL side and **broadcast** its distinct (shingle →
   eval_id) map (bounded: |eval| × dl shingles);
2. stream the corpus once through the same shingle projection (JVM
   higher-order functions, dedup.shingles_col) and broadcast-hash-join —
   map-side, no corpus shuffle;
3. partial-aggregate (doc_id, eval_id) match counts — the only exchange
   is over matched pairs, which contamination makes rare by definition.

Reference analogue: none (the reference is a search library); the
operator reuses the engine's frozen analyzer + shingle spec so the
DuckDB oracle mirrors it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analyzer import tokens_col
from .dedup import shingles_col

#: conventional decontamination shingle width
DECONTAM_W = 8


def eval_shingles(eval_df: DataFrame, w: int = DECONTAM_W) -> DataFrame:
    """(eval_id, shingle) distinct — the broadcast side.  The explicit
    ``distinct`` matters for multi-row eval items: shingles_col dedups
    only within a row, and duplicate (eval_id, shingle) pairs would
    inflate n_shared past the true distinct-overlap count."""
    return eval_df.select(
        "eval_id", F.explode(shingles_col(tokens_col("text"), w)).alias("shingle")
    ).distinct()


def contamination_report(
    docs: DataFrame,
    eval_df: DataFrame,
    w: int = DECONTAM_W,
    min_hits: int = 1,
) -> DataFrame:
    """(doc_id, eval_id, n_shared) for every doc/eval pair sharing ≥
    ``min_hits`` distinct w-gram shingles."""
    if min_hits < 1:
        raise ValueError(f"min_hits must be ≥ 1, got {min_hits}")
    ev = F.broadcast(eval_shingles(eval_df, w))
    doc_sh = docs.select(
        "doc_id", F.explode(shingles_col(tokens_col("text"), w)).alias("shingle")
    )
    return (
        doc_sh.join(ev, "shingle")
        .groupBy("doc_id", "eval_id")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_hits)
    )


def contaminated_doc_ids(
    docs: DataFrame,
    eval_df: DataFrame,
    w: int = DECONTAM_W,
    min_hits: int = 1,
) -> DataFrame:
    """Distinct doc_ids to drop before training."""
    return (
        contamination_report(docs, eval_df, w, min_hits)
        .select("doc_id")
        .distinct()
    )

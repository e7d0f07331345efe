"""DF-native index build + BM25 query — the minimum end-to-end slice (M1).

Pure declarative DataFrame ops, zero custom formats: Catalyst supplies
column pruning, partial+final hash aggregation for tf/df, broadcast join
for the (tiny) query-term side, and `TakeOrderedAndProject` for top-k —
the distributed equivalent of the reference's bounded min-heap
(/root/reference/index.go:63-86; Catalyst keeps a size-k heap per partition
and merges on the driver, exactly the same semantics at scale).

This slice is kept permanently as the "DF-native oracle at scale": the real
block-max engine (segments/WAND, operators/segments.py + wand.py) is
cross-checked against it in tests, the same way the reference checks SIMD
kernels against scalar ones (/root/reference/internal/cosine/simd/simd_test.go:52-74).

Build stages (each a narrow, shuffle-accounted step — SURVEY.md §3.2):
  tokenize (JVM regexp, codegen)  → no shuffle
  doclens / stats                 → one partial+final agg (tiny output)
  explode + groupBy(doc_id, term) → one shuffle on (doc_id, term); with
      doc-contiguous input partitions AQE coalesces well and the partial
      aggregation does the map-side combine
  dictionary groupBy(term)        → one shuffle on term (Zipf-skewed, but
      partial agg reduces each mapper's contribution to ≤|vocab| rows —
      the classic reason word-count doesn't need salting for *counts*)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analyzer import tokens_col
from ..functions.bm25 import idf_col, term_score_col
from .docids import assign_doc_ids


@dataclass
class DFIndex:
    """The DF-native index: logical tables, unmaterialized until used."""

    docs: DataFrame       # doc_id, conv_id, turn_idx, role, text, tool, ts, dl
    postings: DataFrame   # term, doc_id, tf
    doclens: DataFrame    # doc_id, dl
    dictionary: DataFrame # term, df, cf
    n_docs: int
    avgdl: float


def tokenize_docs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``tokens array<string>`` + ``dl int`` via JVM-side regexp."""
    return docs.withColumn("tokens", tokens_col(text_col)).withColumn("dl", F.size("tokens"))


def build_df_index(transcripts: DataFrame, assign_ids: bool = True) -> DFIndex:
    """Index a transcript DataFrame declaratively."""
    docs = assign_doc_ids(transcripts) if assign_ids else transcripts
    docs = tokenize_docs(docs)

    doclens = docs.select("doc_id", "dl")
    stats = doclens.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]

    postings = (
        docs.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("int").alias("tf"))
    )
    dictionary = postings.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )
    return DFIndex(
        docs=docs.drop("tokens"),
        postings=postings,
        doclens=doclens,
        dictionary=dictionary,
        n_docs=int(stats["n"]),
        avgdl=float(stats["avgdl"]),
    )


def score_query_df(index: DFIndex, query_terms: list[str]) -> DataFrame:
    """All nonzero BM25 scores for one query — declarative plan.

    ``postings.filter(term.isin(...))`` pushes the term predicate into the
    scan; the dictionary side is broadcast (|query terms| rows).
    """
    terms = sorted(set(query_terms))
    if not terms:
        return index.postings.sparkSession.createDataFrame([], "doc_id bigint, score double")
    dict_q = index.dictionary.filter(F.col("term").isin(terms)).withColumn(
        "idf", idf_col(F.lit(index.n_docs), F.col("df"))
    )
    scored = (
        index.postings.filter(F.col("term").isin(terms))
        .join(F.broadcast(dict_q.select("term", "idf")), "term")
        .join(index.doclens, "doc_id")
        .withColumn(
            "contrib",
            term_score_col(F.col("tf"), F.col("dl"), F.lit(index.avgdl), F.col("idf")),
        )
    )
    return scored.groupBy("doc_id").agg(F.sum("contrib").alias("score"))


def search_topk_df(index: DFIndex, query_terms: list[str], k: int = 10) -> DataFrame:
    """Exact top-k, total order (score DESC, doc_id ASC).

    ``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject — Spark's
    distributed bounded heap (per-partition size-k heaps, driver merge):
    the same O(N log k) shape as /root/reference/index.go:63-81, minus the
    full-scan cost once the WAND engine replaces the scoring stage.
    k <= 0 returns empty (guard semantics of /root/reference/index.go:54-56).
    """
    spark = index.postings.sparkSession
    if k <= 0:
        return spark.createDataFrame([], "doc_id bigint, score double")
    return (
        score_query_df(index, query_terms)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def search_text_df(index: DFIndex, query_text: str, k: int = 10) -> DataFrame:
    from ..analyzer import tokenize

    return search_topk_df(index, tokenize(query_text), k)

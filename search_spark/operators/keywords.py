"""Per-document keyword extraction: top-n terms by tf·idf.

A training-data pipeline uses this for topic tagging, near-dup triage and
index-time term pruning.  The reference has no per-doc analysis surface
(its unit of meaning is the whole-text embedding, /root/reference/
index.go:44-50); this is a beyond-reference pipeline operator built from
the same frozen analyzer + idf spec the BM25 engine uses (functions/bm25),
so its numbers are consistent with query-time scoring.

Plan shape at 10^12 docs: tokenize+tf is the SAME partition-local Arrow
computation as the index build (no shuffle); df is one map-side-combined
hash aggregate over (term); the tf⋈df join is a shuffle join on term
(vocab-sized build side — broadcast at test scale via AQE, sort-merge at
real scale); the per-doc top-n window shuffles on doc_id once.  Nothing is
collected; no cartesian; every aggregate is partial-agg friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..analyzer import tokens_col
from ..functions.bm25 import idf_col

TOP_TERMS_N = 5


def top_terms(docs: DataFrame, n: int = TOP_TERMS_N) -> DataFrame:
    """(doc_id, term, rank, tfidf_micro): top-``n`` terms per document by
    tf·idf, ties broken on term ASC (total order, engine-independent).

    idf = ln((N - df + 0.5)/(df + 0.5) + 1) — the BM25 idf the engine
    already pins against the DuckDB oracle at micro rounding.
    """
    n_docs = docs.count()
    toks = docs.select("doc_id", F.explode(tokens_col("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dft = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(dft, "term")
        .withColumn("idf", idf_col(F.lit(n_docs), F.col("df")))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.col("idf") * 1e6).cast("bigint").alias("tfidf_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf_micro"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= n)
        .select("doc_id", "term", "rank", "tfidf_micro")
    )


def doc_keywords(reader, doc_id: int, max_terms: int = 8) -> list[str]:
    """The seed doc's top ``max_terms`` terms by tf·idf, computed
    index-natively: text from a bucket-pruned doc fetch (one row), tf
    driver-side from the frozen analyzer, idf from the DICTIONARY (same
    numbers query scoring uses).  Ties: (tfidf_micro DESC, term ASC).
    OOV terms (possible on a purged store) drop out."""
    from ..analyzer import tokenize

    bucket = int(doc_id) // int(reader.stats["doc_bucket_size"])
    rows = (
        reader.doc_source(buckets=[bucket])
        .filter(F.col("doc_id") == int(doc_id))
        .select("text")
        .collect()
    )
    if not rows:
        return []
    toks = tokenize(rows[0]["text"])
    tf: dict[str, int] = {}
    for t in toks:
        tf[t] = tf.get(t, 0) + 1
    dict_rows = reader._dictionary_rows(sorted(tf))
    scored = [
        (round(tf[t] * idf * 1e6), t)
        for t, (idf, _) in dict_rows.items()
    ]
    scored.sort(key=lambda x: (-x[0], x[1]))
    return [t for _, t in scored[:max_terms]]


def more_like_this(
    reader, doc_id: int, k: int = 10, max_terms: int = 8
) -> DataFrame:
    """Find-similar: the seed doc's tf·idf keywords become a disjunctive
    BM25 query; the seed itself is excluded from the result.  (doc_id,
    rank, score) under (score DESC, doc_id ASC)."""
    spark = reader.spark
    empty = "doc_id bigint, rank int, score double"
    if k <= 0:
        return spark.createDataFrame([], empty)
    terms = doc_keywords(reader, doc_id, max_terms)
    if not terms:
        return spark.createDataFrame([], empty)
    res = (
        reader.batch_search([("q", " ".join(terms))], k + 1)
        .drop("query_id")
        .filter(F.col("doc_id") != int(doc_id))
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        res.select("doc_id", "score")
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "score")
    )

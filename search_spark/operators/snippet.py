"""Snippet (best-window highlight) generation for top-k results.

The reference's example app prints each hit's full text with its
relevance bucket (/root/reference/example/main.go:44-54); at transcript
scale a serving layer returns a bounded window around the first query-term
occurrence instead.  Deterministic rule (oracle-mirrorable):

- ``pos`` = the smallest 1-based token position holding ANY query term
  (the min over per-term first occurrences).
- snippet = the ``2*width+1``-token window centred on ``pos`` (clamped to
  the doc edges), over the ANALYZED token stream — normalized tokens, not
  raw text, so the rule is a pure function of the frozen analyzer.

Plan: top-k from the standard batch scorer (k rows, driver-bounded) →
doc scan partition-pruned to the hits' buckets (doc_bucket = doc_id //
doc_bucket_size — derivable from the doc_id alone, no lookup) → JVM
higher-order array expressions for position/window/join.  No Python in
the enrichment, no corpus scan, no shuffle beyond the top-k's own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analyzer import tokenize, tokens_col

#: tokens on each side of the first match
DEFAULT_WIDTH = 5

_EMPTY_SCHEMA = (
    "doc_id bigint, rank int, score double, match_pos int, snippet string"
)


def first_match_pos_col(toks, terms: list[str]):
    """Smallest 1-based position in ``toks`` holding any of ``terms``
    (0 when none does): min over per-term ``array_position``."""
    uniq = sorted(set(terms))
    positions = F.filter(
        F.transform(F.lit(uniq), lambda t: F.array_position(toks, t).cast("int")),
        lambda p: p > 0,
    )
    return F.coalesce(F.array_min(positions), F.lit(0)).cast("int")


def snippet_col(toks, pos, width: int = DEFAULT_WIDTH):
    """The ``2*width+1``-token window of ``toks`` centred on 1-based
    ``pos``, clamped to the doc, joined with single spaces."""
    start = F.greatest(pos - F.lit(width), F.lit(1))
    return F.array_join(F.slice(toks, start, 2 * width + 1), " ")


def search_snippets(
    reader, query_text: str, k: int = 10, width: int = DEFAULT_WIDTH
) -> DataFrame:
    """Top-k BM25 with a highlight window per hit: (doc_id, rank, score,
    match_pos, snippet), ordered (score DESC, doc_id ASC)."""
    spark = reader.spark
    terms = sorted(set(tokenize(query_text)))
    if k <= 0 or not terms:
        return spark.createDataFrame([], _EMPTY_SCHEMA)
    top = reader.batch_search([("q", query_text)], k).drop("query_id")
    rows = top.collect()  # ≤ k rows — driver-bounded by construction
    if not rows:
        return spark.createDataFrame([], _EMPTY_SCHEMA)
    bucket_size = int(reader.stats["doc_bucket_size"])
    buckets = sorted({int(r["doc_id"]) // bucket_size for r in rows})
    hits = spark.createDataFrame(
        [(int(r["doc_id"]), int(r["rank"]), float(r["score"])) for r in rows],
        "doc_id bigint, rank int, score double",
    )
    docs = reader.doc_source(buckets=buckets).select("doc_id", "text")
    toks = tokens_col("text")
    pos = first_match_pos_col(toks, terms)
    return (
        docs.join(F.broadcast(hits), "doc_id")
        .select(
            "doc_id",
            "rank",
            "score",
            pos.alias("match_pos"),
            snippet_col(toks, pos, width).alias("snippet"),
        )
        .orderBy(F.asc("rank"))
    )

"""Rank identity on adversarial corpus shapes — the places tie handling,
varint width, and degenerate stats would diverge first:

- all-identical documents (every score ties → doc_id tiebreak decides all)
- a single-document corpus (N=1, df=N → idf at its floor)
- extreme tf (one token repeated thousands of times → multi-byte varints,
  tf ≫ k1 saturation) next to tiny docs
- empty-text documents interleaved (dl=0 rows must not corrupt avgdl-based
  scoring of their neighbors)

Engine under test = the full persisted path (build_index → IndexReader);
ground truth = the numpy oracle, compared on (doc_id, score_micro) rank
lists exactly.
"""

from __future__ import annotations

import pandas as pd
import pytest

from search_spark.operators.indexer import build_index
from search_spark.operators.wand import IndexReader
from search_spark.oracle import OracleIndex
from search_spark.sources.index_store import IndexStore


def _transcripts(texts: list[str]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": [f"conv-{i:06d}" for i in range(len(texts))],
            "turn_idx": [0] * len(texts),
            "role": ["user"] * len(texts),
            "text": texts,
            "tool": [None] * len(texts),
            "ts": pd.Timestamp("2026-01-01"),
        }
    )


def _check(spark, tmp_path, texts, queries, k=10):
    store = IndexStore(str(tmp_path / "idx"), doc_bucket_size=64, term_buckets=4)
    build_index(spark, spark.createDataFrame(_transcripts(texts)), store, n_units=2)
    reader = IndexReader(spark, store)
    oracle = OracleIndex.build(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    for q in queries:
        got = [
            (r["doc_id"], round(r["score"] * 1e6))
            for r in reader.batch_search([("q", q)], k).orderBy("rank").collect()
        ]
        want = [(d, round(s * 1e6)) for d, s in oracle.search(q, k)]
        assert got == want, (q, got, want)


def test_all_identical_docs_tiebreak(spark, tmp_path):
    _check(
        spark,
        tmp_path,
        ["the same exact text again"] * 150,
        ["the same", "exact", "the missing"],
    )


def test_single_document_corpus(spark, tmp_path):
    _check(spark, tmp_path, ["lonely document with a few words"], ["lonely words", "absent"], k=5)


def test_extreme_tf_and_tiny_docs(spark, tmp_path):
    texts = [
        "spike " * 5000,          # tf=5000 for 'spike', dl huge
        "spike",                   # tf=1, dl=1
        "spike spike other words here",
        "other words entirely different",
        "x",
    ]
    _check(spark, tmp_path, texts, ["spike", "spike other", "words x"], k=5)


def test_empty_text_docs_interleaved(spark, tmp_path):
    texts = []
    for i in range(60):
        texts.append("" if i % 3 == 0 else f"token{i % 7} shared words w{i % 5}")
    _check(spark, tmp_path, texts, ["shared words", "token1 w2", "token3"], k=10)


def test_null_text_docs_count_toward_avgdl(spark, tmp_path):
    """NULL text must behave exactly like empty text: dl=0 and COUNTED in
    avgdl (regression: F.size(tokens) is NULL for NULL text and avg()
    silently excluded those docs, skewing every BM25 score vs the oracle)."""
    texts = ["shared words here", None, "shared other tokens", None, "words words words"]
    _check(spark, tmp_path, texts, ["shared words", "tokens"], k=5)

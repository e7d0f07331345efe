"""Oracle self-consistency: heap semantics, ties, k-guards, self-search."""

from __future__ import annotations

import pandas as pd
import pytest

from search_spark.analyzer import tokenize
from search_spark.corpus import conv_name, needle_position
from search_spark.oracle import OracleIndex


def _with_doc_ids(corpus_pd: pd.DataFrame) -> pd.DataFrame:
    df = corpus_pd.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    df["doc_id"] = range(len(df))
    return df


@pytest.fixture(scope="module")
def oracle(tiny_corpus_pd):
    return OracleIndex.build(_with_doc_ids(tiny_corpus_pd))


def test_stats(oracle, tiny_corpus_pd):
    assert oracle.n_docs == len(tiny_corpus_pd)
    total = sum(len(tokenize(t)) for t in tiny_corpus_pd.text)
    assert oracle.avgdl == pytest.approx(total / len(tiny_corpus_pd))


def test_heap_equals_full_sort(oracle):
    q = "the fast w0003 w0010"
    scores = oracle.scores(q)
    full = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    assert oracle.search(q, 5) == full[:5]
    assert oracle.search(q, 10_000) == full  # k > matches returns all


def test_k_guard(oracle):
    assert oracle.search("the", 0) == []
    assert oracle.search("the", -3) == []
    assert oracle.search("zzzqqq oovtoken", 5) == []


def test_needle_self_search(oracle, tiny_corpus_pd):
    df = _with_doc_ids(tiny_corpus_pd)
    conv, turn = needle_position(1)
    row = df[(df.conv_id == conv_name(conv)) & (df.turn_idx == turn)].iloc[0]
    res = oracle.search("needle1", 5)
    assert len(res) == 1 and res[0][0] == row.doc_id


def test_self_search_rank1(oracle, tiny_corpus_pd):
    """Reference invariant: query with an indexed item's own full text →
    that item at rank 1 (/root/reference/index_test.go:35-41)."""
    df = _with_doc_ids(tiny_corpus_pd)
    for _, row in df.sample(10, random_state=7).iterrows():
        res = oracle.search(row.text, 5)
        assert res, row.text
        top_ids = [d for d, s in res if s == res[0][1]]
        assert row.doc_id in top_ids  # its own text may tie with a duplicate doc

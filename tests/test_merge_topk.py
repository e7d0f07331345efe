"""Hierarchical final top-k merge (wand.ranked_topk).

VERDICT r3 #1: the per-query single-partition rank window over k×buckets
candidate rows was the last acknowledged scale-killer (SCALE.md's head-
query worst case: 150M rows through ONE task at 10^12 docs).  These tests
pin the fix: above MERGE_FANOUT buckets the merge runs a bounded
pre-reduce level — per-(query, ⌈√B⌉ merge-group) top-k — before the final
per-query rank, and the results stay EXACT (rank/score-identical to the
brute-force oracle, the reference's per-partition-heaps-then-merge
semantics, /root/reference/index.go:63-86)."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from search_spark import corpus
from search_spark.operators.indexer import build_index
from search_spark.operators.wand import MERGE_FANOUT, IndexReader
from search_spark.oracle import OracleIndex
from search_spark.sources.index_store import IndexStore

N_CONVS = 80  # 640 docs / doc_bucket_size=8 → 80 buckets > MERGE_FANOUT

QUERIES = [
    ("m_head", "the a"),  # head-only: every bucket emits survivors
    ("m_mid", "w0003 w0010"),
    ("m_mix", "the w0007 needle0"),
]


@pytest.fixture(scope="module")
def reader(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("merge_idx"))
    st = IndexStore(root, doc_bucket_size=8, term_buckets=4)
    build_index(
        spark, corpus.generate_spark(spark, N_CONVS, partitions=4), st, n_units=2
    )
    return IndexReader(spark, st)


@pytest.fixture(scope="module")
def oracle():
    df = (
        corpus.generate_pandas(N_CONVS)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    df["doc_id"] = range(len(df))
    return OracleIndex.build(df)


def _n_buckets(reader) -> int:
    return -(-int(reader.stats["n_docs"]) // int(reader.stats["doc_bucket_size"]))


def test_hierarchical_merge_rank_identity(reader, oracle):
    assert _n_buckets(reader) > MERGE_FANOUT  # the pre-reduce level is ACTIVE
    for qid, q in QUERIES:
        for k in (5, 10, 25):
            got = reader.batch_search([(qid, q)], k).orderBy("rank").collect()
            want = oracle.search(q, k)
            assert [r["doc_id"] for r in got] == [d for d, _ in want], (q, k)
            for r, (_, s) in zip(got, want):
                assert r["score"] == pytest.approx(s, abs=1e-9)
            assert [r["rank"] for r in got] == list(range(1, len(want) + 1))


def test_merge_plan_is_two_level(reader):
    """Plan pin: the pre-reduce window keyed (query_id, _mg) must appear —
    no per-query single-partition WindowExec over raw candidate rows."""
    plan = (
        reader.batch_search(QUERIES, 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "_mg" in plan
    assert plan.count("row_number") >= 2  # pre-reduce rank + final rank


def test_merge_single_level_below_fanout(spark, tmp_path_factory, oracle):
    """Below MERGE_FANOUT buckets the extra exchange is pure overhead —
    the plan must stay single-level and still be exact."""
    root = str(tmp_path_factory.mktemp("merge_small"))
    st = IndexStore(root, doc_bucket_size=512, term_buckets=4)
    build_index(
        spark, corpus.generate_spark(spark, N_CONVS, partitions=2), st, n_units=1
    )
    rd = IndexReader(spark, st)
    assert _n_buckets(rd) <= MERGE_FANOUT
    df = rd.batch_search(QUERIES, 10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "_mg" not in plan
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in df.collect()
    }
    for qid, q in QUERIES:
        want = oracle.search(q, 10)
        assert [got[(qid, i + 1)][0] for i in range(len(want))] == [
            d for d, _ in want
        ]


def test_boolean_batch_uses_hierarchical_merge(reader, oracle):
    """boolean_batch shares ranked_topk — verify the two-level plan AND
    pure-must results against the oracle's conjunctive BM25 semantics."""
    from search_spark.operators.boolean import boolean_batch

    df = boolean_batch(reader, [("b", "the a", "", "")], 10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "_mg" in plan
    got = [(r["doc_id"], r["score"]) for r in df.orderBy("rank").collect()]
    # oracle twin: docs containing ALL terms, BM25 over those terms
    docs_all = {
        d for d, _ in oracle.postings["the"]
    } & {d for d, _ in oracle.postings["a"]}
    want = sorted(
        ((d, s) for d, s in oracle.search("the a", 10_000) if d in docs_all),
        key=lambda r: (-r[1], r[0]),
    )[:10]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9)

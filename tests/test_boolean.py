"""Boolean retrieval + facets: oracle identity, clause semantics, guards,
and plan shape (pruned postings scan, no corpus text scan)."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from search_spark.corpus import TURNS_PER_CONV, transcripts_from_documents
from search_spark.operators.boolean import boolean_search, facet_counts, matching_doc_ids
from search_spark.operators.indexer import build_index
from search_spark.operators.wand import IndexReader
from search_spark.oracle_sql import boolean_topk_sql, facet_counts_sql
from search_spark.sources.index_store import IndexStore

SF = "/root/testdata/sf0.001"
ROLE_EXPR = (
    f"CASE WHEN (doc_id % {TURNS_PER_CONV}) % 2 = 0 THEN 'user' ELSE 'assistant' END"
)


@pytest.fixture(scope="module")
def reader(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bool_idx"))
    store = IndexStore(root, doc_bucket_size=128, term_buckets=8)
    build_index(spark, transcripts_from_documents(spark, SF), store, n_units=2)
    return IndexReader(spark, store)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con


@pytest.mark.parametrize(
    "must,should,must_not",
    [
        ("order fast", "", ""),              # pure conjunction
        ("order", "scan filter", "fast"),    # all three clauses
        ("", "scan filter table", "the"),    # disjunctive + exclusion
        ("fast", "order", "fast order"),     # must/must_not overlap → must wins
        ("the", "", "zzq_oov"),              # OOV must_not drops out
    ],
)
def test_boolean_matches_oracle(reader, ddb, must, should, must_not):
    got = [
        (r["doc_id"], round(r["score"] * 1e6))
        for r in boolean_search(reader, must, should, must_not, 10).collect()
    ]
    want = [
        (r[0], r[2])
        for r in ddb.execute(boolean_topk_sql(must, should, must_not, 10)).fetchall()
    ]
    assert got == want and len(got) > 0


def test_boolean_guards(reader):
    assert boolean_search(reader, "order zzq_oov", "", "", 10).count() == 0
    assert boolean_search(reader, "", "zzq_oov", "", 10).count() == 0
    assert boolean_search(reader, "", "", "the", 10).count() == 0  # nothing to score
    assert boolean_search(reader, "order", "", "", 0).count() == 0  # k=0


def test_must_not_actually_excludes(reader, spark):
    base = {r["doc_id"] for r in boolean_search(reader, "order", "", "", 10_000).collect()}
    excl = {r["doc_id"] for r in boolean_search(reader, "order", "", "fast", 10_000).collect()}
    fast = {int(v) for v in matching_doc_ids(reader, ["fast"], "any").toPandas()["doc_id"]}
    assert excl == base - fast and len(excl) < len(base)


@pytest.mark.parametrize("mode", ["any", "all"])
def test_facets_match_oracle(reader, ddb, mode):
    got = [
        (r["facet_value"], r["n_docs"])
        for r in facet_counts(reader, "order fast", facet="role", mode=mode).collect()
    ]
    want = [
        tuple(r)
        for r in ddb.execute(
            facet_counts_sql("order fast", ROLE_EXPR, mode=mode)
        ).fetchall()
    ]
    assert got == want and len(got) == 2  # both roles present


def test_boolean_plan_is_pruned(reader):
    """The boolean scan must carry the same partition-prune + term
    pushdown as batch_search — no full postings walk, no doc text scan."""
    dict_rows = reader._dictionary_rows(["order", "fast"])
    plan = (
        reader.candidate_blocks(["order", "fast"], [b for _, b in dict_rows.values()])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "term_bucket" in plan


BATCH_CLAUSES = [
    ("b1", "order fast", "", ""),
    ("b2", "order", "scan filter", "fast"),
    ("b3", "", "scan filter table", "the"),
    ("b4", "order zzq_oov", "", ""),  # OOV must → 0 rows for b4 ONLY
]


def test_boolean_batch_matches_oracle(reader, ddb):
    """N clauses, ONE job — per-query results identical to the per-clause
    oracle union AND to the single-clause boolean_search twin."""
    from search_spark.operators.boolean import boolean_batch
    from search_spark.oracle_sql import boolean_batch_sql

    res = boolean_batch(reader, BATCH_CLAUSES, 10)
    got = [
        (r["query_id"], r["doc_id"], r["rank"], round(r["score"] * 1e6))
        for r in res.orderBy("query_id", "rank").collect()
    ]
    want = [
        tuple(r)
        for r in ddb.execute(
            "SELECT query_id, doc_id, rank, score_micro FROM ("
            + boolean_batch_sql(BATCH_CLAUSES, 10)
            + ") ORDER BY query_id, rank"
        ).fetchall()
    ]
    assert got == want and len(got) > 0
    assert not any(q == "b4" for q, *_ in got)  # OOV must query is empty
    for qid, m, s, n in BATCH_CLAUSES[:3]:
        single = [
            (r["doc_id"], round(r["score"] * 1e6))
            for r in boolean_search(reader, m, s, n, 10).collect()
        ]
        batch = [(d, sm) for q, d, _, sm in got if q == qid]
        assert single == batch, qid


def test_boolean_batch_guards(reader, spark):
    from search_spark.operators.boolean import boolean_batch

    assert boolean_batch(reader, [], 10).count() == 0
    assert boolean_batch(reader, BATCH_CLAUSES, 0).count() == 0
    assert boolean_batch(reader, [("e", "", "", "the")], 10).count() == 0


def test_more_like_this_matches_oracle(reader, ddb):
    from search_spark.operators.keywords import more_like_this
    from search_spark.oracle_sql import more_like_this_sql

    for seed in (0, 17):
        got = [
            (r["doc_id"], r["rank"], round(r["score"] * 1e6))
            for r in more_like_this(reader, seed, 10).collect()
        ]
        want = [tuple(r) for r in ddb.execute(more_like_this_sql(seed, 10)).fetchall()]
        assert got == want and len(got) == 10
        assert all(d != seed for d, _, _ in got)
    # unknown seed and k=0 are clean empties
    assert more_like_this(reader, 10**9, 10).count() == 0
    assert more_like_this(reader, 0, 0).count() == 0

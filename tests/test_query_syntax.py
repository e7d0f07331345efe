"""Query-syntax router: parse totality and dispatch equivalence."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from search_spark.corpus import transcripts_from_documents
from search_spark.operators.indexer import build_index
from search_spark.operators.wand import IndexReader
from search_spark.query_syntax import parse_query, run_query
from search_spark.sources.index_store import IndexStore

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reader(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("syntax_idx"))
    store = IndexStore(root, doc_bucket_size=128, term_buckets=8)
    build_index(spark, transcripts_from_documents(spark, SF), store, n_units=2)
    return IndexReader(spark, store)


@pytest.mark.parametrize(
    "line,op,attrs",
    [
        ('"order fast"', "phrase", {"text": "order fast"}),
        ('"order fast"~3', "near", {"text": "order fast", "slop": 3}),
        ("+order -fast scan", "boolean", {"must": "order", "must_not": "fast", "should": "scan"}),
        ("+a +b", "boolean", {"must": "a b", "should": ""}),
        ("ord*", "prefix", {"text": "ord"}),
        ("ordr~", "fuzzy", {"text": "ordr", "dist": 1}),
        ("ordr~2", "fuzzy", {"text": "ordr", "dist": 2}),
        ("order fast", "bm25", {"text": "order fast"}),
        ("order*  fast", "bm25", {}),       # suffixes only on single tokens
        ("- lonely dash", "bm25", {}),      # bare '-' is not a clause
        ('"unterminated', "bm25", {}),
        ("", "bm25", {"text": ""}),
    ],
)
def test_parse_totality(line, op, attrs):
    q = parse_query(line)
    assert q.op == op
    for k, v in attrs.items():
        assert getattr(q, k) == v


def _ids(df):
    return [(r["doc_id"], round(r["score"] * 1e6)) for r in df.collect()]


def test_dispatch_matches_direct_calls(reader):
    from search_spark.operators.boolean import boolean_search
    from search_spark.operators.phrase import near_search, phrase_search
    from search_spark.operators.prefix import fuzzy_search, prefix_search

    assert _ids(run_query(reader, '"order fast"', 5)) == _ids(
        phrase_search(reader, "order fast", 5).select("doc_id", "score")
    )
    assert _ids(run_query(reader, '"order fast"~2', 5)) == _ids(
        near_search(reader, "order fast", 2, 5).select("doc_id", "score")
    )
    assert _ids(run_query(reader, "+order -fast scan", 5)) == _ids(
        boolean_search(reader, "order", "scan", "fast", 5)
    )
    assert _ids(run_query(reader, "fa*", 5)) == _ids(
        prefix_search(reader, "fa", 5).select("doc_id", "score")
    )
    assert _ids(run_query(reader, "ordr~", 5)) == _ids(
        fuzzy_search(reader, "ordr", 1, 5).select("doc_id", "score")
    )
    assert _ids(run_query(reader, "order fast", 5)) == _ids(
        reader.batch_search([("q", "order fast")], 5).select("doc_id", "score")
    )


def test_dispatch_is_total_on_junk(reader):
    for line in ["", "   ", '"', "~", "*", "+ -"]:
        assert run_query(reader, line, 5).count() >= 0  # parses + runs


def test_boosted_matches_oracle_and_syntax(reader):
    import duckdb

    from search_spark.oracle_sql import bm25_boosted_sql

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    boosts = {"order": 3.0, "fast": 0.5}
    got = _ids(
        reader.batch_search([("q", "order fast")], 10, boosts=boosts)
        .select("doc_id", "score")
    )
    want = [(r[0], r[2]) for r in con.execute(bm25_boosted_sql("order fast", boosts, 10)).fetchall()]
    assert got == want and len(got) == 10
    # boosting changes the ranking vs plain BM25
    plain = _ids(reader.batch_search([("q", "order fast")], 10).select("doc_id", "score"))
    assert got != plain
    # syntax route and parse
    q = parse_query("order^3 fast^0.5")
    assert q.op == "boosted" and q.clauses == boosts
    assert _ids(run_query(reader, "order^3 fast^0.5", 10)) == got
    # guards: non-positive boost
    import pytest as _pytest

    with _pytest.raises(ValueError):
        reader.batch_search([("q", "order")], 5, boosts={"order": 0.0})


def test_boost_parse_edge_cases(reader):
    # multi-token boost body boosts each analyzer token
    q = parse_query("data-base^3 cache")
    assert q.op == "boosted" and q.clauses == {"data": 3.0, "base": 3.0}
    # zero weight falls back to plain bm25 (parser stays total)
    q0 = parse_query("order^0")
    assert q0.op == "bm25" and q0.text == "order"
    assert run_query(reader, "order^0", 5).count() == 5  # no crash


def test_pagination_exact_and_consistent(reader):
    import duckdb

    from search_spark.oracle_sql import bm25_page_sql

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    got = [
        (r["doc_id"], r["rank"], round(r["score"] * 1e6))
        for r in reader.search_page("order fast", offset=5, size=5).collect()
    ]
    want = [(r[0], r[1], r[2]) for r in con.execute(bm25_page_sql("order fast", 5, 5)).fetchall()]
    assert got == want and [r[1] for r in got] == [6, 7, 8, 9, 10]
    # pages tile the full ranking
    p1 = reader.search_page("order fast", 0, 5).collect()
    p2 = reader.search_page("order fast", 5, 5).collect()
    full = reader.search("order fast", 10).collect()
    assert [(r["rank"], r["doc_id"]) for r in p1 + p2] == [
        (r["rank"], r["doc_id"]) for r in full
    ]
    assert reader.search_page("order fast", -1, 5).count() == 0
    assert reader.search_page("order fast", 0, 0).count() == 0

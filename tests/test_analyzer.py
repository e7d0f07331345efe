"""Analyzer spec v1: the three implementations + SQL dialect must agree."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from search_spark.analyzer import sql_tokens, tokenize, tokenize_pandas, tokens_col

CASES = [
    "Hello, World! 42 times",
    "the fast key order sort",
    "MiXeD CaSe ToKeNs-and_underscores",
    "",
    "   ",
    "éàü unicode outside spec stays ascii only abc123",
    "a" * 500,
    "tabs\tand\nnewlines split too",
]


def test_python_vs_pandas():
    got = tokenize_pandas(pd.Series(CASES)).tolist()
    want = [tokenize(c) for c in CASES]
    assert got == want


def test_python_vs_duckdb():
    con = duckdb.connect()
    for c in CASES:
        got = con.execute(f"select {sql_tokens('?')}", [c]).fetchone()[0]
        assert got == tokenize(c), c


def test_python_vs_spark(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "text string")
    got = [r["toks"] for r in df.select(tokens_col("text").alias("toks")).collect()]
    assert got == [tokenize(c) for c in CASES]


def test_none_handling():
    assert tokenize(None) == []
    assert tokenize_pandas(pd.Series([None, "ab"])).tolist() == [[], ["ab"]]


def test_python_vs_arrow():
    """tokenize_arrow (flat tokens + parent indices) rebuilds the exact
    per-doc token lists of the plain-Python spec, including None/empty."""
    import pyarrow as pa

    from search_spark.analyzer import tokenize_arrow

    cases = CASES + [None, "!!!", "x", "İstanbul Straße ABC1", "300K kelvin K9"]
    flat, par = tokenize_arrow(pa.array(cases, type=pa.string()))
    rebuilt: list[list[str]] = [[] for _ in cases]
    for tok, i in zip(flat.to_pylist(), par.to_pylist()):
        rebuilt[i].append(tok)
    assert rebuilt == [tokenize(c) for c in cases]

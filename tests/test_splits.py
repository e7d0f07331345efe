"""Splits + hash sampling: oracle identity, key coherence, stability,
superset-sample property, guards."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from search_spark.corpus import transcripts_from_documents
from search_spark.operators.splits import (
    DEFAULT_SALT,
    DEFAULT_WEIGHTS,
    assign_splits,
    hash_sample,
    split_summary,
)
from search_spark.oracle_sql import (
    hash_sample_sql,
    split_assignments_sql,
    split_summary_sql,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con


def test_assignments_match_oracle(spark, ddb):
    tr = transcripts_from_documents(spark, SF)
    got = sorted(
        (r["conv_id"], r["split"])
        for r in assign_splits(tr).select("conv_id", "split").distinct().collect()
    )
    want = sorted(
        tuple(r)
        for r in ddb.execute(
            split_assignments_sql(DEFAULT_WEIGHTS, DEFAULT_SALT)
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_summary_matches_oracle(spark, ddb):
    tr = transcripts_from_documents(spark, SF)
    got = sorted(tuple(r) for r in split_summary(tr).collect())
    want = sorted(
        tuple(r)
        for r in ddb.execute(split_summary_sql(DEFAULT_WEIGHTS, DEFAULT_SALT)).fetchall()
    )
    assert got == want


def test_key_coherence_and_stability(spark):
    """All turns of a conversation share one split; re-running and
    re-partitioning don't move anyone; custom weights cover everything."""
    tr = transcripts_from_documents(spark, SF)
    a = assign_splits(tr, weights={"train": 3, "heldout": 1})
    per_conv = a.groupBy("conv_id").agg(
        {"split": "approx_count_distinct"}
    ).collect()
    assert all(r[1] == 1 for r in per_conv)
    b = assign_splits(tr.repartition(13), weights={"train": 3, "heldout": 1})
    assert sorted(map(tuple, a.select("conv_id", "split").distinct().collect())) == sorted(
        map(tuple, b.select("conv_id", "split").distinct().collect())
    )
    names = {r["split"] for r in a.select("split").distinct().collect()}
    assert names <= {"train", "heldout"}


@pytest.mark.parametrize("rate", [0.0, 0.25, 1.0])
def test_sample_matches_oracle(spark, ddb, rate):
    tr = transcripts_from_documents(spark, SF)
    got = sorted(
        (r["conv_id"], r["turn_idx"])
        for r in hash_sample(tr, rate).select("conv_id", "turn_idx").collect()
    )
    want = sorted(tuple(r) for r in ddb.execute(hash_sample_sql(rate, "sample/v1")).fetchall())
    assert got == want
    if rate == 1.0:
        assert len(got) == tr.count()
    if rate == 0.0:
        assert got == []


def test_sample_superset_property(spark):
    tr = transcripts_from_documents(spark, SF)
    s1 = {r["conv_id"] for r in hash_sample(tr, 0.1).select("conv_id").collect()}
    s2 = {r["conv_id"] for r in hash_sample(tr, 0.4).select("conv_id").collect()}
    assert s1 <= s2


def test_guards(spark):
    tr = transcripts_from_documents(spark, SF)
    with pytest.raises(ValueError):
        hash_sample(tr, 1.5)
    with pytest.raises(ValueError):
        assign_splits(tr, weights={"a": -1.0, "b": 2.0})
    with pytest.raises(ValueError):
        assign_splits(tr, weights={})

"""Composed materialization pipeline: end-to-end oracle identity, stage
bite (filter + dedup actually drop rows), per-split packing isolation."""

from __future__ import annotations

import sys

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from search_spark.corpus import transcripts_from_documents
from search_spark.operators.materialize import (
    materialize_summary,
    materialize_training_corpus,
)
from search_spark.operators.splits import DEFAULT_SALT, DEFAULT_WEIGHTS
from search_spark.oracle_sql import materialize_sql, materialize_summary_sql

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con


@pytest.mark.parametrize("budget,minq", [(128, 650_000), (256, 100_000)])
def test_matches_oracle_end_to_end(spark, ddb, budget, minq):
    tr = transcripts_from_documents(spark, SF)
    got = sorted(
        tuple(r) for r in materialize_training_corpus(tr, budget, minq).collect()
    )
    want = sorted(
        tuple(r)
        for r in ddb.execute(
            materialize_sql(budget, minq, DEFAULT_WEIGHTS, DEFAULT_SALT)
        ).fetchall()
    )
    assert got == want and len(got) > 0
    gs = sorted(
        tuple(r)
        for r in materialize_summary(
            materialize_training_corpus(tr, budget, minq)
        ).collect()
    )
    ws = sorted(
        tuple(r)
        for r in ddb.execute(
            materialize_summary_sql(budget, minq, DEFAULT_WEIGHTS, DEFAULT_SALT)
        ).fetchall()
    )
    assert gs == ws


def test_filter_and_dedup_bite(spark, ddb):
    """The quality filter drops rows at a high floor, and a planted
    duplicate loses to its keeper."""
    tr = transcripts_from_documents(spark, SF)
    n_all = tr.count()
    kept = materialize_training_corpus(tr, 128, 700_000).count()
    assert 0 < kept < n_all
    # plant an exact duplicate of the first turn under a LATER key
    first = tr.orderBy("conv_id", "turn_idx").limit(1).collect()[0]
    dup = spark.createDataFrame(
        [("conv-zzzzzz", 0, first["role"], first["text"], first["tool"], first["ts"])],
        tr.schema,
    )
    m = materialize_training_corpus(tr.unionByName(dup), 128, 100_000)
    assert m.filter(F.col("conv_id") == "conv-zzzzzz").count() == 0  # keeper won
    assert (
        m.filter(
            (F.col("conv_id") == first["conv_id"])
            & (F.col("turn_idx") == first["turn_idx"])
        ).count()
        == 1
    )


def test_sequences_never_span_splits(spark):
    tr = transcripts_from_documents(spark, SF)
    m = materialize_training_corpus(tr, 64, 100_000)
    per_seq = m.groupBy("split", "seq_id").count()
    # (split, seq_id) is the sequence key — same seq_id may appear in two
    # splits (offsets reset per split), never mixing rows across splits
    a = m.select("split", "seq_id").distinct().count()
    assert per_seq.count() == a
    # offsets reset per split: every split has a seq_id 0
    zeros = {r["split"] for r in m.filter(F.col("seq_id") == 0).select("split").distinct().collect()}
    splits = {r["split"] for r in m.select("split").distinct().collect()}
    assert zeros == splits

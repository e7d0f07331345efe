"""Sequence packing: oracle identity, partition invariance, budget
semantics, and the no-global-window plan property."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from search_spark.corpus import transcripts_from_documents
from search_spark.operators.packing import pack_sequences, pack_summary
from search_spark.oracle_sql import pack_assignments_sql, pack_summary_sql

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con


@pytest.mark.parametrize("budget", [64, 256, 10_000_000])
def test_assignments_match_oracle(spark, ddb, budget):
    tr = transcripts_from_documents(spark, SF)
    got = sorted(
        tuple(r)
        for r in pack_sequences(tr, budget)
        .select("conv_id", "turn_idx", "n_tokens", "start_offset", "seq_id", "spans_boundary")
        .collect()
    )
    want = sorted(tuple(r) for r in ddb.execute(pack_assignments_sql(budget)).fetchall())
    assert got == want and len(got) > 0


def test_summary_matches_oracle(spark, ddb):
    tr = transcripts_from_documents(spark, SF)
    packed = pack_sequences(tr, 128)
    got = sorted(tuple(r) for r in pack_summary(packed, 128).collect())
    want = sorted(tuple(r) for r in ddb.execute(pack_summary_sql(128)).fetchall())
    assert got == want


def test_partition_invariance(spark):
    """seq_id is a pure function of the corpus order — invariant to the
    physical partition count (the 1000-executor determinism contract)."""
    tr = transcripts_from_documents(spark, SF)
    a = sorted(
        tuple(r)
        for r in pack_sequences(tr, 200, num_partitions=1)
        .select("conv_id", "turn_idx", "seq_id")
        .collect()
    )
    b = sorted(
        tuple(r)
        for r in pack_sequences(tr, 200, num_partitions=13)
        .select("conv_id", "turn_idx", "seq_id")
        .collect()
    )
    assert a == b


def test_budget_semantics(spark):
    tr = transcripts_from_documents(spark, SF)
    packed = pack_sequences(tr, 100).collect()
    total = sum(r["n_tokens"] for r in packed)
    # offsets tile the corpus exactly: max end == total, starts are dense
    assert max(r["start_offset"] + r["n_tokens"] for r in packed) == total
    assert sorted(r["start_offset"] for r in packed)[0] == 0
    for r in packed:
        assert r["seq_id"] == r["start_offset"] // 100
        assert r["spans_boundary"] == (
            r["n_tokens"] > 0
            and (r["start_offset"] + r["n_tokens"] - 1) // 100 != r["seq_id"]
        )
    with pytest.raises(ValueError):
        pack_sequences(tr, 0)


def test_no_global_single_partition_window(spark):
    """The plan must not contain a global (empty-frame) window sort — the
    prefix sum is two-phase by construction."""
    tr = transcripts_from_documents(spark, SF)
    plan = (
        pack_sequences(tr, 128)._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan


def test_reset_col_equals_per_group_packing(spark):
    """reset_col packing (one shuffle) must equal running pack_sequences
    separately per group, at partition counts that force boundary pids."""
    from pyspark.sql import functions as F

    tr = transcripts_from_documents(spark, SF).withColumn(
        "grp", F.when(F.col("conv_id") < "conv-000040", "a").otherwise("b")
    )
    for p in (1, 3, 7):
        one = sorted(
            tuple(r)
            for r in pack_sequences(tr, 100, num_partitions=p, reset_col="grp")
            .select("grp", "conv_id", "turn_idx", "start_offset", "seq_id")
            .collect()
        )
        per = []
        for g in ("a", "b"):
            per.extend(
                tuple(r)
                for r in pack_sequences(
                    tr.filter(F.col("grp") == g), 100, num_partitions=p
                )
                .select("grp", "conv_id", "turn_idx", "start_offset", "seq_id")
                .collect()
            )
        assert one == sorted(per), p

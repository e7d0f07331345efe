"""Decontamination: oracle identity, self-hit invariant, broadcast plan."""

from __future__ import annotations

import sys

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from search_spark.operators.decontam import (
    contaminated_doc_ids,
    contamination_report,
)
from search_spark.oracle_sql_pipeline import contamination_sql

SF = "/root/testdata/sf0.001"
EVAL_SQL = "SELECT doc_id AS eval_id, text FROM documents WHERE doc_id % 53 = 0"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    eval_df = docs.filter(F.col("doc_id") % 53 == 0).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    return docs, eval_df


@pytest.mark.parametrize("w,min_hits", [(8, 1), (3, 3), (5, 2)])
def test_matches_oracle(corpus, ddb, w, min_hits):
    docs, eval_df = corpus
    got = sorted(
        tuple(r) for r in contamination_report(docs, eval_df, w, min_hits).collect()
    )
    want = sorted(
        tuple(r) for r in ddb.execute(contamination_sql(EVAL_SQL, w, min_hits)).fetchall()
    )
    assert got == want and len(got) > 0


def test_self_hits_and_planted_dup(corpus, spark):
    """Every eval doc flags itself; a verbatim copy of an eval text under
    a fresh doc_id is flagged too."""
    docs, eval_df = corpus
    ids = {r["doc_id"] for r in contaminated_doc_ids(docs, eval_df).collect()}
    evs = {r["eval_id"] for r in eval_df.collect()}
    assert evs <= ids
    planted = eval_df.limit(1).select(
        F.lit(999_999).cast("bigint").alias("doc_id"), "text"
    )
    ids2 = {
        r["doc_id"]
        for r in contaminated_doc_ids(docs.unionByName(planted), eval_df).collect()
    }
    assert 999_999 in ids2


def test_guards_and_clean_eval(corpus, spark):
    docs, eval_df = corpus
    with pytest.raises(ValueError):
        contamination_report(docs, eval_df, min_hits=0)
    clean = spark.createDataFrame(
        [(1, "zzq aaa bbb ccc ddd eee fff ggg hhh unique tokens nowhere else")],
        "eval_id bigint, text string",
    )
    assert contamination_report(docs, clean, 8, 1).count() == 0


def test_eval_side_is_broadcast(corpus):
    docs, eval_df = corpus
    plan = (
        contamination_report(docs, eval_df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_multi_row_eval_ids_count_distinct_overlap(spark, ddb, corpus):
    """Two rows of one eval_id sharing shingles must not inflate n_shared
    (review regression: eval_shingles needs a cross-row distinct)."""
    docs, _ = corpus
    text = docs.limit(1).collect()[0]["text"]
    multi = spark.createDataFrame(
        [(7, text), (7, text)], "eval_id bigint, text string"
    )
    single = spark.createDataFrame([(7, text)], "eval_id bigint, text string")
    a = sorted(tuple(r) for r in contamination_report(docs, multi, 8, 1).collect())
    b = sorted(tuple(r) for r in contamination_report(docs, single, 8, 1).collect())
    assert a == b and len(a) > 0

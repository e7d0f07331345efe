#!/usr/bin/env python
"""Benchmark driver: index build + batch BM25 query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall time of the headline workload (build + query
batch) on local[$SPARK_GRAFT_CPUS].  Per-query times are in "queries".
Scaling evidence across two parallelism levels is produced by
``python bench.py --scaling`` (writes BENCH/BASELINE.md) — the sandbox
stand-in for the N vs 4N executor criterion (see BASELINE.md notes).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

BENCH_QUERIES = {
    "q_head": "the fast scan",
    "q_mix": "merge window customer batch",
    "q_rare": "vector stream spark",
    "q_long": "join filter group sort table row data merge batch window",
}


def make_spark(cpus: str, app: str = "search-spark-bench"):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(max(8, int(cpus))))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )


def run_workload(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from search_spark.analyzer import tokenize
    from search_spark.operators.build import build_df_index, search_topk_df

    times: dict[str, float] = {}
    t0 = time.perf_counter()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    idx = build_df_index(docs, assign_ids=False)
    idx.postings.persist()
    idx.doclens.persist()
    idx.dictionary.persist()
    n_postings = idx.postings.count()
    times["build"] = time.perf_counter() - t0

    for name, qtext in BENCH_QUERIES.items():
        t0 = time.perf_counter()
        res = search_topk_df(idx, tokenize(qtext), 10).collect()
        times[name] = time.perf_counter() - t0

    idx.postings.unpersist()
    idx.doclens.unpersist()
    idx.dictionary.unpersist()
    times["_n_postings"] = n_postings
    times["_n_docs"] = idx.n_docs
    return times


def main() -> None:
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    spark = make_spark(CPUS)
    try:
        times = run_workload(spark, SF_DIR)
    finally:
        spark.stop()
    qtimes = {k: round(v, 4) for k, v in times.items() if not k.startswith("_")}
    total = round(sum(qtimes.values()), 4)
    print(
        json.dumps(
            {
                "metric": "bm25_build_plus_batch_query_wall",
                "value": total,
                "unit": "sec",
                "queries": qtimes,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "n_docs": times["_n_docs"],
                "n_postings": times["_n_postings"],
                "cpus": int(CPUS),
            }
        )
    )


if __name__ == "__main__":
    main()

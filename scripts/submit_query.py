#!/usr/bin/env python
"""spark-submit entry point: batch BM25 top-k over a persisted index.

    spark-submit --master <cluster> --py-files dist/search_spark.zip \\
        scripts/submit_query.py --store /index/root -k 10 \\
        --query "error in tool call" --query "retry with backoff" \\
        [--rehydrate] [--out /path/results.parquet]

Local smoke:
    python scripts/submit_query.py --store /tmp/idx_demo \\
        --query "the fast scan" --master 'local[8]'
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True)
    ap.add_argument("--query", action="append", required=True, help="repeatable")
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--rehydrate", action="store_true", help="join back doc text")
    ap.add_argument("--out", default=None, help="write results parquet instead of show")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName("search-spark-query").config(
        "spark.io.compression.codec", "zstd"
    )  # −46% shuffle bytes vs lz4, equal wall time (BENCH.md r5)
    if args.master:
        b = b.master(args.master)
    spark = b.getOrCreate()

    from search_spark.operators.wand import IndexReader
    from search_spark.sources.index_store import IndexStore

    reader = IndexReader(spark, IndexStore(args.store))
    pairs = [(f"q{i}", q) for i, q in enumerate(args.query)]
    res = reader.batch_search(pairs, args.k)
    if args.rehydrate:
        res = reader.rehydrate(res)
    if args.out:
        res.write.mode("overwrite").parquet(args.out)
    else:
        res.show(args.k * len(pairs), truncate=60)
    spark.stop()


if __name__ == "__main__":
    main()

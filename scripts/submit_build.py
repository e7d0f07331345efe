#!/usr/bin/env python
"""spark-submit entry point: resumable index build over a transcript table.

Cluster usage (north_rule packaging):

    scripts/package_pyfiles.sh
    spark-submit --master <cluster> \\
        --py-files dist/search_spark.zip \\
        [--packages org.apache.iceberg:iceberg-spark-runtime-...] \\
        scripts/submit_build.py \\
        --input /path/or/catalog.table --store /index/root \\
        --units 64 [--doc-bucket-size 65536] [--term-buckets 256]

``--input`` accepts a parquet path or (with an Iceberg catalog configured,
see search_spark.sources.iceberg.session_builder_conf) a ``catalog.db.table``
identifier.  Re-running after a failure resumes from the per-unit
checkpoint ledger.  Local smoke:

    python scripts/submit_build.py \\
        --input /root/testdata/sf0.01/documents.parquet --derive-transcripts \\
        --store /tmp/idx_demo --units 4 --master 'local[8]'
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet path or catalog table")
    ap.add_argument("--store", required=True, help="index store root directory")
    ap.add_argument("--units", type=int, default=16, help="resumable work units")
    ap.add_argument("--doc-bucket-size", type=int, default=65536)
    ap.add_argument("--term-buckets", type=int, default=64)
    ap.add_argument("--master", default=None, help="override master (local runs)")
    ap.add_argument(
        "--derive-transcripts",
        action="store_true",
        help="input is a documents table; derive the transcript shape from it",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName("search-spark-build").config(
        "spark.io.compression.codec", "zstd"
    )  # −46% shuffle bytes vs lz4, equal wall time (BENCH.md r5)
    if args.master:
        b = b.master(args.master)
    spark = b.getOrCreate()

    from search_spark.operators.indexer import build_index
    from search_spark.sources.index_store import IndexStore

    if args.derive_transcripts:
        import os

        from search_spark.corpus import transcripts_from_documents

        transcripts = transcripts_from_documents(spark, os.path.dirname(args.input))
    elif "/" in args.input or args.input.endswith(".parquet"):
        transcripts = spark.read.parquet(args.input)
    else:
        transcripts = spark.read.table(args.input)

    store = IndexStore(
        args.store,
        doc_bucket_size=args.doc_bucket_size,
        term_buckets=args.term_buckets,
    )
    result = build_index(spark, transcripts, store, n_units=args.units)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()

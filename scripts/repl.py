#!/usr/bin/env python
"""Interactive search REPL over a persisted index — the analogue of the
reference's example program (/root/reference/example/main.go:25-54: stdin
loop, top-10 search, results rendered in relevance buckets).

    python scripts/repl.py --store /tmp/idx_demo [--master 'local[8]'] [-k 10]

Commands: a query per line; ``:refresh`` re-opens the store's current
snapshot (picks up new stream segments); ``:quit`` / EOF exits.

Query syntax (search_spark/query_syntax.py): ``"exact phrase"``,
``"near terms"~3``, ``+must -not should``, ``pref*``, ``term~2``,
``term^2 other`` (boost) — any other line is a plain BM25 query.

Relevance buckets mirror example/main.go:44-54's ≥0.85 / ≥0.5 cut, applied
to the score normalized by the batch's best hit (BM25 is unbounded, unlike
cosine, so the bucket thresholds are relative to the top score).
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F


def _bucket(rel: float) -> str:
    if rel >= 0.85:
        return "★★★"
    if rel >= 0.5:
        return "★★ "
    return "★  "


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True)
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName("search-spark-repl").config(
        "spark.io.compression.codec", "zstd"
    )  # −46% shuffle bytes vs lz4, equal wall time (BENCH.md r5)
    if args.master:
        b = b.master(args.master)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from search_spark.operators.wand import IndexReader
    from search_spark.sources.index_store import IndexStore

    reader = IndexReader(spark, IndexStore(args.store))
    print(f"index: {reader.stats['n_docs']} docs, avgdl {reader.stats['avgdl']:.1f}")
    print("query per line; :refresh re-opens the snapshot; :quit exits")

    while True:
        try:
            line = input("search> ").strip()
        except EOFError:
            break
        if not line:
            continue
        if line == ":quit":
            break
        if line == ":refresh":
            reader.refresh()
            print(f"refreshed: {reader.stats['n_docs']} docs")
            continue
        from search_spark.query_syntax import run_query

        rows = (
            reader.rehydrate(run_query(reader, line, args.k))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .collect()
        )
        if not rows:
            print("  (no hits)")
            continue
        top = rows[0]["score"]
        for r in rows:
            rel = r["score"] / top if top > 0 else 0.0
            text = (r["text"] or "")[:96]
            print(f"  {_bucket(rel)} {r['score']:8.3f}  #{r['doc_id']:<8d} {text}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Query-set file loader — the engine analogue of the reference eval
harness's TSV loader (``loadSICK``, /root/reference/internal/eval/
main.go:85-121: tab-separated CSV, header skipped, parsed into typed
records that drive the batch evaluation).

Here the query set is a TSV with a header row and columns
``query_id<TAB>text``; the canonical set used by bench.py and the driver
contract is checked in at ``fixtures/queries.tsv``.  Loading goes through
``spark.read.csv`` (SURVEY.md §2.3 #23's mapping) so at cluster scale a
query file on object storage loads the same way; the collected list is
driver-sized by definition — a query *set* is the unit a user submits, not
a data table.
"""

from __future__ import annotations

import csv

from pyspark.sql import SparkSession


def load_queryset(spark: SparkSession, path: str) -> list[tuple[str, str]]:
    """[(query_id, text)] in query_id order (deterministic regardless of
    file-split ordering)."""
    df = (
        spark.read.option("sep", "\t")
        .option("header", True)
        .schema("query_id string, text string")
        .csv(path)
    )
    rows = df.collect()
    out = sorted((r["query_id"], r["text"] or "") for r in rows)
    if not out:
        raise ValueError(f"empty query set at {path}")
    return out


def load_queryset_py(path: str) -> list[tuple[str, str]]:
    """Plain-Python twin (same parse, no Spark) for oracle SQL construction
    and tooling that runs before a session exists."""
    with open(path, newline="") as f:
        rd = csv.DictReader(f, delimiter="\t")
        out = sorted((row["query_id"], row["text"] or "") for row in rd)
    if not out:
        raise ValueError(f"empty query set at {path}")
    return out

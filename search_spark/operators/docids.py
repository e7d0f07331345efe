"""Stable, dense docID assignment at scale (SURVEY.md §7.3).

The reference's docID is the append position in a single in-memory array
(/root/reference/index.go:46-49) — deterministic because the build is
single-threaded.  The distributed contract that replaces it: ``doc_id`` is
the dense global rank 0..N-1 of the row under the total order
``(conv_id ASC, turn_idx ASC)`` (BASELINE.json input_hint: "stable
(conv_id, turn_idx) ordering").

A naive ``row_number() OVER (ORDER BY conv_id, turn_idx)`` collapses to a
single partition — correct at test scale, fatal at 10^12 rows.  The
scalable two-phase plan used here:

1. ``repartitionByRange(P, conv_id, turn_idx)`` + ``sortWithinPartitions``
   — contiguous, ordered ranges.  *Wherever* Spark's range sampler places
   the boundaries, partition p holds a contiguous slice of the total order
   and all rows in partition p sort before partition p+1.
2. Per-partition row counts (P rows — collected to the driver, tiny even at
   P=100k) → cumulative offsets, broadcast.
3. ``row_number`` within each partition (a *local* window keyed on
   ``spark_partition_id()`` — no global shuffle) + offset.

doc_id is therefore the global sort rank — invariant to P and to boundary
placement, hence deterministic across runs and cluster sizes.  Verified by
tests/test_docids.py against a driver-side sort at test scale and by the
per-turn text-equality invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_doc_ids(
    df: DataFrame,
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    num_partitions: int | None = None,
    cache_handle: list | None = None,
) -> DataFrame:
    """Add dense ``doc_id`` = global rank under ``order_cols``.

    Returns the input columns plus ``doc_id`` (bigint), range-partitioned by
    the order columns (a useful physical property for downstream build
    stages: doc-contiguous partitions → doc-contiguous posting runs).

    The ranged intermediate is persisted (the count job and the window job
    MUST observe the same range boundaries — re-execution would re-sample
    them).  Pass ``cache_handle=[]`` to receive the persisted DataFrame and
    ``unpersist()`` it once the result is materialized — long-lived callers
    (the streaming ingest loop) must do this or cached micro-batch RDDs
    accumulate for the life of the stream.
    """
    sc_parallelism = df.sparkSession.sparkContext.defaultParallelism
    p = num_partitions or sc_parallelism
    ranged = df.repartitionByRange(p, *[F.col(c) for c in order_cols])

    # Materialize the ranged layout before reading it twice: the range
    # sampler's boundaries are job-scoped, so the count job and the window
    # job must observe the *same* partitioning.  (At cluster scale the
    # equivalent is staging the sorted table; in-memory persist suffices in
    # one Spark app.)
    with_pid = ranged.withColumn("_pid", F.spark_partition_id()).persist()
    if cache_handle is not None:
        cache_handle.append(with_pid)
    counts = with_pid.groupBy("_pid").count().collect()  # P rows — driver-safe
    by_pid = {r["_pid"]: r["count"] for r in counts}
    offsets, acc = {}, 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]

    offs = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]) if offsets else F.create_map()
    w = Window.partitionBy("_pid").orderBy(*[F.col(c).asc() for c in order_cols])
    return (
        with_pid.withColumn(
            "doc_id",
            (F.row_number().over(w) - 1 + F.element_at(offs, F.col("_pid"))).cast("bigint"),
        )
        .drop("_pid")
    )

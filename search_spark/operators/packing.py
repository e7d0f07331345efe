"""Training-sequence packing: global token-offset chunking of transcripts.

LLM training pipelines concatenate the corpus token stream in a stable
document order and cut it into fixed-budget context windows; each turn
lands in the window its first token falls in.  This is the packing rule
that needs no per-chunk state, so it is exactly computable at any scale
AND exactly mirrorable in SQL (the greedy reset-per-chunk variant needs
recursion; this is the standard high-throughput form).

Definition, under the stable total order ``(conv_id, turn_idx)`` (the
engine's docID order, operators/docids.py):

- ``n_tokens``       = analyzer token count of the turn
- ``start_offset``   = exclusive prefix sum of ``n_tokens``
- ``seq_id``         = start_offset // budget
- ``spans_boundary`` = the turn's tokens cross a budget multiple

Scale plan: the same two-phase global prefix sum as docID assignment —
``repartitionByRange`` on the order, per-partition token sums (P rows to
the driver), cumulative bases broadcast, then a partition-local window.
No global single-partition window anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..analyzer import tokens_col


def pack_sequences(
    df: DataFrame,
    budget: int,
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    num_partitions: int | None = None,
    reset_col: str | None = None,
    cache_handle: list | None = None,
) -> DataFrame:
    """Assign every turn to its training sequence: input columns plus
    ``n_tokens``, ``start_offset``, ``seq_id``, ``spans_boundary``.

    ``budget`` is the context-window token budget (> 0).  With
    ``reset_col`` the offsets (and therefore seq_ids) restart at 0 within
    each value of that column — per-split packing in ONE range shuffle:
    the range key becomes (reset_col, *order_cols), the per-partition
    sums are keyed (partition, reset) so a partition straddling a reset
    boundary accumulates each side separately, and the bases ship back as
    a broadcast-joined (partition, reset, base) lookup.  Reset values
    must be non-null (the bases join is an equality join).

    The ranged intermediate is persisted — the sum job and the window job
    must observe the same sampled range boundaries.  Pass
    ``cache_handle=[]`` to receive the persisted DataFrame and
    ``unpersist()`` it once the result is materialized (the
    assign_doc_ids contract; long-lived callers must do this or cached
    layouts accumulate)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    with_n = df.withColumn("n_tokens", F.size(tokens_col("text")).cast("bigint"))
    range_cols = ([reset_col] if reset_col else []) + list(order_cols)
    ranged = with_n.repartitionByRange(p, *[F.col(c) for c in range_cols])

    # two-phase exclusive prefix sum (docids.assign_doc_ids doctrine): the
    # ranged layout is persisted so the sum job and the window job observe
    # the same sampled boundaries
    with_pid = ranged.withColumn("_pid", F.spark_partition_id()).persist()
    if cache_handle is not None:
        cache_handle.append(with_pid)
    try:
        grp = ["_pid"] + ([reset_col] if reset_col else [])
        sums = with_pid.groupBy(*grp).agg(F.sum("n_tokens").alias("s")).collect()
        if reset_col:
            # per-reset cumulative bases over partition order (range
            # partitioning keeps each reset value's rows contiguous and
            # pid-ordered; a boundary pid holds per-(pid, reset) rows)
            if any(r[reset_col] is None for r in sums):
                raise ValueError(
                    f"pack_sequences reset_col {reset_col!r} contains NULLs — "
                    "reset values must be non-null (bases join on equality)"
                )
            acc_by_reset: dict = {}
            base_rows = []
            for r in sorted(sums, key=lambda r: (str(r[reset_col]), r["_pid"])):
                key = r[reset_col]
                base_rows.append((int(r["_pid"]), key, acc_by_reset.get(key, 0)))
                acc_by_reset[key] = acc_by_reset.get(key, 0) + int(r["s"] or 0)
            reset_type = df.schema[reset_col].dataType.simpleString()
            bases_df = spark.createDataFrame(
                base_rows, f"_pid int, {reset_col} {reset_type}, _base long"
            )
            with_base = with_pid.join(
                F.broadcast(bases_df), ["_pid", reset_col]
            )
            base_expr = F.col("_base")
        else:
            by_pid = {r["_pid"]: int(r["s"] or 0) for r in sums}
            bases, acc = {}, 0
            for pid in sorted(by_pid):
                bases[pid] = acc
                acc += by_pid[pid]
            base_map = (
                F.create_map(*[F.lit(x) for kv in bases.items() for x in kv])
                if bases
                else F.create_map()
            )
            with_base = with_pid
            base_expr = F.element_at(base_map, F.col("_pid"))
        # ROW-based frame, not the default RANGE frame: with RANGE, rows
        # tied on the order key would share one cumulative sum and produce
        # overlapping start_offsets; ROWS BETWEEN ... AND 1 PRECEDING is
        # the exclusive prefix sum the DuckDB oracle computes.
        w = (
            Window.partitionBy(*grp)
            .orderBy(*[F.col(c).asc() for c in order_cols])
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        start = (
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) + base_expr
        ).cast("bigint")
        # `div` (exact integer division) — float division would misround
        # offsets once the global token count passes 2^53
        out = (
            with_base.withColumn("start_offset", start)
            .withColumn("seq_id", F.expr(f"start_offset div {int(budget)}"))
            .withColumn(
                "spans_boundary",
                (F.col("n_tokens") > 0)
                & (
                    F.expr(f"(start_offset + n_tokens - 1) div {int(budget)}")
                    != F.col("seq_id")
                ),
            )
            .drop("_pid", "_base")
        )
        # the caller's plan reads the persisted ranged layout; release it
        # via cache_handle once materialized (assign_doc_ids contract)
        return out
    except Exception:
        with_pid.unpersist()
        raise


def pack_summary(packed: DataFrame, budget: int) -> DataFrame:
    """Per-sequence rollup: (seq_id, n_turns, seq_tokens, n_spanning).
    seq_tokens counts tokens STARTING in the sequence, so it sums to the
    corpus total and is budget-bounded except for boundary-spanning
    tails."""
    return packed.groupBy("seq_id").agg(
        F.count("*").cast("bigint").alias("n_turns"),
        F.sum("n_tokens").cast("bigint").alias("seq_tokens"),
        F.sum(F.col("spans_boundary").cast("int")).cast("bigint").alias("n_spanning"),
    )

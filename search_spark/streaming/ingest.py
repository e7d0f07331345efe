"""Structured Streaming ingest: incremental index segments from a growing
transcript table.

The reference is strictly batch (`Add` then `Search` — /root/reference/
index.go:44-50; no incremental path exists).  At 10^12-turn scale new
transcripts arrive continuously, so the engine adds the Spark-native
incremental path: ``readStream`` over the transcript source →
``foreachBatch`` → each micro-batch becomes ONE immutable posting segment,
registered in the store's checkpoint ledger.

Exactly-once contract:
- Spark's streaming checkpoint (``checkpointLocation``) guarantees each
  micro-batch id is delivered to ``foreachBatch`` at least once and never
  interleaved; re-delivery after a crash reuses the same ``batch_id``.
- The segment write is idempotent: the output path is keyed by
  ``batch_id`` and rewritten with overwrite semantics; the ledger marks the
  batch done only after its files land (same commit order as the batch
  builder's units).

Stream segments are doc-bucketed like batch units, so query-time merge is
just "read more segment directories" — ``IndexReader`` over a store built
from any mix of batch units and stream batches sees one logical index.
Stream doc_ids are assigned from a reserved high range (``STREAM_DOC_BASE``
+ running offset recorded in the ledger) so they never collide with batch
doc_ids and stay stable across restarts: within a micro-batch the order is
the same stable ``(conv_id, turn_idx)`` contract as the batch path.

Global stats (n_docs, avgdl) are refreshed per batch: BM25 idf/avgdl drift
as documents arrive; ``finalize_stream`` recomputes the dictionary exactly
like the batch finalize, giving rank-identical results to a from-scratch
batch build over the same data (tested).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.docids import assign_doc_ids
from ..operators.indexer import (
    POSTING_SCHEMA,
    TF_TID_SCHEMA,
    _encode_partition,
    _tf_arrow_fn,
)
from ..sources.index_store import IndexStore

#: stream doc_ids start here — far above any batch corpus
STREAM_DOC_BASE = 1 << 40
#: stream doc_buckets start here (doc_bucket is int32; batch buckets at
#: 10^12 docs / 65536-doc buckets ≈ 1.5e7 stay far below this)
STREAM_BUCKET_BASE = 1 << 28


def stream_segment_path(store: IndexStore, batch_id: int) -> str:
    return os.path.join(store.root, "stream_postings", f"batch={batch_id}")


def stream_docs_path(store: IndexStore, batch_id: int) -> str:
    return os.path.join(store.root, "stream_docs", f"batch={batch_id}")


def _ingest_one_batch(
    store: IndexStore, batch_df: DataFrame, batch_id: int, avgdl_hint: float
) -> None:
    """foreachBatch body: one micro-batch → one immutable segment.

    Runs under the store's MAINTENANCE GATE: a batch is either fully
    committed before a compaction/finalize starts or starts after it ends —
    no mid-flight interleavings (see index_store._MAINT_LOCK)."""
    from ..sources.index_store import _MAINT_LOCK

    with _MAINT_LOCK:
        _ingest_one_batch_locked(store, batch_df, batch_id, avgdl_hint)


def _ingest_one_batch_locked(
    store: IndexStore, batch_df: DataFrame, batch_id: int, avgdl_hint: float
) -> None:
    cp = store.checkpoints()
    done = cp.get("stream_batches", {})
    if str(batch_id) in done:
        return  # crash-replay of a committed batch: idempotent no-op
    base = STREAM_DOC_BASE + int(cp.get("stream_doc_offset", 0))

    # stable ids within the batch under (conv_id, turn_idx) via the same
    # two-phase assigner as the batch path (a global Window.orderBy would
    # collapse an availableNow backfill batch to one partition), shifted to
    # the stream's reserved range
    cache_handle: list = []
    docs = (
        assign_doc_ids(batch_df, cache_handle=cache_handle)
        .withColumn("doc_id", (F.col("doc_id") + F.lit(base)).cast("bigint"))
        .withColumn(
            "doc_bucket",
            (
                ((F.col("doc_id") - F.lit(STREAM_DOC_BASE)) / store.doc_bucket_size).cast("long")
                + F.lit(STREAM_BUCKET_BASE)
            ).cast("int"),
        )
    )
    spark = batch_df.sparkSession
    docs.write.mode("overwrite").parquet(stream_docs_path(store, batch_id))
    for cached in cache_handle:  # free the docid assigner's per-batch cache
        cached.unpersist()
    staged = spark.read.parquet(stream_docs_path(store, batch_id))
    n_docs = staged.count()
    if n_docs == 0:
        store.mark_stream_batch(batch_id, 0)
        return

    # dictionary-encoded exchange (indexer._tf_arrow_fn): stream docs use
    # the reserved-range affine bucket (doc_id - STREAM_DOC_BASE) // dbs
    # + STREAM_BUCKET_BASE, derived on the reduce side — same contract as
    # the batch build, different offsets
    dbs = store.doc_bucket_size
    tf_local = staged.select("doc_id", "text").mapInArrow(
        _tf_arrow_fn(STREAM_DOC_BASE, STREAM_BUCKET_BASE, dbs),
        schema=TF_TID_SCHEMA,
    )
    n_enc = max(2, spark.sparkContext.defaultParallelism // 2)
    bucket_expr = F.expr(
        f"CAST((doc_id - {STREAM_DOC_BASE}) DIV {dbs} + {STREAM_BUCKET_BASE} AS INT)"
    )
    encoded = (
        tf_local.repartition(n_enc, F.col("tid"), bucket_expr)
        .sortWithinPartitions("tid", "doc_id")
        .mapInPandas(
            _encode_partition(avgdl_hint, STREAM_DOC_BASE, STREAM_BUCKET_BASE, dbs),
            schema=POSTING_SCHEMA,
        )
    )
    encoded = encoded.withColumn(
        "term_bucket", F.pmod(F.xxhash64("term"), F.lit(store.term_buckets)).cast("int")
    )
    encoded.write.mode("overwrite").partitionBy("term_bucket").parquet(
        stream_segment_path(store, batch_id)
    )

    # per-batch build metrics (terms/postings/bytes/skew), same shape as the
    # batch units' rows but under metrics_stream/batch={id} — batch finalize
    # rewrites metrics/ wholesale, so stream rows live beside it; the
    # per-batch dir + overwrite keeps a crash-replayed batch idempotent
    # (append to a shared dir would duplicate the row).  This partitioned
    # layout is part of on-disk FORMAT_VERSION 2 from its first release —
    # no flat-file stores exist to migrate.
    seg = spark.read.option("basePath", stream_segment_path(store, batch_id)).parquet(
        stream_segment_path(store, batch_id)
    )
    payload_bytes = (
        F.octet_length("doc_ids_delta") + F.octet_length("tfs") + F.octet_length("dls")
    )
    per_term = seg.groupBy("term").agg(
        F.sum("n_docs").alias("tp"),
        F.sum(payload_bytes).alias("tb"),
        F.sum("cf_block").alias("tc"),
    )
    mrow = per_term.agg(
        F.count("*").alias("terms"),
        F.sum("tp").alias("postings"),
        F.sum("tb").alias("bytes"),
        F.sum("tc").alias("tokens"),
        (F.max("tp") / F.avg("tp")).alias("skew_factor"),
    ).collect()[0]
    # token total comes FREE from block metadata (Σ cf_block == Σ dl) —
    # no second tokenization pass over the batch text
    n_tokens = int(mrow["tokens"] or 0)
    metrics = spark.createDataFrame(
        [
            (
                int(mrow["terms"]),
                int(mrow["postings"] or 0),
                int(mrow["bytes"] or 0),
                float(mrow["skew_factor"] or 1.0),
                int(batch_id),
                f"stream_batch={batch_id}",
            )
        ],
        "terms bigint, postings bigint, bytes bigint, skew_factor double, "
        "partition_id int, lineage string",
    ).withColumn("build_ts", F.current_timestamp())
    metrics.write.mode("overwrite").parquet(
        os.path.join(store.root, "metrics_stream", f"batch={batch_id}")
    )

    store.mark_stream_batch(batch_id, n_docs, n_tokens)


def start_ingest(
    spark: SparkSession,
    source_path: str,
    store: IndexStore,
    checkpoint_dir: str,
    avgdl_hint: float = 30.0,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start the streaming ingest over a parquet directory source.

    ``available_now=True`` processes everything currently present and
    stops (the test/backfill mode); ``False`` runs continuously.
    ``max_files_per_trigger`` bounds micro-batch size (and in tests forces
    multiple batches).  Returns the StreamingQuery.
    """
    store.init()
    reader = spark.readStream.schema(
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        _ingest_one_batch(store, batch_df, batch_id, avgdl_hint)

    writer = stream.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


#: marker file riding inside the dictionary dir: records which stream
#: batches (and implied stats) the installed dictionary embodies, so the
#: install rename IS the fold's commit point
FOLD_MARKER = "_fold_commit.json"


def _write_fold_marker(dict_dir: str, folded: list[int], stats: dict) -> None:
    import json

    marker = {
        "folded_batches": sorted(int(b) for b in folded),
        "n_docs": int(stats["n_docs"]),
        "total_tokens": int(stats.get("total_tokens", 0)),
        "avgdl": float(stats["avgdl"]),
    }
    with open(os.path.join(dict_dir, FOLD_MARKER), "w") as f:
        json.dump(marker, f)


def _install_dictionary(store: IndexStore, dictionary, folded_after: list[int], stats: dict) -> None:
    """Stage → marker → rename: the rename atomically installs the data AND
    the record of what it embodies (also required because incremental plans
    READ the live dictionary — an in-place overwrite would delete its own
    input mid-job)."""
    import shutil

    tmp = store.dictionary_path + ".tmp"
    aside = store.dictionary_path + ".old"
    # same partitioned layout as the batch finalize (lookup pruning)
    # term-sorted within each bucket like the batch finalize: keeps prefix
    # range scans row-group-skippable after stream folds too
    dictionary.repartition(store.term_buckets, "term_bucket").sortWithinPartitions(
        "term"
    ).write.mode("overwrite").partitionBy("term_bucket").parquet(tmp)
    _write_fold_marker(tmp, folded_after, stats)
    shutil.rmtree(aside, ignore_errors=True)
    if os.path.exists(store.dictionary_path):
        os.rename(store.dictionary_path, aside)
    os.rename(tmp, store.dictionary_path)
    shutil.rmtree(aside, ignore_errors=True)


def _reconcile_fold_marker(store: IndexStore) -> None:
    """Repair a crash between dictionary install and the ledger/stats
    writes: the marker inside the INSTALLED dictionary is authoritative for
    which batches its contents embody — without this, a re-run would fold
    the same deltas twice (double-counted df/cf/n_docs)."""
    import json

    path = os.path.join(store.dictionary_path, FOLD_MARKER)
    if not os.path.exists(path):
        return
    with open(path) as f:
        marker = json.load(f)
    cp = store.checkpoints()
    ledger = set(cp.get("dict_folded_batches", []))
    missing = [b for b in marker["folded_batches"] if b not in ledger]
    if missing:
        store.mark_batches_folded(missing)
    try:
        stats = store.stats()
    except FileNotFoundError:
        stats = {}
    if stats.get("n_docs") != marker["n_docs"]:
        stats.update(
            {
                "n_docs": marker["n_docs"],
                "total_tokens": marker["total_tokens"],
                "avgdl": marker["avgdl"],
                "doc_bucket_size": store.doc_bucket_size,
                "term_buckets": store.term_buckets,
            }
        )
        store.write_stats(stats)


def finalize_stream(spark: SparkSession, store: IndexStore, incremental: bool = True) -> dict:
    """Refresh global stats + dictionary so an IndexReader over the store
    is rank-identical to a batch build of the same rows.

    INCREMENTAL by default (the 10^12-turn path): term stats are
    associative adds (df/cf sums, max_tf/max_raw maxima), so only the
    segments of stream batches NOT yet folded are aggregated — a
    batch-sized metadata scan — and merged into the existing dictionary
    with a full-outer join; stats (n_docs, total_tokens → avgdl) advance
    from the per-batch ledger counters.  idf is recomputed for EVERY term
    (it depends on the new global N) — a map over the vocab-sized
    dictionary, no postings scan.  The full recompute (``incremental=
    False``, also the fallback when no dictionary/stats exist yet) scans
    all postings metadata every call, which at scale grows with the index
    instead of the batch; equality of the two paths is pinned in
    tests/test_streaming.py.
    """
    from ..functions.bm25 import idf_col
    from ..sources.index_store import _MAINT_LOCK

    with _MAINT_LOCK:
        return _finalize_stream_locked(spark, store, incremental, idf_col)


def _finalize_stream_locked(spark, store, incremental, idf_col) -> dict:
    _reconcile_fold_marker(store)
    new_batches = store.unfolded_stream_batches()
    cp = store.checkpoints()
    can_increment = (
        incremental
        and os.path.exists(store.stats_path)
        and os.path.exists(store.dictionary_path)
        and "total_tokens" in store.stats()
        # ledger-format guard: batches committed by a pre-n_tokens engine
        # can't fold incrementally (their token counts are unknown) — fall
        # back to the full recompute rather than silently understate avgdl
        and all(
            "n_tokens" in cp["stream_batches"][str(b)] for b in new_batches
        )
    )
    if can_increment:
        stats = store.stats()
        add_docs = sum(
            cp["stream_batches"][str(b)]["n_docs"] for b in new_batches
        )
        add_tokens = sum(
            cp["stream_batches"][str(b)]["n_tokens"] for b in new_batches
        )
        stats["n_docs"] = int(stats["n_docs"]) + add_docs
        stats["total_tokens"] = int(stats["total_tokens"]) + add_tokens
        stats["avgdl"] = stats["total_tokens"] / max(1, stats["n_docs"])
        if new_batches:
            parts = [
                spark.read.option("basePath", stream_segment_path(store, b)).parquet(
                    stream_segment_path(store, b)
                )
                for b in new_batches
            ]
            newp = parts[0]
            for p in parts[1:]:
                newp = newp.unionByName(p)
            delta = newp.groupBy("term").agg(
                F.sum("n_docs").alias("d_df"), F.sum("cf_block").alias("d_cf"),
                F.max("block_max_tf").alias("d_max_tf"), F.max("block_max_raw").alias("d_max_raw"),
            )
            old = spark.read.parquet(store.dictionary_path).select(
                "term", "df", "cf", "max_tf", "max_raw"
            )
            merged = old.join(delta, "term", "full_outer").select(
                "term",
                (F.coalesce("df", F.lit(0)) + F.coalesce("d_df", F.lit(0))).alias("df"),
                (F.coalesce("cf", F.lit(0)) + F.coalesce("d_cf", F.lit(0))).alias("cf"),
                F.greatest(F.coalesce("max_tf", F.lit(0)), F.coalesce("d_max_tf", F.lit(0))).alias("max_tf"),
                F.greatest(F.coalesce("max_raw", F.lit(0.0)), F.coalesce("d_max_raw", F.lit(0.0))).alias("max_raw"),
            )
        else:
            merged = spark.read.parquet(store.dictionary_path).select(
                "term", "df", "cf", "max_tf", "max_raw"
            )
        dictionary = merged.withColumn(
            "idf", idf_col(F.lit(stats["n_docs"]), F.col("df"))
        ).withColumn(
            "term_bucket", F.pmod(F.xxhash64("term"), F.lit(store.term_buckets)).cast("int")
        )
        folded_after = sorted(
            set(cp.get("dict_folded_batches", [])) | {int(b) for b in new_batches}
        )
        _install_dictionary(store, dictionary, folded_after, stats)
        store.write_stats(stats)
        store.mark_batches_folded(new_batches)
        sid = store.commit_snapshot(
            "finalize_stream", {"n_docs": stats["n_docs"], "folded": new_batches}
        )
        return {"n_docs": stats["n_docs"], "snapshot_id": sid, "incremental": True}

    # full recompute (first finalize, ledger-format fallback, or explicitly
    # requested).  Under the maintenance gate no batch can commit while the
    # recompute runs; the folded set is still the set captured up front so
    # a gate-bypassing caller degrades to "batch folds next time", never to
    # "batch marked folded but missing from the dictionary".
    scanned_batches = new_batches
    doc_sources = []
    if os.path.exists(store.docs_path()):
        doc_sources.append(spark.read.parquet(store.docs_path()).select("doc_id", "dl"))
    sdocs_root = os.path.join(store.root, "stream_docs")
    # only INDEX-ACKNOWLEDGED batches (store.acked_stream_batches): a batch
    # that crashed after writing stream_docs/batch=N but before its ledger
    # done-mark has docs on disk with NO postings — folding them into
    # n_docs/avgdl/total_tokens would skew every term's idf vs the postings
    # the index actually serves.  Same crash-window rule, same helper, as
    # IndexReader.doc_source (operators/wand.py).
    acked = store.acked_stream_batches()
    if os.path.exists(sdocs_root) and acked:
        sd = (
            spark.read.option("basePath", sdocs_root)
            .parquet(sdocs_root)
            .filter(F.col("batch").isin(acked))
        )
        from ..analyzer import tokens_col

        doc_sources.append(
            sd.select(
                "doc_id", F.coalesce(F.size(tokens_col("text")), F.lit(0)).alias("dl")
            )
        )
    if doc_sources:
        all_docs = doc_sources[0]
        for d in doc_sources[1:]:
            all_docs = all_docs.unionByName(d)
        row = all_docs.agg(
            F.count("*").alias("n"), F.avg("dl").alias("avgdl"), F.sum("dl").alias("total")
        ).collect()[0]
    else:
        # no batch docs and no ACKED stream batches (e.g. finalize racing a
        # store whose only batch crashed mid-commit): zero-doc stats, not an
        # IndexError — the crashed batch folds after its replay commits
        row = {"n": 0, "avgdl": 0.0, "total": 0}
    stats = store.stats() if os.path.exists(store.stats_path) else {}
    stats.update(
        {
            "n_docs": int(row["n"]),
            "avgdl": float(row["avgdl"] or 0.0),
            "total_tokens": int(row["total"] or 0),
            "doc_bucket_size": store.doc_bucket_size,
            "term_buckets": store.term_buckets,
        }
    )
    store.write_stats(stats)

    posts = store.load_postings_df(spark)
    dictionary = (
        posts.groupBy("term")
        .agg(F.sum("n_docs").alias("df"), F.sum("cf_block").alias("cf"),
             F.max("block_max_tf").alias("max_tf"), F.max("block_max_raw").alias("max_raw"))
        .withColumn("idf", idf_col(F.lit(stats["n_docs"]), F.col("df")))
        .withColumn("term_bucket", F.pmod(F.xxhash64("term"), F.lit(store.term_buckets)).cast("int"))
    )
    folded_after = sorted(
        set(store.checkpoints().get("dict_folded_batches", []))
        | {int(b) for b in scanned_batches}
    )
    _install_dictionary(store, dictionary, folded_after, stats)
    store.mark_batches_folded(scanned_batches)
    sid = store.commit_snapshot("finalize_stream", {"n_docs": stats["n_docs"]})
    return {"n_docs": stats["n_docs"], "snapshot_id": sid, "incremental": False}



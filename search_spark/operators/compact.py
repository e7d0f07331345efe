"""Segment compaction: per-unit / per-stream-batch segments → one global
posting layout (the LSM story's merge leg; north_star: "merge partition
segments into a global index via a salted, skew-aware shuffle keyed on
term").

Before compaction the global index exists *logically* (IndexReader unions
segment directories).  Compaction materializes it:

- ONE shuffle keyed on ``(term_bucket)`` — the term-hash salt — with
  ``sortWithinPartitions(term, doc_bucket, first_doc)``.  Doc-range
  bucketing means segments' runs for one (term, doc_bucket) never overlap
  in docID, so the sorted stream concatenates into global docID order with
  NO re-sort of postings (SURVEY.md §7.4).
- Adjacent small blocks of the same (term, doc_bucket) — typical at
  stream-batch boundaries — are decoded and re-encoded into full
  BLOCK_SIZE blocks (`mapInPandas`, numpy codec), restoring block-max skip
  efficiency.
- Output replaces the live postings via an atomic snapshot commit: the
  compacted layout is fully written to a NEW directory first, then ONE
  atomic manifest write both records the snapshot and repoints the
  covered-``segments`` list at the new directory.  Old segment dirs are
  removed only after the commit, best-effort — a crash at ANY point leaves
  readers on exactly one consistent view (old segments before the commit,
  compacted layout after), because ``IndexStore.load_postings_df`` reads
  only the dirs the manifest covers and ignores stale leftovers (no
  zero-postings window, no double-counted stream segments).

Query results are IDENTICAL before and after compaction (tested) — only
the physical layout changes.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import codec
from ..sources.index_store import IndexStore
from .indexer import POSTING_SCHEMA


def _merge_partition(
    batches: Iterator[pd.DataFrame], purge: np.ndarray | None = None
) -> Iterator[pd.DataFrame]:
    """Re-block a sorted stream of posting blocks.

    Input partition is hash-partitioned by term_bucket and sorted by
    (term, doc_bucket, first_doc); a (term, doc_bucket) run may be split
    across Arrow batches, so the trailing run is carried like the encoder's.
    Full blocks pass through untouched (no decode); only runs containing
    under-filled blocks — or, when ``purge`` (a SORTED int64 array of
    tombstoned doc_ids) is given, runs whose doc range intersects it — are
    decoded, filtered, and re-encoded.
    """

    carry: pd.DataFrame | None = None

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        out_rows = []
        terms = pdf["term"].to_numpy()
        buckets = pdf["doc_bucket"].to_numpy()
        change = np.flatnonzero((terms[1:] != terms[:-1]) | (buckets[1:] != buckets[:-1]))
        starts = np.concatenate(([0], change + 1))
        ends = np.concatenate((change + 1, [len(pdf)]))
        for s, e in zip(starts, ends):
            run = pdf.iloc[s:e]
            n_blocks = e - s
            full = (run["n_docs"].to_numpy()[:-1] >= codec.BLOCK_SIZE).all() if n_blocks > 1 else True
            hit = False
            if purge is not None and purge.shape[0]:
                lo = int(run["first_doc"].min())
                hi = int(run["last_doc"].max())
                hit = bool(
                    np.searchsorted(purge, lo, "left")
                    < np.searchsorted(purge, hi, "right")
                )
            if full and not hit:
                out_rows.append(run)
                continue
            # decode the whole run, (purge-)filter, re-encode densely
            docs_l, tfs_l, dls_l = [], [], []
            for row in run.itertuples(index=False):
                d, t, dl = codec.decode_block(row._asdict())
                docs_l.append(d)
                tfs_l.append(t)
                dls_l.append(dl)
            d = np.concatenate(docs_l)
            t = np.concatenate(tfs_l)
            dl = np.concatenate(dls_l)
            if hit:
                keep = ~np.isin(d, purge, assume_unique=True)
                d, t, dl = d[keep], t[keep], dl[keep]
                if d.shape[0] == 0:
                    continue  # the whole run was tombstoned
            # avgdl only feeds the diagnostic block_max_raw; bounds used at
            # query time derive from (max_tf, min_dl) — any positive value ok
            blocks = codec.make_blocks(d, t, dl, avgdl=1.0)
            rebuilt = pd.DataFrame(blocks)
            rebuilt.insert(0, "term", run["term"].iloc[0])
            rebuilt.insert(1, "doc_bucket", int(run["doc_bucket"].iloc[0]))
            out_rows.append(rebuilt[[f.name for f in POSTING_SCHEMA.fields]])
        return pd.concat(out_rows, ignore_index=True) if out_rows else pd.DataFrame(
            columns=[f.name for f in POSTING_SCHEMA.fields]
        )

    for pdf in batches:
        if carry is not None and len(carry):
            pdf = pd.concat([carry, pdf], ignore_index=True)
        if not len(pdf):
            continue
        lt = pdf["term"].iloc[-1]
        lb = pdf["doc_bucket"].iloc[-1]
        tail_first = int(
            np.argmax((pdf["term"].to_numpy() == lt) & (pdf["doc_bucket"].to_numpy() == lb))
        )
        carry = pdf.iloc[tail_first:]
        head = pdf.iloc[:tail_first]
        if len(head):
            yield emit(head)
    if carry is not None and len(carry):
        yield emit(carry)


def compact_index(spark: SparkSession, store: IndexStore) -> dict:
    """Merge all segments into the compacted global layout; returns stats.

    Runs under the store's MAINTENANCE GATE for its whole duration: stream
    micro-batch commits wait until the compaction finishes (and vice
    versa), so no batch can land mid-merge — the interleavings that would
    otherwise merge-but-not-fold, delete-but-not-commit, or strand a
    just-written segment are excluded by construction rather than patched
    point by point.  A waiting micro-batch is the intended cost of a
    maintenance op."""
    from ..sources.index_store import _MAINT_LOCK

    with _MAINT_LOCK:
        return _compact_index_locked(spark, store)


def _compact_index_locked(spark: SparkSession, store: IndexStore) -> dict:
    from ..operators.wand import IndexReader

    # Crash repair first: a prior compaction that died between recording
    # its purge ledger and writing stats left the stats file stale —
    # re-apply the ledger's recorded stats before anything reads them.
    store.reconcile_purged_stats()

    # Fold any pending stream-batch term stats into the dictionary FIRST:
    # compaction absorbs those segments' postings into the new layout and
    # removes the per-batch dirs, so deltas not folded now would be
    # unrecoverable by the incremental finalize path.
    if store.unfolded_stream_batches():
        from ..streaming.ingest import finalize_stream

        finalize_stream(spark, store)

    # Belt-and-braces late-batch bookkeeping: under the maintenance gate no
    # batch can commit during the merge, but the covered-segments math
    # below still tolerates one (kept on disk + re-listed) in case a future
    # caller bypasses the gate.
    pre_batches = set(store.checkpoints().get("stream_batches", {}).keys())
    reader = IndexReader(spark, store)  # validates versions, unions segments
    posts = reader._posts_df  # term_bucket present from partition discovery
    n_parts = max(2, spark.sparkContext.defaultParallelism)

    # PURGE: tombstoned docs are physically removed during the merge.
    # Capture the tombstone FILES now — a delete landing mid-compaction
    # stays on disk for the next one (only consumed files are cleared).
    tomb_dir = store.tombstones_path()
    tomb_files = (
        sorted(f for f in os.listdir(tomb_dir) if f.endswith(".json"))
        if os.path.exists(tomb_dir)
        else []
    )
    deleted = store.tombstones() if tomb_files else frozenset()
    purge_arr = (
        np.fromiter(sorted(deleted), dtype=np.int64, count=len(deleted))
        if deleted
        else None
    )

    import functools

    merged = (
        posts.repartition(n_parts, "term_bucket")
        .sortWithinPartitions("term", "doc_bucket", "first_doc")
        .drop("term_bucket")
        .mapInPandas(
            functools.partial(_merge_partition, purge=purge_arr),
            schema=POSTING_SCHEMA,
        )
        .withColumn(
            "term_bucket", F.pmod(F.xxhash64("term"), F.lit(store.term_buckets)).cast("int")
        )
    )
    # unique target dir per compaction (repeated compactions never collide
    # with the still-live previous layout).  Compacted layouts live OUTSIDE
    # the postings/ discovery tree: a legacy (never-compacted) store's
    # readers discover postings/* + stream_postings/*, so installing there
    # would make a not-yet-committed layout visible — double counting.  A
    # dir under compacted/ is reachable ONLY through the covered-segments
    # list the commit writes.
    tag = (store.manifest()["current_snapshot"] or 0) + 1
    new_unit = f"unit{tag}"
    new_rel = os.path.join("compacted", new_unit)
    tmp_path = os.path.join(store.root, f"_compact_tmp_{tag}")
    merged.write.mode("overwrite").partitionBy("term_bucket").parquet(tmp_path)

    row = (
        spark.read.option("basePath", tmp_path).parquet(tmp_path)
        .agg(F.count("*").alias("blocks"), F.sum("n_docs").alias("postings"))
        .collect()[0]
    )

    # purge bookkeeping: new corpus stats and a rebuilt dictionary over the
    # purged postings, staged before the commit.  IDEMPOTENT: only ids NOT
    # already in the purged ledger subtract from N/total_tokens — a crash
    # after write_stats but before tombstone-file removal, or delete_docs
    # re-called with already-purged ids, can never subtract the same doc
    # twice (ADVICE r3).  Ledger entry (ids + implied stats) is written
    # atomically BEFORE the stats file; reconcile_purged_stats repairs the
    # stats file from it after any crash in between.  Tombstones are
    # cleared LAST, so at every crash point results still exclude the
    # deleted docs and a re-run converges.
    new_stats = None
    dict_tmp = None
    new_ids: list[int] = []
    if deleted:
        from ..analyzer import tokens_col
        from ..functions.bm25 import idf_col

        new_ids = sorted(set(deleted) - set(store.purged_ids()))
        old = store.stats()
        if new_ids:
            # broadcast join, not an isin literal list: delete sets are
            # blessed up to millions of ids — a multi-million-literal In
            # expression would stall planning/codegen on the driver
            ids_df = F.broadcast(
                spark.createDataFrame([(int(d),) for d in new_ids], "doc_id bigint")
            )
            docs = reader.doc_source().select("doc_id", "text")
            gone = (
                docs.join(ids_df, "doc_id")
                .agg(
                    F.count("*").alias("n"),
                    F.coalesce(F.sum(F.size(tokens_col("text"))), F.lit(0)).alias("toks"),
                )
                .collect()[0]
            )
            n_docs_new = int(old["n_docs"]) - int(gone["n"])
            total_new = int(old.get("total_tokens", 0)) - int(gone["toks"])
        else:
            # every tombstoned id was already purge-accounted (re-delivered
            # tombstone files / repeat delete_docs): stats stay put, but the
            # dictionary still rebuilds over the (idempotently) purged layout
            n_docs_new = int(old["n_docs"])
            total_new = int(old.get("total_tokens", 0))
        new_stats = dict(old)
        new_stats.update(
            {
                "n_docs": n_docs_new,
                "total_tokens": total_new,
                "avgdl": (total_new / n_docs_new) if n_docs_new else 0.0,
            }
        )
        dictionary = (
            spark.read.option("basePath", tmp_path).parquet(tmp_path)
            .groupBy("term")
            .agg(
                F.sum("n_docs").alias("df"),
                F.sum("cf_block").alias("cf"),
                F.max("block_max_tf").alias("max_tf"),
                F.max("block_max_raw").alias("max_raw"),
            )
            .withColumn("idf", idf_col(F.lit(n_docs_new), F.col("df")))
            .withColumn(
                "term_bucket",
                F.pmod(F.xxhash64("term"), F.lit(store.term_buckets)).cast("int"),
            )
        )
        dict_tmp = store.dictionary_path + ".purge_tmp"
        shutil.rmtree(dict_tmp, ignore_errors=True)
        dictionary.repartition(store.term_buckets, "term_bucket").sortWithinPartitions(
            "term"
        ).write.mode("overwrite").partitionBy("term_bucket").parquet(dict_tmp)

    # install-then-commit: the new layout lands under postings/ while the
    # old dirs remain untouched; the snapshot commit atomically repoints
    # the covered-segments list (single-writer local store; Iceberg's
    # snapshot commit replaces this on a real catalog — sources/iceberg.py)
    os.makedirs(os.path.join(store.root, "compacted"), exist_ok=True)
    dest = os.path.join(store.root, new_rel)
    if os.path.exists(dest):
        # leftover from a compaction that crashed after install but before
        # commit — it was never covered by a snapshot (the commit assigns
        # the segments list with the same tag), so replacing it is safe
        shutil.rmtree(dest)
    os.rename(tmp_path, dest)
    # commit under the ledger lock so no stream batch can land between the
    # late-batch scan and the segments-list write
    from ..sources.index_store import _CP_LOCK

    with _CP_LOCK:
        cp = store.checkpoints().get("stream_batches", {})
        late = sorted(
            int(b) for b, v in cp.items() if b not in pre_batches and v.get("n_docs", 0) > 0
        )
        segments = [new_rel] + [f"stream_postings/batch={b}" for b in late]
        sid = store.commit_snapshot(
            "compact",
            {
                "blocks": int(row["blocks"]),
                "postings": int(row["postings"] or 0),
                "late_stream_batches": late,
                "purged_docs": len(deleted),
            },
            segments=segments,
        )

    if deleted:
        # ledger first (one atomic rename): newly-accounted ids + the
        # stats they imply, tagged with this compaction's snapshot id —
        # from here on the decrement can never be applied twice, and
        # reconcile_purged_stats can re-apply it after any crash below.
        if new_ids:
            new_stats["purge_seq"] = int(sid)
            store.record_purged(new_ids, new_stats, int(sid))
        # install the purged dictionary (staged rename, marker updated so
        # the fold-marker reconciler can't resurrect pre-purge stats),
        # write the reduced stats, then — last — clear the consumed
        # tombstone files.  Late deletes (files not in tomb_files) survive
        # for the next compaction.
        import json as _json

        from ..streaming.ingest import FOLD_MARKER

        marker_path = os.path.join(store.dictionary_path, FOLD_MARKER)
        marker = None
        if os.path.exists(marker_path):
            with open(marker_path) as f:
                marker = _json.load(f)
            marker.update(
                {
                    "n_docs": int(new_stats["n_docs"]),
                    "total_tokens": int(new_stats["total_tokens"]),
                    "avgdl": float(new_stats["avgdl"]),
                }
            )
        aside = store.dictionary_path + ".old"
        shutil.rmtree(aside, ignore_errors=True)
        if marker is not None:
            with open(os.path.join(dict_tmp, FOLD_MARKER), "w") as f:
                _json.dump(marker, f)
        os.rename(store.dictionary_path, aside)
        os.rename(dict_tmp, store.dictionary_path)
        shutil.rmtree(aside, ignore_errors=True)
        store.write_stats(new_stats)
        for name in tomb_files:
            try:
                os.remove(os.path.join(store.tombstones_path(), name))
            except OSError:
                pass
    # cleanup is best-effort: stale dirs are invisible to snapshot-aware
    # readers even if this is interrupted.  Everything the pre-compaction
    # view covered is folded into the new layout (batch postings tree,
    # pre-snapshot stream segments, superseded compacted dirs); LATE stream
    # segments stay on disk and in the covered list.
    covered = set(store.covered_segments() or [])
    shutil.rmtree(store.postings_path(), ignore_errors=True)
    stream_root = os.path.join(store.root, "stream_postings")
    if os.path.exists(stream_root):
        for d in os.listdir(stream_root):
            rel = os.path.join("stream_postings", d)
            if rel not in covered:
                shutil.rmtree(os.path.join(stream_root, d), ignore_errors=True)
        try:
            if not os.listdir(stream_root):
                os.rmdir(stream_root)
        except OSError:
            pass  # defensive: a dir appearing here is kept, never an error
    for d in os.listdir(os.path.join(store.root, "compacted")):
        rel = os.path.join("compacted", d)
        if rel not in covered:
            shutil.rmtree(os.path.join(store.root, "compacted", d), ignore_errors=True)
    return {"blocks": int(row["blocks"]), "postings": int(row["postings"] or 0), "snapshot_id": sid}

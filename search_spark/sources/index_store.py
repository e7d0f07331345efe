"""Persistent index store: parquet tables + versioned manifest with
snapshots, lineage, and per-unit build checkpoints.

The reference persists one flate-compressed binary file with a leading
format-version byte and rejects mismatches on read
(/root/reference/index_codec.go:20-22, :56-58).  The distributed analogue
here is a *table layout* with a JSON manifest carrying format + analyzer
versions (rejected on mismatch the same way), snapshot entries with lineage
(parent snapshot, operation, row counts), and a checkpoint ledger that
makes index builds resumable per work unit (north_rule).

Layout under ``root``::

    _manifest.json         format/analyzer versions, snapshots, current ptr
    checkpoints.json       unit ledger: {unit: {status, rows, ...}}
    docs/unit=N/           staged corpus w/ assigned doc_id, dl, doc_bucket
    postings/unit=N/term_bucket=M/   encoded posting blocks
    dictionary/            term, df, cf, max_tf, idf
    stats.json             n_docs, avgdl, config
    metrics/               per-unit build metrics (FIXTURES.md §5)

Written with plain ``df.write.parquet`` so the sandbox needs no extra jars;
on a cluster with an Iceberg catalog the same tables map 1:1 to Iceberg
tables (``writeTo(...).append()``) and the manifest maps to Iceberg
snapshots — see sources/iceberg.py.

Atomicity: manifest/checkpoint writes go through a temp file + ``os.replace``
(single-writer builds; Iceberg's optimistic commit replaces this at cluster
scale).
"""

from __future__ import annotations

import json
import os
import threading
import time
from dataclasses import dataclass, field
from typing import Any

#: serializes checkpoint-ledger/manifest writes across concurrent
#: unit-builder threads (reentrant: stream commits nest a segment update)
_CP_LOCK = threading.RLock()

#: MAINTENANCE GATE: a whole stream micro-batch ingest and a whole
#: maintenance operation (compaction, dictionary finalize) mutually
#: exclude — point locks around individual ledger writes cannot prevent a
#: batch landing mid-merge (merged-but-unfolded, deleted-but-uncommitted,
#: counted-in-stats-but-not-folded races).  A micro-batch waiting out a
#: compaction is correct and expected semantics; lock ORDER is always
#: _MAINT_LOCK → _CP_LOCK, never the reverse (deadlock-free).  In-process
#: only — the documented single-application scope of the local store
#: (Iceberg's optimistic snapshot conflicts replace this on a catalog).
_MAINT_LOCK = threading.RLock()

from .. import FORMAT_VERSION
from ..analyzer import ANALYZER_VERSION


def _write_json_atomic(path: str, obj: Any) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, default=str)
    os.replace(tmp, path)


def _read_json(path: str, default: Any = None) -> Any:
    if not os.path.exists(path):
        return default
    with open(path) as f:
        return json.load(f)


@dataclass
class IndexStore:
    root: str
    doc_bucket_size: int = 4096
    term_buckets: int = 8

    def __post_init__(self) -> None:
        # Geometry is a property of the STORE, not the caller: when the
        # root already holds a manifest, ITS doc_bucket_size/term_buckets
        # override whatever the constructor received.  Without this, a
        # writer that reopens a non-default store bare — e.g.
        # ``compact_index(spark, IndexStore(root))`` on a 16-term-bucket
        # store — inherits the defaults and rewrites ``term_bucket =
        # pmod(hash, 8)`` while the dictionary still says mod 16: every
        # bucket-pruned read then scans the wrong (or no) partition and
        # silently returns 0 rows (caught live on a 1.4M-doc store;
        # regression-tested in tests/test_compact.py).  Readers were
        # immune only because they take buckets from the dictionary's
        # stored column; every WRITE path (compaction, streaming ingest
        # onto an existing store, purge) used the constructor values.
        m = _read_json(self.manifest_path, None)
        if m:
            self.doc_bucket_size = int(m.get("doc_bucket_size", self.doc_bucket_size))
            self.term_buckets = int(m.get("term_buckets", self.term_buckets))

    # ---- paths ----
    @property
    def manifest_path(self) -> str:
        return os.path.join(self.root, "_manifest.json")

    @property
    def checkpoints_path(self) -> str:
        return os.path.join(self.root, "checkpoints.json")

    @property
    def stats_path(self) -> str:
        return os.path.join(self.root, "stats.json")

    def docs_path(self, unit: int | None = None) -> str:
        base = os.path.join(self.root, "docs")
        return base if unit is None else os.path.join(base, f"unit={unit}")

    def postings_path(self, unit: int | None = None) -> str:
        base = os.path.join(self.root, "postings")
        return base if unit is None else os.path.join(base, f"unit={unit}")

    @property
    def dictionary_path(self) -> str:
        return os.path.join(self.root, "dictionary")

    @property
    def metrics_path(self) -> str:
        return os.path.join(self.root, "metrics")

    # ---- manifest / versioning ----
    def init(self) -> None:
        os.makedirs(self.root, exist_ok=True)
        if not os.path.exists(self.manifest_path):
            _write_json_atomic(
                self.manifest_path,
                {
                    "format_version": FORMAT_VERSION,
                    "analyzer_version": ANALYZER_VERSION,
                    "doc_bucket_size": self.doc_bucket_size,
                    "term_buckets": self.term_buckets,
                    "snapshots": [],
                    "current_snapshot": None,
                },
            )
        else:
            self.check_versions()
            m = self.manifest()
            self.doc_bucket_size = m["doc_bucket_size"]
            self.term_buckets = m["term_buckets"]

    def manifest(self) -> dict:
        m = _read_json(self.manifest_path)
        if m is None:
            raise FileNotFoundError(f"no index manifest at {self.manifest_path}")
        return m

    def check_versions(self) -> None:
        """Reject version mismatches, like /root/reference/index_codec.go:56-58."""
        m = self.manifest()
        if m["format_version"] != FORMAT_VERSION:
            raise ValueError(
                f"index format version {m['format_version']} != engine {FORMAT_VERSION}"
            )
        if m["analyzer_version"] != ANALYZER_VERSION:
            raise ValueError(
                f"analyzer version {m['analyzer_version']} != engine {ANALYZER_VERSION}"
            )

    def commit_snapshot(
        self, operation: str, summary: dict, segments: list[str] | None = None
    ) -> int:
        """Append a snapshot; when ``segments`` is given, the manifest's
        covered-segments list is replaced in the SAME atomic write — readers
        observe either the old (snapshot, segments) pair or the new one,
        never a half-committed mix (compaction relies on this)."""
        with _CP_LOCK:
            m = self.manifest()
            sid = (m["current_snapshot"] or 0) + 1
            m["snapshots"].append(
                {
                    "snapshot_id": sid,
                    "parent_id": m["current_snapshot"],
                    "operation": operation,
                    "timestamp": time.time(),
                    "summary": summary,
                }
            )
            m["current_snapshot"] = sid
            if segments is not None:
                m["segments"] = sorted(segments)
            _write_json_atomic(self.manifest_path, m)
            return sid

    def covered_segments(self) -> list[str] | None:
        """Root-relative posting-segment dirs covered by the current
        snapshot, or None for legacy stores (→ directory discovery).  A
        compacted store lists segments explicitly so stale dirs left by a
        crashed cleanup are INVISIBLE to readers (no double-counting)."""
        return self.manifest().get("segments")

    def add_segment(self, rel_path: str) -> None:
        """Register a new posting segment dir (root-relative) with the
        covered-segments list.  No-op on legacy stores — discovery already
        sees every dir there."""
        with _CP_LOCK:
            m = self.manifest()
            segs = m.get("segments")
            if segs is None or rel_path in segs:
                return
            segs.append(rel_path)
            m["segments"] = sorted(segs)
            _write_json_atomic(self.manifest_path, m)

    # ---- checkpoints (resume ledger) ----
    def checkpoints(self) -> dict:
        return _read_json(self.checkpoints_path, {"units": {}, "docs_staged": False})

    def mark_docs_staged(self, n_docs: int, n_units: int) -> None:
        cp = self.checkpoints()
        cp["docs_staged"] = True
        cp["n_docs"] = n_docs
        cp["n_units"] = n_units
        _write_json_atomic(self.checkpoints_path, cp)

    def mark_unit_done(self, unit: int, info: dict) -> None:
        # units may complete from concurrent driver threads (indexer runs
        # unit jobs in a pool); serialize the read-modify-write
        with _CP_LOCK:
            cp = self.checkpoints()
            cp["units"][str(unit)] = {"status": "done", **info}
            _write_json_atomic(self.checkpoints_path, cp)

    def completed_units(self) -> set[int]:
        cp = self.checkpoints()
        return {int(u) for u, v in cp["units"].items() if v.get("status") == "done"}

    def mark_stream_batch(self, batch_id: int, n_docs: int, n_tokens: int = 0) -> None:
        """Commit one streaming micro-batch segment: records the batch in
        the ledger AND advances the stream doc_id offset atomically — the
        foreachBatch sink checks the ledger first, so a crash-replayed
        batch_id is a no-op (exactly-once segments over at-least-once
        delivery).  ``n_tokens`` feeds incremental avgdl maintenance."""
        with _CP_LOCK:
            # register the segment BEFORE the durable done-mark: a crash
            # between the two replays the batch (ledger not done) onto the
            # already-registered path — idempotent.  The reverse order
            # could leave a done-marked batch invisible forever while its
            # stats still fold into the dictionary.
            if n_docs > 0:
                self.add_segment(f"stream_postings/batch={batch_id}")
            cp = self.checkpoints()
            batches = cp.setdefault("stream_batches", {})
            batches[str(batch_id)] = {
                "status": "done",
                "n_docs": n_docs,
                "n_tokens": n_tokens,
                "ts": time.time(),
            }
            cp["stream_doc_offset"] = int(cp.get("stream_doc_offset", 0)) + n_docs
            _write_json_atomic(self.checkpoints_path, cp)

    def acked_stream_batches(self) -> list[int]:
        """Stream batches the index ACKNOWLEDGED (ledger status "done",
        n_docs > 0) — the only batches whose ``stream_docs/batch=*`` dirs a
        reader may scan.  Stream docs land on disk BEFORE their postings
        commit and before the ledger done-mark (_ingest_one_batch_locked
        writes stream_docs, then postings, then mark_stream_batch), so a
        flat directory scan during a live or crashed micro-batch would
        surface docs the index never served.  Every flat consumer of the
        stream_docs layout (IndexReader.doc_source, finalize_stream's full
        recompute) MUST filter through this one helper so the crash-window
        rule cannot drift between call sites."""
        cp = self.checkpoints()
        return sorted(
            int(b)
            for b, v in cp.get("stream_batches", {}).items()
            if v.get("status") == "done" and v.get("n_docs", 0) > 0
        )

    def unfolded_stream_batches(self) -> list[int]:
        """Stream batches whose term stats are NOT yet folded into the
        dictionary (incremental finalize bookkeeping)."""
        cp = self.checkpoints()
        folded = set(cp.get("dict_folded_batches", []))
        return sorted(
            int(b)
            for b, v in cp.get("stream_batches", {}).items()
            if v.get("n_docs", 0) > 0 and int(b) not in folded
        )

    def mark_batches_folded(self, batch_ids: list[int]) -> None:
        with _CP_LOCK:
            cp = self.checkpoints()
            folded = set(cp.get("dict_folded_batches", []))
            folded.update(int(b) for b in batch_ids)
            cp["dict_folded_batches"] = sorted(folded)
            _write_json_atomic(self.checkpoints_path, cp)

    # ---- postings (snapshot-aware) ----
    def load_postings_df(self, spark):
        """One logical postings DataFrame over the store.

        Snapshot-aware: if the manifest carries a covered-``segments`` list
        (written by compaction, appended to by stream commits), read EXACTLY
        those directories — a crashed post-compaction cleanup can leave old
        segment dirs on disk, and blindly unioning them would double-count
        every streamed posting.  Legacy stores (no list) fall back to
        directory discovery over ``postings/`` + ``stream_postings/``.
        """
        segs = self.covered_segments()
        parts = []
        if segs is None:
            if os.path.exists(self.postings_path()):
                parts.append(
                    spark.read.option("basePath", self.postings_path())
                    .parquet(self.postings_path())
                    .drop("unit")
                )
            stream_root = os.path.join(self.root, "stream_postings")
            if os.path.exists(stream_root):
                parts.append(
                    spark.read.option("basePath", stream_root).parquet(stream_root).drop("batch")
                )
        else:
            for rel in segs:
                p = os.path.join(self.root, rel)
                if not os.path.exists(p):
                    raise FileNotFoundError(
                        f"manifest lists segment {rel!r} but {p} is missing"
                    )
                # basePath = the segment dir itself → only term_bucket is
                # discovered as a partition column (uniform schema across
                # batch units, stream batches and compacted layouts)
                parts.append(spark.read.option("basePath", p).parquet(p))
        if not parts:
            raise FileNotFoundError(f"no postings under {self.root}")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # ---- tombstones (logical deletes) ----
    def tombstones_path(self) -> str:
        return os.path.join(self.root, "tombstones")

    def delete_docs(self, doc_ids) -> int:
        """Logically delete ``doc_ids``: append a tombstone file and commit
        a ``delete`` snapshot.  Readers exclude tombstoned docs from every
        result at their next ``refresh()``; scores keep the PHYSICAL
        index's stats (N, avgdl, df) until a compaction purges the
        postings — the classic logical-delete contract.  Append-only and
        atomic (tmp + rename), so a crashed delete is invisible.

        Driver-sized by design: regulatory/holdout delete sets are
        thousands-to-millions of ids (a few MB of JSON).  A corpus-scale
        delete (>10^8 ids) should instead rebuild without the rows — at
        that volume it is a new corpus, not a delete."""
        ids = sorted({int(d) for d in doc_ids})
        if not ids:
            return self.manifest()["current_snapshot"] or 0
        with _CP_LOCK:
            os.makedirs(self.tombstones_path(), exist_ok=True)
            sid_next = (self.manifest()["current_snapshot"] or 0) + 1
            path = os.path.join(self.tombstones_path(), f"delete-{sid_next}.json")
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"doc_ids": ids}, f)
            os.replace(tmp, path)
            return self.commit_snapshot("delete", {"n_docs": len(ids)})

    def tombstones(self) -> frozenset:
        """Union of all tombstoned doc_ids (empty when none)."""
        root = self.tombstones_path()
        if not os.path.exists(root):
            return frozenset()
        out: set[int] = set()
        for name in sorted(os.listdir(root)):
            if name.endswith(".json"):
                data = _read_json(os.path.join(root, name), {})
                out.update(int(d) for d in data.get("doc_ids", []))
        return frozenset(out)

    def clear_tombstones(self) -> None:
        """Remove all tombstone files — only after a purge has physically
        removed the postings (compaction)."""
        import shutil

        shutil.rmtree(self.tombstones_path(), ignore_errors=True)

    # ---- purged ledger (physical deletes already applied to stats) ----
    def purged_path(self) -> str:
        return os.path.join(self.root, "purged")

    def purged_ids(self) -> frozenset:
        """doc_ids whose stats decrement has already been RECORDED by a
        past compaction — the idempotency ledger for the purge path: a
        tombstone id in this set must never subtract from N/total_tokens
        again (re-delivered tombstone files, delete_docs re-called with
        already-purged ids, crash-rerun compactions)."""
        root = self.purged_path()
        if not os.path.exists(root):
            return frozenset()
        out: set[int] = set()
        for name in sorted(os.listdir(root)):
            if name.endswith(".json"):
                data = _read_json(os.path.join(root, name), {})
                out.update(int(d) for d in data.get("doc_ids", []))
        return frozenset(out)

    def record_purged(self, doc_ids, stats: dict, seq: int) -> None:
        """Atomically record a purge: the consumed ids AND the post-purge
        stats they imply, tagged ``seq`` (the purge's snapshot id).  ONE
        rename makes both durable together, so every crash point is
        recoverable: ledger absent → nothing was subtracted, recompute;
        ledger present but stats file stale → reconcile_purged_stats
        re-applies the recorded stats (idempotent)."""
        os.makedirs(self.purged_path(), exist_ok=True)
        _write_json_atomic(
            os.path.join(self.purged_path(), f"purge-{seq}.json"),
            {"doc_ids": sorted(int(d) for d in doc_ids), "stats": stats, "seq": seq},
        )

    def reconcile_purged_stats(self) -> bool:
        """Crash repair: if the latest purge ledger entry is newer than the
        stats file's ``purge_seq`` (compaction died between record_purged
        and write_stats), re-apply the recorded stats.  Returns True when
        a repair was written.  Safe to call any time — later stream folds
        rebuild stats from the ledger-repaired values and carry purge_seq
        forward."""
        root = self.purged_path()
        if not os.path.exists(root):
            return False
        latest: dict | None = None
        for name in sorted(os.listdir(root)):
            if name.endswith(".json"):
                data = _read_json(os.path.join(root, name), {})
                if latest is None or int(data.get("seq", 0)) > int(latest.get("seq", 0)):
                    latest = data
        if not latest or "stats" not in latest:
            return False
        cur = _read_json(self.stats_path) or {}
        if int(cur.get("purge_seq", 0)) >= int(latest.get("seq", 0)):
            return False
        self.write_stats(latest["stats"])
        return True

    # ---- stats ----
    def write_stats(self, stats: dict) -> None:
        _write_json_atomic(self.stats_path, stats)

    def stats(self) -> dict:
        s = _read_json(self.stats_path)
        if s is None:
            raise FileNotFoundError(f"no stats at {self.stats_path}")
        return s

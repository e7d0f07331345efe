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

#: serializes checkpoint-ledger writes across concurrent unit-builder threads
_CP_LOCK = threading.Lock()

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

    def commit_snapshot(self, operation: str, summary: dict) -> int:
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
        _write_json_atomic(self.manifest_path, m)
        return sid

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

    def mark_stream_batch(self, batch_id: int, n_docs: int) -> None:
        """Commit one streaming micro-batch segment: records the batch in
        the ledger AND advances the stream doc_id offset atomically — the
        foreachBatch sink checks the ledger first, so a crash-replayed
        batch_id is a no-op (exactly-once segments over at-least-once
        delivery)."""
        with _CP_LOCK:
            cp = self.checkpoints()
            batches = cp.setdefault("stream_batches", {})
            batches[str(batch_id)] = {"status": "done", "n_docs": n_docs, "ts": time.time()}
            cp["stream_doc_offset"] = int(cp.get("stream_doc_offset", 0)) + n_docs
            _write_json_atomic(self.checkpoints_path, cp)

    # ---- stats ----
    def write_stats(self, stats: dict) -> None:
        _write_json_atomic(self.stats_path, stats)

    def stats(self) -> dict:
        s = _read_json(self.stats_path)
        if s is None:
            raise FileNotFoundError(f"no stats at {self.stats_path}")
        return s

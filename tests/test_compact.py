"""Compaction: batch units + streaming segments merge into one layout with
IDENTICAL query results, fewer blocks, and a snapshot commit."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from search_spark.corpus import generate_pandas
from search_spark.operators.compact import compact_index
from search_spark.operators.indexer import build_index
from search_spark.operators.wand import IndexReader
from search_spark.sources.index_store import IndexStore
from search_spark.streaming.ingest import finalize_stream, start_ingest

QUERIES = [("a", "the fast"), ("b", "needle1 needle2"), ("c", "w0003 w0050 the")]


@pytest.fixture(scope="module")
def hybrid_store(spark, tmp_path_factory):
    """Batch build over 40 convs + streamed ingest of 20 more convs."""
    root = tmp_path_factory.mktemp("compact")
    pdf = generate_pandas(60)
    batch_part = pdf[pdf["conv_id"] < "conv-000040"]
    stream_part = pdf[pdf["conv_id"] >= "conv-000040"]

    store = IndexStore(str(root / "idx"), doc_bucket_size=256, term_buckets=4)
    build_index(spark, spark.createDataFrame(batch_part), store, n_units=2)

    src = root / "src"
    src.mkdir()
    spark.createDataFrame(stream_part).coalesce(1).write.parquet(str(src / "p1"))
    q = start_ingest(
        spark, f"{src}/p1", store, checkpoint_dir=str(root / "cp"), available_now=True
    )
    q.awaitTermination(300)
    finalize_stream(spark, store)
    # stream source/checkpoint handles for the post-compaction ingest test
    store._test_src = str(src / "p1")
    store._test_cp = str(root / "cp")
    return store


def _results(spark, store):
    reader = IndexReader(spark, store)
    rows = reader.batch_search(QUERIES, 10).collect()
    return [(r["query_id"], r["rank"], r["doc_id"], round(r["score"] * 1e6)) for r in rows]


def test_compaction_preserves_results_and_shrinks(spark, hybrid_store):
    store = hybrid_store
    before = _results(spark, store)
    assert len(before) > 0
    posts_before = IndexReader(spark, store)._posts_df
    blocks_before = posts_before.count()
    small_before = posts_before.filter(F.col("n_docs") < 256 // 2).count()

    info = compact_index(spark, store)
    assert info["blocks"] <= blocks_before
    after = _results(spark, store)
    assert after == before  # bit-identical answers on the compacted layout

    # stream + batch posting dirs are gone; one compacted layout remains
    # OUTSIDE the discovery tree, reachable only via the covered list
    assert not os.path.exists(os.path.join(store.root, "stream_postings"))
    assert not os.path.exists(store.postings_path())
    units = os.listdir(os.path.join(store.root, "compacted"))
    assert len(units) == 1 and units[0].startswith("unit")
    assert store.covered_segments() == [os.path.join("compacted", units[0])]

    # snapshot lineage recorded
    ops = [s["operation"] for s in store.manifest()["snapshots"]]
    assert ops[-1] == "compact"


def test_stale_segments_invisible_after_compaction(spark, hybrid_store, tmp_path):
    """Crash-between-commit-and-cleanup simulation: a leftover stream
    segment dir (which compaction already folded in) must NOT be unioned
    back by readers — that double-counted every streamed posting before the
    snapshot-aware loader."""
    import shutil

    store = hybrid_store
    before = _results(spark, store)
    units = os.listdir(os.path.join(store.root, "compacted"))
    assert len(units) == 1  # compacted by the earlier test

    # resurrect a fake stale stream segment (copy of the live layout — the
    # worst case: every posting duplicated if the reader unioned it)
    stale = os.path.join(store.root, "stream_postings", "batch=999")
    shutil.copytree(os.path.join(store.root, "compacted", units[0]), stale)

    after = _results(spark, store)
    assert after == before  # stale dir ignored — no double counting
    shutil.rmtree(os.path.join(store.root, "stream_postings"))




def test_compaction_postings_conserved(spark, hybrid_store):
    """Total postings must be exactly conserved by the merge."""
    store = hybrid_store
    posts = IndexReader(spark, store)._posts_df
    total = posts.agg(F.sum("n_docs")).collect()[0][0]
    m = store.manifest()
    last = [s for s in m["snapshots"] if s["operation"] == "compact"][-1]
    assert last["summary"]["postings"] == total


def test_post_compaction_stream_visible_after_refresh(spark, hybrid_store, tmp_path):
    """New stream batches committed AFTER compaction register with the
    covered-segments list; an open reader sees them after refresh()."""
    from search_spark.corpus import generate_pandas as gen

    store = hybrid_store
    reader = IndexReader(spark, store)
    n_before = reader._posts_df.agg(F.sum("n_docs")).collect()[0][0]

    # append new files to the SAME source + checkpoint (batch ids continue
    # past the committed ones — a fresh checkpoint would replay batch 0 and
    # be correctly skipped by the exactly-once ledger)
    extra = gen(70)
    extra = extra[extra["conv_id"] >= "conv-000060"]
    spark.createDataFrame(extra).coalesce(1).write.mode("append").parquet(store._test_src)
    q = start_ingest(
        spark, store._test_src, store, checkpoint_dir=store._test_cp, available_now=True
    )
    q.awaitTermination(300)
    finalize_stream(spark, store)

    # snapshot-at-open: invisible before refresh, visible after
    assert reader._posts_df.agg(F.sum("n_docs")).collect()[0][0] == n_before
    n_after = reader.refresh()._posts_df.agg(F.sum("n_docs")).collect()[0][0]
    assert n_after > n_before


def test_compact_folds_pending_stream_stats(spark, tmp_path):
    """Compaction absorbs stream segments into the new layout and deletes
    the per-batch dirs — any term-stat deltas not yet folded into the
    dictionary MUST be folded first, or they'd be unrecoverable
    (regression: incremental finalize crashed on the deleted dirs and the
    dictionary permanently missed those batches)."""
    from pyspark.sql import functions as F

    from search_spark.corpus import generate_pandas as gen

    src = tmp_path / "src"
    src.mkdir()
    store = IndexStore(str(tmp_path / "idx"), doc_bucket_size=256, term_buckets=4)
    pdf = gen(30)
    a = pdf[pdf["conv_id"] < "conv-000015"]
    b = pdf[pdf["conv_id"] >= "conv-000015"]

    spark.createDataFrame(a).coalesce(1).write.mode("append").parquet(str(src))
    q = start_ingest(spark, str(src), store, checkpoint_dir=str(tmp_path / "cp"), available_now=True)
    q.awaitTermination(300)
    finalize_stream(spark, store)  # folds batch 0

    spark.createDataFrame(b).coalesce(1).write.mode("append").parquet(str(src))
    q = start_ingest(spark, str(src), store, checkpoint_dir=str(tmp_path / "cp"), available_now=True)
    q.awaitTermination(300)
    assert store.unfolded_stream_batches()  # batch 1 pending, NOT finalized

    info = compact_index(spark, store)  # must fold before deleting segments
    assert store.unfolded_stream_batches() == []
    # dictionary df total equals postings in the compacted layout
    total_df = (
        spark.read.parquet(store.dictionary_path).agg(F.sum("df")).collect()[0][0]
    )
    assert total_df == info["postings"]
    # subsequent incremental finalize is a safe no-op
    out = finalize_stream(spark, store)
    assert out["incremental"] is True
    # and the streamed second half is searchable with correct idf/N
    res = IndexReader(spark, store).batch_search([("q", "the")], 10).collect()
    assert len(res) == 10


def test_crashed_compaction_recovers(spark, tmp_path, monkeypatch):
    """Crash at the two worst points of the commit protocol, then re-run:
    (a) after the merge write but before install, (b) after install but
    before the snapshot commit.  In both cases readers keep serving the
    OLD view untouched, and a clean re-run converges."""
    from search_spark.corpus import generate_pandas as gen
    from search_spark.operators import compact as cp_mod

    store = IndexStore(str(tmp_path / "idx"), doc_bucket_size=256, term_buckets=4)
    build_index(spark, spark.createDataFrame(gen(25)), store, n_units=2)
    before = _results(spark, store)

    # (a) crash before install: commit_snapshot never reached because the
    # count collect raises (simulates executor failure mid-merge-read)
    class Boom(RuntimeError):
        pass

    real_commit = IndexStore.commit_snapshot

    def crash_commit(self, *a, **k):
        raise Boom("crash before commit")

    monkeypatch.setattr(IndexStore, "commit_snapshot", crash_commit)
    with pytest.raises(Boom):
        compact_index(spark, store)
    monkeypatch.setattr(IndexStore, "commit_snapshot", real_commit)

    # old view intact (manifest unchanged → discovery/covered unchanged)
    assert _results(spark, store) == before
    # crashed attempt left an installed-but-uncovered dir; re-run succeeds
    info = compact_index(spark, store)
    assert info["postings"] > 0
    assert _results(spark, store) == before
    units = os.listdir(os.path.join(store.root, "compacted"))
    assert len(units) == 1 and units[0].startswith("unit")


def test_reopened_store_adopts_manifest_geometry(spark, tmp_path):
    """Regression (round 4, caught live on a 1.4M-doc store): reopening a
    non-default-geometry store BARE — ``IndexStore(root)`` — used to keep
    the dataclass defaults (term_buckets=8, doc_bucket_size=4096).  A
    compaction through such a handle rewrote ``term_bucket`` mod the
    DEFAULT while the dictionary still carried mod-manifest buckets, so
    every bucket-pruned read scanned the wrong partition and silently
    returned 0 rows.  The manifest's geometry must win on reopen."""
    from search_spark.corpus import transcripts_from_documents

    root = str(tmp_path / "geom_idx")
    built = IndexStore(root, doc_bucket_size=128, term_buckets=16)
    build_index(
        spark, transcripts_from_documents(spark, "/root/testdata/sf0.001"),
        built, n_units=2,
    )
    want = _results(spark, built)
    assert want  # non-empty before

    reopened = IndexStore(root)  # bare reopen — the hazardous handle
    assert reopened.term_buckets == 16
    assert reopened.doc_bucket_size == 128

    compact_index(spark, reopened)
    fresh = IndexStore(root)  # fresh reader over the compacted layout
    assert _results(spark, fresh) == want

    # postings partition values must still span the manifest bucket count
    import duckdb

    buckets = duckdb.sql(
        f"SELECT count(DISTINCT term_bucket) FROM "
        f"read_parquet('{root}/compacted/*/*/*.parquet', hive_partitioning=1)"
    ).fetchone()[0]
    assert buckets > 8  # 16-bucket layout, not the default-8 rewrite

"""Resumable build (north_rule): interrupt mid-build, resume, and the final
index must be content-identical to an uninterrupted build (FIXTURES.md §5)."""

from __future__ import annotations

import pandas as pd
import pytest

from search_spark import corpus
from search_spark.operators.indexer import build_index
from search_spark.operators.wand import IndexReader
from search_spark.sources.index_store import IndexStore

N_CONVS = 40


def _content_hash(spark, store: IndexStore) -> int:
    """Order-insensitive content hash of the postings + dictionary tables."""
    from pyspark.sql import functions as F

    posts = spark.read.option("basePath", store.postings_path()).parquet(store.postings_path())
    h1 = (
        posts.select(
            F.xxhash64("term", "doc_bucket", "first_doc", "last_doc", "n_docs",
                       "doc_ids_delta", "tfs", "dls", "block_max_tf", "cf_block").alias("h")
        )
        .agg(F.expr("bit_xor(h)").alias("x"))
        .collect()[0]["x"]
    )
    d = spark.read.parquet(store.dictionary_path)
    h2 = (
        d.select(F.xxhash64("term", "df", "cf", "max_tf").alias("h"))
        .agg(F.expr("bit_xor(h)").alias("x"))
        .collect()[0]["x"]
    )
    return hash((h1, h2))


def test_resume_equals_clean_build(spark, tmp_path):
    tr = corpus.generate_spark(spark, N_CONVS, partitions=4)

    clean = IndexStore(str(tmp_path / "clean"), doc_bucket_size=64, term_buckets=4)
    build_index(spark, tr, clean, n_units=4)

    broken = IndexStore(str(tmp_path / "broken"), doc_bucket_size=64, term_buckets=4)
    with pytest.raises(RuntimeError, match="simulated failure"):
        build_index(spark, tr, broken, n_units=4, fail_after_units=2)

    cp = broken.checkpoints()
    assert cp["docs_staged"] and len(broken.completed_units()) == 2

    # resume: only the 2 missing units build; docs staging is skipped
    build_index(spark, tr, broken, n_units=4)
    assert len(broken.completed_units()) == 4

    assert _content_hash(spark, broken) == _content_hash(spark, clean)

    # and the resumed index answers queries identically
    r1 = IndexReader(spark, clean).batch_search([("q", "the fast w0100")], 10).collect()
    r2 = IndexReader(spark, broken).batch_search([("q", "the fast w0100")], 10).collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))


def test_version_mismatch_rejected(spark, tmp_path):
    """Analogue of /root/reference/index_codec.go:56-58: reject foreign versions."""
    import json

    tr = corpus.generate_spark(spark, 5, partitions=2)
    st = IndexStore(str(tmp_path / "v"), doc_bucket_size=64, term_buckets=2)
    build_index(spark, tr, st, n_units=1)

    m = json.load(open(st.manifest_path))
    m["format_version"] = 99
    json.dump(m, open(st.manifest_path, "w"))
    with pytest.raises(ValueError, match="format version"):
        IndexReader(spark, st)


def test_lineage_recorded(spark, tmp_path):
    tr = corpus.generate_spark(spark, 5, partitions=2)
    st = IndexStore(str(tmp_path / "lin"), doc_bucket_size=16, term_buckets=2)
    build_index(spark, tr, st, n_units=2)
    m = st.manifest()
    ops = [s["operation"] for s in m["snapshots"]]
    assert ops == ["stage_docs", "finalize"]
    assert m["snapshots"][1]["parent_id"] == m["snapshots"][0]["snapshot_id"]
    metrics = spark.read.parquet(st.metrics_path).collect()
    assert {r["partition_id"] for r in metrics} == {0, 1}
    for r in metrics:
        assert r["terms"] > 0 and r["postings"] > 0 and r["bytes"] > 0
        assert r["skew_factor"] >= 1.0
        assert "snapshot_parent=" in r["lineage"]

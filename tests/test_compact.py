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

    # stream segment dirs are gone; single compacted unit remains
    assert not os.path.exists(os.path.join(store.root, "stream_postings"))
    units = os.listdir(store.postings_path())
    assert units == ["unit=compacted"]

    # snapshot lineage recorded
    ops = [s["operation"] for s in store.manifest()["snapshots"]]
    assert ops[-1] == "compact"


def test_compaction_postings_conserved(spark, hybrid_store):
    """Total postings must be exactly conserved by the merge."""
    store = hybrid_store
    posts = IndexReader(spark, store)._posts_df
    total = posts.agg(F.sum("n_docs")).collect()[0][0]
    m = store.manifest()
    last = [s for s in m["snapshots"] if s["operation"] == "compact"][-1]
    assert last["summary"]["postings"] == total

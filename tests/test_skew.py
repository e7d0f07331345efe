"""Skew-stress (VERDICT r3 #5): the salted (term × doc-range) shuffle claim
validated under DELIBERATE skew, not the near-uniform fixture corpus.

The skewed generator (corpus.generate_skewed_spark) plants the two
pathologies a real 100 TB transcript table exhibits:

- one mega-conversation holding ~10% of all turns, its texts near-identical
  (one giant near-dup cluster);
- one hot term (``skewterm``) present in ~50% of all turns (a posting list
  covering half the corpus — the exact shape that caps the reference at
  <100k entries, /root/reference/README.md:30).

Assertions pin the MECHANISM, not just the outcome: every (term, doc_bucket)
reducer group — including the hot term's and the mega-conv's — stays
bounded at doc_bucket_size, the hot postings spread across the expected
bucket count, queries remain rank-identical to the numpy oracle, and the
two-phase connected-components clustering converges on the giant component.
Wall-time ratios at bench scale live in SKEW.json (bench.py --skew).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from search_spark import corpus
from search_spark.corpus import (
    SKEW_HOT_TERM,
    SKEW_MEGA_CONV,
    conv_name,
    generate_skewed_pandas,
    generate_skewed_spark,
    skew_mega_turns,
)
from search_spark.operators.indexer import build_index
from search_spark.operators.wand import IndexReader
from search_spark.oracle import OracleIndex
from search_spark.sources.index_store import IndexStore

N_CONVS = 150
BUCKET = 128


def _sorted_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def skew_pdf():
    return _sorted_pdf(generate_skewed_pandas(N_CONVS))


@pytest.fixture(scope="module")
def skew_store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("skew") / "idx")
    store = IndexStore(root, doc_bucket_size=BUCKET, term_buckets=4)
    tr = generate_skewed_spark(spark, N_CONVS, partitions=8)
    build_index(spark, tr, store, n_units=2)
    return store


@pytest.fixture(scope="module")
def skew_oracle(skew_pdf):
    df = skew_pdf.copy()
    df["doc_id"] = range(len(df))
    return OracleIndex.build(df)


def test_generator_partition_invariance(spark, skew_pdf):
    """Same corpus at 1 task and 16 tasks, and same as the pandas twin —
    required for the N-vs-4N scaling runs to compare identical inputs."""
    a = _sorted_pdf(generate_skewed_spark(spark, N_CONVS, partitions=1).toPandas())
    b = _sorted_pdf(generate_skewed_spark(spark, N_CONVS, partitions=16).toPandas())
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, skew_pdf)


def test_skew_shape_is_as_designed(skew_pdf):
    mega = skew_pdf[skew_pdf["conv_id"] == conv_name(SKEW_MEGA_CONV)]
    frac = len(mega) / len(skew_pdf)
    assert 0.08 <= frac <= 0.12, f"mega-conv holds {frac:.1%}, want ~10%"
    assert len(mega) == skew_mega_turns(N_CONVS)
    hot = skew_pdf["text"].str.contains(SKEW_HOT_TERM).mean()
    assert 0.45 <= hot <= 0.55, f"hot term in {hot:.1%} of turns, want ~50%"


def test_reducer_groups_bounded_under_skew(spark, skew_store, skew_pdf):
    """THE salting claim: no (term, doc_bucket) encode group — the unit of
    reducer work — exceeds doc_bucket_size postings, even for a term in
    50% of all docs; and the hot postings actually SPREAD across buckets
    instead of landing on one reducer."""
    posts = skew_store.load_postings_df(spark)
    grp = posts.groupBy("term", "doc_bucket").agg(F.sum("n_docs").alias("n"))
    worst = grp.agg(F.max("n")).first()[0]
    assert worst <= BUCKET, f"a reducer group holds {worst} > bucket {BUCKET}"

    n_docs = len(skew_pdf)
    n_hot = int(skew_pdf["text"].str.contains(SKEW_HOT_TERM).sum())
    hot_buckets = grp.filter(F.col("term") == SKEW_HOT_TERM).count()
    # hot term must occupy at least its proportional share of buckets
    assert hot_buckets >= max(2, n_hot // BUCKET), (
        f"hot term in only {hot_buckets} buckets for {n_hot} postings"
    )
    total_buckets = (n_docs + BUCKET - 1) // BUCKET
    assert hot_buckets <= total_buckets


def test_mega_conv_spans_doc_buckets(spark, skew_store):
    """Conv skew: docIDs are (conv_id, turn_idx)-ordered, so a 10%-of-corpus
    conversation maps to a contiguous doc range spanning many buckets —
    never one reducer's problem."""
    docs = spark.read.parquet(skew_store.docs_path()).select("conv_id", "doc_bucket")
    mega_buckets = (
        docs.filter(F.col("conv_id") == conv_name(SKEW_MEGA_CONV))
        .select("doc_bucket")
        .distinct()
        .count()
    )
    assert mega_buckets >= skew_mega_turns(N_CONVS) // BUCKET


@pytest.mark.parametrize(
    "query",
    [
        SKEW_HOT_TERM,  # the 50%-df term alone
        f"{SKEW_HOT_TERM} w0003",  # hot + mid
        "the merge window",  # mega-conv head phrase terms
        f"u000007 {SKEW_HOT_TERM}",  # needle inside the mega-conv + hot
    ],
)
def test_rank_identity_under_skew(spark, skew_store, skew_oracle, query):
    reader = IndexReader(spark, skew_store)
    got = [
        (r["doc_id"], round(r["score"], 6))
        for r in reader.batch_search([("q", query)], 10).collect()
    ]
    want = [(d, round(s, 6)) for d, s in skew_oracle.search(query, 10)]
    assert got == want


def test_giant_cluster_converges(spark, skew_pdf):
    """The mega-conv's near-identical turns form one giant near-dup
    component; the two-phase large-star/small-star CC must converge within
    its O(log n) iteration cap and elect exactly one keeper for it."""
    from search_spark.operators.cluster import dup_clusters, keeper_assignment
    from search_spark.operators.dedup import minhash_lsh_pairs

    df = skew_pdf.copy()
    df["doc_id"] = range(len(df))
    docs = spark.createDataFrame(df[["doc_id", "text"]])
    pairs = minhash_lsh_pairs(docs)
    clusters = dup_clusters(pairs)
    sizes = clusters.groupBy("cluster_id").count()
    giant = sizes.agg(F.max("count")).first()[0]
    mega_n = skew_mega_turns(N_CONVS)
    # every mega turn shares 14 of ~16 tokens with every other — the giant
    # component must cover (nearly) all of them
    assert giant >= int(mega_n * 0.9), f"giant cluster {giant} < 90% of {mega_n}"
    keep = keeper_assignment(docs, pairs)
    n_keep = keep.filter(~F.col("is_dup")).count()
    # keeper election collapses the giant cluster to ~1 survivor
    assert n_keep <= len(df) - int(mega_n * 0.9) + 1

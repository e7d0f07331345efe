"""M1 slice rank identity: DF-native BM25 vs numpy oracle.

The analogue of the reference's kernel-vs-scalar equivalence tests
(/root/reference/internal/cosine/simd/simd_test.go:52-74): identical top-k
docIDs, scores within 1e-6.
"""

from __future__ import annotations

import pandas as pd
import pytest

from search_spark import corpus
from search_spark.operators.build import build_df_index, search_text_df
from search_spark.oracle import OracleIndex

N_CONVS = 60

QUERIES = [
    "the fast",                    # head terms (skew stress)
    "w0003 w0010 w0055",           # mid-frequency conjunction
    "needle0",                     # planted needle
    "needle1 the",                 # needle + head
    "zzzqqq oovtoken",             # out of vocabulary → empty
    "w1000 w2000 w3000 w0500 a",   # long tail mix
]


@pytest.fixture(scope="module")
def dfindex(spark):
    sdf = corpus.generate_spark(spark, N_CONVS, partitions=4)
    idx = build_df_index(sdf)
    idx.postings.persist()
    idx.doclens.persist()
    idx.dictionary.persist()
    return idx


@pytest.fixture(scope="module")
def oracle():
    df = corpus.generate_pandas(N_CONVS).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    df["doc_id"] = range(len(df))
    return OracleIndex.build(df)


def test_global_stats_match(dfindex, oracle):
    assert dfindex.n_docs == oracle.n_docs
    assert dfindex.avgdl == pytest.approx(oracle.avgdl, abs=1e-9)
    vocab = dfindex.dictionary.count()
    assert vocab == len(oracle.postings)


@pytest.mark.parametrize("query", QUERIES)
@pytest.mark.parametrize("k", [5, 10])
def test_rank_identity(dfindex, oracle, query, k):
    got = (
        search_text_df(dfindex, query, k)
        .toPandas()
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
    )
    want = oracle.search(query, k)
    assert got["doc_id"].tolist() == [d for d, _ in want]
    for g, (_, s) in zip(got["score"].tolist(), want):
        assert g == pytest.approx(s, abs=1e-6)


def test_k_zero_guard(dfindex):
    assert search_text_df(dfindex, "the", 0).count() == 0


def test_self_search_rank1(spark, dfindex, oracle):
    """Reference self-search invariant (/root/reference/index_test.go:35-41)
    through the Spark engine: query = an indexed turn's own text."""
    docs = dfindex.docs.select("doc_id", "text").orderBy("doc_id").limit(200).collect()
    for row in docs[:: len(docs) // 8]:
        got = search_text_df(dfindex, row["text"], 5).collect()
        assert got
        top = [r["doc_id"] for r in got if r["score"] == got[0]["score"]]
        assert row["doc_id"] in top

"""Stable docID assignment: dense 0..N-1 global rank, partition-invariant."""

from __future__ import annotations

import pytest

from search_spark import corpus
from search_spark.operators.docids import assign_doc_ids


@pytest.mark.parametrize("parts", [1, 3, 7])
def test_doc_ids_match_global_sort(spark, tiny_corpus_pd, parts):
    sdf = corpus.generate_spark(spark, 20, partitions=4)
    got = (
        assign_doc_ids(sdf, num_partitions=parts)
        .select("conv_id", "turn_idx", "doc_id")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = tiny_corpus_pd.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert got["doc_id"].tolist() == list(range(len(want)))
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert got["turn_idx"].tolist() == want["turn_idx"].tolist()


def test_text_equality_invariant(spark, tiny_corpus_pd):
    """input_hint invariant: rehydrated text for any doc_id equals the
    source turn's text under stable (conv_id, turn_idx) ordering."""
    sdf = corpus.generate_spark(spark, 20, partitions=4)
    got = (
        assign_doc_ids(sdf)
        .select("doc_id", "conv_id", "turn_idx", "text")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = tiny_corpus_pd.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert got["text"].tolist() == want["text"].tolist()

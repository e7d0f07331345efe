"""Corpus fixture invariants (FIXTURES.md §1)."""

from __future__ import annotations

import pandas as pd

from search_spark import corpus


def test_determinism_and_uniqueness(tiny_corpus_pd):
    again = corpus.generate_pandas(20)
    pd.testing.assert_frame_equal(tiny_corpus_pd, again)
    assert not tiny_corpus_pd.duplicated(["conv_id", "turn_idx"]).any()
    assert tiny_corpus_pd["turn_idx"].dtype == "int32"


def test_needles_planted(tiny_corpus_pd):
    conv, turn = corpus.needle_position(0)
    row = tiny_corpus_pd[
        (tiny_corpus_pd.conv_id == corpus.conv_name(conv)) & (tiny_corpus_pd.turn_idx == turn)
    ]
    assert len(row) == 1
    assert "needle0" in row.iloc[0].text.split()
    # needle tokens appear nowhere else
    hits = tiny_corpus_pd[tiny_corpus_pd.text.str.contains(r"\bneedle0\b")]
    assert len(hits) == 1


def test_spark_matches_pandas(spark, tiny_corpus_pd):
    sdf = corpus.generate_spark(spark, 20, partitions=4)
    got = (
        sdf.toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = tiny_corpus_pd.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_ts_monotone(tiny_corpus_pd):
    s = tiny_corpus_pd.sort_values(["conv_id", "turn_idx"])["ts"]
    assert s.is_monotonic_increasing

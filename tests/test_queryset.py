"""Query-set TSV loader (SURVEY.md §2.3 #23 — the reference's loadSICK
analogue, /root/reference/internal/eval/main.go:85-121)."""

from __future__ import annotations

import pytest

from search_spark.sources.queryset import load_queryset, load_queryset_py

FIXTURE = "/root/repo/fixtures/queries.tsv"


def test_loader_spark_py_agree(spark):
    assert load_queryset(spark, FIXTURE) == load_queryset_py(FIXTURE)


def test_loader_contents():
    qs = dict(load_queryset_py(FIXTURE))
    assert len(qs) == 16
    assert qs["q_head"] == "the fast scan"
    assert qs["q_one1"] == "spark"


def test_loader_rejects_empty(tmp_path):
    p = tmp_path / "empty.tsv"
    p.write_text("query_id\ttext\n")
    with pytest.raises(ValueError):
        load_queryset_py(str(p))

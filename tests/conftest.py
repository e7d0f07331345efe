from __future__ import annotations

import os
import sys

import pytest

os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("search-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_corpus_pd():
    """FIXTURES.md `tiny` scale: 20 convs / ~140 turns."""
    from search_spark.corpus import generate_pandas

    return generate_pandas(20)


@pytest.fixture(scope="session")
def small_corpus_pd():
    """A mid-size corpus for rank-identity tests (~200 convs)."""
    from search_spark.corpus import generate_pandas

    return generate_pandas(200)

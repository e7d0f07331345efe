"""BM25 scoring expressions — one formula, three dialects.

The scoring function is the engine's contract with the oracle (the analogue
of the reference's dot-product kernel matching its scalar reference,
/root/reference/internal/cosine/simd/simd_test.go:52-62), so it exists in
exactly three places that are tested to agree:

- :func:`idf_col` / :func:`term_score_col` — Spark Columns (JVM, codegen)
- ``search_spark.oracle`` — plain Python floats
- :func:`sql_term_score` — ANSI-SQL fragment for the DuckDB oracle
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def idf_col(n_docs: Column, df: Column) -> Column:
    """ln((N - df + 0.5)/(df + 0.5) + 1) in float64."""
    return F.log((n_docs.cast("double") - df + 0.5) / (df.cast("double") + 0.5) + 1.0)


def term_score_col(tf: Column, dl: Column, avgdl: Column, idf: Column, k1: float = K1, b: float = B) -> Column:
    tf_d = tf.cast("double")
    return idf * tf_d * (k1 + 1.0) / (tf_d + k1 * (1.0 - b + b * dl.cast("double") / avgdl))


def sql_idf(n_docs: str, df: str) -> str:
    return f"ln(({n_docs} - {df} + 0.5) / ({df} + 0.5) + 1.0)"


def sql_term_score(tf: str, dl: str, avgdl: str, idf: str, k1: float = K1, b: float = B) -> str:
    return f"{idf} * {tf} * ({k1} + 1.0) / ({tf} + {k1} * (1.0 - {b} + {b} * {dl} / {avgdl}))"

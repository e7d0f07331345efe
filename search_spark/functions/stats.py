"""Evaluation-metric operators: Pearson r, Spearman ρ, MSE.

The reference ships these in its eval harness (pearson/mse at
/root/reference/internal/eval/main.go:207-246, spearman via rank+argsort at
:124-182) to grade search quality against human gold scores.  Here they are
first-class DataFrame operators, usable over any two numeric columns (the
engine's own grading harness uses them the same way the reference does).

Bit-stability across engines: naive ``corr()`` aggregates sum doubles in
nondeterministic order, so Spark and DuckDB differ in the last ulp and
micro-rounding can flip.  These implementations compute the FIVE integer
moments (n, Σx, Σy, Σxy, Σx², Σy²) exactly (inputs are cast to BIGINT;
sums of int64 are exact and order-free), then evaluate

    r   = (nΣxy − ΣxΣy) / sqrt((nΣx² − (Σx)²) · (nΣy² − (Σy)²))
    mse = (Σx² − 2Σxy + Σy²) / n

from identical integers — the float result is bit-identical on both sides.
Spearman ρ = Pearson r over dense ranks (integers again).  Overflow bound:
values must satisfy n·max(x²) < 2^63 (fine for counts/lengths at any n this
formula would be collected for).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _moments(df: DataFrame, x: str, y: str) -> DataFrame:
    xl = F.col(x).cast("bigint")
    yl = F.col(y).cast("bigint")
    return df.agg(
        F.count("*").alias("n"),
        F.sum(xl).alias("sx"),
        F.sum(yl).alias("sy"),
        F.sum(xl * yl).alias("sxy"),
        F.sum(xl * xl).alias("sxx"),
        F.sum(yl * yl).alias("syy"),
    )


def _pearson_from_moments(m: DataFrame) -> Column:
    n = F.col("n").cast("double")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return (num / den).alias("r")


def pearson(df: DataFrame, x: str, y: str) -> DataFrame:
    """(r_micro BIGINT): Pearson correlation of two integer columns."""
    m = _moments(df, x, y)
    return m.select(F.round(_pearson_from_moments(m) * 1e6).cast("bigint").alias("r_micro"))


def spearman(df: DataFrame, x: str, y: str) -> DataFrame:
    """(rho_micro BIGINT): Spearman ρ with STANDARD average-rank tie
    handling (matches ``pandas.corr(method='spearman')`` / scipy, and the
    reference's rank transform at /root/reference/internal/eval/
    main.go:124-161).

    Average ranks of a tie group are half-integers, which would break the
    integer-moment bit-stability trick — so both engines rank with the
    DOUBLED average rank ``2·avg_rank = 2·rank() + tie_count − 1`` (always
    an integer; Pearson is invariant under the affine x→2x, so ρ is
    unchanged).  The global-orderBy windows are the textbook one-partition
    collapse — fine here because eval metrics run over driver-scale
    samples, not the corpus (documented trade-off).
    """
    rx = (
        2 * F.rank().over(Window.orderBy(F.col(x).asc()))
        + F.count("*").over(Window.partitionBy(F.col(x)))
        - 1
    ).alias("_rx")
    ry = (
        2 * F.rank().over(Window.orderBy(F.col(y).asc()))
        + F.count("*").over(Window.partitionBy(F.col(y)))
        - 1
    ).alias("_ry")
    ranked = df.select(rx, ry)
    m = _moments(ranked, "_rx", "_ry")
    return m.select(F.round(_pearson_from_moments(m) * 1e6).cast("bigint").alias("rho_micro"))


def mse(df: DataFrame, x: str, y: str) -> DataFrame:
    """(mse_micro BIGINT): mean squared error between two integer columns."""
    m = _moments(df, x, y)
    val = (F.col("sxx") - 2 * F.col("sxy") + F.col("syy")).cast("double") / F.col("n").cast(
        "double"
    )
    return m.select(F.round(val * 1e6).cast("bigint").alias("mse_micro"))


# -- DuckDB oracle SQL fragments -------------------------------------------

def _moments_sql(rel: str, x: str, y: str) -> str:
    return f"""
  m AS (
    SELECT count(*) AS n,
           sum(CAST({x} AS BIGINT)) AS sx,
           sum(CAST({y} AS BIGINT)) AS sy,
           sum(CAST({x} AS BIGINT) * CAST({y} AS BIGINT)) AS sxy,
           sum(CAST({x} AS BIGINT) * CAST({x} AS BIGINT)) AS sxx,
           sum(CAST({y} AS BIGINT) * CAST({y} AS BIGINT)) AS syy
    FROM {rel})"""


_PEARSON_EXPR = (
    "(CAST(n AS DOUBLE) * sxy - sx * sy) / "
    "sqrt((CAST(n AS DOUBLE) * sxx - sx * sx) * (CAST(n AS DOUBLE) * syy - sy * sy))"
)


def pearson_sql(rel_sql: str, x: str, y: str) -> str:
    return f"""
WITH rel AS ({rel_sql}),{_moments_sql('rel', x, y)}
SELECT CAST(round(({_PEARSON_EXPR}) * 1e6) AS BIGINT) AS r_micro FROM m"""


def spearman_sql(rel_sql: str, x: str, y: str) -> str:
    """Doubled-average-rank Spearman — mirrors :func:`spearman` exactly."""
    return f"""
WITH rel AS ({rel_sql}),
  ranked AS (
    SELECT 2 * rank() OVER (ORDER BY {x} ASC) + count(*) OVER (PARTITION BY {x}) - 1 AS _rx,
           2 * rank() OVER (ORDER BY {y} ASC) + count(*) OVER (PARTITION BY {y}) - 1 AS _ry
    FROM rel),{_moments_sql('ranked', '_rx', '_ry')}
SELECT CAST(round(({_PEARSON_EXPR}) * 1e6) AS BIGINT) AS rho_micro FROM m"""


def mse_sql(rel_sql: str, x: str, y: str) -> str:
    return f"""
WITH rel AS ({rel_sql}),{_moments_sql('rel', x, y)}
SELECT CAST(round(CAST(sxx - 2 * sxy + syy AS DOUBLE) / CAST(n AS DOUBLE) * 1e6) AS BIGINT) AS mse_micro
FROM m"""

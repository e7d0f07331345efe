"""Deterministic train/val/test splits and hash sampling.

A training pipeline needs leakage-free splits that (a) keep whole
conversations together, (b) are a pure function of the key — stable
across runs, cluster sizes, and corpus growth (a conv added tomorrow
doesn't reshuffle today's assignment), and (c) are exactly auditable.
The construction: ``u = h32(salt || key)`` (the engine's cross-engine
spec-v1 hash, functions/hashing.py — identical in Spark, DuckDB and
CPython) compared against INTEGER thresholds ``floor(cum_weight * 2^32)``
— no float comparison anywhere, so engine and oracle agree bit-for-bit.

Both ops are single narrow projections/filters: no shuffle, no UDF,
embarrassingly parallel at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h32_col

#: default salt — version the assignment, not the code
DEFAULT_SALT = "split/v1"

#: default weights, applied in dict order
DEFAULT_WEIGHTS = {"train": 0.90, "val": 0.05, "test": 0.05}


def _thresholds(weights: dict[str, float]) -> list[tuple[str, int]]:
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError(f"weights must be non-negative and non-empty: {weights}")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    out, cum = [], 0.0
    for name, w in weights.items():
        cum += w / total
        out.append((name, int(cum * 2**32)))
    out[-1] = (out[-1][0], 2**32)  # close the interval against float drift
    return out


def split_col(
    key: Column, weights: dict[str, float] | None = None, salt: str = DEFAULT_SALT
) -> Column:
    """The split name for ``key`` under ``weights`` (dict order)."""
    ths = _thresholds(DEFAULT_WEIGHTS if weights is None else weights)
    h = h32_col(F.concat(F.lit(salt), key.cast("string")))
    expr = None
    for name, t in ths:  # first-match wins, in weight order
        cond = h < F.lit(t)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return expr


def assign_splits(
    df: DataFrame,
    key_col: str = "conv_id",
    weights: dict[str, float] | None = None,
    salt: str = DEFAULT_SALT,
) -> DataFrame:
    """Input plus a ``split`` column keyed on ``key_col`` — all rows of a
    key land in one split (conversation-coherent by default)."""
    return df.withColumn("split", split_col(F.col(key_col), weights, salt))


def split_summary(
    df: DataFrame,
    key_col: str = "conv_id",
    weights: dict[str, float] | None = None,
    salt: str = DEFAULT_SALT,
) -> DataFrame:
    """Split-level audit rollup: (split, n_convs, n_turns, n_tokens)."""
    from ..analyzer import tokens_col

    return (
        assign_splits(df, key_col, weights, salt)
        .withColumn("n_tokens", F.size(tokens_col("text")).cast("bigint"))
        .groupBy("split")
        .agg(
            F.countDistinct(key_col).cast("bigint").alias("n_convs"),
            F.count("*").cast("bigint").alias("n_turns"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
    )


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str = "conv_id",
    salt: str = "sample/v1",
) -> DataFrame:
    """Deterministic ``rate`` sample by key: keeps rows whose
    ``h32(salt || key) < floor(rate * 2^32)``.  Stable across runs and
    partitionings; a superset-sample property holds (rate r1 < r2 ⇒
    sample(r1) ⊆ sample(r2))."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    h = h32_col(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    return df.filter(h < F.lit(int(rate * 2**32)))

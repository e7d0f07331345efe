"""Text-analysis column expressions for training-data pipelines.

All JVM-side built-in expressions (whole-stage codegen) — no Python UDFs —
with matching ANSI-SQL fragments for the DuckDB oracle.  Expanded as ops
land: language-ID, quality scoring, token counting, fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..analyzer import TOKEN_RE_STR


def token_count_col(text: Column) -> Column:
    """Number of analyzer tokens (spec v1) in ``text``."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE_STR), 0))


def ws_token_count_col(text: Column) -> Column:
    """Whitespace-split token count (the cheap pre-tokenizer estimate)."""
    return F.size(F.split(F.trim(text), r"\s+"))

"""Frozen text analyzer (tokenizer/normalizer) — version 1.

The reference delegates text→representation to a fixed GGUF model whose
identity pins the meaning of every vector (/root/reference/llama.go:20-36,
llama-go.cpp/llama-go.cpp:121-153).  Our analogue of that "fixed model file"
is a *versioned analyzer spec* that the engine, the numpy oracle, and the
DuckDB oracle SQL all share bit-for-bit.  If the spec ever changes,
ANALYZER_VERSION must be bumped and indexes rebuilt (the reference rejects
mismatched codec versions the same way, /root/reference/index_codec.go:56-58).

Spec v1:  tokens = regexp findall of ``[a-z0-9]+`` over lowercase(text).
ASCII-only by design so that Java regex (Spark), RE2-like (DuckDB) and
Python ``re`` agree exactly.

Three equivalent implementations (tested to agree in tests/test_analyzer.py):

- :func:`tokens_col` — Spark Column using built-in ``regexp_extract_all``
  (JVM-side, whole-stage codegen; the *default* hot path — faster than any
  Python UDF because no Arrow transfer happens at all).
- :func:`tokenize_pandas` — vectorized pandas implementation for use inside
  ``mapInPandas`` segment builders (Arrow batches; never per-row Python).
- :func:`tokenize` — plain-Python for the oracle.
- :data:`SQL_TOKENS_EXPR` — the DuckDB SQL fragment for oracle queries.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

ANALYZER_VERSION = 1
TOKEN_RE_STR = "[a-z0-9]+"
_TOKEN_RE = re.compile(TOKEN_RE_STR)

#: DuckDB SQL fragment producing the token array for a text expression.
SQL_TOKENS_TEMPLATE = "regexp_extract_all(lower({expr}), '[a-z0-9]+')"


def sql_tokens(expr: str) -> str:
    """DuckDB/ANSI SQL fragment: token array of ``expr`` under spec v1."""
    return SQL_TOKENS_TEMPLATE.format(expr=expr)


def tokens_col(text: Column | str) -> Column:
    """Spark Column: ``array<string>`` of tokens under spec v1 (JVM-side)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(col), F.lit(TOKEN_RE_STR), 0)


def tokenize(text: str | None) -> list[str]:
    """Plain-Python tokenizer (oracle path)."""
    if text is None:
        return []
    return _TOKEN_RE.findall(text.lower())


def tokenize_pandas(texts: pd.Series) -> pd.Series:
    """Vectorized pandas tokenizer: Series[str] -> Series[list[str]].

    Uses pandas' vectorized ``str`` ops (C-level loops over the block),
    the idiomatic Arrow-batch path for ``mapInPandas`` stages.
    """
    return texts.fillna("").str.lower().str.findall(TOKEN_RE_STR)

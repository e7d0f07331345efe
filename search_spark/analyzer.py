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


#: split pattern equivalent to findall(TOKEN_RE_STR): maximal runs of
#: non-token characters ARE the delimiters, so splitting on them yields
#: exactly the findall runs (plus empty strings at the text boundaries,
#: which tokenize_arrow filters out).
SPLIT_RE_STR = "[^a-z0-9]+"


def tokenize_arrow(texts):
    """Arrow-native tokenizer: StringArray -> (flat tokens, parent indices).

    Returns ``(tokens, doc_idx)`` where ``tokens`` is a flat
    ``pyarrow.StringArray`` of every token and ``doc_idx`` an Int32/64Array
    mapping each token back to its row in ``texts``.  The whole pipeline
    (lower → regex split → flatten → filter) runs in Arrow C++ over
    contiguous buffers — no Python string objects are ever materialized,
    which matters because the tf stage is memory-bandwidth-bound (the
    pandas object path spends most of its cycles on PyObject pointer
    chasing and refcounting).  Spec-equivalent to :func:`tokenize` /
    :func:`tokenize_pandas` (tests/test_analyzer.py pins all three).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(texts, type=pa.string())
    # NOT utf8_lower: Arrow's unicode lowercase uses SIMPLE case mapping
    # (İ → i) while Python/Java/DuckDB — the three engines the frozen spec
    # already pins — use FULL mapping (İ → i + combining dot, so the spec
    # tokenizes 'İstanbul' as ['i','stanbul']).  ascii_lower matches the
    # other engines exactly on A-Z, and exhaustive enumeration over all of
    # Unicode shows exactly TWO codepoints whose full lowercase lands in
    # the ASCII token class: U+0130 (İ → 'i̇') and U+212A (KELVIN K →
    # 'k').  Pre-expanding those two, then ascii_lower, reproduces the
    # spec bit-for-bit (tests/test_analyzer.py::test_python_vs_arrow).
    texts = pc.replace_substring(texts, "İ", "i̇")
    texts = pc.replace_substring(texts, "K", "k")
    low = pc.ascii_lower(pc.coalesce(texts, ""))
    toks = pc.split_pattern_regex(low, SPLIT_RE_STR)
    flat = pc.list_flatten(toks)
    doc_idx = pc.list_parent_indices(toks)
    mask = pc.not_equal(flat, "")
    return flat.filter(mask), doc_idx.filter(mask)

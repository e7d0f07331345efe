"""Vectorized positional-match kernels (phrase / proximity tf).

The JVM higher-order-function twins (`operators.phrase.phrase_tf_col`,
`near_tf_col`) are semantically exact but *interpreted*: Catalyst does not
codegen lambda bodies, and every lambda invocation re-evaluates outer
expressions — measured ~10× the cost of tokenization itself on a 1.4M-doc
head-only phrase verify (37 s vs 3.5 s for the tokenize-only scan).  These
kernels are the Arrow/numpy hot path used inside ``mapInPandas`` verify
stages: tokenize ONCE per doc via :func:`analyzer.tokenize_arrow` (flat
token array + parent indices, all Arrow C++), then count matches with
shifted-slice boolean algebra over the whole batch — no per-row Python.

Semantics are pinned to the JVM twins (property-tested equal in
tests/test_phrase.py):

- phrase tf = number of start offsets where the ORDERED terms appear
  consecutively; overlapping occurrences all count.
- near tf  = number of start offsets whose window of
  ``|distinct terms| + slop`` tokens (clamped to the doc length) contains
  ALL distinct terms; docs shorter than the distinct-term count match 0.

Reference analogue: the positional verify behind phrase search — the
reference scores flat token multisets only (/root/reference/index.go:53-86),
so phrase/near semantics are defined by our SQL oracle, not the Go code.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..analyzer import tokenize_arrow

__all__ = [
    "flat_tokens",
    "phrase_tf_np",
    "near_tf_np",
    "phrase_tf_from_flat",
    "near_tf_from_flat",
]


def flat_tokens(texts: pd.Series | list):
    """Tokenize a batch: (flat tokens pyarrow.StringArray, doc index
    int64 ndarray, per-doc length int32 ndarray)."""
    flat, doc_idx = tokenize_arrow(
        texts.to_numpy() if isinstance(texts, pd.Series) else texts
    )
    n = len(texts)
    di = np.asarray(doc_idx.to_numpy(zero_copy_only=False), dtype=np.int64)
    dl = np.bincount(di, minlength=n).astype(np.int32)
    return flat, di, dl


def _term_masks(flat, terms: list[str]) -> dict[str, np.ndarray]:
    """Per-distinct-term boolean match arrays over the flat token array
    (Arrow C++ equality, one pass per distinct term)."""
    import pyarrow.compute as pc

    return {
        t: pc.equal(flat, t).to_numpy(zero_copy_only=False)
        for t in dict.fromkeys(terms)
    }


def phrase_tf_np(texts, terms: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(ptf, dl) int32 arrays for a batch: exact ordered-phrase occurrence
    counts (overlapping counted) of ``terms`` per text."""
    flat, di, dl = flat_tokens(texts)
    return phrase_tf_from_flat(flat, di, dl, terms), dl


def phrase_tf_from_flat(flat, di, dl, terms: list[str]) -> np.ndarray:
    """Counting core of :func:`phrase_tf_np` over a PRE-TOKENIZED batch
    (the ``flat_tokens`` triple) — lets a multi-query verify stage pay the
    tokenize cost once per Arrow batch, not once per query."""
    n = len(dl)
    w = len(terms)
    L = len(flat)
    M = L - w + 1
    if w == 0 or M <= 0:
        return np.zeros(n, dtype=np.int32)
    eq = _term_masks(flat, terms)
    m = eq[terms[0]][0:M].copy()
    for j in range(1, w):
        m &= eq[terms[j]][j : M + j]
    # the whole window must sit inside one doc (flat is doc-ordered)
    if w > 1:
        m &= di[0:M] == di[w - 1 : L]
    return np.bincount(di[0:M][m], minlength=n).astype(np.int32)


def near_tf_np(
    texts, terms: list[str], slop: int
) -> tuple[np.ndarray, np.ndarray]:
    """(ptf, dl) int32 arrays for a batch: per text, the number of start
    offsets whose window of ``|distinct terms| + slop`` tokens (clamped to
    the doc) contains all distinct terms — `near_tf_col` semantics."""
    flat, di, dl = flat_tokens(texts)
    return near_tf_from_flat(flat, di, dl, terms, slop), dl


def near_tf_from_flat(
    flat, di, dl, terms: list[str], slop: int
) -> np.ndarray:
    """Counting core of :func:`near_tf_np` over a pre-tokenized batch
    (same tokenize-once contract as :func:`phrase_tf_from_flat`)."""
    n = len(dl)
    uniq = sorted(set(terms))
    n_uniq = len(uniq)
    if n_uniq == 0:
        return np.zeros(n, dtype=np.int32)
    w = n_uniq + slop
    L = len(flat)
    eq = _term_masks(flat, uniq)
    ptf = np.zeros(n, dtype=np.int32)

    # Long docs (dl >= w): every start i with the w-window inside one doc;
    # presence of each term via global prefix sums differenced at (i, i+w)
    # — windows crossing doc boundaries are masked out, so the global
    # cumsum never leaks counts across docs into a VALID window.
    M = L - w + 1
    if M > 0:
        valid = di[0:M] == di[w - 1 : L] if w > 1 else np.ones(M, dtype=bool)
        ok = valid
        for t in uniq:
            cs = np.concatenate(([0], np.cumsum(eq[t], dtype=np.int64)))
            ok = ok & (cs[w : w + M] - cs[0:M] > 0)
        ptf = np.bincount(di[0:M][ok], minlength=n).astype(np.int32)

    # Short docs (n_uniq <= dl < w): the clamped window is the whole doc —
    # exactly one start, matching iff every distinct term occurs.
    short = (dl < w) & (dl >= n_uniq)
    if short.any():
        pres = short.copy()
        for t in uniq:
            pres &= np.bincount(di[eq[t]], minlength=n) > 0
        ptf[pres] = 1
    return ptf

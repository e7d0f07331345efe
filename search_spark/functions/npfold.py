"""Sequential-left-fold numpy kernels, bit-identical to the engine's JVM
fold (``F.aggregate`` over ``F.zip_with`` — operators/similarity.dot_col)
and the DuckDB oracle's ``list_reduce`` fold.

numpy's own reductions (``(E*E).sum(axis=1)``, ``E @ W``) use pairwise /
BLAS summation whose last-ulp results can differ from a sequential fold;
for sign tests (LSH bucket bits) and argmax at cell boundaries (IVF
assignment) a one-ulp flip silently diverges the engines.  These kernels
run the fold ORDER of the scalar definition but VECTORIZED ACROSS ROWS —
one numpy op per dimension, so cost is O(dim) numpy calls per batch, not
per row (the engine's no-per-row-Python rule).

The reference pins cross-engine kernel agreement the same way: every SIMD
kernel is equivalence-tested against its scalar twin
(/root/reference/internal/cosine/simd/simd_test.go:52-74).
"""

from __future__ import annotations

import numpy as np


def fold_dot(E: np.ndarray, W: np.ndarray) -> np.ndarray:
    """(n, d) × (m, d) → (n, m): dot products accumulated dim-by-dim in
    float64 (sequential fold order, vectorized over rows × planes)."""
    E = np.asarray(E, dtype=np.float64)
    W = np.asarray(W, dtype=np.float64)
    acc = np.zeros((E.shape[0], W.shape[0]), dtype=np.float64)
    for i in range(E.shape[1]):
        acc += E[:, i : i + 1] * W[:, i]
    return acc


def fold_dot_pairs(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """(n, d) × (n, d) → (n,): ROW-PAIRED dot products accumulated
    dim-by-dim (the candidate-rerank shape: one query vector per
    candidate row).  Same fold order as :func:`fold_dot` and the JVM
    ``dot_col`` — bit-identical by construction, pinned in tests."""
    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    acc = np.zeros(A.shape[0], dtype=np.float64)
    for i in range(A.shape[1]):
        acc += A[:, i] * B[:, i]
    return acc


def fold_norm(E: np.ndarray) -> np.ndarray:
    """(n, d) → (n,): sqrt of the sequentially-folded sum of squares."""
    E = np.asarray(E, dtype=np.float64)
    acc = np.zeros(E.shape[0], dtype=np.float64)
    for i in range(E.shape[1]):
        acc += E[:, i] * E[:, i]
    return np.sqrt(acc)

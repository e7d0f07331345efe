"""Pure-Python/numpy BM25 oracle — the rank-identity ground truth.

Plays the role the scalar `generic*` kernels play in the reference's test
strategy (/root/reference/internal/cosine/simd/simd_test.go:52-74: the SIMD
path must match the naive path within tolerance): the Spark engine must
reproduce this oracle's top-k docIDs *exactly* and scores within 1e-6.

Top-k semantics mirror the reference's bounded min-heap
(/root/reference/index.go:63-86):

- size-k min-heap; when full, replace the minimum only when the candidate is
  *strictly greater* (``r > dst[0].Relevance``, /root/reference/index.go:74)
- final results sorted descending (/root/reference/index.go:83-85)

The reference leaves tie order unspecified (heap order).  To make rank
identity testable we pin the total order everywhere (engine + oracle + SQL):
``(score DESC, doc_id ASC)``.  Under a total order, the bounded heap yields
the same set as a full sort + take(k); we keep the heap implementation for
semantic fidelity and test the equivalence.

BM25 (the "standard k1/b" Lucene-flavored variant, north_star):
    idf(t)      = ln((N - df + 0.5) / (df + 0.5) + 1)
    score(d, q) = sum over unique t in q present in d of
                  idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
with k1 = 1.2, b = 0.75.  Scores accumulate in float64 in ascending term
order (fixed summation order, SURVEY.md §7.5) so engine and oracle round
identically.
"""

from __future__ import annotations

import heapq
import math
from collections import Counter
from dataclasses import dataclass, field

import pandas as pd

from .analyzer import tokenize

K1 = 1.2
B = 0.75


def idf(n_docs: int, df: int) -> float:
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def term_score(tf: int, dl: int, avgdl: float, idf_t: float, k1: float = K1, b: float = B) -> float:
    return idf_t * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


@dataclass
class OracleIndex:
    """In-memory inverted index over a small corpus (test scale only)."""

    n_docs: int = 0
    avgdl: float = 0.0
    doclens: dict[int, int] = field(default_factory=dict)
    postings: dict[str, list[tuple[int, int]]] = field(default_factory=dict)  # term -> [(doc_id, tf)]

    @classmethod
    def build(cls, docs: pd.DataFrame, text_col: str = "text", id_col: str = "doc_id") -> "OracleIndex":
        """``docs`` must already carry the stable dense doc_id."""
        idx = cls()
        total_len = 0
        for doc_id, text in zip(docs[id_col].tolist(), docs[text_col].tolist()):
            toks = tokenize(text)
            idx.doclens[int(doc_id)] = len(toks)
            total_len += len(toks)
            for term, tf in Counter(toks).items():
                idx.postings.setdefault(term, []).append((int(doc_id), tf))
        idx.n_docs = len(idx.doclens)
        idx.avgdl = total_len / idx.n_docs if idx.n_docs else 0.0
        for plist in idx.postings.values():
            plist.sort()
        return idx

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    def scores(self, query: str) -> dict[int, float]:
        """All nonzero BM25 scores, summed in ascending term order."""
        terms = sorted(set(tokenize(query)))
        acc: dict[int, float] = {}
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                continue
            idf_t = idf(self.n_docs, len(plist))
            for doc_id, tf in plist:
                acc[doc_id] = acc.get(doc_id, 0.0) + term_score(tf, self.doclens[doc_id], self.avgdl, idf_t)
        return acc

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Exact top-k via the reference's bounded-heap semantics.

        Returns [(doc_id, score)] ordered (score DESC, doc_id ASC).
        k <= 0 returns [] (guard from /root/reference/index.go:54-56).
        """
        if k <= 0:
            return []
        # heap entries keyed so the *worst* under (score DESC, doc_id ASC)
        # sits at the root: key = (score, -doc_id).
        heap: list[tuple[float, int]] = []
        scores = self.scores(query)
        for doc_id in sorted(scores):  # deterministic scan order
            key = (scores[doc_id], -doc_id)
            if len(heap) < k:
                heapq.heappush(heap, key)
            elif key > heap[0]:  # strictly greater, index.go:74
                heapq.heapreplace(heap, key)
        out = [(-d, s) for s, d in heap]
        out.sort(key=lambda r: (-r[1], r[0]))
        return out

    def search_df(self, query: str, k: int = 10) -> pd.DataFrame:
        rows = [
            {"rank": i + 1, "doc_id": d, "score": s}
            for i, (d, s) in enumerate(self.search(query, k))
        ]
        return pd.DataFrame(rows, columns=["rank", "doc_id", "score"])

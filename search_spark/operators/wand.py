"""Block-max WAND top-k scorer over compressed posting blocks (north_star).

Exactness contract: identical top-k to the brute-force oracle — block-max
WAND is *safe* pruning (skip only on provable upper bounds), so it keeps
the reference's exact-search guarantee (/root/reference/README.md:13,
index.go:26) while replacing its O(N·d) full scan with sublinear block
skipping.

Heap semantics mirror the reference's bounded min-heap
(/root/reference/index.go:63-86): size-k, replace the minimum only on a
strictly-greater key, final order descending.  Total order is pinned to
``(score DESC, doc_id ASC)`` (SURVEY.md §7.5), hence:

- heap keys are ``(score, -doc_id)``;
- pruning uses *strict* comparison (skip only when upper bound < θ): a
  candidate scoring exactly θ could still win its tie on doc_id, so equal
  bounds must be evaluated.

Scoring arithmetic matches the oracle bit-for-bit: python-float (C double)
per-term contributions summed in ascending term order (SURVEY.md §7.5).

Distribution model: postings are bucketed by doc range (``doc_bucket``), so
one ``applyInPandas`` group = all query-term blocks for one doc range; each
group runs an independent WAND with a local heap and emits its local top-k;
the global top-k is the k best of (k × buckets) candidate rows — exact,
because any global winner is a local winner in its bucket.  Query time thus
shuffles only candidate *blocks* (pruned by term_bucket partition pruning +
term predicate pushdown at the parquet scan), never raw postings rows.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import codec
from ..analyzer import tokenize
from ..oracle import idf as oracle_idf
from ..sources.index_store import IndexStore

K1 = 1.2
B = 0.75
INF = float("inf")


class TermCursor:
    """Lazy cursor over one term's block list (sorted by first_doc).

    Blocks are decoded (delta+varint → numpy) only when entered; blocks
    proven irrelevant by ``last_doc`` / block-max bounds are skipped
    undecoded — that skip is the entire point of the block-max layout.
    """

    __slots__ = (
        "term", "idf", "avgdl", "first", "last", "bmax", "payloads", "nblocks",
        "bi", "pi", "docs", "tfs", "dls", "global_ub", "decoded", "skipped",
        "cache",
    )

    def __init__(
        self,
        term: str,
        idf: float,
        blocks: pd.DataFrame,
        avgdl: float,
        cache: dict | None = None,
    ):
        self.term = term
        self.idf = idf
        self.avgdl = avgdl
        self.first = blocks["first_doc"].to_numpy()
        self.last = blocks["last_doc"].to_numpy()
        # Safe bound for the LIVE avgdl, derived from (max_tf, min_dl) —
        # the stored block_max_raw is only valid for the avgdl the segment
        # was encoded with, which drifts in incremental indexes
        # (codec.block_upper_bound docstring).
        self.bmax = codec.block_upper_bound(
            blocks["block_max_tf"].to_numpy(), blocks["block_min_dl"].to_numpy(), avgdl, K1, B
        )
        self.payloads = list(
            zip(blocks["doc_ids_delta"], blocks["tfs"], blocks["dls"], blocks["n_docs"])
        )
        self.nblocks = len(self.payloads)
        self.bi = 0
        self.pi = 0
        self.docs = None
        self.global_ub = idf * float(self.bmax.max()) if self.nblocks else 0.0
        self.decoded = 0
        self.skipped = 0
        # shared per-bucket decode cache, keyed (term, first_doc): within a
        # doc_bucket a term's blocks are disjoint doc ranges, so first_doc
        # identifies the block; queries of a batch sharing a term hit the
        # same decoded arrays instead of re-running the varint decode
        self.cache = cache

    # -- state ---------------------------------------------------------
    def exhausted(self) -> bool:
        return self.bi >= self.nblocks

    def cur_doc(self) -> float:
        if self.exhausted():
            return INF
        if self.docs is None:
            # not decoded: current position is the block start, whose docID
            # is stored exactly in metadata — no decode needed to peek.
            return float(self.first[self.bi])
        return float(self.docs[self.pi])

    def block_ub(self) -> float:
        return self.idf * float(self.bmax[self.bi]) if not self.exhausted() else 0.0

    def block_last(self) -> int:
        return int(self.last[self.bi])

    # -- movement ------------------------------------------------------
    def _decode(self) -> None:
        if self.docs is None:
            first = int(self.first[self.bi])
            key = (self.term, first)
            hit = self.cache.get(key) if self.cache is not None else None
            if hit is None:
                ids_b, tfs_b, dls_b, n = self.payloads[self.bi]
                n = int(n)
                hit = (
                    codec.decode_doc_ids(ids_b, first, n),
                    codec.decode_tfs(tfs_b, n),
                    codec.decode_dls(dls_b, n),
                )
                if self.cache is not None:
                    self.cache[key] = hit
                self.decoded += 1
            self.docs, self.tfs, self.dls = hit

    def shallow_to(self, d: int) -> None:
        """Advance block pointer (no decode) until last_doc >= d."""
        while not self.exhausted() and self.last[self.bi] < d:
            if self.docs is None:
                self.skipped += 1
            self.bi += 1
            self.docs = None
            self.pi = 0

    def skip_to(self, d: int) -> None:
        """Position at the first posting with doc >= d."""
        self.shallow_to(d)
        if self.exhausted():
            return
        if self.docs is None and self.first[self.bi] >= d:
            return  # block starts at/after target: stay at pi=0, decode deferred
        self._decode()
        # never move backwards: WAND only skips forward
        self.pi = max(self.pi, int(np.searchsorted(self.docs, d)))
        if self.pi >= len(self.docs):  # d beyond decoded block (can't happen after shallow_to)
            self.bi += 1
            self.docs = None
            self.pi = 0

    def advance(self) -> None:
        """Move one posting forward."""
        self._decode()
        self.pi += 1
        if self.pi >= len(self.docs):
            self.bi += 1
            self.docs = None
            self.pi = 0

    def score_cur(self) -> float:
        """BM25 contribution at the current posting (python-float math,
        bit-identical to oracle.term_score)."""
        self._decode()
        tf = float(self.tfs[self.pi])
        dl = float(self.dls[self.pi])
        return self.idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / self.avgdl))


def wand_topk(
    blocks_by_term: dict[str, pd.DataFrame],
    qidf: dict[str, float],
    avgdl: float,
    k: int,
    cache: dict | None = None,
    deleted: frozenset | None = None,
) -> tuple[list[tuple[int, float]], dict]:
    """Exact top-k over one doc range via block-max WAND.

    ``deleted`` (tombstoned doc_ids) never enter the heap — their cursors
    advance normally so pruning and progress are unaffected.

    Returns ([(doc_id, score)] ordered (score DESC, doc_id ASC), counters).
    """
    if k <= 0:
        return [], {}
    cursors = []
    for term in sorted(blocks_by_term):  # ascending term order → fixed sum order
        blk = blocks_by_term[term].sort_values("first_doc")
        cursors.append(TermCursor(term, qidf[term], blk, avgdl, cache))
    heap: list[tuple[float, float]] = []  # (score, -doc_id)

    def theta() -> float:
        return heap[0][0] if len(heap) == k else -INF

    # Defensive progress guard: every iteration must advance some cursor by
    # at least one posting or one block, so iterations are bounded by
    # O(postings + blocks) per cursor.  A pruning bug that stops making
    # progress (the round-2 skip-cap hang) must fail LOUDLY here instead of
    # stalling an executor task forever.
    max_iters = 8 + 4 * sum(
        int(blocks_by_term[t]["n_docs"].sum()) + len(blocks_by_term[t])
        for t in blocks_by_term
    ) * max(1, len(cursors))
    iters = 0

    active = [c for c in cursors if not c.exhausted()]
    while active:
        iters += 1
        if iters > max_iters:
            raise RuntimeError(
                "wand_topk exceeded its safe iteration bound — block-skip "
                "pruning stopped making progress (engine bug; report the "
                "corpus/query)"
            )
        order = sorted(active, key=lambda c: c.cur_doc())
        th = theta()
        acc = 0.0
        pivot = -1
        for i, c in enumerate(order):
            acc += c.global_ub
            if acc >= th:
                pivot = i
                break
        if pivot < 0:
            break  # no doc can beat θ — done
        pivot_doc = order[pivot].cur_doc()
        if pivot_doc == INF:
            break
        pivot_doc = int(pivot_doc)

        if int(order[0].cur_doc()) == pivot_doc:
            # candidates aligned; refine with block-level maxima before decode
            aligned = [c for c in order if c.cur_doc() == pivot_doc]
            for c in aligned:
                c.shallow_to(pivot_doc)
            block_acc = sum(c.block_ub() for c in aligned if not c.exhausted())
            if len(heap) == k and block_acc < th:
                # whole aligned blocks can't reach θ.  Safe jump target:
                # d' = min(current block ends)+1, capped AT (not past) the
                # next cursor positioned STRICTLY BEYOND the pivot — a doc
                # there may combine aligned + unaligned contributions, so we
                # may not skip over it.  (Capping at order[pivot+1] naively
                # could yield d' == pivot_doc when alignment extends past
                # the pivot index — an infinite loop.)  pivot_doc itself is
                # proven < θ (ALL its mass is in the aligned cursors: any
                # cursor past it no longer contains it), so d' ≥ pivot_doc+1
                # is always safe AND guarantees progress.
                d_prime = 1 + min(
                    (c.block_last() for c in aligned if not c.exhausted()),
                    default=pivot_doc,
                )
                nxt = next(
                    (
                        int(c.cur_doc())
                        for c in order
                        if c.cur_doc() != INF and c.cur_doc() > pivot_doc
                    ),
                    None,
                )
                if nxt is not None:
                    d_prime = min(d_prime, nxt)
                d_prime = max(d_prime, pivot_doc + 1)
                for c in aligned:
                    c.skip_to(d_prime)
            elif deleted and pivot_doc in deleted:
                for c in aligned:  # tombstoned: skip scoring, keep progress
                    c.advance()
            else:
                # sum in ascending term order for bit-identity with oracle
                score = 0.0
                for c in sorted(aligned, key=lambda c: c.term):
                    score += c.score_cur()
                key = (score, -float(pivot_doc))
                if len(heap) < k:
                    heapq.heappush(heap, key)
                elif key > heap[0]:  # strictly greater — index.go:74
                    heapq.heapreplace(heap, key)
                for c in aligned:
                    c.advance()
        else:
            # advance the laggard cursor up to the pivot document
            order[0].skip_to(pivot_doc)

        active = [c for c in cursors if not c.exhausted()]

    out = sorted(((int(-nd), s) for s, nd in heap), key=lambda r: (-r[1], r[0]))
    counters = {
        "blocks_decoded": sum(c.decoded for c in cursors),
        "blocks_skipped": sum(c.skipped for c in cursors),
    }
    return out, counters


#: posting-count dispatch threshold between the two exact scorers
WAND_MAX_POSTINGS = 1024

#: bucket count above which the final per-query top-k merge goes
#: hierarchical.  Below it, k×buckets candidate rows through one window
#: partition is cheaper than an extra exchange; above it, the single
#: partition becomes the scale-killer SCALE.md computes (head-only query
#: at 10^12 docs: 15M buckets × k=10 = 150M rows through ONE task).
MERGE_FANOUT = 64


def ranked_topk(
    local: DataFrame, k: int, n_buckets: int, extra: tuple[str, ...] = ()
) -> DataFrame:
    """Exact hierarchical per-query top-k over per-bucket survivors.

    ``local`` holds ≤ k rows per (query_id, doc_bucket) — each doc lives
    in exactly one bucket, so rows are per-(query, doc) unique and any
    global winner is a local winner in its group at every level.  The
    distributed analogue of the reference's per-partition-heaps-then-
    merge (/root/reference/index.go:63-86), in two bounded levels:

    1. when ``n_buckets > MERGE_FANOUT``: group survivors into
       g = ⌈√n_buckets⌉ merge groups by doc_id hash and keep the
       per-(query, group) top-k — a PARTITIONED window, parallelism
       queries × g, ≤ k·(n_buckets/g) ≈ k·√B rows per window partition;
    2. final per-query rank over ≤ k·g ≈ k·√B rows.

    Worst case per task thus grows as k·√buckets instead of k·buckets —
    the 150M-row head-query case becomes ~39k rows/task.
    """
    if n_buckets > MERGE_FANOUT:
        import math

        g = math.isqrt(max(0, n_buckets - 1)) + 1
        pre = Window.partitionBy("query_id", "_mg").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        local = (
            local.withColumn(
                "_mg", F.pmod(F.xxhash64("doc_id"), F.lit(g)).cast("int")
            )
            .withColumn("_pr", F.row_number().over(pre))
            .filter(F.col("_pr") <= k)
            .drop("_mg", "_pr")
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score", *extra)
    )


def dense_topk(
    blocks_by_term: dict[str, pd.DataFrame],
    qidf: dict[str, float],
    avgdl: float,
    k: int,
    cache: dict | None = None,
    deleted: frozenset | None = None,
) -> list[tuple[int, float]]:
    """Exact top-k over one doc range via dense vectorized accumulation —
    the numpy "SIMD path" of the scorer pair (the reference keeps the same
    pair: AVX kernel + scalar reference, cross-checked —
    /root/reference/internal/cosine/simd/simd.go:33-44, simd_test.go:52-74).

    Per-posting Python stepping (wand_topk) costs ~µs/posting; on Zipf-head
    query terms a doc range is dense and block-max pruning cannot skip, so
    the per-group work degenerates to a full merge — this path does that
    merge as numpy array ops: decode every candidate block, accumulate
    per-doc scores term-by-term in ASCENDING TERM ORDER into a float64
    array (bit-identical summation order to the oracle and to wand_topk),
    then select top-k under (score DESC, doc_id ASC).

    Used for groups with > WAND_MAX_POSTINGS candidate postings; wand_topk
    (posting-level block-max WAND) serves sparse groups where skipping
    wins.  Equality of the two scorers is property-tested.
    """
    if k <= 0:
        return []
    terms = sorted(blocks_by_term)
    # local dense index over the group's doc range
    lo = min(int(blocks_by_term[t]["first_doc"].min()) for t in terms)
    hi = max(int(blocks_by_term[t]["last_doc"].max()) for t in terms)
    width = hi - lo + 1
    scores = np.zeros(width, dtype=np.float64)
    seen = np.zeros(width, dtype=bool)
    for term in terms:  # ascending — pins the float summation order
        idf = qidf[term]
        blk = blocks_by_term[term]
        for ids_b, tfs_b, dls_b, n, first in zip(
            blk["doc_ids_delta"], blk["tfs"], blk["dls"], blk["n_docs"], blk["first_doc"]
        ):
            n = int(n)
            key = (term, int(first))
            hit = cache.get(key) if cache is not None else None
            if hit is None:
                hit = (
                    codec.decode_doc_ids(ids_b, int(first), n),
                    codec.decode_tfs(tfs_b, n),
                    codec.decode_dls(dls_b, n),
                )
                if cache is not None:
                    cache[key] = hit
            docs, tf_i, dl_i = hit
            tf = tf_i.astype(np.float64)
            dl = dl_i.astype(np.float64)
            contrib = idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))
            idx = docs - lo
            scores[idx] += contrib  # unique docs per term: plain fancy-index add
            seen[idx] = True
    cand = np.flatnonzero(seen)
    if deleted and cand.shape[0]:
        dele = np.fromiter(deleted, dtype=np.int64)
        cand = cand[~np.isin(cand + lo, dele)]
    if cand.shape[0] > k:
        # kth-largest score via partial select; keep everything at/above it
        # (boundary ties included) so the exact (score DESC, doc_id ASC)
        # sort below decides the final k
        kth = -np.partition(-scores[cand], k - 1)[k - 1]
        cand = cand[scores[cand] >= kth]
    order = np.lexsort((cand + lo, -scores[cand]))[:k]
    chosen = cand[order]
    return [(int(d + lo), float(scores[d])) for d in chosen]


# ---------------------------------------------------------------------------
# Spark query pipeline over an IndexStore
# ---------------------------------------------------------------------------

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


def tombstones_ref(reader) -> tuple[frozenset | None, object | None]:
    """(small_set, broadcast) for any reader-like object — the shared
    entry point scorer modules (boolean/phrase/keywords) use so every
    delete-aware closure picks the same ship-vs-broadcast strategy.
    Falls back to closure shipping for readers without the method
    (test fakes)."""
    ref = getattr(reader, "tombstones_ref", None)
    if ref is not None:
        return ref()
    return (getattr(reader, "deleted", frozenset()) or None), None


class IndexReader:
    """Query-side handle on a persisted index (analogue of the loaded
    ``Index[T]`` in /root/reference/example/main.go:59-65, but lazy: only
    the manifest + stats are read eagerly; postings stream per query).

    SNAPSHOT AT OPEN: the postings file listing, stats, and dictionary are
    fixed at construction (Spark caches the listing in the DataFrame's
    FileIndex, so repeated queries skip the directory walk).  Segments
    ingested or compacted AFTER construction are invisible until
    :meth:`refresh` — the same contract as the reference's loaded in-memory
    index.  Streaming consumers should call ``refresh()`` when the store's
    ledger advances (``store.checkpoints()['stream_batches']`` count)."""

    def __init__(self, spark: SparkSession, store: IndexStore):
        store.check_versions()
        self.spark = spark
        self.store = store
        self.term_buckets = store.manifest()["term_buckets"]
        self.refresh()

    #: driver-side term-cache bound (≈ tens of MB at the cap; reset, not
    #: LRU-tracked — a full reset is rare and the next queries re-warm it)
    TERM_CACHE_MAX = 1_000_000

    def refresh(self) -> "IndexReader":
        """Re-open the store's CURRENT snapshot: re-reads stats, dictionary
        and the postings file listing (new stream segments / compacted
        layouts become visible) and drops the term cache (idf depends on
        the snapshot's N/df).  Cheap — three metadata reads, no data."""
        self.stats = self.store.stats()
        self._dict_df = self.spark.read.parquet(self.store.dictionary_path)
        self._posts_df = self.store.load_postings_df(self.spark)
        # tombstoned doc_ids: excluded from every result (logical delete);
        # scores keep the physical index's stats until a compaction purges
        self.deleted: frozenset = self.store.tombstones()
        # term → (idf, term_bucket), or None for known-absent terms —
        # negative entries stop OOV terms from re-running the lookup job
        self._term_cache: dict[str, tuple[float, int] | None] = {}
        # snapshot-scoped caches for the delete set's two serving forms
        # (built lazily, invalidated here because the set is snapshot state)
        self._gone_df = None
        if getattr(self, "_deleted_bc", None) is not None:
            self._deleted_bc.unpersist()
        self._deleted_bc = None
        return self

    #: ship tombstones per-task in the closure below this size (driver-
    #: sized sets serialize fine); above it use ONE broadcast per snapshot
    #: so a lazily-compacted store with millions of tombstones doesn't pay
    #: the pickle cost on every task of every query
    TOMBSTONE_BROADCAST_MIN = 100_000

    def tombstones_ref(self):
        """(small_set, broadcast) — exactly one is non-None when tombstones
        exist.  Scorer closures capture both; executors resolve via
        ``bc.value if bc is not None else small``.  Results are identical
        on either path (pinned in tests/test_deletes.py)."""
        if not self.deleted:
            return None, None
        if len(self.deleted) < self.TOMBSTONE_BROADCAST_MIN:
            return self.deleted, None
        if self._deleted_bc is None:
            self._deleted_bc = self.spark.sparkContext.broadcast(self.deleted)
        return None, self._deleted_bc

    def gone_ids_df(self) -> DataFrame | None:
        """Tombstoned ∪ purged doc_ids as a (cached per snapshot) single-
        column DataFrame for anti-joins — built from a numpy array via
        Arrow, not a per-id Python row list (delete sets are thousands to
        millions of ids; re-materializing them through the driver on every
        flat-scan query was a measured per-call cost)."""
        if self._gone_df is None:
            gone = (self.deleted or frozenset()) | self.store.purged_ids()
            if not gone:
                self._gone_df = False  # sentinel: nothing to exclude
            else:
                import numpy as np
                import pandas as pd

                arr = np.fromiter(gone, dtype=np.int64)
                arr.sort()
                self._gone_df = self.spark.createDataFrame(
                    pd.DataFrame({"doc_id": arr})
                )
        return None if self._gone_df is False else self._gone_df

    def _dictionary_rows(self, terms: list[str]) -> dict[str, tuple[float, int]]:
        """term → (idf, term_bucket).  ONE Spark job for the batch's UNSEEN
        terms only; terms repeat heavily across a serving session's
        queries — Zipf again — so steady-state batches often skip the
        lookup job entirely.

        The lookup scan is PARTITION-PRUNED: the dictionary is laid out by
        term_bucket (indexer.finalize) and the query's buckets are derived
        driver-side with the spec-tested pure-Python xxhash64 twin — at
        10^12-doc scale the dictionary is billions of terms, and this turns
        the lookup from a vocabulary scan into ≤|terms| partition reads.
        Stored-vs-derived bucket equality is asserted on every fetched row
        (a hash-spec drift fails loudly instead of silently missing terms).
        """
        from ..functions.hashing import term_bucket_py

        missing = [t for t in terms if t not in self._term_cache]
        if missing:
            py_buckets = {t: term_bucket_py(t, self.term_buckets) for t in missing}
            rows = (
                self._dict_df.filter(
                    F.col("term_bucket").isin(sorted(set(py_buckets.values())))
                    & F.col("term").isin(missing)
                )
                .select("term", "df", "term_bucket")
                .collect()
            )
            for r in rows:
                if int(r["term_bucket"]) != py_buckets[r["term"]]:
                    raise RuntimeError(
                        f"term_bucket mismatch for {r['term']!r}: stored "
                        f"{r['term_bucket']} != derived {py_buckets[r['term']]} "
                        "— xxhash64_py no longer matches the layout hash"
                    )
            # idf derived HERE in CPython from (N, df) rather than read from
            # the stored column: JVM Math.log is only 1-ulp-accurate while
            # the oracle uses correctly-rounded libm — deriving driver-side
            # makes the scorer's idf bit-identical to the oracle's
            n = int(self.stats["n_docs"])
            found = {
                r["term"]: (oracle_idf(n, int(r["df"])), int(r["term_bucket"]))
                for r in rows
            }
            if len(self._term_cache) + len(missing) > self.TERM_CACHE_MAX:
                # keep THIS batch's already-cached entries through the reset —
                # dropping them would silently score those terms as OOV below
                self._term_cache = {
                    t: self._term_cache[t] for t in terms if t in self._term_cache
                }
            for t in missing:
                self._term_cache[t] = found.get(t)
        out = {}
        for t in terms:
            v = self._term_cache.get(t)
            if v is not None:
                out[t] = v
        return out

    def candidate_blocks(self, terms: list[str], buckets: list[int] | None = None) -> DataFrame:
        """Scan only the term_bucket partitions + terms of the query:
        partition pruning on the directory column, then predicate pushdown
        on ``term`` into the parquet row groups.  ``buckets=None`` skips the
        partition prune (term predicate still pushes down)."""
        posts = self._posts_df
        pred = F.col("term").isin(terms)
        if buckets is not None:
            pred = F.col("term_bucket").isin(sorted(set(buckets))) & pred
        return posts.filter(pred)

    def batch_search(
        self,
        queries: list[tuple[str, str]],
        k: int = 10,
        boosts: dict[str, float] | None = None,
    ) -> DataFrame:
        """Batch top-k: queries = [(query_id, query_text)].

        ``boosts`` (term → positive weight) scales each term's
        contribution: BM25 is linear in idf per term, so boosting is an
        idf scale — the WAND upper bounds derive from the scaled idf and
        stay exact.

        Plan: candidate blocks (pruned scan) → applyInPandas per
        ``doc_bucket`` group scoring ALL queries of the batch against the
        bucket (shared-term blocks cross the wire and decode ONCE per
        bucket, not once per query — head terms like "the" typically
        appear in many queries of a batch) → global per-query top-k over
        k×buckets candidate rows.  Returns (query_id, rank, doc_id, score).
        """
        if k <= 0:
            return self.spark.createDataFrame(
                [], "query_id string, rank int, doc_id bigint, score double"
            )
        qterms_all = {qid: sorted(set(tokenize(text))) for qid, text in queries}
        all_terms = sorted({t for ts in qterms_all.values() for t in ts})
        dict_rows = self._dictionary_rows(all_terms)
        live_terms = [t for t in all_terms if t in dict_rows]
        qterms = {
            qid: [t for t in ts if t in dict_rows]
            for qid, ts in qterms_all.items()
            if any(t in dict_rows for t in ts)
        }
        if not qterms:
            return self.spark.createDataFrame(
                [], "query_id string, rank int, doc_id bigint, score double"
            )

        blocks = self.candidate_blocks(live_terms, [b for _, b in dict_rows.values()])
        avgdl = float(self.stats["avgdl"])
        idf_b = {t: idf for t, (idf, _) in dict_rows.items()}
        if boosts:
            if any(w <= 0 for w in boosts.values()):
                raise ValueError(f"boosts must be positive: {boosts}")
            idf_b = {t: idf * float(boosts.get(t, 1.0)) for t, idf in idf_b.items()}
        qterms_b = dict(qterms)  # captured in the closure (tiny)
        # small delete sets ride the closure; large ones go through ONE
        # broadcast per snapshot (TOMBSTONE_BROADCAST_MIN) — identical
        # results either way, pinned in tests/test_deletes.py
        deleted_small, deleted_bc = self.tombstones_ref()

        def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
            deleted_b = deleted_bc.value if deleted_bc is not None else deleted_small
            by_term = {t: g for t, g in pdf.groupby("term")}
            outs = []
            # ONE decode cache per bucket group: shared-term blocks decode
            # once for the whole batch, not once per query
            cache: dict = {}
            for qid, terms in qterms_b.items():
                sub = {t: by_term[t] for t in terms if t in by_term}
                if not sub:
                    continue
                # scorer dispatch: posting-level block-max WAND where
                # skipping can win (sparse), vectorized dense accumulation
                # where per-posting Python would crawl.  Both exact and
                # bit-identical (property-tested).
                n_postings = int(sum(g["n_docs"].sum() for g in sub.values()))
                if n_postings <= WAND_MAX_POSTINGS:
                    top, _ = wand_topk(sub, idf_b, avgdl, k, cache, deleted_b)
                else:
                    top = dense_topk(sub, idf_b, avgdl, k, cache, deleted_b)
                if top:
                    out = pd.DataFrame(top, columns=["doc_id", "score"])
                    out.insert(0, "query_id", qid)
                    outs.append(out)
            if not outs:
                return pd.DataFrame(columns=["query_id", "doc_id", "score"])
            return pd.concat(outs, ignore_index=True)

        # explicit partition count: the scorer's cost is Python-per-posting,
        # not bytes — AQE's byte-based coalescing would serialize it onto
        # one task at small scale, while over-partitioning pays a Python
        # worker round trip per EMPTY task.  Group count = doc buckets
        # (known from stats).  Hash layout matches the grouping key, so
        # groupBy below adds no second exchange.
        n_buckets = -(-int(self.stats["n_docs"]) // int(self.stats["doc_bucket_size"]))
        n_score = max(1, min(self.spark.sparkContext.defaultParallelism, max(1, n_buckets)))
        local = (
            blocks.repartition(n_score, "doc_bucket")
            .groupBy("doc_bucket")
            .applyInPandas(score_bucket, schema=RESULT_SCHEMA)
        )
        return ranked_topk(local, k, n_buckets)

    def search(self, query_text: str, k: int = 10) -> DataFrame:
        """Single query → (rank, doc_id, score)."""
        return self.batch_search([("q", query_text)], k).drop("query_id")

    def search_page(
        self, query_text: str, offset: int = 0, size: int = 10
    ) -> DataFrame:
        """Deep pagination: results ranked offset+1 .. offset+size.

        Exact-top-k semantics carry over: the engine retrieves the top
        (offset+size) and slices — the only exact way to paginate a
        rank-sensitive score (ranks stay globally consistent across
        pages of the same snapshot).  Cost grows with the page depth,
        which is the honest cost model of deep paging on any engine."""
        if offset < 0 or size <= 0:
            return self.spark.createDataFrame(
                [], "rank int, doc_id bigint, score double"
            )
        return (
            self.batch_search([("q", query_text)], offset + size)
            .drop("query_id")
            .filter(F.col("rank") > offset)
            .select("rank", "doc_id", "score")
        )

    def doc_source(self, buckets: list[int] | None = None) -> DataFrame:
        """The store's staged document table (batch docs ∪ stream docs).

        Doc sources mirror the index's own discovery (streaming/ingest.py
        finalize): batch docs PLUS stream_docs/batch=* — a stream-only
        store has no batch docs dir at all, and a hybrid store's streamed
        doc_ids would otherwise rehydrate to NULLs.

        ``buckets`` prunes the batch side to the unit partitions that can
        contain those doc_buckets (unit = pmod(doc_bucket, n_units) — the
        staged layout, indexer.stage_docs) plus a doc_bucket predicate for
        row-group skipping; stream segments are small and read unpruned.
        """
        import os

        cols = ["doc_id", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
        sources = []
        if os.path.exists(self.store.docs_path()):
            batch = self.spark.read.parquet(self.store.docs_path())
            if buckets is not None:
                n_units = int(self.store.checkpoints().get("n_units", 1))
                units = sorted({b % n_units for b in buckets})
                batch = batch.filter(
                    F.col("unit").isin(units)
                    & F.col("doc_bucket").isin(sorted(set(buckets)))
                )
            sources.append(batch.select(*cols))
        sdocs_root = os.path.join(self.store.root, "stream_docs")
        if os.path.exists(sdocs_root):
            # only INDEX-ACKNOWLEDGED batches: stream docs land on disk
            # BEFORE their postings commit, so a flat scan during a live or
            # crashed micro-batch would surface docs the index never served
            # — diverging from the candidate path on the same store state.
            # The crash-window rule lives in ONE place (the store helper)
            # shared with finalize_stream's full recompute.
            acked = self.store.acked_stream_batches()
            if acked:
                stream = (
                    self.spark.read.option("basePath", sdocs_root)
                    .parquet(sdocs_root)
                    .filter(F.col("batch").isin(acked))
                )
                if buckets is not None and "doc_bucket" in stream.columns:
                    stream = stream.filter(
                        F.col("doc_bucket").isin(sorted(set(buckets)))
                    )
                sources.append(stream.select(*cols))
        if not sources:
            raise FileNotFoundError(
                f"no docs staged under {self.store.root} (neither batch docs "
                "nor stream_docs) — build or ingest before rehydrating"
            )
        docs = sources[0]
        for d in sources[1:]:
            docs = docs.unionByName(d)
        return docs

    def rehydrate(self, results: DataFrame) -> DataFrame:
        """Join results back to the staged docs table — the reference keeps
        the payload inline in each entry (/root/reference/index.go:16-17);
        we store it relationally and join on demand."""
        return results.join(self.doc_source(), "doc_id", "left")

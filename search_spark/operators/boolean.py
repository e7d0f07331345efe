"""Boolean retrieval (MUST / SHOULD / MUST_NOT) and faceting over the
persisted inverted index.

The reference engine scores every query as a disjunctive vector match
(/root/reference/index.go:52-86); a fulltext engine also needs filtered
retrieval — "all of these, none of those, rank by relevance".  The
Spark-first construction keeps the exact plan shape of
:meth:`wand.IndexReader.batch_search`: one partition-pruned,
term-pushed posting scan covering every clause's terms, ONE exchange
sized to the true doc-bucket count, then a per-bucket Arrow kernel that
does candidate algebra and scoring as numpy set/array ops:

- **MUST** — per-bucket sorted-array intersection of the must terms'
  posting lists (a doc lives in exactly one bucket, so bucket-local
  intersection is globally correct).
- **MUST_NOT** — sorted-array set-difference against the union of the
  excluded terms' postings in the same bucket.  No corpus scan: an
  exclusion only needs the excluded terms' postings.
- **SHOULD** — when no MUST clause exists the candidates are the union
  of the should terms' postings; otherwise should terms only add score.
- **Scoring** — BM25 summed over the distinct (must ∪ should) terms a
  candidate contains, accumulated per term in ascending term order into
  a float64 array indexed by candidate position (bit-identical summation
  order to wand.dense_topk and the DuckDB oracle).

OOV semantics mirror the reference's guard style (index.go:54-56): an
OOV must term → 0 rows (nothing can match); OOV should / must_not terms
drop out of their clause.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import codec
from ..analyzer import tokenize
from ..functions.bm25 import B, K1
from .wand import tombstones_ref

_EMPTY_SCHEMA = "doc_id bigint, score double"


def _decode_term(group: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Concat-decode one term's blocks within a bucket group →
    (doc_ids, tfs, dls), doc_ids sorted ascending.

    Blocks ARE doc-ordered within a segment (indexer.finalize), but
    applyInPandas group rows carry no order guarantee — the explicit
    first_doc sort below is what makes the documented sorted-output
    invariant true (wand.TermCursor sorts for the same reason)."""
    group = group.sort_values("first_doc")
    ids, tfs, dls = [], [], []
    for ids_b, tfs_b, dls_b, n, first in zip(
        group["doc_ids_delta"], group["tfs"], group["dls"],
        group["n_docs"], group["first_doc"],
    ):
        n = int(n)
        ids.append(codec.decode_doc_ids(ids_b, int(first), n))
        tfs.append(codec.decode_tfs(tfs_b, n))
        dls.append(codec.decode_dls(dls_b, n))
    return np.concatenate(ids), np.concatenate(tfs), np.concatenate(dls)


def matching_doc_ids(reader, terms: list[str], mode: str = "all") -> DataFrame | None:
    """Docs matching ``terms`` under ``mode``: ``all`` = conjunction
    (intersection of posting lists), ``any`` = disjunction (union).

    Returns (doc_bucket, doc_id); None when no doc can match (``all``
    with an OOV term, or ``any`` with every term OOV).  Same plan as
    phrase.conjunctive_doc_ids: pruned scan → one exchange → numpy
    per-bucket set algebra.
    """
    uniq = sorted(set(terms))
    dict_rows = reader._dictionary_rows(uniq)
    if mode == "all" and len(dict_rows) < len(uniq):
        return None
    live = sorted(dict_rows)
    if not live:
        return None
    blocks = reader.candidate_blocks(live, [b for _, b in dict_rows.values()])
    n_terms = len(live)
    conj = mode == "all"
    deleted_small, deleted_bc = tombstones_ref(reader)

    def combine(pdf: pd.DataFrame) -> pd.DataFrame:
        deleted = deleted_bc.value if deleted_bc is not None else deleted_small
        per_term = [
            _decode_term(g)[0] for _, g in pdf.groupby("term")
        ]
        if conj:
            if len(per_term) < n_terms:
                acc = np.empty(0, dtype=np.int64)
            else:
                per_term.sort(key=len)
                acc = per_term[0]
                for ids in per_term[1:]:
                    acc = np.intersect1d(acc, ids, assume_unique=True)
                    if acc.shape[0] == 0:
                        break
        else:
            acc = np.unique(np.concatenate(per_term))
        if deleted and acc.shape[0]:
            acc = acc[~np.isin(acc, np.fromiter(deleted, dtype=np.int64))]
        return pd.DataFrame(
            {
                "doc_bucket": np.full(acc.shape[0], int(pdf["doc_bucket"].iloc[0]), dtype=np.int32),
                "doc_id": acc,
            }
        )

    n_buckets = -(-int(reader.stats["n_docs"]) // int(reader.stats["doc_bucket_size"]))
    n_part = max(1, min(reader.spark.sparkContext.defaultParallelism, n_buckets))
    return (
        blocks.repartition(n_part, "doc_bucket")
        .groupBy("doc_bucket")
        .applyInPandas(combine, schema="doc_bucket int, doc_id long")
    )


def _clause_topk(
    by_term: dict,
    must_live: list[str],
    should_live: list[str],
    mnot_live: list[str],
    idf_b: dict[str, float],
    avgdl: float,
    k: int,
    deleted: frozenset | None,
) -> tuple[np.ndarray, np.ndarray] | None:
    """Per-bucket candidate algebra + BM25 for ONE clause set over the
    bucket's decoded terms (``by_term``: term → (doc_ids, tfs, dls), each
    sorted unique by doc_id).  Returns (doc_ids, scores) of the local
    top-k, or None when the clause matches nothing in this bucket."""
    if must_live:
        musts = [by_term[t][0] for t in must_live if t in by_term]
        if len(musts) < len(must_live):
            return None
        musts.sort(key=len)
        cand = musts[0]
        for ids in musts[1:]:
            cand = np.intersect1d(cand, ids, assume_unique=True)
            if cand.shape[0] == 0:
                break
    else:
        unions = [by_term[t][0] for t in should_live if t in by_term]
        if not unions:
            return None
        cand = np.unique(np.concatenate(unions))
    if cand.shape[0] and mnot_live:
        excl = [by_term[t][0] for t in mnot_live if t in by_term]
        if excl:
            cand = cand[~np.isin(cand, np.concatenate(excl), assume_unique=False)]
    if deleted and cand.shape[0]:
        cand = cand[~np.isin(cand, np.fromiter(deleted, dtype=np.int64))]
    if cand.shape[0] == 0:
        return None
    # BM25 over scoring terms, ascending term order, accumulated by
    # candidate position (cand and each posting list are sorted unique)
    scoring = sorted(set(must_live) | set(should_live))
    scores = np.zeros(cand.shape[0], dtype=np.float64)
    for term in scoring:
        got = by_term.get(term)
        if got is None:
            continue
        docs, tf_i, dl_i = got
        pos = np.searchsorted(cand, docs)
        pos_c = np.minimum(pos, cand.shape[0] - 1)
        mask = cand[pos_c] == docs
        if not mask.any():
            continue
        tf = tf_i[mask].astype(np.float64)
        dl = dl_i[mask].astype(np.float64)
        idf = idf_b[term]
        contrib = idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))
        scores[pos_c[mask]] += contrib
    keep = np.flatnonzero(scores > 0.0)
    if keep.shape[0] == 0:
        return None
    if keep.shape[0] > k:
        kth = -np.partition(-scores[keep], k - 1)[k - 1]
        keep = keep[scores[keep] >= kth]
    order = np.lexsort((cand[keep], -scores[keep]))[:k]
    chosen = keep[order]
    return cand[chosen], scores[chosen]


def boolean_batch(
    reader,
    clauses: list[tuple[str, str, str, str]],
    k: int = 10,
) -> DataFrame:
    """Batched filtered retrieval: ``clauses`` =
    [(query_id, must, should, must_not)] → (query_id, rank, doc_id, score).

    Serving is batched (BENCH.md): the batch shares ONE partition-pruned,
    term-pushed posting scan over the union of every clause's terms and
    ONE exchange sized to the true bucket count; per bucket each term
    decodes ONCE for the whole batch (head terms typically appear in many
    clauses), then the clause algebra loops queries — the exact shape of
    wand.batch_search.  Per-query semantics are unchanged from
    boolean_search: an OOV must term, or no live (must ∪ should) term,
    yields 0 rows for that query only.  The final merge is the
    hierarchical exact top-k (wand.ranked_topk).
    """
    from .wand import ranked_topk

    spark = reader.spark
    empty = "query_id string, rank int, doc_id bigint, score double"
    if k <= 0 or not clauses:
        return spark.createDataFrame([], empty)
    parsed: dict[str, tuple[list[str], list[str], list[str]]] = {}
    for qid, must, should, must_not in clauses:
        must_t = sorted(set(tokenize(must)))
        should_t = sorted(set(tokenize(should)))
        mnot_t = sorted(set(tokenize(must_not)) - set(must_t))
        if must_t or should_t:
            parsed[qid] = (must_t, should_t, mnot_t)
    if not parsed:
        return spark.createDataFrame([], empty)

    all_terms = sorted({t for c in parsed.values() for part in c for t in part})
    dict_rows = reader._dictionary_rows(all_terms)
    specs: dict[str, tuple[list[str], list[str], list[str]]] = {}
    needed: set[str] = set()
    for qid, (must_t, should_t, mnot_t) in parsed.items():
        if any(t not in dict_rows for t in must_t):
            continue  # OOV must term → this query matches nothing
        should_live = [t for t in should_t if t in dict_rows]
        mnot_live = [t for t in mnot_t if t in dict_rows]
        if not must_t and not should_live:
            continue
        specs[qid] = (must_t, should_live, mnot_live)
        needed.update(must_t, should_live, mnot_live)
    if not specs:
        return spark.createDataFrame([], empty)

    live = sorted(needed)
    blocks = reader.candidate_blocks(
        live, [dict_rows[t][1] for t in live]
    )
    avgdl = float(reader.stats["avgdl"])
    idf_b = {t: idf for t, (idf, _) in dict_rows.items() if t in needed}
    specs_b = dict(specs)
    deleted_small, deleted_bc = tombstones_ref(reader)

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        deleted = deleted_bc.value if deleted_bc is not None else deleted_small
        by_term = {t: _decode_term(g) for t, g in pdf.groupby("term")}
        outs = []
        for qid, (must_l, should_l, mnot_l) in specs_b.items():
            got = _clause_topk(
                by_term, must_l, should_l, mnot_l, idf_b, avgdl, k, deleted
            )
            if got is None:
                continue
            ids, scores = got
            out = pd.DataFrame({"doc_id": ids, "score": scores})
            out.insert(0, "query_id", qid)
            outs.append(out)
        if not outs:
            return pd.DataFrame(columns=["query_id", "doc_id", "score"])
        return pd.concat(outs, ignore_index=True)

    n_buckets = -(-int(reader.stats["n_docs"]) // int(reader.stats["doc_bucket_size"]))
    n_score = max(1, min(spark.sparkContext.defaultParallelism, max(1, n_buckets)))
    local = (
        blocks.repartition(n_score, "doc_bucket")
        .groupBy("doc_bucket")
        .applyInPandas(score_bucket, schema="query_id string, " + _EMPTY_SCHEMA)
    )
    return ranked_topk(local, k, n_buckets)


def boolean_search(
    reader,
    must: str = "",
    should: str = "",
    must_not: str = "",
    k: int = 10,
) -> DataFrame:
    """Filtered BM25 top-k: (doc_id, score) under (score DESC, doc_id ASC).

    A doc matches iff it contains ALL must terms and NO must_not term;
    with an empty must clause it matches iff it contains ≥1 should term.
    Score = BM25 over the distinct (must ∪ should) terms present.
    Single-clause form of :func:`boolean_batch` (same plan, one query).
    """
    return (
        boolean_batch(reader, [("q", must, should, must_not)], k)
        .orderBy("rank")
        .select("doc_id", "score")
    )


def facet_counts(
    reader,
    query_text: str,
    facet: str = "role",
    k: int = 10,
    mode: str = "any",
) -> DataFrame:
    """Facet the query's match set: (facet_value, n_docs) top-k by
    (n_docs DESC, facet_value ASC).

    Plan: index-driven match set (matching_doc_ids — never a corpus text
    scan) → broadcast-joined against the doc source pruned to the
    candidate units → hash-aggregate on the facet column.  One pruned
    postings scan + one pruned docs scan + one tiny aggregate.
    """
    spark = reader.spark
    terms = tokenize(query_text)
    empty = "facet_value string, n_docs bigint"
    if not terms:
        return spark.createDataFrame([], empty)
    ids = matching_doc_ids(reader, terms, mode=mode)
    if ids is None:
        return spark.createDataFrame([], empty)
    ids = ids.cache()
    try:
        from .phrase import BROADCAST_CANDIDATES_MAX, MAX_BUCKET_LIST

        per_bucket = (
            ids.groupBy("doc_bucket").count().limit(MAX_BUCKET_LIST + 1).collect()
        )
        if not per_bucket:
            return spark.createDataFrame([], empty)
        # past the cap the bucket list prunes nothing and would be
        # driver-sized (head-only queries touch ~every bucket) — scan
        # unpruned; broadcast is gated on MATCH rows, not bucket count
        capped = len(per_bucket) > MAX_BUCKET_LIST
        n_match = None if capped else sum(int(r["count"]) for r in per_bucket)
        buckets = None if capped else [int(r["doc_bucket"]) for r in per_bucket]
        docs = reader.doc_source(buckets=buckets).select("doc_id", facet)
        match_ids = ids.select("doc_id")
        if n_match is not None and n_match <= BROADCAST_CANDIDATES_MAX:
            match_ids = F.broadcast(match_ids)
        out = (
            docs.join(match_ids, "doc_id")
            .groupBy(F.col(facet).cast("string").alias("facet_value"))
            .agg(F.count("*").cast("bigint").alias("n_docs"))
            .orderBy(F.desc("n_docs"), F.asc_nulls_last("facet_value"))
            .limit(k)
        )
        rows = out.collect()
        return (
            spark.createDataFrame(rows, schema=out.schema)
            if rows
            else spark.createDataFrame([], empty)
        )
    finally:
        ids.unpersist()

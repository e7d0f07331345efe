"""Persisted IVF (inverted-file) ANN index — the coarse-quantizer
alternative to the sign-LSH path (operators/ann_index.py).

IVF-flat, Spark-first:

- **Train**: k-means on a deterministic hash-strided sample
  (``h32(vec_id) % stride == 0``, bounded at ``nlist × 40`` rows — a
  pruned scan, not a full collect; corpus-representative even when vec_id
  correlates with source/time), iterated a fixed number of rounds in
  numpy on the driver.  Sample-fit is the standard IVF recipe (the
  quantizer needs the distribution's shape, not every row); the pinned
  hash/order/rounds make the centroids bit-reproducible — the DuckDB
  oracle re-derives them through the same pure construction.
- **Assign**: one ``mapInPandas`` pass — a single matmul per Arrow batch
  against the broadcast centroid matrix — writes the corpus partitioned by
  ``centroid`` (same pruned-layout story as postings/term_bucket and
  LSH/(table_id, bucket)).
- **Query**: rank centroids by distance to the query driver-side, scan the
  ``nprobe`` nearest partitions only (partition pruning), exact-cosine
  rerank of candidates, window top-k.

Scaling: ``nlist`` auto-sizes to ≈√n (clamped), so probed fraction per
query ≈ ``nprobe/√n`` and per-partition candidate count ≈ √n — the classic
IVF balance.  vs sign-LSH: data-adaptive cells (better recall/cost on
clustered corpora) at the price of a training step; both layouts serve the
same exact-rerank downstream and are cross-checked against the brute
scorer in tests.

The reference's exact brute scan (/root/reference/index.go:63-81) remains
the verification baseline; approximate-by-design, recall pinned in
tests/test_pipeline_ops.py.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import FORMAT_VERSION
from ..functions.hashing import h32_col, h32_py
from ..functions.npfold import fold_dot, fold_norm
from .similarity import rerank_topk

KMEANS_ROUNDS = 12
SAMPLE_PER_CENTROID = 40


def sample_stride(n: int, n_sample: int) -> int:
    """Deterministic hash-sample stride: keep rows with
    h32(vec_id) % stride == 0 — expected ≥ n_sample rows at any n."""
    return max(1, n // max(1, n_sample))


def auto_nlist(n: int) -> int:
    return max(4, min(4096, int(math.sqrt(max(1, n)))))


def _kmeans_fit(sample: np.ndarray, nlist: int, rounds: int = KMEANS_ROUNDS) -> np.ndarray:
    """Deterministic Lloyd iterations on L2-normalized vectors (spherical
    k-means: cosine cells).  Init = evenly strided sample rows (sorted by
    vec_id upstream), no RNG anywhere."""
    S = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    idx = np.linspace(0, len(S) - 1, nlist).astype(np.int64)
    C = S[idx].copy()
    for _ in range(rounds):
        assign = np.argmax(S @ C.T, axis=1)
        for c in range(nlist):
            m = assign == c
            if m.any():
                v = S[m].mean(axis=0)
                C[c] = v / max(np.linalg.norm(v), 1e-12)
    return C


def centroids_py(rows: list[tuple[int, list[float]]], nlist: int | None = None) -> np.ndarray:
    """(vec_id, embedding) rows → the centroid matrix build_ivf_index
    would train, WITHOUT Spark — the oracle-side twin: same hash-strided
    sample rule (h32_py ≡ h32_col by the pinned spec, functions/hashing)
    and the same fixed-round _kmeans_fit, so the result is bit-identical.
    This is what lets the driver gate pin an exact DuckDB oracle on the
    IVF entry (oracle_sql_pipeline.ivf_topk_sql)."""
    n = len(rows)
    if n == 0:
        raise ValueError("empty embeddings input")
    if nlist is None:
        nlist = auto_nlist(n)
    n_sample = min(n, nlist * SAMPLE_PER_CENTROID)
    stride = sample_stride(n, n_sample)
    sel = [
        list(emb)
        for vid, emb in sorted(rows, key=lambda r: r[0])
        if h32_py(str(int(vid))) % stride == 0
    ][:n_sample]
    return _kmeans_fit(np.asarray(sel, dtype=np.float64), nlist)


def build_ivf_index(
    spark: SparkSession,
    emb: DataFrame,
    root: str,
    nlist: int | None = None,
) -> dict:
    """Materialize the centroid-partitioned layout under ``root``."""
    first = emb.select(F.size("embedding").alias("d")).first()
    if first is None:
        raise ValueError("empty embeddings input")
    dim = int(first["d"])
    n = emb.count()
    if nlist is None:
        nlist = auto_nlist(n)
    n_sample = min(n, nlist * SAMPLE_PER_CENTROID)
    # corpus-representative deterministic sample: hash-strided on vec_id
    # (lowest-vec_id rows would bias the quantizer when vec_id correlates
    # with source/time), bounded at n_sample rows in vec_id order
    stride = sample_stride(n, n_sample)
    sample = np.asarray(
        [
            r["embedding"]
            for r in (
                emb.filter(F.pmod(h32_col(F.col("vec_id")), F.lit(stride)) == 0)
                .orderBy("vec_id")
                .limit(n_sample)
                .collect()
            )
        ],
        dtype=np.float64,
    )
    C = _kmeans_fit(sample, nlist)

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            # fold-order norms/projections: bit-identical to the JVM fold
            # and the DuckDB oracle (functions/npfold.py); argmax over raw
            # dot — positive scaling by 1/nrm cannot change the winner, and
            # skipping the divide keeps the float path identical to SQL's
            nrm = np.maximum(fold_norm(E), 1e-12)
            cent = np.argmax(fold_dot(E, C), axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "centroid": cent.astype(np.int32),
                    "embedding": pdf["embedding"],
                    "nrm": nrm,
                }
            )

    schema = "vec_id bigint, centroid int, embedding array<float>, nrm double"
    out = emb.select("vec_id", "embedding").mapInPandas(assign, schema=schema)
    n_out = min(spark.sparkContext.defaultParallelism * 4, max(2, nlist))
    (
        out.repartition(n_out, "centroid")
        .write.mode("overwrite")
        .partitionBy("centroid")
        .parquet(os.path.join(root, "cells"))
    )
    meta = {
        "format_version": FORMAT_VERSION,
        "dim": dim,
        "n": n,
        "nlist": nlist,
        "kmeans_rounds": KMEANS_ROUNDS,
        "centroids": [[float(x) for x in row] for row in C],
    }
    tmp = os.path.join(root, "_ivf_meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(root, "_ivf_meta.json"))
    return {k: meta[k] for k in ("format_version", "dim", "n", "nlist")}


class IvfIndex:
    """Query-side handle (snapshot at open, like LshIndex/IndexReader)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        with open(os.path.join(root, "_ivf_meta.json")) as f:
            meta = json.load(f)
        if meta["format_version"] != FORMAT_VERSION:
            raise ValueError(
                f"ivf index format {meta['format_version']} != engine {FORMAT_VERSION}"
            )
        self.meta = meta
        self._C = np.asarray(meta["centroids"], dtype=np.float64)
        base = os.path.join(root, "cells")
        self._df = spark.read.option("basePath", base).parquet(base)

    def topk(
        self,
        queries: list[tuple[int, list[float]]],
        k: int = 10,
        nprobe: int = 8,
        deleted=None,
    ) -> DataFrame:
        """Approximate top-k: scan the ``nprobe`` nearest centroid cells
        per query (partition pruning), exact-cosine rerank.  Output schema
        and (cos_micro DESC, vec_id ASC) order match ann_brute_topk.
        ``deleted`` vec_ids are masked from the candidates before ranking
        (same serve-time tombstone contract as LshIndex.topk)."""
        if k <= 0 or not queries:
            return self.spark.createDataFrame(
                [], "query_id bigint, vec_id bigint, rank int, cos_micro bigint"
            )
        Q = np.asarray([v for _, v in queries], dtype=np.float64)
        qn = np.maximum(fold_norm(Q), 1e-12)
        sims = fold_dot(Q, self._C)  # raw dot: same probe ORDER as q·c/|q|
        nprobe = min(nprobe, self.meta["nlist"])
        probe_rows = []
        probed: set[int] = set()
        for qi, (qid, vec) in enumerate(queries):
            cells = np.argsort(-sims[qi], kind="stable")[:nprobe]
            probed.update(int(c) for c in cells)
            for c in cells:
                probe_rows.append(
                    (int(qid), int(c), [float(x) for x in vec], float(qn[qi]))
                )
        probes = self.spark.createDataFrame(
            probe_rows, "query_id bigint, centroid int, q_emb array<double>, q_nrm double"
        )
        corpus = self._df.filter(F.col("centroid").isin(sorted(probed)))
        if deleted:
            from .similarity import exclude_ids

            corpus = exclude_ids(corpus, "vec_id", deleted)
        cand = (
            corpus.join(F.broadcast(probes), "centroid")
            .dropDuplicates(["query_id", "vec_id"])
        )
        # fold-order Arrow kernel rerank (similarity.rerank_topk) — bit-
        # identical to the interpreted JVM fold it replaces, ~10× faster
        # on candidate sets beyond a few thousand rows
        return rerank_topk(cand, k)

    def topk_for_ids(
        self, query_ids: list[int], k: int = 10, nprobe: int = 8, deleted=None
    ) -> DataFrame:
        live = [q for q in query_ids if not (deleted and int(q) in deleted)]
        rows = (
            self._df.filter(F.col("vec_id").isin(live))
            .select("vec_id", "embedding")
            .collect()
        )
        vecs = {int(r["vec_id"]): list(r["embedding"]) for r in rows}
        return self.topk(
            [(q, vecs[q]) for q in live if q in vecs], k, nprobe, deleted=deleted
        )

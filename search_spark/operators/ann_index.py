"""Persisted multi-probe sign-LSH ANN index over embeddings — the 100 TB
serving path for approximate nearest-neighbor top-k.

The reference's search is an exact brute-force scan of every vector
(/root/reference/index.go:63-81) and its README caps the design at <100k
entries for exactly that reason (/root/reference/README.md:30).  This
module is the scale path that replaces the O(N·d) scan:

- **Build** (``build_lsh_index``): one pass over the embeddings table in
  ``mapInPandas`` — a single numpy matmul per Arrow batch projects every
  vector onto ``tables × planes`` deterministic ±1 hyperplanes (derived
  from the pinned hash spec, functions/hashing.py) and packs the signs
  into a bucket id per table.  Output is written **partitioned by
  (table_id, bucket)** with a versioned JSON meta sidecar — the same
  "pruned layout + version gate" story as the posting store
  (/root/reference/index_codec.go:56-58).
- **Plane-count auto-scaling**: ``planes = max(4, ceil(log2(n / 256)))``,
  so a bucket holds ~256 vectors at ANY corpus size — 16 buckets/table at
  5k vectors, 2^22 buckets/table at 10^9.  A query's scanned fraction is
  ``probes × 2^-planes`` per table, i.e. constant work per query as the
  corpus grows (the ephemeral 4-plane variant in operators/similarity.py
  rescanned ~6% of the corpus per query regardless of size).
- **Query** (``LshIndex.topk``): buckets for the query vectors are
  computed driver-side with the SAME numpy routine as the build (bit-
  identical), expanded to all buckets within Hamming radius ``radius``
  (multi-probe LSH — recall of many tables at the candidate cost of few),
  and the scan is pruned by PARTITION FILTERS on (table_id, bucket)
  before a broadcast join + exact-cosine rerank.  No shuffle of the
  corpus at query time.

Exactness contract: approximate by design; recall@k vs the brute-force
scorer is pinned in tests/test_pipeline_ops.py (the brute path,
operators/similarity.py:ann_brute_topk, stays the verification tool).
"""

from __future__ import annotations

import json
import math
import os
from functools import reduce
from itertools import combinations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import FORMAT_VERSION
from ..functions.hashing import HASH_SPEC_VERSION, h32_py
from ..functions.npfold import fold_dot, fold_norm
from .similarity import cosine_col

#: default hash-table count (multi-table LSH: union of probed buckets)
LSH_INDEX_TABLES = 8
#: target vectors per bucket — drives plane-count auto-scaling
TARGET_BUCKET_SIZE = 256


def plane_matrix(dim: int, tables: int, planes: int) -> np.ndarray:
    """(tables, planes, dim) float64 ±1 hyperplanes from the pinned hash
    spec — same derivation as similarity._plane_signs, so ephemeral and
    persisted variants agree on plane geometry."""
    P = np.empty((tables, planes, dim), dtype=np.float64)
    for t in range(tables):
        for p in range(planes):
            P[t, p] = [
                1.0 if h32_py(f"lshplane/{t}/{p}/{i}") & 1 else -1.0 for i in range(dim)
            ]
    return P


def buckets_np(E: np.ndarray, P: np.ndarray) -> np.ndarray:
    """(tables, n) int64 bucket ids: bit p of table t = sign(E · P[t,p]).

    Projections use the SEQUENTIAL-FOLD kernel (functions/npfold.py), not a
    BLAS matmul: the sign test sits at a float boundary, and fold order is
    what makes build, query, the ephemeral JVM-fold variant
    (similarity.lsh_bucket_col), and the DuckDB oracle agree bit-for-bit."""
    tables, planes, _ = P.shape
    out = np.empty((tables, E.shape[0]), dtype=np.int64)
    w = (1 << np.arange(planes, dtype=np.int64))
    for t in range(tables):
        out[t] = (fold_dot(E, P[t]) > 0) @ w
    return out


def auto_planes(n: int, target_bucket: int = TARGET_BUCKET_SIZE) -> int:
    """Plane count so that 2^planes ≈ n / target_bucket (clamped 4..24)."""
    return max(4, min(24, math.ceil(math.log2(max(1.0, n / target_bucket)))))


def _probe_masks(planes: int, radius: int) -> list[int]:
    """XOR masks for all buckets within Hamming distance ``radius``."""
    masks = [0]
    for r in range(1, radius + 1):
        for bits in combinations(range(planes), r):
            masks.append(sum(1 << b for b in bits))
    return masks


def build_lsh_index(
    spark: SparkSession,
    emb: DataFrame,
    root: str,
    tables: int = LSH_INDEX_TABLES,
    planes: int | None = None,
    target_bucket: int = TARGET_BUCKET_SIZE,
) -> dict:
    """Materialize the bucketed layout under ``root``; returns the meta.

    ``emb`` must have (vec_id BIGINT, embedding ARRAY<FLOAT>).  Rows are
    replicated ``tables`` times (one per hash table) and written
    partitioned by (table_id, bucket) so queries prune to their probed
    partitions.  An explicit repartition on the partition keys bounds the
    file count to one writer task per populated (table_id, bucket) slice.
    """
    first = emb.select(F.size("embedding").alias("d")).first()
    if first is None:
        raise ValueError("empty embeddings input")
    dim = int(first["d"])
    n = emb.count()
    if planes is None:
        planes = auto_planes(n, target_bucket)
    P = plane_matrix(dim, tables, planes)

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            nrm = fold_norm(E)  # fold order matches norm_col / the oracle
            B = buckets_np(E, P)
            frames = []
            for t in range(tables):
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": pdf["vec_id"].to_numpy(),
                            "table_id": np.int32(t),
                            "bucket": B[t],
                            "embedding": pdf["embedding"],
                            "nrm": nrm,
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    schema = (
        "vec_id bigint, table_id int, bucket bigint, "
        "embedding array<float>, nrm double"
    )
    bucketed = emb.select("vec_id", "embedding").mapInPandas(assign, schema=schema)
    n_out = min(
        spark.sparkContext.defaultParallelism * 4, max(2, tables * (1 << planes))
    )
    (
        bucketed.repartition(n_out, "table_id", "bucket")
        .write.mode("overwrite")
        .partitionBy("table_id", "bucket")
        .parquet(os.path.join(root, "buckets"))
    )
    meta = {
        "format_version": FORMAT_VERSION,
        "hash_spec_version": HASH_SPEC_VERSION,
        "dim": dim,
        "n": n,
        "tables": tables,
        "planes": planes,
    }
    tmp = os.path.join(root, "_lsh_meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, os.path.join(root, "_lsh_meta.json"))
    return meta


class LshIndex:
    """Query-side handle on a persisted LSH layout (snapshot at open, like
    operators/wand.IndexReader)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        with open(os.path.join(root, "_lsh_meta.json")) as f:
            self.meta = json.load(f)
        if self.meta["format_version"] != FORMAT_VERSION:
            raise ValueError(
                f"lsh index format {self.meta['format_version']} != engine {FORMAT_VERSION}"
            )
        if self.meta["hash_spec_version"] != HASH_SPEC_VERSION:
            raise ValueError("lsh index built under a different hash spec")
        self._P = plane_matrix(self.meta["dim"], self.meta["tables"], self.meta["planes"])
        base = os.path.join(root, "buckets")
        self._df = spark.read.option("basePath", base).parquet(base)

    def topk(
        self,
        queries: list[tuple[int, list[float]]],
        k: int = 10,
        radius: int = 1,
        deleted=None,
    ) -> DataFrame:
        """Approximate top-k for explicit (query_id, vector) pairs.

        Output (query_id, vec_id, rank, cos_micro) — same schema and
        (cos_micro DESC, vec_id ASC) total order as ann_brute_topk.
        ``deleted`` (tombstoned vec_ids, e.g. the text store's
        ``reader.deleted``) are masked out of the candidate set BEFORE
        ranking — the persisted layout is append-only like the
        reference's (/root/reference/index.go:44-50), so logical deletes
        must be honored at serve time until the index is rebuilt (the
        same contract as the lexical scorers, operators/wand.py).
        """
        if k <= 0 or not queries:
            return self.spark.createDataFrame(
                [], "query_id bigint, vec_id bigint, rank int, cos_micro bigint"
            )
        tables, planes = self.meta["tables"], self.meta["planes"]
        Q = np.asarray([v for _, v in queries], dtype=np.float64)
        qn = fold_norm(Q)
        B = buckets_np(Q, self._P)
        masks = _probe_masks(planes, radius)

        probe_rows = []
        for qi, (qid, vec) in enumerate(queries):
            for t in range(tables):
                for m in masks:
                    probe_rows.append(
                        (int(qid), t, int(B[t, qi]) ^ m, [float(x) for x in vec], float(qn[qi]))
                    )
        probes = self.spark.createDataFrame(
            probe_rows,
            "query_id bigint, table_id int, bucket bigint, q_emb array<double>, q_nrm double",
        )

        # partition pruning: OR of per-table In-filters on the partition
        # columns — the scan touches only probed (table_id, bucket) dirs
        by_table: dict[int, set[int]] = {}
        for _, t, b, _, _ in probe_rows:
            by_table.setdefault(t, set()).add(b)
        pred = reduce(
            lambda a, b: a | b,
            [
                (F.col("table_id") == t) & F.col("bucket").isin(sorted(bs))
                for t, bs in by_table.items()
            ],
        )
        corpus = self._df.filter(pred)
        if deleted:
            from .similarity import exclude_ids

            corpus = exclude_ids(corpus, "vec_id", deleted)
        cand = (
            corpus.join(F.broadcast(probes), ["table_id", "bucket"])
            .dropDuplicates(["query_id", "vec_id"])
        )
        scored = cand.select(
            "query_id",
            "vec_id",
            F.round(
                cosine_col(F.col("q_emb"), F.col("embedding"), F.col("q_nrm"), F.col("nrm"))
                * 1e6
            )
            .cast("bigint")
            .alias("cos_micro"),
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("cos_micro"), F.asc("vec_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select("query_id", "vec_id", "rank", "cos_micro")
        )

    def topk_for_ids(
        self, query_ids: list[int], k: int = 10, radius: int = 1, deleted=None
    ) -> DataFrame:
        """Convenience: queries are rows of the indexed corpus itself.

        Fetches the query vectors from the table_id=0 slice (one pruned
        scan with a vec_id pushdown).  Serving systems that hold the query
        vector should call :meth:`topk` directly and skip this job.
        Deleted ids are unservable as queries too (they return no rows)."""
        live = [q for q in query_ids if not (deleted and int(q) in deleted)]
        rows = (
            self._df.filter((F.col("table_id") == 0) & F.col("vec_id").isin(live))
            .select("vec_id", "embedding")
            .collect()
        )
        vecs = {int(r["vec_id"]): list(r["embedding"]) for r in rows}
        return self.topk(
            [(q, vecs[q]) for q in live if q in vecs], k, radius, deleted=deleted
        )

"""Near-dup clustering: connected components over a pair list, plus
keeper election — the step a training pipeline runs AFTER pair mining
(dedup.py / similarity.py) to decide which rows to drop.

Algorithm (default): **two-phase large-star/small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — each round is
a constant handful of uniform doc_id-keyed shuffles (two groupBy-min +
join stars plus dedup distincts) and converges in O(log n) rounds on ANY
graph shape, so a pathological dup chain (diameter ~ corpus size: think a
boilerplate page edited one token per crawl snapshot) costs ~40 rounds at
10^12 docs instead of 10^12.  Round state is just the edge list, persisted
and lineage-truncated with ``localCheckpoint`` so the plan stays O(1) deep.

The earlier MIN-LABEL PROPAGATION form (one shuffle per round, rounds =
graph diameter) is kept as :func:`dup_clusters_propagation` — it is the
readable scalar twin the star algorithm is equivalence-tested against
(tests/test_pipeline_ops.py), the same doctrine as the reference's
SIMD-vs-scalar kernel tests (/root/reference/internal/cosine/simd/
simd_test.go:52-74) and this engine's npfold/JVM-fold twins.

The reference has no multi-document operators at all (single-container
index, /root/reference/index.go:26-29); this extends the engine per the
training-pipeline brief.  Determinism: cluster_id = min(doc_id) of the
component — a pure function of the pair list (either algorithm, any
execution order), so the DuckDB oracle reproduces it with a recursive CTE
(oracle_sql_pipeline.keeper_assignment_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: two-phase rounds before declaring the input pathological; the bound is
#: O(log^2 n) worst case / ~log n observed, so 50 covers any feasible corpus
MAX_CC_ITERS = 50


def _symmetrize(e: DataFrame) -> DataFrame:
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def _large_star(sym: DataFrame) -> DataFrame:
    """For each node u: every strictly-larger neighbor v re-attaches to
    m = min(neighbors(u) ∪ {u}).  Output oriented src > dst."""
    mins = sym.groupBy("src").agg(F.min("dst").alias("mn"))
    mins = mins.select("src", F.least("mn", F.col("src")).alias("m"))
    return (
        sym.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Input oriented src > dst.  For each node u: all of u's smaller
    neighbors AND u itself re-attach to m = min(smaller neighbors).
    Output stays oriented src > dst."""
    mins = e.groupBy("src").agg(F.min("dst").alias("m"))
    nb = e.join(mins, "src").select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    self_e = mins.select("src", F.col("m").alias("dst"))
    return (
        nb.unionByName(self_e).filter(F.col("src") != F.col("dst")).distinct()
    )


def dup_clusters(pairs: DataFrame, max_iters: int = MAX_CC_ITERS) -> DataFrame:
    """(a_id, b_id) near-dup pairs → (doc_id, cluster_id).

    Only documents that appear in at least one pair are emitted (documents
    in no pair are their own singleton cluster by definition — callers
    needing them add ``cluster_id = doc_id`` rows back, as
    :func:`keeper_assignment` does).  cluster_id is the component's
    minimum doc_id.
    """
    # canonical undirected edge set, oriented src > dst, self-loops dropped
    edges = (
        pairs.filter(F.col("a_id") != F.col("b_id"))
        .select(
            F.greatest("a_id", "b_id").alias("src"),
            F.least("a_id", "b_id").alias("dst"),
        )
        .distinct()
        .localCheckpoint()
    )
    # vertices that only ever appear as a component min (or in self-pairs)
    # still need a label row; track the full vertex set once
    verts = (
        pairs.select(F.col("a_id").alias("doc_id"))
        .unionByName(pairs.select(F.col("b_id").alias("doc_id")))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iters):
        nxt = _small_star(_large_star(_symmetrize(edges))).localCheckpoint()
        n_nxt = nxt.count()
        converged = (
            n_nxt == edges.count() and nxt.exceptAll(edges).count() == 0
        )
        edges = nxt
        if converged:
            # star graphs now: every non-min vertex points at its
            # component min; min vertices label themselves
            labels = (
                edges.select(
                    F.col("src").alias("doc_id"), F.col("dst").alias("cluster_id")
                )
                .unionByName(verts.withColumn("cluster_id", F.col("doc_id")))
                .groupBy("doc_id")
                .agg(F.min("cluster_id").alias("cluster_id"))
            )
            return labels
    raise RuntimeError(
        f"dup_clusters did not converge in {max_iters} two-phase rounds — "
        "that exceeds the O(log^2 n) bound for any feasible input; "
        "inspect the pair list for corruption"
    )


def dup_clusters_propagation(pairs: DataFrame, max_iters: int = MAX_CC_ITERS) -> DataFrame:
    """Scalar twin of :func:`dup_clusters`: iterative min-label propagation
    (one shuffle per round, rounds = graph diameter).  Same output by
    construction; kept for cross-algorithm equivalence tests.  Prefer
    :func:`dup_clusters` — diameter-bound rounds make this form unusable
    on chain-shaped components at scale."""
    edges = (
        pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
        .unionByName(pairs.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst")))
        .distinct()
    )
    edges = edges.localCheckpoint()
    # localCheckpoint per round: labels feeds the next plan TWICE (neighbor
    # join + union), so without lineage truncation the analyzed tree doubles
    # every round and Catalyst OOMs on deep graphs long before the data does
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        # min over (own label, every neighbor's label)
        neighbor = (
            edges.join(labels.withColumnRenamed("doc_id", "dst"), "dst")
            .select(F.col("src").alias("doc_id"), "cluster_id")
        )
        new_labels = (
            labels.unionByName(neighbor)
            .groupBy("doc_id")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"dup_clusters_propagation did not converge in {max_iters} rounds — "
        "a component with pathological diameter; use dup_clusters (two-phase)"
    )


def keeper_assignment(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Full-corpus dedup verdict: (doc_id, cluster_id, is_dup).

    keeper = the cluster's minimum doc_id (the deterministic "first seen"
    rule exact_dedup already uses); documents in no near-dup pair are
    singleton keepers.  One broadcast-able join back to the corpus — the
    cluster table is |clustered docs| rows, tiny relative to the corpus.
    """
    clustered = dup_clusters(pairs)
    out = (
        docs.select("doc_id")
        .join(clustered, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        )
        .withColumn("is_dup", F.col("doc_id") != F.col("cluster_id"))
    )
    return out

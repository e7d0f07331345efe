"""Near-dup clustering: connected components over a pair list, plus
keeper election — the step a training pipeline runs AFTER pair mining
(dedup.py / similarity.py) to decide which rows to drop.

Algorithm: iterative MIN-LABEL PROPAGATION on the undirected pair graph —
each vertex repeatedly adopts the minimum label among itself and its
neighbors until a fixpoint.  Each round is one shuffle join keyed on
doc_id (uniform); rounds needed = graph diameter, and near-dup components
are shallow by construction (every member collides with a shared
centroid-ish text, so diameters are small; ``max_iters`` bounds the worst
case and the operator raises rather than return a half-converged
labeling).  At 100 TB scale this is the standard Spark CC recipe; the
two-phase large-star/small-star optimization drops in here if components
with large diameters ever appear.

The reference has no multi-document operators at all (single-container
index, /root/reference/index.go:26-29); this extends the engine per the
training-pipeline brief.  Determinism: cluster_id = min(doc_id) of the
component — a pure function of the pair list, so the DuckDB oracle can
reproduce it with a recursive CTE (oracle_sql_pipeline.dup_clusters_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: propagation rounds before declaring the component pathological
MAX_CC_ITERS = 50


def dup_clusters(pairs: DataFrame, max_iters: int = MAX_CC_ITERS) -> DataFrame:
    """(a_id, b_id) near-dup pairs → (doc_id, cluster_id).

    Only documents that appear in at least one pair are emitted (documents
    in no pair are their own singleton cluster by definition — callers
    needing them add ``cluster_id = doc_id`` rows back, as
    :func:`keeper_assignment` does).  cluster_id is the component's
    minimum doc_id.
    """
    edges = (
        pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
        .unionByName(pairs.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst")))
        .distinct()
    )
    labels = edges.select(F.col("src").alias("doc_id")).distinct().withColumn(
        "cluster_id", F.col("doc_id")
    )
    labels.persist()
    labels.count()
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
        )
        new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            return labels
    labels.unpersist()
    raise RuntimeError(
        f"dup_clusters did not converge in {max_iters} rounds — a component "
        "with pathological diameter; raise max_iters or switch this corpus "
        "to the large-star/small-star variant"
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

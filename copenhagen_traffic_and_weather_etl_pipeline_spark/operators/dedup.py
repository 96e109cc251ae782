"""Dedup cluster resolution: candidate pairs -> connected components ->
one keeper per cluster (north-star extension; the reference has no dedup
surface — its closest primitive is the append-only snapshot overwrite,
README.md:84).

Pair generators (ngram-jaccard, MinHash-LSH) emit edges; an actual dedup
job needs a *decision* per document. Components are computed by iterative
min-label propagation expressed in DataFrame ops:

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated to fixpoint. Each round is one shuffle (join + groupBy-min);
rounds needed = component diameter. Near-dup clusters are small and
dense (diameter 2-4 in practice), so this converges in a handful of
rounds — for adversarial chain-shaped graphs at web scale, swap in the
large-star/small-star alternating algorithm (same join/agg primitives,
O(log n) rounds). ``localCheckpoint`` truncates the growing lineage each
round so the plan stays bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_clusters(
    pairs: DataFrame,
    vertices: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components over candidate pairs; cluster id = min member.

    ``pairs``: columns ``d1``, ``d2`` (undirected edges).
    ``vertices``: one row per document (``id_col``) — singletons become
    their own cluster, so the output is a total keep/drop decision:
    keep where ``doc_id == cluster_id``.

    Returns (``id_col``, ``cluster_id``).
    """
    edges = pairs.select(
        F.col("d1").alias("src"), F.col("d2").alias("dst")
    ).union(pairs.select(F.col("d2").alias("src"), F.col("d1").alias("dst")))
    edges = edges.localCheckpoint()

    labels = vertices.select(
        F.col(id_col).alias("node"), F.col(id_col).cast("long").alias("label")
    ).localCheckpoint()

    for _ in range(max_iter):
        # Propagate each node's label to its neighbors, then take the min
        # of own + incoming labels. One shuffle per round.
        incoming = edges.join(labels, edges["src"] == labels["node"]).select(
            F.col("dst").alias("node"), F.col("label")
        )
        new_labels = (
            labels.union(incoming)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
        )
        labels = new_labels
        if changed.isEmpty():
            break

    return labels.select(
        F.col("node").alias(id_col), F.col("label").alias("cluster_id")
    )


def keep_list(clusters: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The dedup decision: keep the cluster minimum, drop the rest."""
    return clusters.select(
        id_col,
        "cluster_id",
        (F.col(id_col) == F.col("cluster_id")).alias("keep"),
    )


__all__ = ["resolve_clusters", "keep_list"]

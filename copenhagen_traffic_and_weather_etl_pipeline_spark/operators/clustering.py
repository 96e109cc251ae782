"""Iterative clustering (Lloyd's k-means) as a DataFrame loop — the
canonical iterative algorithm a training-data pipeline runs over an
embedding column (no analogue in the reference; SURVEY north-star
extension alongside dedup/similarity).

Spark-first shape, chosen for 100 TB:

- the MODEL (k x dim centroids) is tiny and lives on the driver; each
  iteration bakes it into the assignment expression as literals — the
  same role a broadcast variable plays, but visible to Catalyst so the
  whole assignment stage is one codegen'd projection;
- the DATA never collects: the per-iteration centroid update is
  ``posexplode(embedding) -> groupBy(cluster, pos).avg`` — a single
  shuffle bounded by k*dim groups, then a k*dim-row collect (the new
  model), independent of corpus size;
- every floating-point value that feeds a comparison is rounded first
  (distances to 6 dp, centroids to 6 dp after each update) so an
  independent engine replaying the same recipe lands on identical
  assignments — that is what makes the unrolled SQL oracle in
  workload/scale_queries.py an exact value check, not a smoke test.

Ties on the rounded distance break to the LOWEST cluster id (strict
``<`` while scanning cids in ascending order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sq_dist(vec: Column, centroid: list[float]) -> Column:
    """Rounded squared distance between an array column and a literal
    centroid — codegen'd zip_with/aggregate, no Python."""
    lit = F.expr("array(" + ", ".join(repr(v) for v in centroid) + ")")
    return F.round(
        F.aggregate(
            F.zip_with(
                vec, lit, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Add ``cluster`` (argmin of rounded squared distance, lowest-cid
    tiebreak) and ``dist`` columns. One narrow projection.

    The argmin is ``array_min`` over (d, cid) structs — struct ordering
    is lexicographic, so the minimum is exactly "lowest rounded d, ties
    to the lowest cid". This keeps the expression tree LINEAR in k: the
    previous when-chain re-embedded the running best at every step,
    doubling the tree per centroid (2^(k-1) copies of each _sq_dist —
    fine at k=4, a 30-second Catalyst planning stall at k=8).
    """
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    _sq_dist(F.col(vec_col), c).alias("d"),
                    F.lit(cid).alias("cid"),
                )
                for cid, c in enumerate(centroids)
            ]
        )
    )
    return df.withColumn("_best", best).select(
        "*",
        F.col("_best.cid").cast("bigint").alias("cluster"),
        F.col("_best.d").alias("dist"),
    ).drop("_best")


def kmeans_fit(
    df: DataFrame,
    k: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd iterations; returns the final centroids (rounded 6 dp).

    Deterministic init: the vectors of the ``k`` lowest ids, in id
    order. Empty clusters keep their previous centroid.
    """
    init = (
        df.orderBy(id_col)
        .limit(k)
        .select(F.transform(vec_col, lambda x: F.round(x.cast("double"), 6)).alias("v"))
        .collect()
    )
    centroids = [list(r["v"]) for r in init]
    dim = len(centroids[0])

    for _ in range(iters):
        assigned = assign_clusters(df, centroids, vec_col=vec_col)
        # Exact micro-unit centroid update: round(avg(x), 6) of an
        # order-dependent double sum can land a different double on each
        # engine and cross the rounding boundary (the hourly_tumbling
        # failure class). Quantizing inputs to 1e-6 BIGINTs makes the
        # sum exact and order-free; s and n are then bit-identical
        # integers in both engines, so round(s/n)/1e6 is deterministic.
        mic = F.round(F.col("x").cast("double") * 1000000).cast("long")
        means = (
            assigned.select("cluster", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(
                (F.round(F.sum(mic) / F.count(F.lit(1))) / 1000000.0).alias("m")
            )
            .collect()
        )
        by_cid: dict[int, list[float]] = {}
        for r in means:
            by_cid.setdefault(int(r["cluster"]), [0.0] * dim)[int(r["pos"])] = r["m"]
        centroids = [by_cid.get(cid, centroids[cid]) for cid in range(k)]
    return centroids


__all__ = ["assign_clusters", "kmeans_fit"]

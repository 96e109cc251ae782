"""Lloyd's k-means (operators/clustering.py): deterministic init,
convergence on separated clusters, lowest-cid tie-breaking."""

from __future__ import annotations

from copenhagen_traffic_and_weather_etl_pipeline_spark.operators.clustering import (
    assign_clusters,
    kmeans_fit,
)

SCHEMA = "vec_id long, embedding array<float>"


def test_kmeans_recovers_two_separated_clusters(spark):
    # Two tight clusters around (0,0) and (10,10); init takes vec_ids 0,1
    # (one from each cluster), so one iteration already separates them.
    rows = [
        (0, [0.0, 0.1]),
        (1, [10.0, 10.1]),
        (2, [0.1, 0.0]),
        (3, [9.9, 10.0]),
        (4, [0.2, 0.2]),
        (5, [10.2, 9.9]),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    centroids = kmeans_fit(df, k=2, iters=2)
    assigned = {
        r["vec_id"]: r["cluster"] for r in assign_clusters(df, centroids).collect()
    }
    assert assigned[0] == assigned[2] == assigned[4] == 0
    assert assigned[1] == assigned[3] == assigned[5] == 1
    # Converged centroids are the cluster means (rounded 6 dp).
    assert centroids[0] == [0.1, 0.1]
    assert [round(v, 4) for v in centroids[1]] == [10.0333, 10.0]


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # k=3 but only two distinct locations: the centroid seeded at vec_id 1
    # (same spot as vec_id 0's cluster mate) may end up owning no points
    # after reassignment; it must keep its previous centroid, not NaN out.
    rows = [
        (0, [0.0, 0.0]),
        (1, [0.0, 0.0]),
        (2, [5.0, 5.0]),
        (3, [5.0, 5.0]),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    centroids = kmeans_fit(df, k=3, iters=2)
    assert len(centroids) == 3
    assert all(len(c) == 2 and all(v == v for v in c) for c in centroids)  # no NaN


def test_assign_breaks_ties_to_lowest_cid(spark):
    df = spark.createDataFrame([(0, [1.0, 1.0])], SCHEMA)
    # Equidistant centroids -> rounded distances equal -> cluster 0 wins.
    out = assign_clusters(df, [[0.0, 0.0], [2.0, 2.0]]).collect()[0]
    assert out["cluster"] == 0

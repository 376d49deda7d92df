"""K-means (Lloyd) relational-plan tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from job_market_research_spark.ml.clustering import (
    assign_clusters,
    kmeans_iterate,
    update_centroids,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


def test_kmeans_separates_obvious_clusters(spark):
    # two tight blobs around (0,0) and (10,10); seeds one point in each
    rows = [(i, [0.0 + i * 0.01, 0.0]) for i in range(5)]
    rows += [(10 + i, [10.0 + i * 0.01, 10.0]) for i in range(5)]
    vecs = _vecs(spark, rows)
    seeds = vecs.filter(F.col("vec_id").isin(0, 10)).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    out = kmeans_iterate(vecs, seeds, iters=3).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cid, set()).add(r.vec_id)
    assert by_cluster[0] == {0, 1, 2, 3, 4}
    assert by_cluster[10] == {10, 11, 12, 13, 14}


def test_assignment_tiebreak_is_lowest_cid(spark):
    vecs = _vecs(spark, [(1, [5.0])])
    cents = spark.createDataFrame(
        [(3, [4.0]), (7, [6.0])], "cid long, cv array<double>"
    )  # equidistant → lowest cid wins
    assert assign_clusters(vecs, cents).first().cid == 3


def test_assignment_rejects_empty_centroids(spark):
    """array_min over an empty collected centroid array would silently
    assign every vector a null cid/dist (the pre-round-9 window shape
    returned zero rows) — the guard must raise instead."""
    import pytest

    vecs = _vecs(spark, [(1, [5.0])])
    empty = spark.createDataFrame([], "cid long, cv array<double>")
    with pytest.raises(Exception, match="empty centroids"):
        assign_clusters(vecs, empty).collect()


def test_centroid_update_partitioning_invariant(spark):
    rows = [(i, [float(i), float(i % 3)]) for i in range(60)]
    assigned = _vecs(spark, rows).withColumn("cid", F.col("vec_id") % 4)
    a = {
        r.cid: r.cv
        for r in update_centroids(assigned.repartition(2)).collect()
    }
    b = {
        r.cid: r.cv
        for r in update_centroids(assigned.repartition(17)).collect()
    }
    assert a == b  # decimal sums: partitioning cannot move a bit

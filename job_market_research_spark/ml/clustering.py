"""K-means over the embedding column (beyond-reference).

Lloyd's algorithm expressed as pure relational plans — the shape every
distributed k-means uses (Spark MLlib included): assignment is a
broadcast cross-join against the K centroids + per-vector argmin;
the update step is a per-(cluster, component) mean. K rows always
broadcast; the corpus never shuffles except by cluster id for the
update — at 100 TB each iteration is one scan + one keyed aggregation.

Cross-engine determinism (the interesting part):
- distances fold element-wise in array order on both engines and are
  rounded to 6 dp before the argmin, with a centroid-id tie-break, so
  a near-tie cannot flip between engines;
- the centroid UPDATE sums components in DECIMAL (exact,
  order-independent — Spark's partial aggregation order cannot change
  the result) and divides as double, per the registry's
  float-exactness policy.

The registry query runs TWO unrolled Lloyd iterations so the DuckDB
oracle can replay them as plain CTEs (assignment → update →
assignment); `kmeans_iterate` generalizes to N iterations with the
same per-round plan for real use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.ml.similarity import as_double_vec
from job_market_research_spark.registry import query

K_CLUSTERS = 8


def sq_dist(a: Column, b: Column) -> Column:
    """Squared L2 distance, rounded to 6 dp (argmin stability)."""
    return F.round(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )


def assign_clusters(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, v) × (cid, cv) → nearest cid per vector.

    Broadcast cross-join against K centroid rows + windowed argmin
    with (distance, cid) ordering — K is small by definition, so the
    assignment is map-side over however many corpus partitions exist.
    """
    d = vecs.crossJoin(F.broadcast(centroids)).withColumn(
        "dist", sq_dist(F.col("v"), F.col("cv"))
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "cid", "dist")
    )


def update_centroids(assigned: DataFrame) -> DataFrame:
    """Per-cluster component means in exact decimal: posexplode the
    vectors, SUM(DECIMAL)/COUNT per (cid, pos), rebuild the arrays.
    Order-independent, so both engines and any partitioning agree."""
    comps = assigned.select(
        "cid", F.posexplode("v").alias("pos", "x")
    ).groupBy("cid", "pos").agg(
        (
            F.sum(F.col("x").cast("decimal(28,14)")).cast("double")
            / F.count("*")
        ).alias("m")
    )
    return comps.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s.m
        ).alias("cv")
    )


def kmeans_iterate(
    vecs: DataFrame, centroids: DataFrame, iters: int = 2
) -> DataFrame:
    """N Lloyd rounds; returns the final assignment frame."""
    assigned = assign_clusters(vecs, centroids)
    for _ in range(iters - 1):
        assigned = assign_clusters(vecs, update_centroids(assigned))
    return assigned


@query(
    "ml_kmeans_lite",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    c0 AS (
      SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {K_CLUSTERS}
    ),
    d1 AS (
      SELECT e.vec_id, e.v, c0.cid,
             round(list_sum(list_transform(range(1, len(e.v) + 1),
                    i -> (e.v[i] - c0.cv[i]) * (e.v[i] - c0.cv[i]))), 6) AS dist,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                ORDER BY round(list_sum(list_transform(
                                  range(1, len(e.v) + 1),
                                  i -> (e.v[i] - c0.cv[i]) * (e.v[i] - c0.cv[i]))), 6),
                                c0.cid) AS rn
      FROM e, c0
    ),
    a1 AS (SELECT vec_id, v, cid FROM d1 WHERE rn = 1),
    posed AS (
      SELECT cid, v, unnest(range(1, len(v) + 1)) AS pos FROM a1
    ),
    comp AS (
      SELECT cid, pos,
             CAST(SUM(CAST(v[pos] AS DECIMAL(28,14))) AS DOUBLE) / COUNT(*) AS m
      FROM posed GROUP BY cid, pos
    ),
    c1 AS (
      SELECT cid, list(m ORDER BY pos) AS cv FROM comp GROUP BY cid
    ),
    d2 AS (
      SELECT e.vec_id, c1.cid,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                ORDER BY round(list_sum(list_transform(
                                  range(1, len(e.v) + 1),
                                  i -> (e.v[i] - c1.cv[i]) * (e.v[i] - c1.cv[i]))), 6),
                                c1.cid) AS rn
      FROM e, c1
    ),
    a2 AS (SELECT vec_id, cid FROM d2 WHERE rn = 1)
    SELECT cid AS cluster_id, COUNT(*) AS n_vecs,
           CAST(SUM(vec_id) AS BIGINT) AS vec_checksum
    FROM a2 GROUP BY 1 ORDER BY 1
    """,
)
def q_ml_kmeans_lite(spark, sf_dir: str) -> DataFrame:
    """Two unrolled Lloyd iterations over the embeddings corpus,
    seeded with the first {K_CLUSTERS} vectors as centroids. Per-cluster
    sizes + membership checksum after round 2 must match DuckDB's CTE
    replay exactly — assignment, exact-decimal centroid update and
    re-assignment all agree across engines."""
    vecs = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_vec("embedding").alias("v")
    )
    seeds = vecs.filter(F.col("vec_id") < K_CLUSTERS).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    final = kmeans_iterate(vecs, seeds, iters=2)
    return (
        final.groupBy(F.col("cid").alias("cluster_id"))
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum("vec_id").alias("vec_checksum"),
        )
        .orderBy("cluster_id")
    )


@query(
    "ml_ols_closed_form",
    oracle="""
    WITH s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(hour(ts) AS DECIMAL(28,10))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(hour(ts) AS DECIMAL(28,10))
                      * CAST(hour(ts) AS DECIMAL(28,10))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(hour(ts) AS DECIMAL(28,10))
                      * CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(value AS DECIMAL(28,10))
                      * CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS syy
      FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
                 6) AS intercept,
           round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM s ORDER BY event_type
    """,
)
def q_ml_ols_closed_form(spark, sf_dir: str) -> DataFrame:
    """Per-group ordinary least squares (value ~ hour-of-day) via the
    closed-form normal equations — "model training as one
    aggregation", the pattern that makes simple supervised fits free
    at 100 TB: the ONLY pass over the data collects the five moment
    sums (n, Σx, Σy, Σx², Σxy, Σy²) in exact DECIMAL (map-side
    partials, order-independent), and slope/intercept/R² are a few
    double expressions over the per-group 1-row results.

    Any fixed feature set fits the same shape (k features → the
    k×k X'X moment matrix as k(k+1)/2 sum columns); the driver never
    sees row data, only the moment table."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("decimal(28,10)").alias("x"),
        F.col("value").cast("decimal(28,10)").alias("y"),
    )
    s = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = num / den
    return s.select(
        "event_type",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
        F.round(
            num * num
            / (den * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))),
            6,
        ).alias("r2"),
    ).orderBy("event_type")

"""Similarity search over embedding columns (beyond-reference).

Approximate-nearest-neighbor surface for an `array<float>` embedding
column: brute-force cosine top-k as the exactness baseline, and an
IVF-style partition-probed variant as the 100 TB scale path (search
only the probed coarse cluster instead of the full corpus).

All vector math is native `zip_with`/`aggregate` fold — JVM-side, no
Python in the row path. Scores are rounded to 6 dp with a vec_id
tie-break so ordering and hashes are engine-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.registry import query

TOP_K = 10
QUERY_VEC_ID = 0


def as_double_vec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def l2_norm(vec: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(vec, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return F.round(dot / (norm_a * norm_b), 6)


def _query_vector(spark, sf_dir: str):
    """The probe vector: embedding of QUERY_VEC_ID, as a one-row frame
    (kept in the plan → broadcast; never collected to a literal)."""
    return (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(
            as_double_vec("embedding").alias("qv"),
            F.col("label").alias("qlabel"),
        )
    )


_ORACLE_COSINE = """
      round(list_sum(list_transform(range(1, len(e.v) + 1),
                     i -> e.v[i] * q.qv[i]))
            / (e.nrm * q.qnrm), 6)
"""

_ORACLE_BASE = f"""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v,
             sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
      FROM embeddings
    ),
    q AS (
      SELECT embedding::DOUBLE[] AS qv, label AS qlabel,
             sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS qnrm
      FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
    )
"""


@query(
    "ann_cosine_topk",
    oracle=_ORACLE_BASE
    + f"""
    SELECT e.vec_id, e.label, {_ORACLE_COSINE} AS cosine
    FROM e, q
    WHERE e.vec_id <> {QUERY_VEC_ID}
    ORDER BY cosine DESC, e.vec_id
    LIMIT {TOP_K}
    """,
)
def q_ann_cosine_topk(spark, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k — the exact baseline every ANN variant
    is measured against. One scan, per-row fold, TakeOrderedAndProject
    for the top-k (no global sort). At 100 TB this is the map-side
    score + per-partition top-k + driver merge pattern — still one
    pass, but you run it only to calibrate the approximate path."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double_vec("embedding").alias("v")
    )
    emb = emb.withColumn("nrm", l2_norm(F.col("v")))
    qv = _query_vector(spark, sf_dir).withColumn("qnrm", l2_norm(F.col("qv")))
    scored = emb.filter(F.col("vec_id") != QUERY_VEC_ID).crossJoin(F.broadcast(qv))
    return (
        scored.select(
            "vec_id",
            "label",
            cosine(F.col("v"), F.col("qv"), F.col("nrm"), F.col("qnrm")).alias(
                "cosine"
            ),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(TOP_K)
    )


@query(
    "ann_ivf_topk",
    oracle=_ORACLE_BASE
    + f"""
    SELECT e.vec_id, {_ORACLE_COSINE} AS cosine
    FROM e, q
    WHERE e.label = q.qlabel AND e.vec_id <> {QUERY_VEC_ID}
    ORDER BY cosine DESC, e.vec_id
    LIMIT {TOP_K}
    """,
)
def q_ann_ivf_topk(spark, sf_dir: str) -> DataFrame:
    """IVF-probed ANN: restrict the scan to the query's coarse cluster
    (the `label` column is the inverted-file assignment) and rank only
    within it. The cluster predicate is a plain equality → partition
    pruning when the corpus is stored partitioned by cluster id — at
    100 TB this reads 1/n_clusters of the data instead of all of it.
    Recall vs the brute-force baseline is checked in unit tests."""
    qv = _query_vector(spark, sf_dir).withColumn("qnrm", l2_norm(F.col("qv")))
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double_vec("embedding").alias("v")
    )
    emb = emb.withColumn("nrm", l2_norm(F.col("v")))
    probed = emb.join(
        F.broadcast(qv), emb.label == qv.qlabel
    ).filter(F.col("vec_id") != QUERY_VEC_ID)
    return (
        probed.select(
            "vec_id",
            cosine(F.col("v"), F.col("qv"), F.col("nrm"), F.col("qnrm")).alias(
                "cosine"
            ),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(TOP_K)
    )


@query(
    "ann_lsh_bucketed",
    oracle=_ORACLE_BASE
    + f"""
    , planes AS (
      SELECT j, list_transform(range(1, 65),
               i -> CAST((i * 31 + j * 17) % 7 - 3 AS DOUBLE)) AS p
      FROM range(0, 8) AS r(j)
    ),
    sig AS (
      SELECT e.vec_id, e.label, e.v, e.nrm,
             string_agg(CASE WHEN list_sum(list_transform(range(1, len(e.v) + 1),
                              i -> e.v[i] * p.p[i])) > 0
                        THEN '1' ELSE '0' END, '' ORDER BY p.j) AS bucket
      FROM e, planes p GROUP BY e.vec_id, e.label, e.v, e.nrm
    ),
    qsig AS (
      SELECT q.qv, q.qnrm,
             string_agg(CASE WHEN list_sum(list_transform(range(1, len(q.qv) + 1),
                              i -> q.qv[i] * p.p[i])) > 0
                        THEN '1' ELSE '0' END, '' ORDER BY p.j) AS qbucket
      FROM q, planes p GROUP BY q.qv, q.qnrm
    )
    SELECT s.vec_id,
           round(list_sum(list_transform(range(1, len(s.v) + 1),
                          i -> s.v[i] * qs.qv[i])) / (s.nrm * qs.qnrm), 6) AS cosine
    FROM sig s, qsig qs
    WHERE s.bucket = qs.qbucket AND s.vec_id <> {QUERY_VEC_ID}
    ORDER BY cosine DESC, s.vec_id
    LIMIT {TOP_K}
    """,
)
def q_ann_lsh_bucketed(spark, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN: 8 fixed pseudo-random hyperplanes
    (deterministic integer formula so the oracle replays them) sign
    each vector into an 8-bit bucket; only the query's bucket is
    scanned. At scale the bucket string is the shuffle/partition key —
    candidate generation is a hash lookup, not a scan."""
    n_planes, dim = 8, 64
    # plane j, component i (1-based): ((i*31 + j*17) % 7) - 3  ∈ [-3, 3]
    planes = F.expr(
        f"""transform(sequence(0, {n_planes - 1}),
              j -> transform(sequence(1, {dim}),
                     i -> cast((i * 31 + j * 17) % 7 - 3 as double)))"""
    )

    def bucket_of(vec: Column) -> Column:
        return F.array_join(
            F.transform(
                planes,
                lambda p: F.when(
                    F.aggregate(
                        F.zip_with(vec, p, lambda x, y: x * y),
                        F.lit(0.0),
                        lambda a, x: a + x,
                    )
                    > 0,
                    "1",
                ).otherwise("0"),
            ),
            "",
        )

    emb = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", as_double_vec("embedding").alias("v"))
        .withColumn("nrm", l2_norm(F.col("v")))
        .withColumn("bucket", bucket_of(F.col("v")))
    )
    qv = (
        _query_vector(spark, sf_dir)
        .withColumn("qnrm", l2_norm(F.col("qv")))
        .withColumn("qbucket", bucket_of(F.col("qv")))
    )
    cand = emb.join(F.broadcast(qv), emb.bucket == qv.qbucket).filter(
        F.col("vec_id") != QUERY_VEC_ID
    )
    return (
        cand.select(
            "vec_id",
            cosine(F.col("v"), F.col("qv"), F.col("nrm"), F.col("qnrm")).alias(
                "cosine"
            ),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(TOP_K)
    )


@query(
    "ann_batch_topk",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
      FROM embeddings
    ),
    q AS (
      SELECT vec_id AS qid, embedding::DOUBLE[] AS qv,
             sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS qnrm
      FROM embeddings WHERE vec_id % 100 = 7
    ),
    scored AS (
      SELECT q.qid, e.vec_id,
             round(list_sum(list_transform(range(1, len(e.v) + 1),
                            i -> e.v[i] * q.qv[i])) / (e.nrm * q.qnrm), 6) AS cosine
      FROM e, q WHERE e.vec_id <> q.qid
    ),
    ranked AS (
      SELECT qid, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cosine DESC, vec_id) AS rk
      FROM scored
    )
    SELECT qid, vec_id, cosine, rk FROM ranked
    WHERE rk <= {TOP_K} ORDER BY qid, rk
    """,
)
def q_ann_batch_topk(spark, sf_dir: str) -> DataFrame:
    """Batch kNN — the realistic similarity-search workload: a SET of
    query vectors against the corpus in one plan. The query set
    broadcasts (tiny), scoring is corpus-partition-parallel, and the
    per-query top-k is a window over the query id — no global sort, no
    per-query jobs. Ranking is on the ROUNDED score (+vec_id
    tie-break) so both engines select the identical k. At 100 TB the
    same plan holds: |corpus| × |batch| scored rows, partitioned by
    corpus shard."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_vec("embedding").alias("v")
    )
    emb = emb.withColumn("nrm", l2_norm(F.col("v")))
    queries = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 100 == 7)
        .select(F.col("vec_id").alias("qid"), as_double_vec("embedding").alias("qv"))
        .withColumn("qnrm", l2_norm(F.col("qv")))
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            cosine(F.col("v"), F.col("qv"), F.col("nrm"), F.col("qnrm")).alias(
                "cosine"
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
    )

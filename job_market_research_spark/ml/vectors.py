"""Embedding-column vector operators: quantization + pooling
(beyond-reference, training-data pipeline family).

Two operators every embedding pipeline needs before the ANN stages
(ml/similarity.py) are affordable at 100 TB:

- `ann_quantize_int8`: symmetric per-vector int8 scalar quantization —
  q_i = round(x_i * 127 / max|x|). 4× memory cut vs float32 (32× vs
  the float64 Spark arrays), which is the difference between an ANN
  index that fits executor memory and one that spills. Pure JVM-side
  array expressions (transform / array_max), no Python.
- `embed_mean_pool`: chunk→document mean pooling. Long documents are
  embedded per chunk (text_chunk_overlap); retrieval wants ONE vector
  per document. Pooling is expressed as posexplode → groupBy(doc, dim)
  → mean — the shuffle key is (group, dim), cardinality |groups|×dim,
  perfectly balanced regardless of how skewed chunk counts are (the
  alternative, collect_list of arrays per doc, puts a whole document's
  chunks in one row and dies on the longest doc at scale).

Cross-engine exactness: quantized codes are integers (exact);
max-abs scales and pooled means are rounded to 6 decimals per the
float policy in registry.py (both engines' ≤1e-13 summation skew
cannot straddle a 1e-6 rounding boundary in practice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.registry import query

#: Chunks per simulated document for the pooling demo.
POOL_GROUP = 8


@query(
    "ann_quantize_int8",
    oracle="""
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    scaled AS (
      SELECT vec_id, e,
             list_max(list_transform(e, x -> abs(x))) AS max_abs
      FROM v
    )
    SELECT vec_id, CAST(i AS BIGINT) AS dim_idx,
           CAST(CASE WHEN max_abs = 0 THEN 0
                     ELSE round(e[i + 1] * 127.0 / max_abs, 0) END
                AS INTEGER) AS q,
           round(max_abs, 6) AS scale_r6
    FROM scaled, unnest(range(0, len(e))) AS t(i)
    ORDER BY vec_id, dim_idx
    """,
)
def q_ann_quantize_int8(spark, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column: per-vector
    max-abs scale, codes in [-127, 127]. All array math stays in the
    JVM (transform/array_max/posexplode); the posexploded output is the
    compare surface — production would keep the quantized
    array<tinyint> + scale column and feed it to the ANN operators."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    scaled = emb.withColumn(
        "max_abs", F.array_max(F.transform("e", lambda x: F.abs(x)))
    )
    quantized = scaled.select(
        "vec_id",
        F.round("max_abs", 6).alias("scale_r6"),
        F.posexplode(
            F.transform(
                "e",
                lambda x: F.when(F.col("max_abs") == 0, F.lit(0)).otherwise(
                    F.round(x * 127.0 / F.col("max_abs"), 0)
                ),
            )
        ).alias("dim_idx", "qd"),
    )
    return quantized.select(
        "vec_id",
        F.col("dim_idx").cast("long").alias("dim_idx"),
        F.col("qd").cast("int").alias("q"),
        "scale_r6",
    ).orderBy("vec_id", "dim_idx")


@query(
    "embed_mean_pool",
    oracle=f"""
    WITH flat AS (
      SELECT vec_id // {POOL_GROUP} AS group_id,
             CAST(i AS BIGINT) AS dim_idx,
             CAST(embedding[i + 1] AS DOUBLE) AS val
      FROM embeddings, unnest(range(0, len(embedding))) AS t(i)
    )
    SELECT group_id, dim_idx,
           round(SUM(val) / COUNT(*), 6) AS pooled_r6,
           CAST(COUNT(*) AS BIGINT) AS n_chunks
    FROM flat GROUP BY group_id, dim_idx
    ORDER BY group_id, dim_idx
    """,
)
def q_embed_mean_pool(spark, sf_dir: str) -> DataFrame:
    """Chunk→document mean pooling: vectors are grouped into simulated
    documents of {POOL_GROUP} chunks and averaged element-wise. The
    plan is posexplode → groupBy(group, dim) → sum/count: one shuffle
    keyed on (group, dim) whose partition sizes are independent of
    chunk-count skew — the scalable pooling shape."""
    flat = load(spark, sf_dir, "embeddings").select(
        F.expr(f"vec_id div {POOL_GROUP}").alias("group_id"),
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("dim_idx", "val"),
    )
    pooled = (
        flat.groupBy(F.col("group_id"), F.col("dim_idx").cast("long").alias("dim_idx"))
        .agg(
            F.round(F.sum("val") / F.count("*"), 6).alias("pooled_r6"),
            F.count("*").cast("long").alias("n_chunks"),
        )
    )
    return pooled.orderBy("group_id", "dim_idx")


@query(
    "embed_anisotropy",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
               AS nrm
      FROM embeddings
    ),
    flat AS (
      SELECT vec_id, CAST(i AS BIGINT) AS dim,
             CAST(round(v[i + 1] / nrm, 6) AS DECIMAL(18,6)) AS val
      FROM e, unnest(range(0, len(v))) AS t(i)
    ),
    sd AS (
      SELECT dim,
             CAST(SUM(CAST(val AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS s,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM flat GROUP BY dim
    ),
    agg1 AS (
      SELECT CAST(SUM(CAST(s AS DECIMAL(19,6))
                      * CAST(s AS DECIMAL(19,6))) AS DOUBLE) AS ssq,
             CAST(MAX(c) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS dims
      FROM sd
    ),
    agg2 AS (
      SELECT CAST(SUM(CAST(val AS DECIMAL(19,6))
                      * CAST(val AS DECIMAL(19,6))) AS DOUBLE) AS sq
      FROM flat
    )
    SELECT n AS n_vecs, dims,
           round((ssq - sq) / (CAST(n AS DOUBLE) * (n - 1)), 6)
             AS mean_cos_r6,
           round(sqrt(ssq) / n, 6) AS mean_norm_r6
    FROM agg1 CROSS JOIN agg2
    """,
    tags=("embeddings", "diagnostics", "beyond"),
)
def q_embed_anisotropy(spark, sf_dir: str) -> DataFrame:
    """Embedding-space anisotropy audit: the mean pairwise cosine
    between DISTINCT unit-normalized vectors — the one-number check
    (Ethayarajh 2019) run before trusting cosine thresholds for
    semantic dedup or retrieval, since an anisotropic space (mean
    cosine ≫ 0, all vectors in a narrow cone) makes every cosine look
    high and a fixed dedup threshold meaningless. Also emits the mean
    vector's norm (the cone's center offset — the quantity mean-
    centering would remove).

    The scale trick: NO pair join. With unit vectors, Σ_{i≠j} v̂_i·v̂_j
    = ‖Σv̂‖² − Σ‖v̂‖², so the all-pairs mean collapses to per-dimension
    sums — one scan, one |dims|-key aggregation, O(n·d) not O(n²·d).
    Normalized coordinates are rounded 6 and carried as DECIMAL, so
    both Σval and Σval² are order-free exact; the two closing
    divisions are fixed-shape doubles.

    Requires a fixed embedding width (n = per-dim count; MAX over
    dims is that count for rectangular data)."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    e = e.withColumn(
        "nrm",
        F.sqrt(
            F.aggregate(
                "v", F.lit(0.0), lambda acc, x: acc + x * x
            )
        ),
    )
    flat = e.select(
        F.posexplode(
            F.transform(
                "v",
                lambda x: F.round(x / F.col("nrm"), 6).cast("decimal(18,6)"),
            )
        ).alias("dim", "val")
    ).select(F.col("dim").cast("long").alias("dim"), "val")
    sd = flat.groupBy("dim").agg(
        F.sum(F.col("val").cast("decimal(38,6)"))
        .cast("decimal(38,6)")
        .alias("s"),
        F.count("*").cast("long").alias("c"),
    )
    agg1 = sd.agg(
        F.sum(F.col("s").cast("decimal(19,6)") * F.col("s").cast("decimal(19,6)"))
        .cast("double")
        .alias("ssq"),
        F.max("c").cast("long").alias("n"),
        F.count("*").cast("long").alias("dims"),
    )
    agg2 = flat.agg(
        F.sum(
            F.col("val").cast("decimal(19,6)") * F.col("val").cast("decimal(19,6)")
        )
        .cast("double")
        .alias("sq")
    )
    n = F.col("n").cast("double")
    return agg1.crossJoin(F.broadcast(agg2)).select(
        F.col("n").alias("n_vecs"),
        "dims",
        F.round((F.col("ssq") - F.col("sq")) / (n * (n - 1)), 6).alias(
            "mean_cos_r6"
        ),
        F.round(F.sqrt("ssq") / n, 6).alias("mean_norm_r6"),
    )

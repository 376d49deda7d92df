"""Integer-exact vector geometry: power-iteration PCA, farthest-point
diversity sampling, kNN classification (beyond-reference, training-data
pipeline family).

These three operators all rank or iterate on dot products — the
operations where naive float pipelines lose cross-engine determinism
(summation order shifts the low bits, and an argmax/top-k boundary can
flip). The fix used throughout this module: quantize each embedding
ONCE to integers, ``x̃ᵢ = floor(xᵢ·2²⁰)`` (float32 inputs scale by a
power of two exactly, and floor has no rounding ties), then every dot
product and squared norm is EXACT integer arithmetic — associative,
order-independent, bit-identical between Spark's partial aggregation
and DuckDB's single-threaded fold. Doubles appear only in final
divisions of identical integers, so comparisons and rankings agree by
construction, not by luck. Quantization error (~2⁻²⁰ per component) is
orders below any decision boundary these operators face.

Scale notes (100 TB):
- `ml_pca_power_iteration`: the classic d²-bounded reduction — each
  iteration is one scan producing a d-vector (posexplode → 64-key
  partial-aggregated groupBy); driver state is 64 integers. T scans
  total; at scale you `persist()` the quantized frame once.
- `sample_fps_diversity`: k-center greedy; each round is one scan with
  a broadcast selected-set literal and a distributed argmax
  (TakeOrderedAndProject) — no pairwise matrix ever materializes.
- `ml_knn_classify`: the bounded query set broadcasts; candidate
  scoring is map-side; per-query ranking shuffles on query id only.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from job_market_research_spark.io import load
from job_market_research_spark.registry import query

#: Embedding dimensionality of the driver's `embeddings` table.
DIM = 64
#: Component quantizer: floor(x * 2^20) — power-of-two scale is exact
#: for float32 inputs, floor is tie-free.
QUANT = 1 << 20
#: Iteration-vector scale: v components live in [-1e9, 1e9] integers.
V_SCALE = 10**9
#: Power-iteration rounds (parity needs determinism, not convergence;
#: both engines run the same T rounds).
PCA_ITERS = 6
#: Farthest-point sample size (seed + 5 greedy picks).
FPS_K = 6
#: kNN: queries are the first N_QUERY vec_ids, classified by K_NN votes.
N_QUERY, K_NN = 10, 5

#: DuckDB twin of `as_int_vec`.
_SQL_INTVEC = (
    "list_transform(embedding::DOUBLE[], x -> CAST(floor(x * 1048576.0) AS BIGINT))"
)


def as_int_vec(col: Column) -> Column:
    """array<long> quantization of an embedding column."""
    return F.transform(col, lambda x: F.floor(x.cast("double") * QUANT).cast("long"))


def int_norm(xi: Column) -> Column:
    """sqrt(Σx̃²) as double — the integer sum (≤ 64·(2²⁰)² ≈ 7e13) is
    exact in both long and double, so the root is identical everywhere."""
    return F.sqrt(
        F.aggregate(
            F.transform(xi, lambda x: x * x),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).cast("double")
    )


def dot_cols(a: Column, b: Column) -> Column:
    """Exact integer dot product of two array<long> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def dot_lit(xi: Column, v: list[int]) -> Column:
    """Exact integer dot product against a driver-side vector literal."""
    return dot_cols(xi, F.array(*[F.lit(int(c)) for c in v]))


def _int_emb(spark, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_int_vec("embedding").alias("xi")
    )


# ---------------------------------------------------------------------------
# Power-iteration PCA
# ---------------------------------------------------------------------------


def power_iteration_plan(emb: DataFrame, iters: int = PCA_ITERS) -> DataFrame:
    """Dominant right singular vector of the (uncentered) embedding
    matrix by power iteration: v ← XᵀX v, renormalized each round.

    Rounds 1..iters-1 collect the 64-element vector to the driver
    (the d-sized state power iteration inherently carries) and re-embed
    it as an integer literal; the FINAL round stays in the plan — the
    returned DataFrame computes w = XᵀXv, the max-abs renormalization,
    and the unit-norm loadings as one lazy Spark job.

    Lockstep renormalization: v' = floor((w/max|w|)·1e9). w is an
    exact DECIMAL(38,0) (long·long products summed decimal-side), the
    division is IEEE on identical doubles, floor is tie-free — so the
    oracle's unrolled-CTE replay holds integer-for-integer through
    every round."""
    # Fan the quantized frame out to full parallelism and materialize
    # it ONCE: locally the parquet is 1-2 splits, so without this every
    # round's fold+posexplode runs near-serially AND re-executes the
    # scan+quantize lineage. On a cluster the scan already has
    # thousands of splits; swap localCheckpoint for checkpoint(dir) /
    # persist(DISK_ONLY) at 100 TB.
    emb = emb.repartition(
        emb.sparkSession.sparkContext.defaultParallelism
    ).localCheckpoint()
    v = [V_SCALE] * DIM

    def w_frame(v_cur: list[int]) -> DataFrame:
        # XᵀXv as posexplode → DIM-key groupBy. Measured against the
        # no-shuffle alternative (one aggregation with DIM decimal sum
        # buffers + unpivot): the explode shape is ~3× FASTER here —
        # 64 decimal aggregate buffers fall out of whole-stage codegen
        # into interpreted mode, costing far more than shuffling
        # corpus×DIM skinny rows into a 64-key hash agg that combines
        # map-side anyway.
        dot = dot_lit(F.col("xi"), v_cur)
        return (
            emb.select(dot.alias("dot"), F.posexplode("xi").alias("dim", "xj"))
            .groupBy("dim")
            .agg(
                F.sum(
                    F.col("xj").cast("decimal(19,0)")
                    * F.col("dot").cast("decimal(19,0)")
                ).alias("w")
            )
        )

    for _ in range(iters - 1):
        rows = w_frame(v).collect()
        wd = {r["dim"]: float(r["w"]) for r in rows}
        m = max(abs(x) for x in wd.values())
        v = [
            math.floor((wd[j] / m) * 1.0e9) if m > 0 else 0
            for j in range(DIM)
        ]

    wf = w_frame(v)
    mx = wf.agg(F.max(F.abs(F.col("w").cast("double"))).alias("m"))
    vT = wf.crossJoin(F.broadcast(mx)).select(
        "dim",
        F.floor((F.col("w").cast("double") / F.col("m")) * F.lit(1.0e9))
        .cast("long")
        .alias("vj"),
    )
    s2 = vT.agg(
        F.sum(F.col("vj").cast("decimal(19,0)") * F.col("vj").cast("decimal(19,0)"))
        .alias("s2")
    )
    return (
        vT.crossJoin(F.broadcast(s2))
        .select(
            F.col("dim").cast("int").alias("dim_idx"),
            F.round(
                F.col("vj").cast("double") / F.sqrt(F.col("s2").cast("double")), 6
            ).alias("pc1_r6"),
        )
        .orderBy("dim_idx")
    )


def _pca_oracle(iters: int = PCA_ITERS) -> str:
    """Unrolled-CTE DuckDB replay of the same {iters} rounds."""
    parts = [
        f"""
    WITH e AS (
      SELECT vec_id, {_SQL_INTVEC} AS xi FROM embeddings
    ),
    v0 AS (SELECT range AS dim, CAST({V_SCALE} AS BIGINT) AS v
           FROM range(0, {DIM}))"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f""",
    pv{t} AS (SELECT list(v ORDER BY dim) AS vl FROM v{t - 1}),
    d{t} AS (
      SELECT e.vec_id, e.xi,
             CAST(list_sum(list_transform(range(1, {DIM + 1}),
                           i -> e.xi[i] * pv{t}.vl[i])) AS BIGINT) AS dot
      FROM e, pv{t}
    ),
    w{t} AS (
      SELECT u.i AS dim, SUM(CAST(xp.xi[u.i + 1] AS HUGEINT) * xp.dot) AS w
      FROM d{t} xp, unnest(range(0, {DIM})) AS u(i)
      GROUP BY u.i
    ),
    m{t} AS (SELECT max(abs(CAST(w AS DOUBLE))) AS m FROM w{t}),
    v{t} AS (
      SELECT dim,
             CAST(floor((CAST(w.w AS DOUBLE) / m.m) * 1000000000.0) AS BIGINT)
               AS v
      FROM w{t} w, m{t} m
    )"""
        )
    parts.append(
        f""",
    s2 AS (SELECT SUM(CAST(v AS HUGEINT) * v) AS s2 FROM v{iters})
    SELECT CAST(dim AS INT) AS dim_idx,
           round(CAST(v AS DOUBLE) / sqrt(CAST(s2.s2 AS DOUBLE)), 6) AS pc1_r6
    FROM v{iters}, s2 ORDER BY dim_idx"""
    )
    return "".join(parts)


@query("ml_pca_power_iteration", oracle=_pca_oracle())
def q_ml_pca_power_iteration(spark, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus (uncentered) —
    'training as aggregation': each round reduces the corpus to a
    64-long vector (XᵀXv) with map-side partial aggregation; no
    matrix, no collect beyond d driver floats per round."""
    return power_iteration_plan(_int_emb(spark, sf_dir).select("vec_id", "xi"))


# ---------------------------------------------------------------------------
# Farthest-point (k-center greedy) diversity sampling
# ---------------------------------------------------------------------------


def fps_select(emb: DataFrame, k: int = FPS_K) -> list[tuple[int, int | None, float | None]]:
    """Greedy k-center selection: seed with the smallest vec_id, then
    k-1 rounds of 'pick the candidate farthest (cosine distance) from
    the selected set'. Each round is ONE distributed pass: the selected
    vectors ride along as integer literals (≤ k·DIM ints), the min-dist
    is a `least(...)` over exact-integer cosines, and the argmax is a
    TakeOrderedAndProject — never a pairwise materialization.

    Returns [(order, vec_id, sel_dist)] with sel_dist = the distance
    that won the round (None for the seed)."""
    base = emb.select("vec_id", "xi", int_norm(F.col("xi")).alias("nrm"))
    # One materialization serves all k argmax rounds (same rationale
    # and cluster-scale swap as power_iteration_plan).
    base = base.repartition(
        base.sparkSession.sparkContext.defaultParallelism
    ).localCheckpoint()
    seed = base.orderBy("vec_id").select("vec_id", "xi", "nrm").first()
    picked = [(0, seed["vec_id"], None)]
    sel_vecs = [(seed["xi"], seed["nrm"])]
    for step in range(1, k):
        dists = [
            F.lit(1.0) - dot_lit(F.col("xi"), sv).cast("double") / (F.col("nrm") * F.lit(sn))
            for sv, sn in sel_vecs
        ]
        mind = F.least(*dists) if len(dists) > 1 else dists[0]
        cand = (
            base.filter(~F.col("vec_id").isin([p[1] for p in picked]))
            .select("vec_id", "xi", "nrm", mind.alias("d"))
            .orderBy(F.desc("d"), "vec_id")
            .first()
        )
        picked.append((step, cand["vec_id"], cand["d"]))
        sel_vecs.append((cand["xi"], cand["nrm"]))
    return picked


def _fps_oracle(k: int = FPS_K) -> str:
    parts = [
        f"""
    WITH e AS (
      SELECT vec_id, {_SQL_INTVEC} AS xi,
             sqrt(CAST(list_sum(list_transform({_SQL_INTVEC}, x -> x * x))
                  AS DOUBLE)) AS nrm
      FROM embeddings
    ),
    s1 AS (SELECT vec_id, 0 AS ord, NULL::DOUBLE AS d
           FROM e ORDER BY vec_id LIMIT 1),
    sel1 AS (SELECT * FROM s1)"""
    ]
    for t in range(2, k + 1):
        parts.append(
            f""",
    c{t} AS (
      SELECT a.vec_id,
             min(1.0 - CAST(list_sum(list_transform(range(1, {DIM + 1}),
                            i -> a.xi[i] * b.xi[i])) AS DOUBLE)
                       / (a.nrm * b.nrm)) AS d
      FROM e a
      JOIN e b ON b.vec_id IN (SELECT vec_id FROM sel{t - 1})
      WHERE a.vec_id NOT IN (SELECT vec_id FROM sel{t - 1})
      GROUP BY a.vec_id
    ),
    s{t} AS (SELECT vec_id, {t - 1} AS ord, d FROM c{t}
             ORDER BY d DESC, vec_id LIMIT 1),
    sel{t} AS (SELECT * FROM sel{t - 1} UNION ALL SELECT * FROM s{t})"""
        )
    parts.append(
        f"""
    SELECT CAST(ord AS INT) AS sel_order, vec_id,
           round(d, 6) AS sel_dist_r6
    FROM sel{k} ORDER BY sel_order"""
    )
    return "".join(parts)


@query("sample_fps_diversity", oracle=_fps_oracle())
def q_sample_fps_diversity(spark, sf_dir: str) -> DataFrame:
    """Diversity (coverage) sampling for training-data curation:
    farthest-point sampling picks a subset whose min pairwise distance
    is within 2× of the best possible k-center — the standard greedy
    for 'give me k maximally-different exemplars'. Output: selection
    order, chosen vec_id, and the winning distance per round."""
    picked = fps_select(_int_emb(spark, sf_dir).select("vec_id", "xi"))
    order = {vid: o for o, vid, _ in picked}
    dist = {vid: d for _, vid, d in picked}
    ids = list(order)
    order_expr = F.element_at(
        F.create_map(*[F.lit(x) for vid in ids for x in (vid, order[vid])]),
        F.col("vec_id"),
    )
    dist_expr = F.element_at(
        F.create_map(
            *[
                F.lit(x)
                for vid in ids
                for x in (vid, float(dist[vid]) if dist[vid] is not None else None)
            ]
        ),
        F.col("vec_id"),
    )
    return (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id").isin(ids))
        .select(
            order_expr.cast("int").alias("sel_order"),
            "vec_id",
            F.round(dist_expr.cast("double"), 6).alias("sel_dist_r6"),
        )
        .orderBy("sel_order")
    )


# ---------------------------------------------------------------------------
# kNN classification
# ---------------------------------------------------------------------------

_KNN_ORACLE = f"""
    WITH e AS (
      SELECT vec_id, label, {_SQL_INTVEC} AS xi,
             sqrt(CAST(list_sum(list_transform({_SQL_INTVEC}, x -> x * x))
                  AS DOUBLE)) AS nrm
      FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS qid, c.label,
             CAST(list_sum(list_transform(range(1, {DIM + 1}),
                           i -> q.xi[i] * c.xi[i])) AS DOUBLE)
               / (q.nrm * c.nrm) AS cos,
             c.vec_id AS cid
      FROM e q JOIN e c ON c.vec_id >= {N_QUERY}
      WHERE q.vec_id < {N_QUERY}
    ),
    ranked AS (
      SELECT qid, label,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos DESC, cid) AS rn
      FROM scored
    ),
    votes AS (
      SELECT qid, label, CAST(COUNT(*) AS BIGINT) AS votes
      FROM ranked WHERE rn <= {K_NN} GROUP BY qid, label
    )
    SELECT qid AS query_vec_id, label AS predicted_label, votes
    FROM (
      SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY votes DESC, label) AS wr
      FROM votes
    ) WHERE wr = 1 ORDER BY query_vec_id
"""


@query("ml_knn_classify", oracle=_KNN_ORACLE)
def q_ml_knn_classify(spark, sf_dir: str) -> DataFrame:
    """Majority-vote kNN: the first N_QUERY vectors are classified by
    their K_NN cosine-nearest neighbors among the rest. The query set
    is BOUNDED (broadcast), candidate scoring is map-side over the
    corpus scan, and ranking shuffles on query id only — the label-
    transfer shape used to propagate curation labels from a small
    audited seed set across a 100 TB corpus. Integer-exact dots make
    the rank order engine-independent."""
    e = _int_emb(spark, sf_dir).withColumn("nrm", int_norm(F.col("xi")))
    q = (
        e.filter(F.col("vec_id") < N_QUERY)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("xi").alias("qxi"),
            F.col("nrm").alias("qnrm"),
        )
    )
    c = e.filter(F.col("vec_id") >= N_QUERY).select(
        F.col("vec_id").alias("cid"), "label", "xi", "nrm"
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "qid",
        "label",
        "cid",
        (
            dot_cols(F.col("xi"), F.col("qxi")).cast("double")
            / (F.col("nrm") * F.col("qnrm"))
        ).alias("cos"),
    )
    # rank + filter(<= k): Spark's InferWindowGroupLimit turns this
    # into a partial pre-shuffle top-k per query (WGL-pinned test),
    # so the low-cardinality qid does not funnel the corpus; the
    # vote-rank window below runs on the bounded (qid, label) table
    rn = F.row_number().over(Window.partitionBy("qid").orderBy(F.desc("cos"), "cid"))
    votes = (
        scored.withColumn("rn", rn)
        .filter(F.col("rn") <= K_NN)
        .groupBy("qid", "label")
        .agg(F.count("*").cast("long").alias("votes"))
    )
    wr = F.row_number().over(
        Window.partitionBy("qid").orderBy(F.desc("votes"), "label")
    )
    return (
        votes.withColumn("wr", wr)
        .filter(F.col("wr") == 1)
        .select(
            F.col("qid").alias("query_vec_id"),
            F.col("label").alias("predicted_label"),
            "votes",
        )
        .orderBy("query_vec_id")
    )

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

import math

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

    All K centroids collapse into ONE broadcast row of (cid, cv)
    structs; the argmin is `array_min` over per-centroid (dist, cid)
    structs — struct comparison is field-order lexicographic, so the
    (distance, cid) tie-break is identical to the oracle's windowed
    ROW_NUMBER. A pure map-side projection: the corpus never shuffles
    or row-multiplies for an assignment pass (the pre-round-9 shape
    cross-joined to corpus×K rows and shuffled them on vec_id for a
    partitioned window — one corpus×K exchange per Lloyd round).

    Centroids must be NON-EMPTY: array_min over an empty collected
    array is null, which would silently emit every vector with
    cid/dist null (the pre-round-9 window shape returned zero rows
    instead) — so an empty `cents` row raises at execution instead of
    letting callers like kmeans_iterate propagate nulls.
    """
    cents = centroids.agg(
        F.collect_list(F.struct("cid", "cv")).alias("cents")
    ).select(
        F.when(F.size("cents") > 0, F.col("cents"))
        .otherwise(F.raise_error("assign_clusters: empty centroids frame"))
        .alias("cents")
    )
    best = F.array_min(
        F.transform(
            "cents",
            lambda c: F.struct(
                sq_dist(F.col("v"), c["cv"]).alias("dist"),
                c["cid"].alias("cid"),
            ),
        )
    )
    return (
        vecs.crossJoin(F.broadcast(cents))
        .withColumn("best", best)
        .select(
            "vec_id",
            "v",
            F.col("best.cid").alias("cid"),
            F.col("best.dist").alias("dist"),
        )
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


@query(
    "ml_naive_bayes_lang",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, t AS token
      FROM documents, unnest(string_split(text, ' ')) AS u(t)
      WHERE t <> ''
    ),
    langs AS (
      SELECT lang, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_tokens
      FROM tok GROUP BY lang
    ),
    vocab AS (SELECT DISTINCT token FROM tok),
    vsize AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
    counts AS (
      SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY lang, token
    ),
    grid AS (
      SELECT l.lang, vv.token,
             ln((COALESCE(c.c, 0) + 1.0) / (l.n_tokens + vs.v)) AS loglik
      FROM langs l
      CROSS JOIN vocab vv CROSS JOIN vsize vs
      LEFT JOIN counts c ON c.lang = l.lang AND c.token = vv.token
    ),
    ntot AS (SELECT CAST(SUM(n_docs) AS DOUBLE) AS n FROM langs),
    scored AS (
      SELECT t.doc_id, g.lang AS cand,
             round(
               CAST(SUM(CAST(g.loglik AS DECIMAL(28,14))) AS DOUBLE)
               + ln(l.n_docs / nt.n), 6) AS score
      FROM tok t
      JOIN grid g ON g.token = t.token
      JOIN langs l ON l.lang = g.lang
      CROSS JOIN ntot nt
      GROUP BY t.doc_id, g.lang, l.n_docs, nt.n
    ),
    pred AS (
      SELECT doc_id, cand AS predicted
      FROM (
        SELECT doc_id, cand,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, cand) AS rk
        FROM scored
      ) WHERE rk = 1
    )
    SELECT d.lang AS actual, p.predicted,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM documents d JOIN pred p USING (doc_id)
    GROUP BY 1, 2 ORDER BY actual, predicted
    """,
)
def q_ml_naive_bayes_lang(spark, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier, trained AND scored
    entirely as aggregations (in-sample confusion matrix as output).

    Training is two bounded aggregations — per-(lang, token) counts
    and per-lang totals; the add-1-smoothed log-likelihood grid is
    |vocab|×|langs| rows, BROADCAST to the scoring join (100 TB
    corpora train the same way: the model IS a small table). Scoring
    joins the token stream to the grid (one corpus shuffle on
    (doc, lang) for the score sum, DECIMAL-cast terms so partial
    aggregation order is irrelevant), then a doc-partitioned argmax
    with a (rounded score, lang) tie-break. The confusion matrix
    collapses to |langs|² rows. No Python in any row path; DuckDB
    replays training end-to-end."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    # The exploded token stream is consumed FOUR times (lang totals,
    # vocab, per-(lang, token) counts, scoring join) — each unstaged
    # reference re-runs the scan + split + explode (census: 8 scans).
    # Staged per app it derives once; (doc, lang, token) rows are the
    # tokenized corpus a real NB trainer materializes first.

    from job_market_research_spark.staging import staged_frame

    tok = staged_frame(spark, "nb_tok", sf_dir,
        lambda: docs.select(
            "doc_id",
            "lang",
            F.explode(
                F.filter(F.split("text", r"\s+"), lambda x: x != "")
            ).alias("token"),
        ),
    )
    langs = tok.groupBy("lang").agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_tokens"),
    )
    vocab = tok.select("token").distinct()
    vsize = vocab.agg(F.count("*").cast("long").alias("v"))
    counts = tok.groupBy("lang", "token").agg(F.count("*").cast("long").alias("c"))
    # loglik = ln of a Laplace-smoothed probability, so |loglik| < ~40
    # on any input; the scoring product below RELIES on |loglik| < 1e9
    # (the decimal(23,14) integral capacity — a non-ANSI overflow casts
    # to NULL, which F.sum would silently DROP from the score, shifting
    # results instead of erroring; ADVICE r14). Enforce the bound loudly
    # here on the grid (a small broadcast frame, so the branch is free):
    raw_ll = F.log(
        (F.coalesce(F.col("c"), F.lit(0)) + 1.0) / (F.col("n_tokens") + F.col("v"))
    )
    grid = (
        langs.crossJoin(vocab)
        .crossJoin(F.broadcast(vsize))
        .join(F.broadcast(counts), ["lang", "token"], "left")
        .select(
            "lang",
            "token",
            F.when(F.abs(raw_ll) < 1e9, raw_ll)
            .otherwise(
                F.raise_error(
                    "naive-bayes loglik exceeds the decimal(23,14) bound —"
                    " the tf-weighted product would overflow to NULL"
                )
            )
            .alias("loglik"),
        )
    )
    ntot = langs.agg(F.sum("n_docs").cast("double").alias("n"))
    pri = langs.select("lang", "n_docs")
    # The scoring join is the heavy leg: tok × |langs| candidate rows
    # shuffled on (doc, cand). Ride the IR family's staged (doc_id,
    # token, tf) table instead of the raw token stream — identical
    # whitespace tokenization, tf-compressed, shared per app with the
    # whole BM25/Rocchio family — and weight by tf. Exactness needs
    # care: decimal(28,14) × bigint would be typed decimal(38,6) by
    # Spark's precision-loss rule, rounding each term to 6 dp. Sizing
    # the casts as decimal(23,14) × decimal(14,0) → decimal(38,14)
    # (loglik magnitude < 1e9 and tf < 1e14 hold trivially) keeps the
    # product exact, so the sum equals the oracle's per-occurrence
    # DECIMAL(28,14) sum bit-for-bit. The corpus-row
    # side of the model join shrinks by the mean within-doc repeat
    # factor, and in a sweep the table already exists.
    from job_market_research_spark.ml.ir import staged_ws_tcounts

    scored = (
        staged_ws_tcounts(spark, sf_dir)
        .join(F.broadcast(grid.withColumnRenamed("lang", "cand")), "token")
        .groupBy("doc_id", "cand")
        .agg(
            F.sum(
                F.col("loglik").cast("decimal(23,14)")
                * F.col("tf").cast("decimal(14,0)")
            )
            .cast("double")
            .alias("ll")
        )
        .join(
            F.broadcast(pri.withColumnRenamed("lang", "cand")), "cand"
        )
        .crossJoin(F.broadcast(ntot))
        .select(
            "doc_id",
            "cand",
            F.round(F.col("ll") + F.log(F.col("n_docs") / F.col("n")), 6).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "cand")
    pred = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("cand").alias("predicted"))
    )
    return (
        docs.select("doc_id", F.col("lang").alias("actual"))
        .join(pred, "doc_id")
        .groupBy("actual", "predicted")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("actual", "predicted")
    )


@query(
    "ml_ols_multivariate",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sx1,
             SUM(CAST(l_discount AS DECIMAL(18,6))) AS sx2,
             SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS sy,
             -- first factor widened to DECIMAL(19,6): DuckDB keeps
             -- width-18 products in int64 and overflows on price^2;
             -- width 19 forces int128 (values identical either way)
             SUM(CAST(l_quantity AS DECIMAL(19,6))
                 * CAST(l_quantity AS DECIMAL(18,6))) AS s11,
             SUM(CAST(l_quantity AS DECIMAL(19,6))
                 * CAST(l_discount AS DECIMAL(18,6))) AS s12,
             SUM(CAST(l_discount AS DECIMAL(19,6))
                 * CAST(l_discount AS DECIMAL(18,6))) AS s22,
             SUM(CAST(l_quantity AS DECIMAL(19,6))
                 * CAST(l_extendedprice AS DECIMAL(18,6))) AS s1y,
             SUM(CAST(l_discount AS DECIMAL(19,6))
                 * CAST(l_extendedprice AS DECIMAL(18,6))) AS s2y,
             SUM(CAST(l_extendedprice AS DECIMAL(19,6))
                 * CAST(l_extendedprice AS DECIMAL(18,6))) AS syy
      FROM lineitem GROUP BY 1
    ),
    d AS (
      SELECT l_returnflag, n,
             CAST(n AS DOUBLE) AS a, CAST(sx1 AS DOUBLE) AS b,
             CAST(sx2 AS DOUBLE) AS c, CAST(sy AS DOUBLE) AS y0,
             CAST(s11 AS DOUBLE) AS e, CAST(s12 AS DOUBLE) AS f,
             CAST(s22 AS DOUBLE) AS g, CAST(s1y AS DOUBLE) AS y1,
             CAST(s2y AS DOUBLE) AS y2, CAST(syy AS DOUBLE) AS yy
      FROM m
    ),
    s AS (
      SELECT l_returnflag, n, y0, y1, y2, yy, a,
             a * (e * g - f * f) - b * (b * g - f * c)
               + c * (b * f - e * c) AS det,
             y0 * (e * g - f * f) - b * (y1 * g - f * y2)
               + c * (y1 * f - e * y2) AS det0,
             a * (y1 * g - y2 * f) - y0 * (b * g - f * c)
               + c * (b * y2 - y1 * c) AS det1,
             a * (e * y2 - y1 * f) - b * (b * y2 - y1 * c)
               + y0 * (b * f - e * c) AS det2
      FROM d
    )
    SELECT l_returnflag, n,
           round(det0 / det, 6) AS b0_r6,
           round(det1 / det, 6) AS b1_r6,
           round(det2 / det, 6) AS b2_r6,
           round(1.0 - (yy - (det0 / det) * y0 - (det1 / det) * y1
                        - (det2 / det) * y2)
                       / (yy - y0 * y0 / a), 6) AS r2_r6
    FROM s ORDER BY l_returnflag
    """,
)
def q_ml_ols_multivariate(spark, sf_dir: str) -> DataFrame:
    """Per-group TWO-feature closed-form OLS — the moment-matrix
    generalization `ml_ols_closed_form`'s docstring promises: fit
    extendedprice ~ quantity + discount per returnflag by collecting
    the 10 second-order moments (the 3×3 normal-equation matrix plus
    RHS) in ONE exact-decimal aggregation, then solving by Cramer's
    rule as plain column expressions over the per-group 1-row moment
    table. R² uses the normal-equation identity
    SSE = Σy² − b·(XᵀY), so no residual pass is needed.

    One corpus scan, map-side decimal partials, |groups| output rows —
    the driver never touches row data. Both engines cast the SAME
    exact decimals to doubles and evaluate the SAME expression tree,
    so determinants match bit-for-bit before the final rounding."""
    from job_market_research_spark.exact import (
        _hilo3_sum_as_decimal,
        _hilo_sum_as_decimal,
    )

    li = load(spark, sf_dir, "lineitem")
    # Moment sums as scaled-long limb sums (exact.py, the r16 change-2
    # path): quantity is integer-valued and discount/price are 2dp
    # money, so each operand is exact at scale 2 and every product is
    # exact at scale 4. The recombined decimal is the SAME rational as
    # the former decimal(18,6)-product SUM digit for digit, and the
    # decimal->double conversion is correctly rounded on both paths —
    # bit-identical moments (checked per scale factor at adoption),
    # still ~2x cheaper per row than the wide-decimal accumulator.
    # Limb count follows the input magnitude (ADVICE r16 — the old
    # "safe to ~1e13 rows" claim held only for scale-2 operands).
    # TPC-H data contracts bound the operands: l_quantity in [1,50]
    # (q2 <= 5e3), l_discount in [0,0.10] (d2 <= 10), l_extendedprice
    # <= ~1.1e5 (p2 <= ~1.2e7). Per exact.py's restated rule (N_safe =
    # 9.2e18 / max(|v|max/2^20, 2^20)), every moment except syy stays
    # 2-limb-safe to ~8.8e12 rows per group (largest is s1y = q2*p2 <=
    # 6e10). syy = p2*p2 reaches ~1.5e14, where the 2-limb hi partial
    # wraps at ~6.4e10 rows per group — under the 100 TB worst case of
    # ~2e11 — so syy ALONE rides the 3-limb split (N_safe ~8.8e12,
    # ~44x headroom; r17 A/B: 3-limb on all six products cost 1.09x
    # min, on syy alone it is noise).
    q2 = F.round(F.col("l_quantity") * 100).cast("long")
    d2 = F.round(F.col("l_discount") * 100).cast("long")
    p2 = F.round(F.col("l_extendedprice") * 100).cast("long")

    def s2(v, alias):  # single scale-2 operand
        return (_hilo_sum_as_decimal(v) / F.lit(100)).cast("double").alias(alias)

    def s4(v, alias):  # product of two scale-2 operands -> scale 4
        return (
            (_hilo_sum_as_decimal(v) / F.lit(10_000)).cast("double").alias(alias)
        )

    def s4w(v, alias):  # scale-4 product at price*price magnitude
        return (
            (_hilo3_sum_as_decimal(v) / F.lit(10_000)).cast("double").alias(alias)
        )

    m = li.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n"),
        s2(q2, "sx1"),
        s2(d2, "sx2"),
        s2(p2, "sy"),
        s4(q2 * q2, "s11"),
        s4(q2 * d2, "s12"),
        s4(d2 * d2, "s22"),
        s4(q2 * p2, "s1y"),
        s4(d2 * p2, "s2y"),
        s4w(p2 * p2, "syy"),
    )
    a = F.col("n").cast("double")
    b = F.col("sx1")
    c = F.col("sx2")
    y0 = F.col("sy")
    e = F.col("s11")
    f = F.col("s12")
    g = F.col("s22")
    y1 = F.col("s1y")
    y2 = F.col("s2y")
    yy = F.col("syy")
    det = a * (e * g - f * f) - b * (b * g - f * c) + c * (b * f - e * c)
    det0 = y0 * (e * g - f * f) - b * (y1 * g - f * y2) + c * (y1 * f - e * y2)
    det1 = a * (y1 * g - y2 * f) - y0 * (b * g - f * c) + c * (b * y2 - y1 * c)
    det2 = a * (e * y2 - y1 * f) - b * (b * y2 - y1 * c) + y0 * (b * f - e * c)
    b0, b1, b2 = det0 / det, det1 / det, det2 / det
    r2 = 1.0 - (yy - b0 * y0 - b1 * y1 - b2 * y2) / (yy - y0 * y0 / a)
    return m.select(
        "l_returnflag",
        "n",
        F.round(b0, 6).alias("b0_r6"),
        F.round(b1, 6).alias("b1_r6"),
        F.round(b2, 6).alias("b2_r6"),
        F.round(r2, 6).alias("r2_r6"),
    ).orderBy("l_returnflag")


#: Coreset sample size and the seeded-race salt.
CORESET_K = 40
CORESET_SALT = "cs-v1#"


@query(
    "sample_coreset_sensitivity",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    c0 AS (
      SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {K_CLUSTERS}
    ),
    d1 AS (
      SELECT e.vec_id, c0.cid,
             round(list_sum(list_transform(range(1, len(e.v) + 1),
                    i -> (e.v[i] - c0.cv[i]) * (e.v[i] - c0.cv[i]))), 6) AS dist,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                ORDER BY round(list_sum(list_transform(
                                  range(1, len(e.v) + 1),
                                  i -> (e.v[i] - c0.cv[i]) * (e.v[i] - c0.cv[i]))), 6),
                                c0.cid) AS rn
      FROM e, c0
    ),
    a1 AS (SELECT vec_id, cid, dist FROM d1 WHERE rn = 1),
    per_c AS (
      SELECT cid, CAST(COUNT(*) AS BIGINT) AS nk FROM a1 GROUP BY cid
    ),
    tot AS (
      SELECT CAST(SUM(CAST(dist AS DECIMAL(28,14))) AS DOUBLE) AS cost
      FROM a1
    ),
    sens AS (
      SELECT a.vec_id, a.cid, a.dist,
             0.5 * a.dist / t.cost + 0.5 / p.nk AS s
      FROM a1 a JOIN per_c p USING (cid) CROSS JOIN tot t
    )
    SELECT vec_id, cid,
           round(s, 9) AS sensitivity_r9,
           round(-ln((CAST(('0x' || substr(md5('{CORESET_SALT}'
                  || CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
                  / 4294967296.0) / s, 9) AS race_key
    FROM sens
    ORDER BY race_key, vec_id LIMIT {CORESET_K}
    """,
    tags=("sampling", "ml", "beyond"),
)
def q_sample_coreset_sensitivity(spark, sf_dir: str) -> DataFrame:
    """k-means coreset construction by sensitivity sampling (Feldman &
    Langberg 2011 / Bachem et al. 2018): assign each embedding to its
    nearest seed centroid, compute the per-point sensitivity bound
    s_i = ½·cost_i/COST + ½/n_cluster(i), then draw a CORESET_K-point
    sample PROPORTIONAL to sensitivity without replacement via the
    exponential race (`sample_gumbel_weighted`'s mechanism with s_i as
    the weight). The winners are the representative subset a pipeline
    clusters/trains on instead of the full corpus.

    Scale shape: assignment is the broadcast-K centroid argmin (same
    map-side shape as ml_kmeans_lite/SemDeDup); cluster sizes and the
    total cost are a K-row and a 1-row broadcast aggregate; sensitivity
    and the race key are then pure map-side expressions and the cut is
    TakeOrderedAndProject. Nothing after the one assignment pass
    shuffles more than K rows. Cost sums in exact DECIMAL over round-6
    distances; race keys round-9 (ties → vec_id) so libm ln() ulps
    cannot reorder the boundary."""
    from job_market_research_spark.ml.neardup import portable_hash
    from job_market_research_spark.ml.similarity import as_double_vec

    vecs = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_vec("embedding").alias("v")
    )
    seeds = vecs.filter(F.col("vec_id") < K_CLUSTERS).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    a1 = assign_clusters(vecs, seeds).select("vec_id", "cid", "dist")
    per_c = a1.groupBy("cid").agg(F.count("*").alias("nk"))
    tot = a1.agg(
        F.sum(F.col("dist").cast("decimal(28,14)")).cast("double").alias("cost")
    )
    sens = (
        a1.join(F.broadcast(per_c), "cid")
        .crossJoin(F.broadcast(tot))
        .select(
            "vec_id",
            "cid",
            (
                0.5 * F.col("dist") / F.col("cost") + 0.5 / F.col("nk")
            ).alias("s"),
        )
    )
    u = (
        portable_hash(
            F.concat(F.lit(CORESET_SALT), F.col("vec_id").cast("string"))
        )
        + 0.5
    ) / 4294967296.0
    return (
        sens.select(
            "vec_id",
            "cid",
            F.round("s", 9).alias("sensitivity_r9"),
            F.round(-F.log(u) / F.col("s"), 9).alias("race_key"),
        )
        .orderBy("race_key", "vec_id")
        .limit(CORESET_K)
    )


#: AdaBoost-stump training: rounds, threshold grid size, ε clamp.
ADA_ROUNDS = 3
ADA_BINS = 16
ADA_EPS_CLAMP = 1.0e-6

_ADA_BASE_SQL = f"""
    rows AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS x,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END AS y
      FROM events WHERE value IS NOT NULL
    ),
    bounds AS (SELECT MIN(x) AS lo, MAX(x) AS hi FROM rows),
    thr AS (
      SELECT lo + (k * (hi - lo)) // {ADA_BINS + 1} AS theta
      FROM bounds, unnest(generate_series(1, {ADA_BINS})) AS t(k)
    ),
    hyps AS (
      SELECT theta, p FROM thr, (VALUES (1), (-1)) AS pol(p)
    )"""


def _ada_round_sql(t: int, w_expr: str) -> str:
    """One boosting round: weighted error per hypothesis (explode rows
    × 32 hypotheses), deterministic argmin, alpha."""
    return f""",
    err{t} AS (
      SELECT h.theta, h.p,
             round(CAST(SUM(CASE WHEN (CASE WHEN r.x <= h.theta THEN h.p
                                       ELSE -h.p END) <> r.y
                  THEN CAST({w_expr} AS DECIMAL(28,14)) ELSE 0 END) AS DOUBLE)
                  / CAST((SELECT SUM(CAST({w_expr} AS DECIMAL(28,14)))
                          FROM rows r) AS DOUBLE), 9) AS eps
      FROM rows r CROSS JOIN hyps h
      GROUP BY h.theta, h.p
    ),
    m{t} AS (
      SELECT theta, p,
             least(greatest(eps, {ADA_EPS_CLAMP}), 1 - {ADA_EPS_CLAMP})
               AS eps
      FROM err{t} ORDER BY eps, theta, p LIMIT 1
    ),
    a{t} AS (
      SELECT theta, p, eps,
             round(0.5 * ln((1 - eps) / eps), 9) AS alpha
      FROM m{t}
    )"""


def _ada_w_expr(upto: int) -> str:
    """Cumulative weight of a row after rounds 1..upto (1.0 before)."""
    if upto == 0:
        return "1.0"
    terms = " + ".join(
        f"(SELECT -alpha * (CASE WHEN r.x <= theta THEN p ELSE -p END)"
        f" FROM a{j}) * r.y"
        for j in range(1, upto + 1)
    )
    return f"exp({terms})"


def _ada_oracle(rounds: int = ADA_ROUNDS) -> str:
    parts = ["    WITH" + _ADA_BASE_SQL]
    for t in range(1, rounds + 1):
        parts.append(_ada_round_sql(t, _ada_w_expr(t - 1)))
    score = " + ".join(
        f"(SELECT alpha * (CASE WHEN r.x <= theta THEN p ELSE -p END)"
        f" FROM a{j})"
        for j in range(1, rounds + 1)
    )
    unions = "\n      UNION ALL\n".join(
        f"      SELECT {t} AS rnd, theta, CAST(p AS INT) AS polarity,"
        f" eps AS eps_r9, alpha AS alpha_r9 FROM a{t}"
        for t in range(1, rounds + 1)
    )
    parts.append(
        f""",
    acc AS (
      SELECT round(CAST(SUM(CASE WHEN (CASE WHEN ({score}) >= 0 THEN 1
                                       ELSE -1 END) = r.y
                   THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS acc
      FROM rows r
    )
    SELECT CAST(rnd AS INT) AS rnd, theta, polarity, eps_r9, alpha_r9,
           (SELECT acc FROM acc) AS train_acc_r6
    FROM (
{unions}
    ) ORDER BY rnd"""
    )
    return "".join(parts)


@query("ml_adaboost_stumps", oracle=_ada_oracle())
def q_ml_adaboost_stumps(spark, sf_dir: str) -> DataFrame:
    """AdaBoost with depth-1 decision stumps (Freund & Schapire 1997),
    trained end-to-end as aggregations: {ADA_ROUNDS} rounds of
    'score all {ADA_BINS}×2 candidate stumps by weighted error in one
    exploded aggregation, pick the argmin, reweight' — boosting joins
    OLS/Naive-Bayes/k-means in the training-as-aggregation family
    (per round: ONE distributed pass + a 1-row argmin collect, exactly
    the BPE-training loop shape). Label: is-purchase; feature: the
    event value in integer cents.

    Cross-engine exactness: thresholds are INTEGER cent expressions
    from integer min/max (no float grid), stump comparisons are
    integer, weighted-error sums run in exact DECIMAL, and ε/α are
    rounded to 9 dp before use (argmin ties then break on (θ, pol) —
    so a libm exp/ln ulp can never flip the learned model). Weights
    are exp of a ±α sum, recomputed per round from the learned
    literals rather than mutated in place — retry-safe and
    oracle-replayable. Output: the learned stump per round + training
    accuracy of the weighted vote.

    Round 8 (r7 verdict item 4): every stump prediction AND every
    row weight is a function of (grid bin, y) only — all thresholds
    come from the fixed {ADA_BINS}-value θ grid, so rows binned by
    'first grid index with x ≤ θ_k' are indistinguishable to every
    hypothesis of every round. The corpus is therefore compressed
    ONCE into a ≤2·({ADA_BINS}+1)-row (bin, y, n) moment table (one
    distributed pass after the min/max pass, exactly the per-bin
    moment shape the GBDT query uses) and every boosting round runs
    driver-side over those ≤34 tuples — the same precedent alpha
    already set (Python math.log on the 9dp-rounded eps). Exactness
    is preserved group-wise: within a group every per-row weight
    double is identical (same exp argument, terms added in learned
    order), so the oracle's SUM of n identical DECIMAL(28,14) casts
    equals n × the cast value — replicated with exact decimal
    arithmetic (quantize to scale 14, ROUND_HALF_UP, the same
    rounding Spark's double→decimal cast applies via
    BigDecimal.valueOf(d).setScale(14, HALF_UP)); the mis/tot ratio
    then converts each exact decimal to its nearest double, exactly
    as both engines' decimal→double casts do."""
    from decimal import ROUND_HALF_UP, Decimal

    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    rows = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("x"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(-1).alias("y"),
    )
    b = rows.agg(F.min("x").alias("lo"), F.max("x").alias("hi")).first()
    lo, hi = b["lo"], b["hi"]
    thetas = [lo + (k * (hi - lo)) // (ADA_BINS + 1) for k in range(1, ADA_BINS + 1)]
    # k is the 1-based grid index: x ≤ θ_k ⟺ bin ≤ k (grid ascending;
    # bin = 1 + count of grid points strictly below x, so duplicates
    # from a degenerate lo≈hi grid stay correct).
    hyps = [(k + 1, th, p) for k, th in enumerate(thetas) for p in (1, -1)]
    bin_expr = F.lit(1)
    for th in thetas:
        bin_expr = bin_expr + F.when(F.col("x") > th, 1).otherwise(0)
    moments = [
        (r["b"], r["y"], r["n"])
        for r in rows.groupBy(bin_expr.alias("b"), "y")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    learned = []  # (rnd, k, theta, pol, eps, alpha)
    q14 = Decimal("1e-14")

    def round_half_up(x: float, scale: str) -> float:
        """Spark's round(double, n): BigDecimal.valueOf(d) (shortest
        decimal repr) then setScale(n, HALF_UP) — NOT Python round(),
        whose half-even ties would diverge from both engines."""
        return float(Decimal(repr(x)).quantize(Decimal(scale), ROUND_HALF_UP))

    def weight(bin_idx: int, y: int) -> float:
        """The SAME double the per-row plan computed: identical alpha
        literals, terms added in learned order, one exp (glibc exp —
        the ratio's 9dp round absorbs any engine ulp, exactly as it
        did for the JVM-exp path this replaces)."""
        if not learned:
            return 1.0
        s = None
        for _, k, _, p, _, alpha in learned:
            h = p if bin_idx <= k else -p
            term = (-alpha * h) * y
            s = term if s is None else s + term
        return math.exp(s)

    for rnd in range(1, ADA_ROUNDS + 1):
        # Oracle parity: the oracle casts each row's weight to
        # DECIMAL(28,14) (round half-up at scale 14) then sums; a
        # group of n identical values sums to exactly n × the cast
        # value. Python Decimal sums are exact at any precision.
        wd = {
            (bi, y): Decimal(repr(weight(bi, y))).quantize(q14, ROUND_HALF_UP)
            for bi, y, _ in moments
        }
        tot = sum(Decimal(n) * wd[(bi, y)] for bi, y, n in moments)
        eps_by_hyp = []
        for k, th, p in hyps:
            mis = sum(
                Decimal(n) * wd[(bi, y)]
                for bi, y, n in moments
                if (p if bi <= k else -p) != y
            )
            eps_by_hyp.append(
                (round_half_up(float(mis) / float(tot), "1e-9"), th, p, k)
            )
        # Deterministic argmin with the same (eps, theta, polarity)
        # tiebreak the previous orderBy used.
        eps_t, th, p, k = min(eps_by_hyp)
        eps = min(max(eps_t, ADA_EPS_CLAMP), 1 - ADA_EPS_CLAMP)
        alpha = round(0.5 * math.log((1 - eps) / eps), 9)
        learned.append((rnd, k, th, p, eps, alpha))

    def vote(bin_idx: int) -> int:
        s = None
        for _, k, _, p, _, alpha in learned:
            term = alpha * (p if bin_idx <= k else -p)
            s = term if s is None else s + term
        return 1 if s >= 0 else -1

    n_total = sum(n for _, _, n in moments)
    n_correct = sum(n for bi, y, n in moments if vote(bi) == y)
    acc = round_half_up(n_correct / n_total, "1e-6")
    return spark.createDataFrame(
        [(r, th, p, e, a, acc) for r, _, th, p, e, a in learned],
        "rnd int, theta long, polarity int, eps_r9 double,"
        " alpha_r9 double, train_acc_r6 double",
    ).orderBy("rnd")


#: GBDT-stump regression: boosting rounds and the hour-threshold grid.
GBDT_ROUNDS = 3


def _gbdt_round_sql(stats: str, pred: str, out_pick: str, out_pred: str) -> str:
    """One unrolled gradient-boosting round as DuckDB CTEs: score every
    hour threshold on the 24-row moment table, pick the min-SSE stump
    (round-9, theta tie-break), emit the updated per-hour prediction."""
    return f"""
    grid_{out_pick} AS (
      SELECT t.theta,
             SUM(CASE WHEN s.h <= t.theta THEN s.n END) AS nl,
             SUM(CASE WHEN s.h <= t.theta
                      THEN s.sy - s.n * p.f END) AS rl,
             SUM(CASE WHEN s.h > t.theta THEN s.n END) AS nr,
             SUM(CASE WHEN s.h > t.theta
                      THEN s.sy - s.n * p.f END) AS rr,
             SUM(s.qy - 2 * p.f * s.sy + s.n * p.f * p.f) AS sse0
      FROM {stats} s
      JOIN {pred} p ON p.h = s.h
      CROSS JOIN (SELECT unnest(range(0, 23)) AS theta) t
      GROUP BY t.theta
    ),
    {out_pick} AS (
      SELECT theta, round(rl / nl, 9) AS gl, round(rr / nr, 9) AS gr,
             round(sse0 - rl * rl / nl - rr * rr / nr, 6) AS sse
      FROM grid_{out_pick}
      WHERE nl > 0 AND nr > 0
      ORDER BY round(sse0 - rl * rl / nl - rr * rr / nr, 9), theta
      LIMIT 1
    ),
    {out_pred} AS (
      SELECT s.h,
             p.f + CASE WHEN s.h <= k.theta THEN k.gl ELSE k.gr END AS f
      FROM {stats} s JOIN {pred} p ON p.h = s.h CROSS JOIN {out_pick} k
    )"""


@query(
    "ml_gbdt_stumps_regression",
    oracle=f"""
    WITH stats AS (
      SELECT CAST(hour(ts) AS BIGINT) AS h,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(value AS DECIMAL(28,10))
                      * CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS qy
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    f0 AS (
      SELECT round(SUM(sy) / SUM(n), 9) AS f FROM stats
    ),
    p0 AS (SELECT h, f0.f AS f FROM stats, f0),
    {_gbdt_round_sql("stats", "p0", "k1", "p1")},
    {_gbdt_round_sql("stats", "p1", "k2", "p2")},
    {_gbdt_round_sql("stats", "p2", "k3", "p3")}
    SELECT 1 AS rnd, CAST(theta AS BIGINT) AS theta,
           gl AS gamma_left_r9, gr AS gamma_right_r9, sse AS sse_r6
    FROM k1
    UNION ALL
    SELECT 2, CAST(theta AS BIGINT), gl, gr, sse FROM k2
    UNION ALL
    SELECT 3, CAST(theta AS BIGINT), gl, gr, sse FROM k3
    ORDER BY rnd
    """,
    tags=("ml", "training", "beyond"),
)
def q_ml_gbdt_stumps_regression(spark, sf_dir: str) -> DataFrame:
    """Gradient-boosted depth-1 regression (squared loss, Friedman
    2001) predicting event value from hour-of-day — boosting joins
    AdaBoost/OLS/k-means in the training-as-aggregation family, and
    shows the regression-side trick: ONE corpus pass collapses to the
    24-row per-hour moment table (n, Σy, Σy²), and because stump
    ensembles are piecewise-constant IN THE FEATURE, every boosting
    round — residual means, SSE of all 23 candidate thresholds, the
    argmin, the leaf values — is closed-form algebra on those 24 rows.
    Three rounds cost three 24-row passes, not three corpus scans.

    Exactness: moments in exact DECIMAL; leaf values round-9 before
    use; the argmin compares round-9 SSE with a theta tie-break (the
    AdaBoost discipline, so a ulp cannot flip the learned tree)."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    dec = F.col("value").cast("decimal(28,10)")
    stats = (
        ev.groupBy(F.hour("ts").cast("long").alias("h"))
        .agg(
            F.count("*").alias("n"),
            F.sum(dec).cast("double").alias("sy"),
            F.sum(dec * dec).cast("double").alias("qy"),
        )
        .collect()
    )
    import builtins

    n_tot = builtins.sum(r["n"] for r in stats)
    sy_tot = builtins.sum(r["sy"] for r in stats)
    f = {r["h"]: round(sy_tot / n_tot, 9) for r in stats}
    learned = []
    for rnd in range(1, GBDT_ROUNDS + 1):
        best = None
        for theta in range(0, 23):
            nl = builtins.sum(r["n"] for r in stats if r["h"] <= theta)
            nr = n_tot - nl
            if nl == 0 or nr == 0:
                continue
            rl = builtins.sum(
                r["sy"] - r["n"] * f[r["h"]] for r in stats if r["h"] <= theta
            )
            rr = builtins.sum(
                r["sy"] - r["n"] * f[r["h"]] for r in stats if r["h"] > theta
            )
            sse0 = builtins.sum(
                r["qy"] - 2 * f[r["h"]] * r["sy"] + r["n"] * f[r["h"]] ** 2
                for r in stats
            )
            sse = round(sse0 - rl * rl / nl - rr * rr / nr, 9)
            key = (sse, theta)
            if best is None or key < best[0]:
                best = (key, theta, round(rl / nl, 9), round(rr / nr, 9))
        _, theta, gl, gr = best
        learned.append((rnd, theta, gl, gr, round(best[0][0], 6)))
        f = {
            h: f[h] + (gl if h <= theta else gr) for h in f
        }
    # Driver-side round loop mirrors the adaboost/BPE shape: the
    # distributed work is the ONE moment pass above; each round is
    # 24-row algebra identical to the oracle's unrolled CTEs.
    return ev.sparkSession.createDataFrame(
        learned,
        "rnd int, theta long, gamma_left_r9 double,"
        " gamma_right_r9 double, sse_r6 double",
    ).orderBy("rnd")


@query(
    "ml_logreg_newton",
    oracle="""
    WITH base AS (
      SELECT l_returnflag,
             CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS y,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS p
      FROM lineitem
    ),
    m1 AS (
      SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS sy,
             SUM(p) AS sp,
             SUM(CAST(p AS DECIMAL(19,2)) * p) AS spp,
             SUM(CAST(p AS DECIMAL(19,2)) * y) AS spy
      FROM base GROUP BY l_returnflag
    ),
    s1 AS (
      SELECT l_returnflag, n,
             CAST(n AS DOUBLE) AS a,
             CAST(sy AS DOUBLE) AS syd,
             CAST(sp AS DOUBLE) / 10000.0 AS su,
             CAST(spp AS DOUBLE) / 100000000.0 AS suu,
             CAST(spy AS DOUBLE) / 10000.0 AS suy
      FROM m1
    ),
    betas1 AS (
      SELECT l_returnflag, n,
             4.0 * (suu * (syd - a / 2.0) - su * (suy - su / 2.0))
               / (a * suu - su * su) AS a0,
             4.0 * (a * (suy - su / 2.0) - su * (syd - a / 2.0))
               / (a * suu - su * su) AS a1
      FROM s1
    ),
    scored AS (
      SELECT b.l_returnflag, b.y, b.p,
             CAST(p AS DECIMAL(19,2)) * b.p AS pp,
             CAST(round(1.0 / (1.0 + exp(-(t.a0 + t.a1
                    * (CAST(b.p AS DOUBLE) / 10000.0)))), 6)
                  AS DECIMAL(8,6)) AS pr
      FROM base b JOIN betas1 t USING (l_returnflag)
    ),
    wrow AS (
      SELECT l_returnflag, y, p, pp, pr,
             CAST(CAST(pr AS DECIMAL(9,6))
                  * CAST(1 - pr AS DECIMAL(8,6)) AS DECIMAL(17,12)) AS w
      FROM scored
    ),
    m2 AS (
      SELECT l_returnflag,
             SUM(w) AS sw,
             -- first factors widened to width 19: DuckDB keeps
             -- width<=18 products in int64 and overflows (the
             -- ml_ols_multivariate trick)
             SUM(CAST(CAST(w AS DECIMAL(19,12)) * p AS DECIMAL(36,14)))
               AS swp,
             SUM(CAST(CAST(w AS DECIMAL(19,12)) * CAST(pp AS DECIMAL(19,4))
                      AS DECIMAL(38,16))) AS swpp,
             SUM(CAST(y - pr AS DECIMAL(8,6))) AS g0s,
             SUM(CAST(CAST(y - pr AS DECIMAL(19,6)) * p AS DECIMAL(28,8)))
               AS g1s
      FROM wrow GROUP BY l_returnflag
    ),
    s2 AS (
      SELECT m2.l_returnflag,
             CAST(sw AS DOUBLE) AS aw,
             CAST(swp AS DOUBLE) / 10000.0 AS bw,
             CAST(swpp AS DOUBLE) / 100000000.0 AS cw,
             CAST(g0s AS DOUBLE) AS g0,
             CAST(g1s AS DOUBLE) / 10000.0 AS g1
      FROM m2
    )
    SELECT t.l_returnflag, t.n,
           round(t.a0 + (cw * g0 - bw * g1) / (aw * cw - bw * bw), 6)
             AS b0_r6,
           round(t.a1 + (aw * g1 - bw * g0) / (aw * cw - bw * bw), 6)
             AS b1_r6
    FROM betas1 t JOIN s2 USING (l_returnflag)
    ORDER BY t.l_returnflag
    """,
    tags=("ml", "stats", "beyond"),
)
def q_ml_logreg_newton(spark, sf_dir: str) -> DataFrame:
    """Logistic regression by BOUNDED Newton-Raphson: fit
    P(quantity > 25) ~ extendedprice per returnflag with exactly two
    Newton steps from the zero vector, each step ONE exact-decimal
    moment pass over the corpus (the ml_ols_multivariate discipline
    extended to an iterative GLM). Step 1 is closed-form (at beta=0
    every weight is 1/4, so the update is 4·(XᵀX)⁻¹Xᵀ(y−½)); step 2
    re-scores every row with the broadcast step-1 coefficients,
    rounds the sigmoid to 6 decimals (the round-then-DECIMAL policy —
    exp() is the ONLY libm call, and a 1-ulp engine difference cannot
    move a value across a 1e-6 boundary in practice), and accumulates
    the weighted moments exactly; the 2×2 solve is plain column
    algebra on the per-group one-row table.

    Scale: two corpus scans total (the iteration count is a CONSTANT,
    not data-dependent), map-side decimal partials, a 3-row broadcast
    join for the re-score, |groups| output rows. This is the shape an
    iterative fit must take at 100 TB — per-iteration full passes
    with driver-side tiny solves, never per-row Python.
    """
    from job_market_research_spark.exact import limb_sum_scaled

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.when(F.col("l_quantity") > 25, 1).otherwise(0).alias("y"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("p"),
    )
    # Moment sums as scaled-long limb sums (exact.py; the r16 change-2
    # discipline extended here in r17): p is 2dp money, so its decimal
    # unscaled value p2 = p*100 is an exact long (<= ~1.2e7; the
    # decimal multiply and truncating cast never touch a double), and
    # every per-row product below is an exact integer. Each recombined
    # decimal is the SAME rational as the wide-decimal SUM it replaces
    # — bit-identical moments (verified at adoption, see
    # OPTIMIZATION_r17.md), at plain-long-sum cost per row. Limb
    # counts per exact.py's magnitude rule: |p2| <= 1.2e7 -> 2-limb,
    # |p2*y| <= 1.2e7 -> 2-limb, |p2*p2| <= 1.5e14 -> 3-limb.
    p2l = (F.col("p") * 100).cast("long")
    yl = F.col("y").cast("long")
    m1 = li.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        limb_sum_scaled(p2l, 2, 32).alias("sp"),
        limb_sum_scaled(p2l * p2l, 4, 32, limbs=3).alias("spp"),
        limb_sum_scaled(p2l * yl, 2, 32).alias("spy"),
    )
    s1 = m1.select(
        "l_returnflag",
        "n",
        F.col("n").cast("double").alias("a"),
        F.col("sy").cast("double").alias("syd"),
        (F.col("sp").cast("double") / F.lit(10000.0)).alias("su"),
        (F.col("spp").cast("double") / F.lit(100000000.0)).alias("suu"),
        (F.col("spy").cast("double") / F.lit(10000.0)).alias("suy"),
    )
    a, syd = F.col("a"), F.col("syd")
    su, suu, suy = F.col("su"), F.col("suu"), F.col("suy")
    det1 = a * suu - su * su
    betas1 = s1.select(
        "l_returnflag",
        "n",
        (
            F.lit(4.0)
            * (suu * (syd - a / F.lit(2.0)) - su * (suy - su / F.lit(2.0)))
            / det1
        ).alias("a0"),
        (
            F.lit(4.0)
            * (a * (suy - su / F.lit(2.0)) - su * (syd - a / F.lit(2.0)))
            / det1
        ).alias("a1"),
    )
    # betas1's subtree (one full lineitem moment pass) is consumed
    # TWICE — broadcast into the step-2 re-score and again in the
    # final coefficient join — with DIFFERENT column prunings, so the
    # two broadcast subtrees are never canonically equal and
    # ReuseExchange cannot dedupe them (r15 profile: 3 lineitem scans,
    # 0 ReusedExchange). Staging the 3-row frame collapses the fit to
    # its designed two corpus passes; sf0.1 A/B in SCALE.md.
    from job_market_research_spark.staging import staged_frame

    # Bind the inline frame to its own name before rebinding `betas1`:
    # the build closure must not capture the variable it assigns to,
    # or a deferred build would resolve to the staged frame itself.
    betas1_inline = betas1
    betas1 = staged_frame(
        spark, "logreg_betas1", sf_dir, lambda: betas1_inline
    )
    z = F.col("a0") + F.col("a1") * (F.col("p").cast("double") / F.lit(10000.0))
    scored = li.join(F.broadcast(betas1.select("l_returnflag", "a0", "a1")),
                     "l_returnflag").select(
        "l_returnflag",
        "y",
        "p",
        (F.col("p").cast("decimal(19,2)") * F.col("p")).alias("pp"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
        .cast("decimal(8,6)")
        .alias("pr"),
    )
    wrow = scored.withColumn(
        "w",
        (
            F.col("pr").cast("decimal(9,6)")
            * (F.lit(1) - F.col("pr")).cast("decimal(8,6)")
        ).cast("decimal(17,12)"),
    )
    # Step-2 moment sums: pr is DECIMAL(8,6) by contract (the rounded
    # sigmoid), so pr6 = pr*1e6 is an exact long in [0, 1e6] and
    # w's unscaled value is exactly pr6*(1e6-pr6) <= 2.5e11 — the
    # scaled-long path reproduces sw / g0s / g1s as the same rationals
    # the wide-decimal sums computed (limb counts per magnitude:
    # |w12| <= 2.5e11 -> 2-limb; |(y-pr)*1e6| <= 1e6 -> plain long sum,
    # N_safe 9.2e12 rows/group; |(y-pr)6 * p2| <= 1.2e13 -> 3-limb).
    # swp (scale 14) and swpp (scale 16) stay wide-decimal: their
    # unscaled group sums need ~24+/28+ integer digits, and
    # decimal(38)'s division typing cannot hold sum_digits + scale + 2
    # past 38 (exact.py limb_sum_scaled's constraint) — reconstructing
    # them exactly is impossible without rescaling the CONTRACT, which
    # r17 deliberately leaves alone (OPTIMIZATION_r17.md).
    pr6 = (F.col("pr") * F.lit(1_000_000)).cast("long")
    w12 = pr6 * (F.lit(1_000_000) - pr6)
    ym6 = F.col("y").cast("long") * F.lit(1_000_000) - pr6
    p2m = (F.col("p") * 100).cast("long")
    m2 = wrow.groupBy("l_returnflag").agg(
        limb_sum_scaled(w12, 12, 24).alias("sw"),
        F.sum((F.col("w") * F.col("p")).cast("decimal(36,14)")).alias("swp"),
        F.sum(
            (F.col("w") * F.col("pp").cast("decimal(19,4)")).cast(
                "decimal(38,16)"
            )
        ).alias("swpp"),
        limb_sum_scaled(ym6, 6, 30, limbs=1).alias("g0s"),
        limb_sum_scaled(ym6 * p2m, 8, 28, limbs=3).alias("g1s"),
    )
    s2 = m2.select(
        "l_returnflag",
        F.col("sw").cast("double").alias("aw"),
        (F.col("swp").cast("double") / F.lit(10000.0)).alias("bw"),
        (F.col("swpp").cast("double") / F.lit(100000000.0)).alias("cw"),
        F.col("g0s").cast("double").alias("g0"),
        (F.col("g1s").cast("double") / F.lit(10000.0)).alias("g1"),
    )
    aw, bw, cw = F.col("aw"), F.col("bw"), F.col("cw")
    g0, g1 = F.col("g0"), F.col("g1")
    det2 = aw * cw - bw * bw
    return (
        betas1.join(s2, "l_returnflag")
        .select(
            "l_returnflag",
            "n",
            F.round(F.col("a0") + (cw * g0 - bw * g1) / det2, 6).alias("b0_r6"),
            F.round(F.col("a1") + (aw * g1 - bw * g0) / det2, 6).alias("b1_r6"),
        )
        .orderBy("l_returnflag")
    )


#: Deterministic EM init for the 1-D two-component GMM: symmetric
#: weights, spread means, equal variances (sd 2000).
GMM_MU0 = (1000.0, 7000.0)
GMM_V0 = 4000000.0


@query(
    "ml_gmm_em",
    oracle=f"""
    WITH base AS (
      SELECT CAST(c_acctbal AS DOUBLE) AS xd,
             CAST(c_acctbal AS DECIMAL(18,2)) AS x,
             CAST(CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DECIMAL(19,2))
                  * CAST(c_acctbal AS DECIMAL(18,2)) AS DECIMAL(13,4)) AS xx
      FROM customer
    ),
    e1 AS (
      SELECT x, xx,
             CAST(round(1.0 / (1.0 + exp(-(
               -(xd - {GMM_MU0[0]}) * (xd - {GMM_MU0[0]}) / (2.0 * {GMM_V0})
               + (xd - {GMM_MU0[1]}) * (xd - {GMM_MU0[1]}) / (2.0 * {GMM_V0})
             ))), 6) AS DECIMAL(8,6)) AS r1
      FROM base
    ),
    m1 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(r1) AS sr,
             SUM(CAST(CAST(r1 AS DECIMAL(19,6)) * x AS DECIMAL(28,8)))
               AS srx,
             SUM(CAST(CAST(r1 AS DECIMAL(19,6)) * xx AS DECIMAL(38,10)))
               AS srxx,
             SUM(x) AS sx,
             SUM(CAST(xx AS DECIMAL(19,4))) AS sxx
      FROM e1
    ),
    p1 AS (
      SELECT n,
             CAST(sr AS DOUBLE) / n AS pi1,
             CAST(srx AS DOUBLE) / CAST(sr AS DOUBLE) AS mu1,
             greatest(CAST(srxx AS DOUBLE) / CAST(sr AS DOUBLE)
               - (CAST(srx AS DOUBLE) / CAST(sr AS DOUBLE))
                 * (CAST(srx AS DOUBLE) / CAST(sr AS DOUBLE)), 1e-6) AS v1,
             (CAST(sx AS DOUBLE) - CAST(srx AS DOUBLE))
               / (n - CAST(sr AS DOUBLE)) AS mu2,
             greatest((CAST(sxx AS DOUBLE) - CAST(srxx AS DOUBLE))
               / (n - CAST(sr AS DOUBLE))
               - ((CAST(sx AS DOUBLE) - CAST(srx AS DOUBLE))
                  / (n - CAST(sr AS DOUBLE)))
                 * ((CAST(sx AS DOUBLE) - CAST(srx AS DOUBLE))
                    / (n - CAST(sr AS DOUBLE))), 1e-6) AS v2
      FROM m1
    ),
    e2 AS (
      SELECT b.x, b.xx,
             CAST(round(1.0 / (1.0 + exp(-(
               ln(p.pi1) - ln(1.0 - p.pi1)
               - 0.5 * (ln(p.v1) - ln(p.v2))
               - (b.xd - p.mu1) * (b.xd - p.mu1) / (2.0 * p.v1)
               + (b.xd - p.mu2) * (b.xd - p.mu2) / (2.0 * p.v2)
             ))), 6) AS DECIMAL(8,6)) AS r1
      FROM base b CROSS JOIN p1 p
    ),
    m2 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(r1) AS sr,
             SUM(CAST(CAST(r1 AS DECIMAL(19,6)) * x AS DECIMAL(28,8)))
               AS srx,
             SUM(CAST(CAST(r1 AS DECIMAL(19,6)) * xx AS DECIMAL(38,10)))
               AS srxx,
             SUM(x) AS sx,
             SUM(CAST(xx AS DECIMAL(19,4))) AS sxx
      FROM e2
    )
    SELECT n,
           round(CAST(sr AS DOUBLE) / n, 6) AS pi1_r6,
           round(CAST(srx AS DOUBLE) / CAST(sr AS DOUBLE), 6) AS mu1_r6,
           round(sqrt(greatest(CAST(srxx AS DOUBLE) / CAST(sr AS DOUBLE)
             - (CAST(srx AS DOUBLE) / CAST(sr AS DOUBLE))
               * (CAST(srx AS DOUBLE) / CAST(sr AS DOUBLE)), 1e-6)), 6)
             AS sd1_r6,
           round((CAST(sx AS DOUBLE) - CAST(srx AS DOUBLE))
                 / (n - CAST(sr AS DOUBLE)), 6) AS mu2_r6,
           round(sqrt(greatest((CAST(sxx AS DOUBLE) - CAST(srxx AS DOUBLE))
             / (n - CAST(sr AS DOUBLE))
             - ((CAST(sx AS DOUBLE) - CAST(srx AS DOUBLE))
                / (n - CAST(sr AS DOUBLE)))
               * ((CAST(sx AS DOUBLE) - CAST(srx AS DOUBLE))
                  / (n - CAST(sr AS DOUBLE))), 1e-6)), 6) AS sd2_r6
    FROM m2
    """,
    tags=("ml", "stats", "beyond"),
)
def q_ml_gmm_em(spark, sf_dir: str) -> DataFrame:
    """1-D two-component Gaussian mixture fit by BOUNDED EM — exactly
    two E/M rounds from a deterministic init (spread means, equal
    variances, symmetric weights), completing the bounded-iteration
    trio: k-means (broadcast argmin), Newton logistic (weighted
    moments), now EM (soft-responsibility moments). Each E-step is a
    map-side expression (the responsibility is a 2-component posterior
    = a sigmoid of the log-density gap, round-6 quantized — the
    logreg_newton libm policy); each M-step is ONE exact-decimal
    moment aggregation; component-2 moments come from totals minus
    component-1 (r2 = 1 − r1, so no second weighted pass). The second
    round's parameters broadcast as a 1-row crossJoin.

    Scale: two corpus scans (iteration count constant), no window, no
    driver state beyond 5 parameters. sqrt is IEEE-correctly-rounded
    (safe cross-engine); ln/exp pass through the round-6 gate."""
    base = load(spark, sf_dir, "customer").select(
        F.col("c_acctbal").cast("double").alias("xd"),
        F.col("c_acctbal").cast("decimal(18,2)").alias("x"),
        (
            F.col("c_acctbal").cast("decimal(18,2)").cast("decimal(19,2)")
            * F.col("c_acctbal").cast("decimal(18,2)")
        )
        .cast("decimal(13,4)")
        .alias("xx"),
    )

    def resp(z):
        return (
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
            .cast("decimal(8,6)")
            .alias("r1")
        )

    def mstep(e):
        return e.agg(
            F.count("*").cast("long").alias("n"),
            F.sum("r1").alias("sr"),
            F.sum(
                (F.col("r1").cast("decimal(19,6)") * F.col("x")).cast(
                    "decimal(28,8)"
                )
            ).alias("srx"),
            F.sum(
                (F.col("r1").cast("decimal(19,6)") * F.col("xx")).cast(
                    "decimal(38,10)"
                )
            ).alias("srxx"),
            F.sum("x").alias("sx"),
            F.sum(F.col("xx").cast("decimal(19,4)")).alias("sxx"),
        )

    xd = F.col("xd")
    z1 = (
        -(xd - GMM_MU0[0]) * (xd - GMM_MU0[0]) / (2.0 * GMM_V0)
        + (xd - GMM_MU0[1]) * (xd - GMM_MU0[1]) / (2.0 * GMM_V0)
    )
    m1 = mstep(base.select("x", "xx", resp(z1)))
    sr, srx, srxx = (
        F.col("sr").cast("double"),
        F.col("srx").cast("double"),
        F.col("srxx").cast("double"),
    )
    sx, sxx, n = F.col("sx").cast("double"), F.col("sxx").cast("double"), F.col("n")
    p1 = m1.select(
        "n",
        (sr / n).alias("pi1"),
        (srx / sr).alias("mu1"),
        F.greatest(srxx / sr - (srx / sr) * (srx / sr), F.lit(1e-6)).alias(
            "v1"
        ),
        ((sx - srx) / (n - sr)).alias("mu2"),
        F.greatest(
            (sxx - srxx) / (n - sr)
            - ((sx - srx) / (n - sr)) * ((sx - srx) / (n - sr)),
            F.lit(1e-6),
        ).alias("v2"),
    )
    z2 = (
        F.log(F.col("pi1"))
        - F.log(F.lit(1.0) - F.col("pi1"))
        - 0.5 * (F.log(F.col("v1")) - F.log(F.col("v2")))
        - (xd - F.col("mu1")) * (xd - F.col("mu1")) / (2.0 * F.col("v1"))
        + (xd - F.col("mu2")) * (xd - F.col("mu2")) / (2.0 * F.col("v2"))
    )
    m2 = mstep(
        base.crossJoin(F.broadcast(p1)).select("x", "xx", resp(z2))
    )
    return m2.select(
        "n",
        F.round(sr / n, 6).alias("pi1_r6"),
        F.round(srx / sr, 6).alias("mu1_r6"),
        F.round(
            F.sqrt(
                F.greatest(srxx / sr - (srx / sr) * (srx / sr), F.lit(1e-6))
            ),
            6,
        ).alias("sd1_r6"),
        F.round((sx - srx) / (n - sr), 6).alias("mu2_r6"),
        F.round(
            F.sqrt(
                F.greatest(
                    (sxx - srxx) / (n - sr)
                    - ((sx - srx) / (n - sr)) * ((sx - srx) / (n - sr)),
                    F.lit(1e-6),
                )
            ),
            6,
        ).alias("sd2_r6"),
    )

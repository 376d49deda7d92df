"""Model-evaluation aggregations: confusion metrics and calibration
(beyond-reference, ML-pipeline family).

A pipeline that trains/applies classifiers in-engine (the lang-id
heuristic, `ml_naive_bayes_lang`, the linear quality model) also needs
to EVALUATE them in-engine — on a 100 TB corpus the evaluation is
itself a big-data job. Both operators here reduce the corpus to a
BOUNDED table in one pass (classes², or CAL_BINS rows) and compute all
metrics on that bounded table, so cost is one scan + one tiny shuffle
regardless of corpus size.

Exactness: every metric is a ratio of exact integer counts — identical
doubles on both engines before the final rounding (registry float
policy). Mean-confidence style averages of float ratios are
deliberately NOT emitted: a sum of rationals is order-dependent in
double; counts and count-ratios are not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from job_market_research_spark.functions.text import _count_token, tokens
from job_market_research_spark.io import load
from job_market_research_spark.registry import query

#: SQL twin of the lang-id marker counts (mirrors text_lang_id).
_MARKER_SQL = """
      SELECT doc_id, lang,
        len(list_filter(string_split(text,' '), x -> x = 'the')) AS c_en,
        len(list_filter(string_split(text,' '), x -> x = 'le'))  AS c_fr,
        len(list_filter(string_split(text,' '), x -> x = 'el'))  AS c_es,
        len(list_filter(string_split(text,' '), x -> x = 'der')) AS c_de
      FROM documents
"""

_PRED_SQL = """
      SELECT doc_id, lang,
           CASE WHEN c_en >= c_fr AND c_en >= c_es AND c_en >= c_de AND c_en > 0 THEN 'en'
                WHEN c_fr >= c_es AND c_fr >= c_de AND c_fr > 0 THEN 'fr'
                WHEN c_es >= c_de AND c_es > 0 THEN 'es'
                WHEN c_de > 0 THEN 'de'
                ELSE 'und' END AS pred
      FROM c
"""


def _lang_pred(spark, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = tokens("text")
    c_en = _count_token(toks, "the")
    c_fr = _count_token(toks, "le")
    c_es = _count_token(toks, "el")
    c_de = _count_token(toks, "der")
    pred = (
        F.when((c_en >= c_fr) & (c_en >= c_es) & (c_en >= c_de) & (c_en > 0), "en")
        .when((c_fr >= c_es) & (c_fr >= c_de) & (c_fr > 0), "fr")
        .when((c_es >= c_de) & (c_es > 0), "es")
        .when(c_de > 0, "de")
        .otherwise("und")
    )
    return docs.select(
        "doc_id",
        "lang",
        pred.alias("pred"),
        c_en.alias("c_en"),
        (c_en + c_fr + c_es + c_de).alias("c_tot"),
    )


@query(
    "ml_eval_confusion",
    oracle=f"""
    WITH c AS ({_MARKER_SQL}),
    p AS ({_PRED_SQL}),
    cm AS (
      SELECT lang, pred, CAST(COUNT(*) AS BIGINT) AS n
      FROM p GROUP BY 1, 2
    ),
    cls AS (SELECT DISTINCT lang AS c FROM cm),
    m AS (
      SELECT cls.c,
             COALESCE(SUM(CASE WHEN cm.lang = cls.c AND cm.pred = cls.c
                               THEN cm.n END), 0) AS tp,
             COALESCE(SUM(CASE WHEN cm.pred = cls.c AND cm.lang <> cls.c
                               THEN cm.n END), 0) AS fp,
             COALESCE(SUM(CASE WHEN cm.lang = cls.c AND cm.pred <> cls.c
                               THEN cm.n END), 0) AS fn
      FROM cls LEFT JOIN cm ON cm.lang = cls.c OR cm.pred = cls.c
      GROUP BY 1
    )
    SELECT c AS lang, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn,
           round(CASE WHEN tp + fp > 0
                 THEN CAST(tp AS DOUBLE) / (tp + fp) ELSE 0 END, 6)
             AS precision_r6,
           round(CASE WHEN tp + fn > 0
                 THEN CAST(tp AS DOUBLE) / (tp + fn) ELSE 0 END, 6)
             AS recall_r6,
           round(CASE WHEN 2 * tp + fp + fn > 0
                 THEN CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn)
                 ELSE 0 END, 6) AS f1_r6
    FROM m ORDER BY lang
    """,
)
def q_ml_eval_confusion(spark, sf_dir: str) -> DataFrame:
    """Per-class precision / recall / F1 of the lang-id heuristic
    against the `lang` ground truth. One corpus scan reduces to the
    (lang, pred) confusion table — ≤ classes² rows — and every metric
    derives from that bounded table with conditional sums. F1 is
    computed as 2tp/(2tp+fp+fn) (one division of exact integers)
    rather than the p·r form, so no intermediate float feeds another
    float."""
    cm = _lang_pred(spark, sf_dir).groupBy("lang", "pred").agg(
        F.count("*").cast("long").alias("n")
    )
    cls = cm.select(F.col("lang").alias("c")).distinct()
    joined = cls.join(
        cm, (cm.lang == cls.c) | (cm.pred == cls.c), "left"
    )
    m = joined.groupBy("c").agg(
        F.coalesce(
            F.sum(F.when((F.col("lang") == F.col("c")) & (F.col("pred") == F.col("c")), F.col("n"))),
            F.lit(0),
        ).alias("tp"),
        F.coalesce(
            F.sum(F.when((F.col("pred") == F.col("c")) & (F.col("lang") != F.col("c")), F.col("n"))),
            F.lit(0),
        ).alias("fp"),
        F.coalesce(
            F.sum(F.when((F.col("lang") == F.col("c")) & (F.col("pred") != F.col("c")), F.col("n"))),
            F.lit(0),
        ).alias("fn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return m.select(
        F.col("c").alias("lang"),
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        F.round(
            F.when(tp + fp > 0, tp.cast("double") / (tp + fp)).otherwise(0.0), 6
        ).alias("precision_r6"),
        F.round(
            F.when(tp + fn > 0, tp.cast("double") / (tp + fn)).otherwise(0.0), 6
        ).alias("recall_r6"),
        F.round(
            F.when(
                2 * tp + fp + fn > 0,
                (2 * tp).cast("double") / (2 * tp + fp + fn),
            ).otherwise(0.0),
            6,
        ).alias("f1_r6"),
    ).orderBy("lang")


#: Calibration histogram resolution.
CAL_BINS = 10


#: Bin width: 2% marker-density steps (floor(density·50), capped at 9).
CAL_DENSITY_SCALE = 50


@query(
    "ml_calibration_bins",
    oracle=f"""
    WITH c AS (
      SELECT doc_id, lang,
        len(list_filter(string_split(text,' '), x -> x = 'the')) AS c_en,
        len(list_filter(string_split(text,' '), x -> x <> ''))   AS n_tok
      FROM documents
    )
    SELECT CAST(least(floor(CAST(c_en AS DOUBLE) / n_tok
                            * {CAL_DENSITY_SCALE}), {CAL_BINS - 1}) AS INT)
             AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_en,
           round(CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS en_rate_r6
    FROM c WHERE n_tok > 0 GROUP BY 1 ORDER BY bin
    """,
)
def q_ml_calibration_bins(spark, sf_dir: str) -> DataFrame:
    """Reliability diagram for an English-ness score: the density of
    the 'the' marker per document, bucketed into CAL_BINS 2%-wide
    bins, against the observed English rate per bin. A calibrated
    scorer shows en_rate rising with the bin; a flat curve (what this
    corpus actually shows) is the diagnostic that says DON'T use this
    score as a confidence threshold to gate a 100 TB filter. One scan
    to a CAL_BINS-row table. The bin id is a floor of an identical
    IEEE division on both engines — floor is deterministic even when
    the ratio lands exactly on a bin edge, unlike round — and every
    emitted rate is a ratio of exact counts."""
    toks = tokens("text")
    c = load(spark, sf_dir, "documents").select(
        "lang",
        _count_token(toks, "the").alias("c_en"),
        F.size(F.filter(toks, lambda x: x != "")).alias("n_tok"),
    )
    return (
        c.filter(F.col("n_tok") > 0)
        .groupBy(
            F.least(
                F.floor(
                    F.col("c_en").cast("double")
                    / F.col("n_tok")
                    * CAL_DENSITY_SCALE
                ),
                F.lit(CAL_BINS - 1).cast("long"),
            )
            .cast("int")
            .alias("bin")
        )
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            .cast("long")
            .alias("n_en"),
            F.round(
                F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("double")
                / F.count("*"),
                6,
            ).alias("en_rate_r6"),
        )
        .orderBy("bin")
    )


#: Threshold sweep: equal-width candidate grid size.
F1_GRID = 32


@query(
    "ml_threshold_tune_f1",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             round(-0.25
               + 1.8 * (CAST(len(list_filter(string_split(text, ' '),
                       x -> x IN ('the','a','of','and','to','in')))
                       AS DOUBLE)
                 / len(list_filter(string_split(text, ' '), x -> x <> '')))
               + 0.05 * (CAST(len(text) AS DOUBLE)
                 / len(list_filter(string_split(text, ' '), x -> x <> '')))
               + 0.001 * len(list_filter(string_split(text, ' '),
                             x -> x <> '')), 6) AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    bounds AS (SELECT MIN(s) AS lo, MAX(s) AS hi FROM scored),
    grid AS (
      SELECT k, lo + k * (hi - lo) / {F1_GRID + 1} AS theta
      FROM bounds, unnest(generate_series(1, {F1_GRID})) AS t(k)
    ),
    sweep AS (
      SELECT g.k, g.theta,
             CAST(SUM(CASE WHEN s.s >= g.theta AND s.y = 1
                  THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN s.s >= g.theta AND s.y = 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN s.s < g.theta AND s.y = 1
                  THEN 1 ELSE 0 END) AS BIGINT) AS fn
      FROM scored s CROSS JOIN grid g
      GROUP BY g.k, g.theta
    )
    SELECT CAST(k AS INT) AS k, round(theta, 6) AS theta_r6, tp, fp, fn,
           round(CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0
                 ELSE 2.0 * tp / (2 * tp + fp + fn) END, 6) AS f1_r6
    FROM sweep ORDER BY k
    """,
    tags=("evaluation", "beyond"),
)
def q_ml_threshold_tune_f1(spark, sf_dir: str) -> DataFrame:
    """Decision-threshold tuning for the quality gate: sweep {F1_GRID}
    equal-width thresholds over the linear quality score
    (`text_quality_model`'s exact feature algebra) against a reference
    label (lang=='en' as the held-out 'verified good' proxy) and
    report the full TP/FP/FN/F1 curve — the calibration step between
    training a filter and deploying it (ship the argmax row's θ;
    shipping a default 0.5 on an uncalibrated score is the classic
    silent-recall killer).

    One conditional-agg pass over scored docs × the broadcast grid:
    counts are exact integers, F1 is one ratio of exact counts per
    grid row (zero-denominator rows pinned to 0), the grid edges are
    identical double arithmetic on both engines. |grid| rows out."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    n_tokens = F.size(toks).cast("long")
    n_stop = F.size(
        F.filter(toks, lambda x: x.isin("the", "a", "of", "and", "to", "in"))
    ).cast("long")
    s = F.round(
        F.lit(-0.25)
        + F.lit(1.8) * (n_stop.cast("double") / n_tokens)
        + F.lit(0.05)
        * (F.length("text").cast("long").cast("double") / n_tokens)
        + F.lit(0.001) * n_tokens,
        6,
    )
    scored = docs.select(
        s.alias("s"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    bounds = scored.agg(F.min("s").alias("lo"), F.max("s").alias("hi"))
    grid = (
        spark.range(1, F1_GRID + 1)
        .select(F.col("id").cast("int").alias("k"))
        .crossJoin(F.broadcast(bounds))
        .select(
            "k",
            (
                F.col("lo")
                + F.col("k") * (F.col("hi") - F.col("lo")) / (F1_GRID + 1)
            ).alias("theta"),
        )
    )
    sweep = (
        scored.crossJoin(F.broadcast(grid))
        .groupBy("k", "theta")
        .agg(
            F.sum(
                F.when((F.col("s") >= F.col("theta")) & (F.col("y") == 1), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("tp"),
            F.sum(
                F.when((F.col("s") >= F.col("theta")) & (F.col("y") == 0), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("fp"),
            F.sum(
                F.when((F.col("s") < F.col("theta")) & (F.col("y") == 1), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("fn"),
        )
    )
    f1 = F.when(2 * F.col("tp") + F.col("fp") + F.col("fn") == 0, 0.0).otherwise(
        2.0 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn"))
    )
    return sweep.select(
        "k",
        F.round("theta", 6).alias("theta_r6"),
        "tp",
        "fp",
        "fn",
        F.round(f1, 6).alias("f1_r6"),
    ).orderBy("k")


#: NDCG position discounts as INTEGERS: round(1e6 / log2(i+1)) for
#: rank i = 1..10, plus their prefix sums (the ideal DCG for h hits).
#: Integer-izing the discounts removes libm log2 AND float-sum order
#: from the metric entirely — DCG accumulates as an exact integer and
#: NDCG is one double division at the end (same trick as
#: ml_adaboost_stumps' integer-cent thresholds). Rendered from ONE
#: Python list into both engines.
_NDCG_W = (
    1000000, 630930, 500000, 430677, 386853,
    356207, 333333, 315465, 301030, 289065,
)
_NDCG_IDEAL = (
    1000000, 1630930, 2130930, 2561607, 2948460,
    3304667, 3638000, 3953465, 4254495, 4543560,
)

_NDCG_W_SQL = "[" + ", ".join(str(x) for x in _NDCG_W) + "]"
_NDCG_IDEAL_SQL = "[" + ", ".join(str(x) for x in _NDCG_IDEAL) + "]"


@query(
    "ml_eval_retrieval_ndcg",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v,
             sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
               AS nrm
      FROM embeddings
    ),
    q AS (
      SELECT vec_id AS qid, label AS qlabel, v AS qv, nrm AS qnrm
      FROM e WHERE vec_id % 100 = 7
    ),
    scored AS (
      SELECT q.qid, q.qlabel, e.vec_id, e.label,
             round(list_sum(list_transform(range(1, len(e.v) + 1),
                            i -> e.v[i] * q.qv[i])) / (e.nrm * q.qnrm), 6)
               AS cosine
      FROM e, q WHERE e.vec_id <> q.qid
    ),
    ranked AS (
      SELECT qid, qlabel, label, cosine,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cosine DESC, vec_id) AS rk
      FROM scored
    ),
    topk AS (
      SELECT qid,
             CASE WHEN label = qlabel THEN 1 ELSE 0 END AS rel, rk
      FROM ranked WHERE rk <= 10
    ),
    per_q AS (
      SELECT qid,
             CAST(SUM(rel) AS BIGINT) AS n_rel,
             MIN(CASE WHEN rel = 1 THEN rk END) AS first_rel,
             SUM(rel * ({_NDCG_W_SQL})[rk]) AS dcg_i
      FROM topk GROUP BY qid
    )
    SELECT qid, n_rel,
           round(CAST(n_rel AS DOUBLE) / 10, 6) AS precision_r6,
           CASE WHEN first_rel IS NULL THEN 0.0
                ELSE round(1.0 / first_rel, 6) END AS mrr_r6,
           CASE WHEN n_rel = 0 THEN 0.0
                ELSE round(CAST(dcg_i AS DOUBLE)
                           / ({_NDCG_IDEAL_SQL})[n_rel], 6) END AS ndcg_r6
    FROM per_q ORDER BY qid
    """,
    tags=("eval", "retrieval", "beyond"),
)
def q_ml_eval_retrieval_ndcg(spark, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation (precision@k, MRR, NDCG@10) of the
    brute-force cosine retriever against label-match relevance — the
    in-engine eval loop for the ANN family (a retriever you can't
    score at corpus scale is a retriever you can't tune). Relevance is
    binary: the retrieved vector shares the query's label.

    Plan shape: identical to ann_batch_topk (broadcast query set,
    corpus-parallel scoring, per-query rank window), then ONE bounded
    per-query aggregate — |queries| rows out. Exactness: ranking is on
    the round-6 cosine with vec_id tie-break (identical k on both
    engines); DCG uses integer position discounts (_NDCG_W) so the
    metric is exact-integer until one final double division. At 100 TB
    the scored set is |corpus| × |queries| rows but every stage is
    map-side except the rank window's query-key shuffle."""
    from pyspark.sql import Window

    from job_market_research_spark.ml.similarity import (
        as_double_vec,
        cosine,
        l2_norm,
    )

    emb = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", "label", as_double_vec("embedding").alias("v"))
        .withColumn("nrm", l2_norm(F.col("v")))
    )
    queries = (
        emb.filter(F.col("vec_id") % 100 == 7)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("label").alias("qlabel"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qnrm"),
        )
    )
    # rank + filter(<= k): Spark's InferWindowGroupLimit turns this
    # into a partial pre-shuffle top-k per query (WGL-pinned test),
    # so the low-cardinality qid does not funnel the corpus
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "vec_id")
    topk = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "qlabel",
            "label",
            "vec_id",
            cosine(F.col("v"), F.col("qv"), F.col("nrm"), F.col("qnrm")).alias(
                "cosine"
            ),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select(
            "qid",
            F.when(F.col("label") == F.col("qlabel"), 1).otherwise(0).alias("rel"),
            "rk",
        )
    )
    w_arr = F.array(*[F.lit(x) for x in _NDCG_W])
    ideal_arr = F.array(*[F.lit(x) for x in _NDCG_IDEAL])
    per_q = topk.groupBy("qid").agg(
        F.sum("rel").cast("long").alias("n_rel"),
        F.min(F.when(F.col("rel") == 1, F.col("rk"))).alias("first_rel"),
        F.sum(F.col("rel") * F.element_at(w_arr, F.col("rk"))).alias("dcg_i"),
    )
    return per_q.select(
        "qid",
        "n_rel",
        F.round(F.col("n_rel").cast("double") / 10, 6).alias("precision_r6"),
        F.when(F.col("first_rel").isNull(), 0.0)
        .otherwise(F.round(1.0 / F.col("first_rel"), 6))
        .alias("mrr_r6"),
        F.when(F.col("n_rel") == 0, 0.0)
        .otherwise(
            F.round(
                F.col("dcg_i").cast("double")
                / F.element_at(ideal_arr, F.col("n_rel").cast("int")),
                6,
            )
        )
        .alias("ndcg_r6"),
    ).orderBy("qid")


@query(
    "ml_isotonic_calibration",
    oracle=f"""
    WITH c AS (
      SELECT doc_id, lang,
        len(list_filter(string_split(text,' '), x -> x = 'the')) AS c_en,
        len(list_filter(string_split(text,' '), x -> x <> ''))   AS n_tok
      FROM documents
    ),
    bins AS (
      SELECT CAST(least(floor(CAST(c_en AS DOUBLE) / n_tok
                              * {CAL_DENSITY_SCALE}), {CAL_BINS - 1}) AS INT)
               AS bin,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_en
      FROM c WHERE n_tok > 0 GROUP BY 1
    ),
    seg AS (
      SELECT j.bin AS j, k.bin AS k,
             SUM(m.n_en) AS s, SUM(m.n_docs) AS n
      FROM bins j JOIN bins k ON j.bin <= k.bin
      JOIN bins m ON m.bin BETWEEN j.bin AND k.bin
      GROUP BY 1, 2
    ),
    inner_min AS (
      SELECT i.bin AS bin, seg.j,
             MIN(CAST(seg.s AS DOUBLE) / seg.n) AS mn
      FROM bins i JOIN seg ON seg.j <= i.bin AND seg.k >= i.bin
      GROUP BY 1, 2
    )
    SELECT b.bin AS bin, b.n_docs,
           round(CAST(b.n_en AS DOUBLE) / b.n_docs, 6) AS rate_r6,
           round(MAX(im.mn), 6) AS iso_rate_r6
    FROM bins b JOIN inner_min im ON im.bin = b.bin
    GROUP BY b.bin, b.n_docs, b.n_en
    ORDER BY b.bin
    """,
    tags=("eval", "calibration", "beyond"),
)
def q_ml_isotonic_calibration(spark, sf_dir: str) -> DataFrame:
    """Isotonic (pool-adjacent-violators) calibration of the
    English-ness score, via the minimax closed form: the isotonic fit
    at bin i equals max over j ≤ i of min over k ≥ i of the weighted
    mean of [j..k] — no sequential pooling loop, so the whole fit is
    three joins over the BOUNDED bin table (|bins|³ segment means for
    |bins| ≤ {CAL_BINS} — trivially small however big the corpus).
    ml_calibration_bins DIAGNOSES miscalibration; this op produces
    the monotone correction a filter would actually apply.

    Exactness: segment means are integer-count ratios — identical
    doubles on both engines — and min/max over identical doubles is
    exact; the only rounding is on output."""
    toks = tokens("text")
    c = load(spark, sf_dir, "documents").select(
        "lang",
        _count_token(toks, "the").alias("c_en"),
        F.size(F.filter(toks, lambda x: x != "")).alias("n_tok"),
    )
    bins = (
        c.filter(F.col("n_tok") > 0)
        .groupBy(
            F.least(
                F.floor(
                    F.col("c_en").cast("double")
                    / F.col("n_tok")
                    * CAL_DENSITY_SCALE
                ),
                F.lit(CAL_BINS - 1).cast("long"),
            )
            .cast("int")
            .alias("bin")
        )
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            .cast("long")
            .alias("n_en"),
        )
    )
    j = bins.select(F.col("bin").alias("j"))
    k = bins.select(F.col("bin").alias("k"))
    m = bins.select(
        F.col("bin").alias("mb"),
        F.col("n_en").alias("m_en"),
        F.col("n_docs").alias("m_docs"),
    )
    seg = (
        j.join(F.broadcast(k), F.col("j") <= F.col("k"))
        .join(
            F.broadcast(m),
            (F.col("mb") >= F.col("j")) & (F.col("mb") <= F.col("k")),
        )
        .groupBy("j", "k")
        .agg(
            (F.sum("m_en").cast("double") / F.sum("m_docs")).alias("mean_jk")
        )
    )
    i = bins.select(F.col("bin").alias("i"))
    inner_min = (
        i.join(
            F.broadcast(seg),
            (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")),
        )
        .groupBy("i", "j")
        .agg(F.min("mean_jk").alias("mn"))
    )
    iso = inner_min.groupBy("i").agg(F.round(F.max("mn"), 6).alias("iso_rate_r6"))
    return (
        bins.join(F.broadcast(iso), bins.bin == iso.i)
        .select(
            "bin",
            "n_docs",
            F.round(F.col("n_en").cast("double") / F.col("n_docs"), 6).alias(
                "rate_r6"
            ),
            "iso_rate_r6",
        )
        .orderBy("bin")
    )


#: Bradley-Terry: two unrolled minorization-maximization rounds; every
#: cross-item sum goes through round-9 DECIMAL terms so bounded-group
#: double summation can't reorder across engines.
BT_ROUNDS_DOC = 2


@query(
    "ml_bradley_terry_strength",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, event_type,
             CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*)
               AS mean_v
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id, event_type
    ),
    duels AS (
      SELECT a.event_type AS item_a, b.event_type AS item_b,
             CASE WHEN a.mean_v > b.mean_v THEN 1
                  WHEN a.mean_v < b.mean_v THEN -1 ELSE 0 END AS outcome
      FROM per_user a JOIN per_user b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
    ),
    games AS (
      SELECT item_a, item_b,
             CAST(COUNT(*) FILTER (WHERE outcome <> 0) AS BIGINT) AS n,
             CAST(COUNT(*) FILTER (WHERE outcome = 1) AS BIGINT) AS w_a
      FROM duels GROUP BY 1, 2
    ),
    items AS (
      SELECT item_a AS item, n AS g, w_a AS w FROM games
      UNION ALL
      SELECT item_b AS item, n AS g, n - w_a AS w FROM games
    ),
    tot AS (
      SELECT item, CAST(SUM(g) AS BIGINT) AS games,
             CAST(SUM(w) AS BIGINT) AS wins
      FROM items GROUP BY item
    ),
    p1 AS (
      SELECT item, games, wins,
             round(2.0 * wins / games, 9) AS p
      FROM tot
    ),
    pair_terms AS (
      SELECT g.item_a AS item,
             CAST(round(g.n / (pa.p + pb.p), 9) AS DECIMAL(18,9)) AS term
      FROM games g JOIN p1 pa ON pa.item = g.item_a
                   JOIN p1 pb ON pb.item = g.item_b
      UNION ALL
      SELECT g.item_b AS item,
             CAST(round(g.n / (pa.p + pb.p), 9) AS DECIMAL(18,9)) AS term
      FROM games g JOIN p1 pa ON pa.item = g.item_a
                   JOIN p1 pb ON pb.item = g.item_b
    ),
    p2 AS (
      SELECT t.item, t.games, t.wins,
             round(t.wins / CAST(SUM(pt.term) AS DOUBLE), 9) AS p
      FROM tot t JOIN pair_terms pt ON pt.item = t.item
      GROUP BY t.item, t.games, t.wins, t.wins
    ),
    norm AS (
      SELECT CAST(SUM(CAST(p AS DECIMAL(18,9))) AS DOUBLE) AS z FROM p2
    )
    SELECT item, games, wins,
           round(p / z, 6) AS strength_r6
    FROM p2, norm ORDER BY item
    """,
    tags=("preference", "eval", "beyond"),
)
def q_ml_bradley_terry_strength(spark, sf_dir: str) -> DataFrame:
    """Bradley–Terry strength estimation from pairwise preferences —
    the aggregation step of preference/reward-data pipelines (human
    A-vs-B judgments → per-item strengths). Preferences derive
    deterministically here: for each user, event type A beats B when
    the user's mean value for A is higher (exact-decimal means, ties
    dropped). Two unrolled MM rounds (p ← W_i / Σ_j n_ij/(p_i+p_j)),
    the BPE/PageRank unrolled-iteration discipline: each round's
    cross-item sums go through round-9 DECIMAL terms so bounded-group
    double summation order can't diverge between engines.

    Scale: corpus → (user, type) means (one shuffle) → |types|²
    duel counts → ALL MM algebra on the |types|-row table with
    broadcast joins. Strengths normalize to Σ = 1, round-6."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    per_user = ev.groupBy("user_id", "event_type").agg(
        (
            F.sum(F.col("value").cast("decimal(28,10)")).cast("double")
            / F.count("*")
        ).alias("mean_v")
    )
    a = per_user.select(
        "user_id",
        F.col("event_type").alias("item_a"),
        F.col("mean_v").alias("va"),
    )
    b = per_user.select(
        F.col("user_id").alias("uid_b"),
        F.col("event_type").alias("item_b"),
        F.col("mean_v").alias("vb"),
    )
    duels = a.join(
        b,
        (a.user_id == b.uid_b) & (F.col("item_a") < F.col("item_b")),
    ).select(
        "item_a",
        "item_b",
        F.when(F.col("va") > F.col("vb"), 1)
        .when(F.col("va") < F.col("vb"), -1)
        .otherwise(0)
        .alias("outcome"),
    )
    # The duel-count table is |types|² rows but its build is the
    # expensive leg (corpus scan + per-user self-join), and every MM
    # round re-references it (items, gj, pair_terms) — unstaged, the
    # 2-round unroll re-ran the build ~12x (48 scans in the plan
    # census). Staged once per (app, sf_dir), the corpus is read once.

    from job_market_research_spark.staging import staged_frame

    def _build_games() -> DataFrame:
        return (
            duels.filter(F.col("outcome") != 0)
            .groupBy("item_a", "item_b")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.when(F.col("outcome") == 1, 1).otherwise(0)).alias(
                    "w_a"
                ),
            )
        )

    games = staged_frame(spark, "bt_games", sf_dir, _build_games
    )
    items = games.select(
        F.col("item_a").alias("item"), F.col("n").alias("g"), F.col("w_a").alias("w")
    ).unionByName(
        games.select(
            F.col("item_b").alias("item"),
            F.col("n").alias("g"),
            (F.col("n") - F.col("w_a")).alias("w"),
        )
    )
    tot = items.groupBy("item").agg(
        F.sum("g").cast("long").alias("games"),
        F.sum("w").cast("long").alias("wins"),
    )
    p1 = tot.select(
        "item",
        "games",
        "wins",
        F.round(2.0 * F.col("wins") / F.col("games"), 9).alias("p"),
    )
    pa = p1.select(F.col("item").alias("item_a"), F.col("p").alias("p_a"))
    pb = p1.select(F.col("item").alias("item_b"), F.col("p").alias("p_b"))
    gj = games.join(F.broadcast(pa), "item_a").join(F.broadcast(pb), "item_b")
    term = F.round(F.col("n") / (F.col("p_a") + F.col("p_b")), 9).cast(
        "decimal(18,9)"
    )
    pair_terms = gj.select(F.col("item_a").alias("item"), term.alias("term")).unionByName(
        gj.select(F.col("item_b").alias("item"), term.alias("term"))
    )
    p2 = (
        tot.join(pair_terms, "item")
        .groupBy("item", "games", "wins")
        .agg(
            F.round(
                F.col("wins") / F.sum("term").cast("double"), 9
            ).alias("p")
        )
    )
    norm = p2.agg(
        F.sum(F.col("p").cast("decimal(18,9)")).cast("double").alias("z")
    )
    return (
        p2.crossJoin(F.broadcast(norm))
        .select(
            "item",
            "games",
            "wins",
            F.round(F.col("p") / F.col("z"), 6).alias("strength_r6"),
        )
        .orderBy("item")
    )


#: pass@k estimator: correctness threshold and the k values reported.
PASS_K_THRESHOLD = 100.0
PASS_K_VALUES = (1, 5, 10)


def _pass_at_k_sql(k: int) -> str:
    """1 − Π_{i=0}^{k−1} (n−c−i)/(n−i), factors multiplied left to
    right — the unbiased pass@k estimator with the product form both
    engines evaluate identically (each factor is a division of exact
    small integers; IEEE double products are deterministic). When
    n−c < k a factor is exactly 0, giving pass@k = 1."""
    prod = " * ".join(
        f"(CAST(n - c - {i} AS DOUBLE) / CAST(n - {i} AS DOUBLE))"
        for i in range(k)
    )
    return f"round(1.0 - {prod}, 6)"


@query(
    "ml_eval_pass_at_k",
    oracle=f"""
    WITH s AS (
      SELECT user_id,
             COUNT(*) AS n,
             SUM(CASE WHEN value >= {PASS_K_THRESHOLD} THEN 1 ELSE 0 END) AS c
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id
    )
    SELECT user_id,
           CAST(n AS BIGINT) AS n_samples,
           CAST(c AS BIGINT) AS n_correct,
           {_pass_at_k_sql(1)} AS pass_at_1_r6,
           {_pass_at_k_sql(5)} AS pass_at_5_r6,
           {_pass_at_k_sql(10)} AS pass_at_10_r6
    FROM s WHERE n >= {max(PASS_K_VALUES)}
    ORDER BY user_id
    """,
)
def q_ml_eval_pass_at_k(spark, sf_dir: str) -> DataFrame:
    """pass@k — the standard code/reasoning eval metric (Chen et al.
    2021): given n samples per problem of which c are correct, the
    unbiased estimator pass@k = 1 − C(n−c,k)/C(n,k). Problems are
    user_id groups, a sample is "correct" when its score clears
    PASS_K_THRESHOLD.

    Cross-engine exactness without big-integer combinatorics: the
    binomial ratio is the falling-factorial product
    Π (n−c−i)/(n−i), evaluated as k left-associated double
    multiplications of exact-integer divisions — no factorials (which
    overflow BIGINT once n is thousands of samples), no lgamma (libm
    drift). n−c < k hits an exactly-zero factor, so fully-solvable
    problems report 1.0 with no special-casing.

    Scale: ONE map-side-combinable aggregation to (n, c) per problem;
    the estimator is expression-only arithmetic on the bounded
    per-problem table. At 100 TB of eval samples the shuffle carries
    two longs per problem."""
    s = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(
                F.when(F.col("value") >= PASS_K_THRESHOLD, 1).otherwise(0)
            ).cast("long")
            .alias("c"),
        )
        .filter(F.col("n") >= max(PASS_K_VALUES))
    )

    def pass_col(k: int):
        prod = None
        for i in range(k):
            f = (F.col("n") - F.col("c") - F.lit(i)).cast("double") / (
                F.col("n") - F.lit(i)
            ).cast("double")
            prod = f if prod is None else prod * f
        return F.round(F.lit(1.0) - prod, 6)

    return s.select(
        "user_id",
        F.col("n").alias("n_samples"),
        F.col("c").alias("n_correct"),
        pass_col(1).alias("pass_at_1_r6"),
        pass_col(5).alias("pass_at_5_r6"),
        pass_col(10).alias("pass_at_10_r6"),
    ).orderBy("user_id")


#: Self-consistency: answer discretization width (answer id = ⌊value/50⌋).
SC_ANSWER_BIN = 50


@query(
    "ml_eval_majority_vote",
    oracle=f"""
    WITH s AS (
      SELECT user_id, CAST(floor(value / {SC_ANSWER_BIN}) AS BIGINT) AS answer
      FROM events WHERE value IS NOT NULL
    ),
    votes AS (
      SELECT user_id, answer, COUNT(*) AS v
      FROM s GROUP BY user_id, answer
    ),
    ranked AS (
      SELECT user_id, answer, v,
             SUM(v) OVER (PARTITION BY user_id) AS n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY v DESC, answer ASC) AS rk
      FROM votes
    )
    SELECT user_id,
           CAST(n AS BIGINT) AS n_samples,
           answer AS top_answer,
           CAST(v AS BIGINT) AS top_votes,
           round(CAST(v AS DOUBLE) / n, 6) AS agreement_r6,
           v * 2 > n AS strict_majority
    FROM ranked WHERE rk = 1 ORDER BY user_id
    """,
)
def q_ml_eval_majority_vote(spark, sf_dir: str) -> DataFrame:
    """Self-consistency aggregation (Wang et al. 2023): sample n
    answers per problem, return the MODE — the step that turns n
    chain-of-thought samples into one prediction, plus the agreement
    ratio (a calibration signal: low agreement flags problems to
    route to a stronger model). Problems are user_id groups; answers
    discretize value into SC_ANSWER_BIN-wide ids.

    Spark-first shape: two map-side-combinable aggregations — votes
    per (problem, answer), then a struct-extremum per problem
    (max over (votes, −answer) gives the plurality winner WITH the
    smallest-answer tie-break in one partial, same pattern as
    sample_preference_pairs; the oracle replays it with a rank
    window). No rank window on the corpus, no per-problem sort.

    Scale: shuffle one count per (problem, answer) then one struct
    per problem; a viral problem with millions of samples reduces
    map-side."""
    s = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id",
            F.floor(F.col("value") / SC_ANSWER_BIN).cast("long").alias("answer"),
        )
    )
    votes = s.groupBy("user_id", "answer").agg(F.count("*").alias("v"))
    top = votes.groupBy("user_id").agg(
        F.sum("v").cast("long").alias("n_samples"),
        F.max(F.struct(F.col("v"), (-F.col("answer")).alias("neg"))).alias("w"),
    )
    return top.select(
        "user_id",
        "n_samples",
        (-F.col("w.neg")).cast("long").alias("top_answer"),
        F.col("w.v").cast("long").alias("top_votes"),
        F.round(F.col("w.v").cast("double") / F.col("n_samples"), 6).alias(
            "agreement_r6"
        ),
        (F.col("w.v") * 2 > F.col("n_samples")).alias("strict_majority"),
    ).orderBy("user_id")


@query(
    "ml_eval_rouge2_overlap",
    oracle="""
    WITH pairs AS (
      SELECT doc_id AS pid, trim(text) AS ref,
             trim(regexp_replace(trim(text), '^[^ ]+ ', '')) AS cand
      FROM documents WHERE doc_id % 10 = 0
    ),
    rt AS (SELECT pid, string_split(ref, ' ') AS t FROM pairs),
    ct AS (SELECT pid, string_split(cand, ' ') AS t FROM pairs),
    rbg AS (SELECT pid, t[i] || ' ' || t[i + 1] AS bg
            FROM rt, unnest(range(1, len(t))) AS r(i)),
    cbg AS (SELECT pid, t[i] || ' ' || t[i + 1] AS bg
            FROM ct, unnest(range(1, len(t))) AS r(i)),
    rc AS (SELECT pid, bg, COUNT(*) AS c FROM rbg GROUP BY pid, bg),
    cc AS (SELECT pid, bg, COUNT(*) AS c FROM cbg GROUP BY pid, bg),
    ov AS (
      SELECT rc.pid, SUM(LEAST(rc.c, cc.c)) AS overlap
      FROM rc JOIN cc ON rc.pid = cc.pid AND rc.bg = cc.bg
      GROUP BY rc.pid
    ),
    rtot AS (SELECT pid, SUM(c) AS nr FROM rc GROUP BY pid),
    ctot AS (SELECT pid, SUM(c) AS nc FROM cc GROUP BY pid)
    SELECT rtot.pid AS doc_id,
           CAST(rtot.nr AS BIGINT) AS ref_bigrams,
           CAST(ctot.nc AS BIGINT) AS cand_bigrams,
           CAST(COALESCE(ov.overlap, 0) AS BIGINT) AS overlap,
           round(CAST(COALESCE(ov.overlap, 0) AS DOUBLE) / rtot.nr, 6)
             AS rouge2_recall_r6,
           round(CAST(COALESCE(ov.overlap, 0) AS DOUBLE) / ctot.nc, 6)
             AS rouge2_precision_r6
    FROM rtot
    JOIN ctot ON rtot.pid = ctot.pid
    LEFT JOIN ov ON rtot.pid = ov.pid
    ORDER BY doc_id
    """,
)
def q_ml_eval_rouge2_overlap(spark, sf_dir: str) -> DataFrame:
    """ROUGE-2 with CLIPPED counts — the summarization/NLG overlap
    metric done the way Lin (2004) defines it: per bigram the overlap
    credit is min(count in candidate, count in reference), so a
    candidate repeating one reference bigram 50 times scores it once
    per reference occurrence, not 50 (the clipping naive set-overlap
    implementations skip). Pairs are each 10th document (reference)
    against its first-token-stripped variant (candidate — the same
    mutation recipe the near-dup fixtures use).

    Spark-first shape: bigram multisets via a guarded `transform`
    over the token array (sequence is DESCENDING for single-token
    docs, hence the size>1 guard), one (pid, bigram) count per side,
    clipped overlap as SUM(LEAST) on the co-partitioned equi-join,
    then pid-level totals — every shuffle is on (pid, bigram) or pid,
    all map-side combinable, never an all-pairs comparison.

    Scale: candidate/reference pairing arrives as a column pair, so
    the metric is one pipeline regardless of corpus size; per-doc
    bigram fan-out is len(doc), linear."""
    pairs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select(
            F.col("doc_id").alias("pid"),
            F.split(F.trim("text"), " ").alias("rt"),
            F.split(
                F.trim(F.regexp_replace(F.trim("text"), r"^[^ ]+ ", "")), " "
            ).alias("ct"),
        )
    )

    def bigrams(col: str):
        return F.when(
            F.size(col) > 1,
            F.expr(
                f"transform(sequence(1, size({col}) - 1),"
                f" i -> concat({col}[i-1], ' ', {col}[i]))"
            ),
        ).otherwise(F.array().cast("array<string>"))

    rc = (
        pairs.select("pid", F.explode(bigrams("rt")).alias("bg"))
        .groupBy("pid", "bg")
        .agg(F.count("*").alias("c"))
    )
    cc = (
        pairs.select("pid", F.explode(bigrams("ct")).alias("bg"))
        .groupBy("pid", "bg")
        .agg(F.count("*").alias("c"))
    )
    ov = (
        rc.alias("r")
        .join(cc.alias("c"), ["pid", "bg"])
        .groupBy("pid")
        .agg(F.sum(F.least(F.col("r.c"), F.col("c.c"))).alias("overlap"))
    )
    rtot = rc.groupBy("pid").agg(F.sum("c").alias("nr"))
    ctot = cc.groupBy("pid").agg(F.sum("c").alias("nc"))
    return (
        rtot.join(ctot, "pid")
        .join(ov, "pid", "left")
        .select(
            F.col("pid").alias("doc_id"),
            F.col("nr").cast("long").alias("ref_bigrams"),
            F.col("nc").cast("long").alias("cand_bigrams"),
            F.coalesce("overlap", F.lit(0)).cast("long").alias("overlap"),
            F.round(
                F.coalesce("overlap", F.lit(0)).cast("double") / F.col("nr"), 6
            ).alias("rouge2_recall_r6"),
            F.round(
                F.coalesce("overlap", F.lit(0)).cast("double") / F.col("nc"), 6
            ).alias("rouge2_precision_r6"),
        )
        .orderBy("doc_id")
    )


@query(
    "ml_eval_bleu2",
    oracle="""
    WITH pairs AS (
      SELECT doc_id AS pid, trim(text) AS ref,
             trim(regexp_replace(trim(text), '^[^ ]+ ', '')) AS cand
      FROM documents WHERE doc_id % 10 = 0
    ),
    rt AS (SELECT pid, string_split(ref, ' ') AS t FROM pairs),
    ct AS (SELECT pid, string_split(cand, ' ') AS t FROM pairs),
    rg AS (
      SELECT pid, 1 AS n, u.g FROM rt, unnest(t) AS u(g)
      UNION ALL
      SELECT pid, 2 AS n, t[i] || ' ' || t[i + 1] AS g
      FROM rt, unnest(range(1, len(t))) AS r(i)
    ),
    cg AS (
      SELECT pid, 1 AS n, u.g FROM ct, unnest(t) AS u(g)
      UNION ALL
      SELECT pid, 2 AS n, t[i] || ' ' || t[i + 1] AS g
      FROM ct, unnest(range(1, len(t))) AS r(i)
    ),
    rc AS (SELECT pid, n, g, COUNT(*) AS c FROM rg GROUP BY pid, n, g),
    cc AS (SELECT pid, n, g, COUNT(*) AS c FROM cg GROUP BY pid, n, g),
    ov AS (
      SELECT rc.pid,
             SUM(CASE WHEN rc.n = 1 THEN LEAST(rc.c, cc.c) ELSE 0 END) AS o1,
             SUM(CASE WHEN rc.n = 2 THEN LEAST(rc.c, cc.c) ELSE 0 END) AS o2
      FROM rc JOIN cc ON rc.pid = cc.pid AND rc.n = cc.n AND rc.g = cc.g
      GROUP BY rc.pid
    ),
    ctot AS (
      SELECT pid,
             SUM(CASE WHEN n = 1 THEN c ELSE 0 END) AS n1,
             SUM(CASE WHEN n = 2 THEN c ELSE 0 END) AS n2
      FROM cc GROUP BY pid
    ),
    lens AS (
      SELECT pid, len(string_split(ref, ' ')) AS rlen,
             len(string_split(cand, ' ')) AS clen
      FROM pairs
    )
    SELECT lens.pid AS doc_id,
           CAST(lens.rlen AS BIGINT) AS ref_len,
           CAST(lens.clen AS BIGINT) AS cand_len,
           CAST(COALESCE(ov.o1, 0) AS BIGINT) AS overlap1,
           CAST(COALESCE(ov.o2, 0) AS BIGINT) AS overlap2,
           round(CAST(COALESCE(ov.o1, 0) AS DOUBLE) / ctot.n1, 6) AS p1_r6,
           CASE WHEN ctot.n2 > 0
                THEN round(CAST(COALESCE(ov.o2, 0) AS DOUBLE) / ctot.n2, 6)
                ELSE 0.0 END AS p2_r6,
           CASE WHEN ctot.n2 > 0
                THEN round(sqrt((CAST(COALESCE(ov.o1, 0) AS DOUBLE) / ctot.n1)
                              * (CAST(COALESCE(ov.o2, 0) AS DOUBLE) / ctot.n2)),
                           6)
                ELSE 0.0 END AS bleu2_core_r6,
           round(CAST(lens.rlen AS DOUBLE) / lens.clen, 6) AS len_ratio_r6,
           lens.clen < lens.rlen AS bp_applies
    FROM lens
    JOIN ctot ON lens.pid = ctot.pid
    LEFT JOIN ov ON lens.pid = ov.pid
    ORDER BY doc_id
    """,
)
def q_ml_eval_bleu2(spark, sf_dir: str) -> DataFrame:
    """BLEU-2 with CLIPPED n-gram precision (Papineni et al. 2002):
    per n-gram the credit is min(count in candidate, count in
    reference) — the modified-precision clipping that stops a
    candidate from farming one reference n-gram — then the geometric
    mean of unigram and bigram precision. Pairs are each 10th
    document (reference) against its first-token-stripped variant
    (candidate), the same pairing recipe as ml_eval_rouge2_overlap so
    the two metrics are directly comparable per document.

    Determinism: the geometric mean is sqrt(p1*p2) — division,
    multiply and sqrt are all IEEE-754 correctly-rounded on both
    engines, unlike exp/ln whose libm implementations may differ in
    the last ulp. For the same reason the brevity penalty is emitted
    as its exact rational argument (len_ratio_r6 = ref_len/cand_len,
    with bp_applies = cand shorter): BP = exp(1 - len_ratio) is a
    monotone transform the caller applies, and every compared column
    stays bit-deterministic across engines.

    Spark-first shape: unigrams and bigrams are built as ONE tagged
    struct array per side (n=1|2) so each side is a single explode +
    a single (pid, n, gram) count — two map-side-combinable shuffles
    total, clipped overlap as SUM(LEAST) on the co-partitioned
    equi-join, exactly the rouge2 plan generalized to two gram orders.

    Scale: per-doc fan-out is 2·len(doc) rows, linear; every shuffle
    keys on (pid, n, gram) or pid; never all-pairs."""

    def gram_structs(c: str):
        return F.expr(
            f"concat("
            f"  transform({c}, t -> struct(1 as n, t as g)),"
            f"  transform("
            f"    if(size({c}) > 1, sequence(1, size({c}) - 1),"
            f"       cast(array() as array<int>)),"
            f"    i -> struct(2 as n,"
            f"                concat(element_at({c}, i), ' ',"
            f"                       element_at({c}, i + 1)) as g)))"
        )

    pairs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select(
            F.col("doc_id").alias("pid"),
            F.split(F.trim("text"), " ").alias("rt"),
            F.split(
                F.trim(F.regexp_replace(F.trim("text"), r"^[^ ]+ ", "")), " "
            ).alias("ct"),
        )
    )
    lens = pairs.select(
        "pid", F.size("rt").alias("rlen"), F.size("ct").alias("clen")
    )

    def side_counts(col: str):
        return (
            pairs.select("pid", F.explode(gram_structs(col)).alias("s"))
            .select("pid", F.col("s.n").alias("n"), F.col("s.g").alias("g"))
            .groupBy("pid", "n", "g")
            .agg(F.count("*").alias("c"))
        )

    rc = side_counts("rt")
    cc = side_counts("ct")
    ov = (
        rc.alias("r")
        .join(cc.alias("c"), ["pid", "n", "g"])
        .groupBy("pid")
        .agg(
            F.sum(
                F.when(F.col("n") == 1, F.least(F.col("r.c"), F.col("c.c")))
                .otherwise(F.lit(0))
            ).alias("o1"),
            F.sum(
                F.when(F.col("n") == 2, F.least(F.col("r.c"), F.col("c.c")))
                .otherwise(F.lit(0))
            ).alias("o2"),
        )
    )
    ctot = cc.groupBy("pid").agg(
        F.sum(F.when(F.col("n") == 1, F.col("c")).otherwise(F.lit(0))).alias("n1"),
        F.sum(F.when(F.col("n") == 2, F.col("c")).otherwise(F.lit(0))).alias("n2"),
    )
    o1 = F.coalesce("o1", F.lit(0)).cast("double")
    o2 = F.coalesce("o2", F.lit(0)).cast("double")
    p1 = o1 / F.col("n1")
    p2 = o2 / F.col("n2")
    return (
        lens.join(ctot, "pid")
        .join(ov, "pid", "left")
        .select(
            F.col("pid").alias("doc_id"),
            F.col("rlen").cast("long").alias("ref_len"),
            F.col("clen").cast("long").alias("cand_len"),
            F.coalesce("o1", F.lit(0)).cast("long").alias("overlap1"),
            F.coalesce("o2", F.lit(0)).cast("long").alias("overlap2"),
            F.round(p1, 6).alias("p1_r6"),
            F.when(F.col("n2") > 0, F.round(p2, 6)).otherwise(0.0).alias("p2_r6"),
            F.when(F.col("n2") > 0, F.round(F.sqrt(p1 * p2), 6))
            .otherwise(0.0)
            .alias("bleu2_core_r6"),
            F.round(F.col("rlen").cast("double") / F.col("clen"), 6).alias(
                "len_ratio_r6"
            ),
            (F.col("clen") < F.col("rlen")).alias("bp_applies"),
        )
        .orderBy("doc_id")
    )


#: Length-difference bucket width (tokens) for the length-bias audit.
LB_BUCKET_W = 5
LB_MAX_BUCKET = 5


@query(
    "ml_eval_length_bias",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             CAST(doc_id // 2 AS BIGINT) AS pid,
             doc_id % 2 AS side,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n,
             CAST(len(list_distinct(string_split(trim(text), ' ')))
                  AS BIGINT) AS reward
      FROM documents
    ),
    pairs AS (
      SELECT a.pid, a.n AS len_a, b.n AS len_b,
             a.reward AS rew_a, b.reward AS rew_b
      FROM (SELECT * FROM d WHERE side = 0) a
      JOIN (SELECT * FROM d WHERE side = 1) b USING (pid)
      WHERE a.reward <> b.reward AND a.n <> b.n
    ),
    scored AS (
      SELECT pid,
             CAST(LEAST(abs(len_a - len_b) // {LB_BUCKET_W},
                        {LB_MAX_BUCKET}) AS BIGINT) AS dlen_bucket,
             CASE WHEN rew_a > rew_b THEN len_a > len_b
                  ELSE len_b > len_a END AS longer_wins
      FROM pairs
    )
    SELECT dlen_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN longer_wins THEN 1 ELSE 0 END) AS BIGINT)
             AS longer_wins,
           round(CAST(SUM(CASE WHEN longer_wins THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS longer_win_rate_r6
    FROM scored GROUP BY dlen_bucket ORDER BY dlen_bucket
    """,
)
def q_ml_eval_length_bias(spark, sf_dir: str) -> DataFrame:
    """Length-bias audit for preference data — the reward-hacking
    check run before training a reward model or DPO policy: across
    (chosen, rejected) pairs, does the LONGER response win more often
    than chance, and does the bias grow with the length gap? A
    longer_win_rate near 1.0 in the big-gap buckets means the
    "reward" is largely measuring verbosity (the classic RLHF length
    exploit). Pairs are adjacent documents (2k, 2k+1) sharing pair id
    k; the stand-in reward is vocabulary richness (distinct-token
    count) — deterministic, and genuinely length-correlated, so the
    audit has real signal to find. Reward ties and equal lengths are
    excluded (no winner / no "longer" side).

    Exactness: every emitted number is a ratio of exact integer
    counts — token counts and distinct-token counts map-side via
    size(split)/array_distinct, never an explode.

    Scale: one equi-join on pair id (adjacent ids co-locate under the
    same hash partitioning) and one bounded-key aggregation
    (LB_MAX_BUCKET+1 rows). Linear, two shuffles, no skew exposure."""
    d = load(spark, sf_dir, "documents").select(
        (F.col("doc_id") / 2).cast("long").alias("pid"),
        (F.col("doc_id") % 2).alias("side"),
        F.size(F.split(F.trim("text"), " ")).cast("long").alias("n"),
        F.size(F.array_distinct(F.split(F.trim("text"), " ")))
        .cast("long")
        .alias("reward"),
    )
    a = d.filter(F.col("side") == 0).select(
        "pid", F.col("n").alias("len_a"), F.col("reward").alias("rew_a")
    )
    b = d.filter(F.col("side") == 1).select(
        "pid", F.col("n").alias("len_b"), F.col("reward").alias("rew_b")
    )
    pairs = a.join(b, "pid").filter(
        (F.col("rew_a") != F.col("rew_b")) & (F.col("len_a") != F.col("len_b"))
    )
    scored = pairs.select(
        F.least(
            F.floor(F.abs(F.col("len_a") - F.col("len_b")) / LB_BUCKET_W),
            F.lit(LB_MAX_BUCKET),
        )
        .cast("long")
        .alias("dlen_bucket"),
        F.when(
            F.col("rew_a") > F.col("rew_b"), F.col("len_a") > F.col("len_b")
        )
        .otherwise(F.col("len_b") > F.col("len_a"))
        .alias("longer_wins"),
    )
    return (
        scored.groupBy("dlen_bucket")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum(F.when(F.col("longer_wins"), 1).otherwise(0))
            .cast("long")
            .alias("longer_wins"),
        )
        .select(
            "dlen_bucket",
            "n_pairs",
            "longer_wins",
            F.round(
                F.col("longer_wins").cast("double") / F.col("n_pairs"), 6
            ).alias("longer_win_rate_r6"),
        )
        .orderBy("dlen_bucket")
    )


@query(
    "agg_cohens_kappa",
    oracle=f"""
    WITH c AS ({_MARKER_SQL}),
    p AS ({_PRED_SQL}),
    cm AS (
      SELECT lang, pred, CAST(COUNT(*) AS BIGINT) AS n
      FROM p GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM cm),
    po AS (
      SELECT CAST(COALESCE(SUM(CASE WHEN lang = pred THEN n END), 0)
                  AS BIGINT) AS agree
      FROM cm
    ),
    rows_ AS (SELECT lang AS c, SUM(n) AS rn FROM cm GROUP BY lang),
    cols_ AS (SELECT pred AS c, SUM(n) AS cn FROM cm GROUP BY pred),
    pe AS (
      SELECT CAST(SUM(CAST(rows_.rn AS DECIMAL(38,0))
                      * CAST(cols_.cn AS DECIMAL(38,0))) AS DOUBLE)
               AS cross_mass
      FROM rows_ JOIN cols_ USING (c)
    )
    SELECT nn AS n,
           (SELECT CAST(COUNT(DISTINCT c) AS BIGINT)
            FROM (SELECT lang AS c FROM cm
                  UNION SELECT pred AS c FROM cm)) AS n_classes,
           round(CAST(agree AS DOUBLE) / nn, 6) AS po_r6,
           round(cross_mass / (CAST(nn AS DOUBLE) * nn), 6) AS pe_r6,
           round((CAST(agree AS DOUBLE) / nn
                  - cross_mass / (CAST(nn AS DOUBLE) * nn))
                 / (1 - cross_mass / (CAST(nn AS DOUBLE) * nn)), 6)
             AS kappa_r6
    FROM tot CROSS JOIN po CROSS JOIN pe
    """,
)
def q_agg_cohens_kappa(spark, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the in-engine lang-id classifier and the
    gold label — chance-corrected agreement, the metric annotation
    pipelines (RLHF rater QA, silver-label audits) report instead of
    raw accuracy because a skewed label mix makes accuracy free: po is
    observed agreement, pe the agreement two independent raters with
    these marginals would reach by luck, κ = (po−pe)/(1−pe).

    Exactness: the corpus reduces to the (lang, pred) confusion cells
    in one map-side-combinable pass; po/pe come from exact integer
    counts, with the marginal cross-products accumulated in
    DECIMAL(38,0) (row·col products overflow int64 once row counts
    pass ~3·10⁹ — real at 100 TB); ratios are then single
    deterministic double expressions.

    Scale: one corpus aggregation; everything downstream runs on ≤
    |classes|² cells."""
    cm = (
        _lang_pred(spark, sf_dir)
        .groupBy("lang", "pred")
        .agg(F.count("*").alias("n"))
    )
    tot = cm.agg(F.sum("n").cast("long").alias("nn"))
    po = cm.agg(
        F.coalesce(
            F.sum(F.when(F.col("lang") == F.col("pred"), F.col("n"))), F.lit(0)
        )
        .cast("long")
        .alias("agree")
    )
    rows_ = cm.groupBy(F.col("lang").alias("c")).agg(F.sum("n").alias("rn"))
    cols_ = cm.groupBy(F.col("pred").alias("c")).agg(F.sum("n").alias("cn"))
    pe = (
        rows_.join(cols_, "c")
        .agg(
            F.sum(
                F.col("rn").cast("decimal(38,0)")
                * F.col("cn").cast("decimal(38,0)")
            )
            .cast("double")
            .alias("cross_mass")
        )
    )
    classes = (
        cm.select(F.col("lang").alias("c"))
        .union(cm.select(F.col("pred").alias("c")))
        .agg(F.countDistinct("c").cast("long").alias("n_classes"))
    )
    nn_d = F.col("nn").cast("double")
    po_e = F.col("agree").cast("double") / F.col("nn")
    pe_e = F.col("cross_mass") / (nn_d * F.col("nn"))
    return (
        tot.crossJoin(F.broadcast(po))
        .crossJoin(F.broadcast(pe))
        .crossJoin(F.broadcast(classes))
        .select(
            F.col("nn").alias("n"),
            "n_classes",
            F.round(po_e, 6).alias("po_r6"),
            F.round(pe_e, 6).alias("pe_r6"),
            F.round((po_e - pe_e) / (1 - pe_e), 6).alias("kappa_r6"),
        )
    )


#: Lift-table score banding: value clamped into LIFT_BINS bands of
#: width LIFT_BIN_W (band LIFT_BINS-1 catches the tail).
LIFT_BINS = 10
LIFT_BIN_W = 50


@query(
    "ml_lift_table",
    oracle=f"""
    WITH scored AS (
      SELECT CAST(LEAST(floor(value / {LIFT_BIN_W}), {LIFT_BINS - 1})
                  AS BIGINT) AS band,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL
    ),
    b AS (
      SELECT band, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS pos
      FROM scored GROUP BY band
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(pos) AS BIGINT) AS np
      FROM b
    ),
    cum AS (
      SELECT band, n, pos,
             SUM(n) OVER (ORDER BY band DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
             SUM(pos) OVER (ORDER BY band DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cpos
      FROM b
    )
    SELECT band, n, pos,
           round(CAST(pos AS DOUBLE) / n, 6) AS band_rate_r6,
           CAST(cn AS BIGINT) AS cum_n,
           CAST(cpos AS BIGINT) AS cum_pos,
           round(CAST(cpos AS DOUBLE) / np, 6) AS capture_r6,
           round((CAST(cpos AS DOUBLE) / np)
                 / (CAST(cn AS DOUBLE) / nn), 6) AS lift_r6
    FROM cum CROSS JOIN tot ORDER BY band DESC
    """,
)
def q_ml_lift_table(spark, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift table — how a ranked targeting model is
    actually read in production: sort the population by score band
    (descending), and per cut-off report what share of all positives
    the top slice captures (capture) versus its population share
    (lift = capture/share; lift 1.0 = random targeting). Score = the
    event value banded into LIFT_BINS fixed-width bands; label =
    purchase events. Fixed VALUE bands, not ntile, keep the banding a
    map-side expression — a corpus-wide ntile would funnel every row
    through one sorting task (the global-window ban).

    Exactness: every column is a ratio of exact integer counts; the
    cumulative runs over the LIFT_BINS-row band table (bounded,
    allowlisted), never the corpus.

    Scale: one map-side-combinable aggregation to LIFT_BINS rows;
    constant-size downstream."""
    scored = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.least(
                F.floor(F.col("value") / LIFT_BIN_W), F.lit(LIFT_BINS - 1)
            )
            .cast("long")
            .alias("band"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("y"),
        )
    )
    b = scored.groupBy("band").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    tot = b.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("pos").cast("long").alias("np"),
    )
    w = (
        Window.orderBy(F.desc("band"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = b.select(
        "band",
        "n",
        "pos",
        F.sum("n").over(w).cast("long").alias("cum_n"),
        F.sum("pos").over(w).cast("long").alias("cum_pos"),
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "band",
            "n",
            "pos",
            F.round(F.col("pos").cast("double") / F.col("n"), 6).alias(
                "band_rate_r6"
            ),
            "cum_n",
            "cum_pos",
            F.round(F.col("cum_pos").cast("double") / F.col("np"), 6).alias(
                "capture_r6"
            ),
            F.round(
                (F.col("cum_pos").cast("double") / F.col("np"))
                / (F.col("cum_n").cast("double") / F.col("nn")),
                6,
            ).alias("lift_r6"),
        )
        .orderBy(F.desc("band"))
    )


#: AUC score banding: integer floor of the event value, clamped. The
#: band table is ≤ AUC_MAX_BAND+1 rows no matter the corpus size, and
#: ties (same band) get the exact mid-rank correction, so this is the
#: EXACT tie-corrected AUC of the integer-banded score.
AUC_MAX_BAND = 999


@query(
    "ml_eval_auc_roc",
    oracle=f"""
    WITH scored AS (
      SELECT CAST(LEAST(floor(value), {AUC_MAX_BAND}) AS BIGINT) AS band,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL
    ),
    b AS (
      SELECT band,
             CAST(SUM(y) AS BIGINT) AS pos,
             CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg
      FROM scored GROUP BY band
    ),
    cum AS (
      SELECT pos, neg,
             COALESCE(SUM(neg) OVER (ORDER BY band
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cneg
      FROM b
    ),
    s AS (
      SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
             CAST(SUM(neg) AS BIGINT) AS n_neg,
             CAST(SUM(CAST(pos AS DECIMAL(38,0))
                      * CAST(2 * cneg + neg AS DECIMAL(38,0)))
                  AS DOUBLE) AS num2
      FROM cum
    )
    SELECT n_pos, n_neg,
           round(CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                 num2 / (2.0 * (CAST(n_pos AS DOUBLE) * n_neg))
                 ELSE 0.5 END, 6) AS auc_r6,
           round(CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                 num2 / (CAST(n_pos AS DOUBLE) * n_neg) - 1.0
                 ELSE 0.0 END, 6) AS gini_r6
    FROM s
    """,
)
def q_ml_eval_auc_roc(spark, sf_dir: str) -> DataFrame:
    """Exact tie-corrected ROC AUC of the event-value score against the
    purchase label — the ranking metric every targeting/quality model
    reports alongside the lift table. Uses the rank identity
    AUC = P(score_pos > score_neg) + ½·P(tie): with per-band positive
    and negative counts, numerator 2·Σ_b pos_b·(2·cneg_b + neg_b)
    where cneg is the negatives strictly below band b — the pos·neg
    pair count each band wins twice plus ties once, all exact integers
    (DECIMAL products; no float until the single final division).

    Scale shape: the corpus collapses to the ≤ AUC_MAX_BAND+1-row band
    table in ONE map-side-combinable aggregation; the cumulative and
    the closed-form division run on that bounded table (allowlisted
    bounded window). No global per-row rank — a corpus-wide rank
    window is exactly what a 100 TB AUC job must avoid."""
    scored = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.least(F.floor("value"), F.lit(AUC_MAX_BAND))
            .cast("long")
            .alias("band"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("y"),
        )
    )
    b = scored.groupBy("band").agg(
        F.sum("y").cast("long").alias("pos"),
        (F.count("*") - F.sum("y")).cast("long").alias("neg"),
    )
    w = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    cum = b.select(
        "pos",
        "neg",
        F.coalesce(F.sum("neg").over(w), F.lit(0)).alias("cneg"),
    )
    s = cum.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
        F.sum(
            F.col("pos").cast("decimal(38,0)")
            * (2 * F.col("cneg") + F.col("neg")).cast("decimal(38,0)")
        )
        .cast("double")
        .alias("num2"),
    )
    pn = F.col("n_pos").cast("double") * F.col("n_neg")
    both = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    return s.select(
        "n_pos",
        "n_neg",
        F.round(
            F.when(both, F.col("num2") / (2.0 * pn)).otherwise(0.5), 6
        ).alias("auc_r6"),
        F.round(
            F.when(both, F.col("num2") / pn - 1.0).otherwise(0.0), 6
        ).alias("gini_r6"),
    )


@query(
    "ml_eval_brier_decomposition",
    oracle=f"""
    WITH c AS (
      SELECT lang,
        len(list_filter(string_split(text,' '), x -> x = 'the')) AS c_en,
        len(list_filter(string_split(text,' '), x -> x <> ''))   AS n_tok
      FROM documents
    ),
    b AS (
      SELECT CAST(least(floor(CAST(c_en AS DOUBLE) / n_tok
                              * {CAL_DENSITY_SCALE}), {CAL_BINS - 1})
                  AS BIGINT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS pos
      FROM c WHERE n_tok > 0 GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(pos) AS BIGINT) AS np
      FROM b
    ),
    terms AS (
      SELECT
        CAST(round(n * pow((2.0 * bin + 1) / {2 * CAL_DENSITY_SCALE}
                           - CAST(pos AS DOUBLE) / n, 2), 6)
             AS DECIMAL(28,6)) AS t_rel,
        CAST(round(n * pow(CAST(pos AS DOUBLE) / n
                           - CAST(np AS DOUBLE) / nn, 2), 6)
             AS DECIMAL(28,6)) AS t_res
      FROM b CROSS JOIN tot
    ),
    s AS (
      SELECT CAST(SUM(t_rel) AS DOUBLE) AS srel,
             CAST(SUM(t_res) AS DOUBLE) AS sres
      FROM terms
    )
    SELECT nn AS n, np AS n_pos,
           round(srel / nn, 6) AS reliability_r6,
           round(sres / nn, 6) AS resolution_r6,
           round((CAST(np AS DOUBLE) / nn) * (1.0 - CAST(np AS DOUBLE) / nn),
                 6) AS uncertainty_r6,
           round(srel / nn - sres / nn
                 + (CAST(np AS DOUBLE) / nn)
                   * (1.0 - CAST(np AS DOUBLE) / nn), 6) AS brier_r6
    FROM s CROSS JOIN tot
    """,
)
def q_ml_eval_brier_decomposition(spark, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score for the binned
    English-ness forecast: Brier = REL − RES + UNC, where reliability
    (how far each bin's forecast midpoint sits from its observed rate)
    is the part recalibration can remove, resolution (how much the
    bins separate outcomes) is the model's real skill, and uncertainty
    is the base-rate floor no model can beat. The companion number to
    ml_calibration_bins: the diagram shows WHERE calibration breaks,
    this scores HOW MUCH it costs.

    The decomposition is exact (not approximate) because every doc in
    a bin carries the same forecast — the bin midpoint — by
    construction. Per-bin terms are fixed-shape double expressions
    rounded 6 then DECIMAL-summed over the ≤ CAL_BINS rows (order-free
    partial agg), with one final division each.

    Scale: one corpus scan to the CAL_BINS-row table; everything else
    is constant-size."""
    toks = tokens("text")
    c = load(spark, sf_dir, "documents").select(
        "lang",
        _count_token(toks, "the").alias("c_en"),
        F.size(F.filter(toks, lambda x: x != "")).alias("n_tok"),
    )
    b = (
        c.filter(F.col("n_tok") > 0)
        .groupBy(
            F.least(
                F.floor(
                    F.col("c_en").cast("double")
                    / F.col("n_tok")
                    * CAL_DENSITY_SCALE
                ),
                F.lit(CAL_BINS - 1).cast("long"),
            )
            .cast("long")
            .alias("bin")
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            .cast("long")
            .alias("pos"),
        )
    )
    tot = b.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("pos").cast("long").alias("np"),
    )
    f_mid = (2.0 * F.col("bin") + 1) / (2 * CAL_DENSITY_SCALE)
    o_bin = F.col("pos").cast("double") / F.col("n")
    o_all = F.col("np").cast("double") / F.col("nn")
    terms = b.crossJoin(F.broadcast(tot)).select(
        F.round(F.col("n") * F.pow(f_mid - o_bin, 2), 6)
        .cast("decimal(28,6)")
        .alias("t_rel"),
        F.round(F.col("n") * F.pow(o_bin - o_all, 2), 6)
        .cast("decimal(28,6)")
        .alias("t_res"),
    )
    s = terms.agg(
        F.sum("t_rel").cast("double").alias("srel"),
        F.sum("t_res").cast("double").alias("sres"),
    )
    unc = o_all * (1.0 - o_all)
    return s.crossJoin(F.broadcast(tot)).select(
        F.col("nn").alias("n"),
        F.col("np").alias("n_pos"),
        F.round(F.col("srel") / F.col("nn"), 6).alias("reliability_r6"),
        F.round(F.col("sres") / F.col("nn"), 6).alias("resolution_r6"),
        F.round(unc, 6).alias("uncertainty_r6"),
        F.round(
            F.col("srel") / F.col("nn") - F.col("sres") / F.col("nn") + unc, 6
        ).alias("brier_r6"),
    )


@query(
    "ml_eval_pr_auc",
    oracle=f"""
    WITH scored AS (
      SELECT CAST(LEAST(floor(value), {AUC_MAX_BAND}) AS BIGINT) AS band,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL
    ),
    b AS (
      SELECT band,
             CAST(SUM(y) AS BIGINT) AS pos,
             CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg
      FROM scored GROUP BY band
    ),
    cum AS (
      SELECT pos,
             SUM(pos) OVER (ORDER BY band DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ctp,
             SUM(pos + neg) OVER (ORDER BY band DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn
      FROM b
    ),
    tot AS (
      SELECT CAST(SUM(pos) AS BIGINT) AS p,
             CAST(SUM(pos + neg) AS BIGINT) AS nn
      FROM b
    ),
    terms AS (
      SELECT CAST(round(CAST(pos AS DOUBLE) / tot.p
                        * (CAST(ctp AS DOUBLE) / cn), 9)
                  AS DECIMAL(28,9)) AS t
      FROM cum CROSS JOIN tot WHERE pos > 0
    )
    SELECT tot.p AS n_pos, tot.nn AS n,
           round(CAST(tot.p AS DOUBLE) / tot.nn, 6) AS base_rate_r6,
           round(CAST((SELECT SUM(t) FROM terms) AS DOUBLE), 6) AS ap_r6
    FROM tot
    """,
)
def q_ml_eval_pr_auc(spark, sf_dir: str) -> DataFrame:
    """Average precision (area under the precision-recall curve, step
    interpolation) of the banded event-value score against the
    purchase label — the ranking metric that stays honest when
    positives are rare, where ROC AUC flatters (its false-positive
    axis barely moves). AP = Σ_k ΔR_k·P_k over score bands descending:
    each band contributes its recall mass times the precision AT that
    cut. Reported next to the base rate — the AP a random ranker
    earns, which is the number AP must beat.

    Exactness: per-band terms are fixed-shape double products of two
    exact-integer ratios, rounded 9 then DECIMAL-summed (order-free
    over the partial aggregation), one closing round-6.

    Scale: same bounded shape as ml_eval_auc_roc — one map-side
    combinable aggregation to ≤ AUC_MAX_BAND+1 rows, cumulative and
    closing algebra on that table only (allowlisted)."""
    scored = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.least(F.floor("value"), F.lit(AUC_MAX_BAND))
            .cast("long")
            .alias("band"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("y"),
        )
    )
    b = scored.groupBy("band").agg(
        F.sum("y").cast("long").alias("pos"),
        (F.count("*") - F.sum("y")).cast("long").alias("neg"),
    )
    w = Window.orderBy(F.desc("band")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = b.select(
        "pos",
        F.sum("pos").over(w).alias("ctp"),
        F.sum(F.col("pos") + F.col("neg")).over(w).alias("cn"),
    )
    tot = b.agg(
        F.sum("pos").cast("long").alias("p"),
        F.sum(F.col("pos") + F.col("neg")).cast("long").alias("nn"),
    )
    terms = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("pos") > 0)
        .select(
            F.round(
                F.col("pos").cast("double")
                / F.col("p")
                * (F.col("ctp").cast("double") / F.col("cn")),
                9,
            )
            .cast("decimal(28,9)")
            .alias("t")
        )
    )
    ap = terms.agg(F.sum("t").cast("double").alias("sap"))
    return tot.crossJoin(F.broadcast(ap)).select(
        F.col("p").alias("n_pos"),
        F.col("nn").alias("n"),
        F.round(F.col("p").cast("double") / F.col("nn"), 6).alias(
            "base_rate_r6"
        ),
        F.round(F.col("sap"), 6).alias("ap_r6"),
    )


@query(
    "ml_eval_krippendorff_alpha",
    oracle=f"""
    WITH c AS ({_MARKER_SQL}),
    p AS ({_PRED_SQL}),
    srcmaj AS (
      SELECT source, lab AS src_pred FROM (
        SELECT d.source, d.lang AS lab,
               ROW_NUMBER() OVER (PARTITION BY d.source
                                  ORDER BY COUNT(*) DESC, d.lang) AS rk
        FROM documents d GROUP BY d.source, d.lang
      ) WHERE rk = 1
    ),
    units AS (
      SELECT d.lang AS a, p.pred AS b, s.src_pred AS c3
      FROM documents d
      JOIN p USING (doc_id)
      JOIN srcmaj s ON s.source = d.source
    ),
    dis AS (
      SELECT CAST(SUM(2 * ((CASE WHEN a <> b THEN 1 ELSE 0 END)
                         + (CASE WHEN a <> c3 THEN 1 ELSE 0 END)
                         + (CASE WHEN b <> c3 THEN 1 ELSE 0 END)))
                  AS BIGINT) AS sd,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM units
    ),
    vals AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS nc FROM (
        SELECT a AS v FROM units
        UNION ALL SELECT b AS v FROM units
        UNION ALL SELECT c3 AS v FROM units
      ) GROUP BY v
    ),
    e AS (
      SELECT CAST(SUM(CAST(nc AS DECIMAL(38,0))
                      * CAST(nc - 1 AS DECIMAL(38,0))) AS DOUBLE) AS snc2,
             CAST(SUM(nc) AS BIGINT) AS nn
      FROM vals
    )
    SELECT dis.n AS n_units, CAST(3 AS BIGINT) AS n_raters,
           round(CAST(sd AS DOUBLE) / (6.0 * dis.n), 6) AS d_o_r6,
           round((CAST(nn AS DOUBLE) * (nn - 1) - snc2)
                 / (CAST(nn AS DOUBLE) * (nn - 1)), 6) AS d_e_r6,
           round(1.0 - (CAST(sd AS DOUBLE) / (6.0 * dis.n))
                 / ((CAST(nn AS DOUBLE) * (nn - 1) - snc2)
                    / (CAST(nn AS DOUBLE) * (nn - 1))), 6) AS alpha_r6
    FROM dis CROSS JOIN e
    """,
)
def q_ml_eval_krippendorff_alpha(spark, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal) across THREE raters of each
    document's language — the gold label, the content-based marker
    heuristic, and a metadata rater (the majority language of the
    doc's source) — the reliability coefficient annotation pipelines
    report when more than two labelers disagree, where pairwise kappa
    stops working. alpha = 1 − D_o/D_e with observed disagreement
    from per-unit label pairs and expected disagreement from the
    pooled label marginals.

    All-integer core: with 3 complete ratings per unit, the unit's
    disagreeing ordered pairs are 2·(1[a≠b]+1[a≠c]+1[b≠c]) (0, 4, or
    6), and D_e's numerator is N(N−1) − Σ_c n_c(n_c−1) (DECIMAL
    products, the kappa overflow contract); one fixed-shape double
    closing form.

    Scale: the marker rater is map-side; the metadata rater is one
    |sources|×|langs| aggregate with a source-partitioned rank
    window; pooled marginals are one combinable aggregation. No
    corpus pair join — the pair algebra happens inside each row."""
    docs = load(spark, sf_dir, "documents")
    pred = _lang_pred(spark, sf_dir).select("doc_id", "pred")
    srcmaj = (
        docs.groupBy("source", F.col("lang").alias("lab"))
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.desc("cnt"), F.col("lab")
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .select("source", F.col("lab").alias("src_pred"))
    )
    units = (
        docs.select("doc_id", "lang", "source")
        .join(pred, "doc_id")
        .join(F.broadcast(srcmaj), "source")
        .select(
            F.col("lang").alias("a"),
            F.col("pred").alias("b"),
            F.col("src_pred").alias("c3"),
        )
    )
    neq = lambda x, y: F.when(F.col(x) != F.col(y), 1).otherwise(0)
    dis = units.agg(
        F.sum(2 * (neq("a", "b") + neq("a", "c3") + neq("b", "c3")))
        .cast("long")
        .alias("sd"),
        F.count("*").cast("long").alias("n"),
    )
    vals = (
        units.select(F.explode(F.array("a", "b", "c3")).alias("v"))
        .groupBy("v")
        .agg(F.count("*").cast("long").alias("nc"))
    )
    e = vals.agg(
        F.sum(
            F.col("nc").cast("decimal(38,0)")
            * (F.col("nc") - 1).cast("decimal(38,0)")
        )
        .cast("double")
        .alias("snc2"),
        F.sum("nc").cast("long").alias("nn"),
    )
    nn = F.col("nn").cast("double")
    d_o = F.col("sd").cast("double") / (6.0 * F.col("n"))
    d_e = (nn * (F.col("nn") - 1) - F.col("snc2")) / (nn * (F.col("nn") - 1))
    return dis.crossJoin(F.broadcast(e)).select(
        F.col("n").alias("n_units"),
        F.lit(3).cast("long").alias("n_raters"),
        F.round(d_o, 6).alias("d_o_r6"),
        F.round(d_e, 6).alias("d_e_r6"),
        F.round(1.0 - d_o / d_e, 6).alias("alpha_r6"),
    )


#: Upper 5% critical value of chi-square(1) — literal, like MWU_CRIT.
MCNEMAR_CRIT = 3.841459


@query(
    "ml_eval_mcnemar",
    oracle=f"""
    WITH c AS ({_MARKER_SQL}),
    p AS ({_PRED_SQL}),
    srcmaj AS (
      SELECT source, lab AS src_pred FROM (
        SELECT d.source, d.lang AS lab,
               ROW_NUMBER() OVER (PARTITION BY d.source
                                  ORDER BY COUNT(*) DESC, d.lang) AS rk
        FROM documents d GROUP BY d.source, d.lang
      ) WHERE rk = 1
    ),
    u AS (
      SELECT CASE WHEN p.pred = d.lang THEN 1 ELSE 0 END AS ok1,
             CASE WHEN s.src_pred = d.lang THEN 1 ELSE 0 END AS ok2
      FROM documents d
      JOIN p USING (doc_id)
      JOIN srcmaj s ON s.source = d.source
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN ok1 = 1 AND ok2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
             CAST(SUM(CASE WHEN ok1 = 0 AND ok2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c2
      FROM u
    )
    SELECT n, b AS only_marker_right, c2 AS only_metadata_right,
           round(CASE WHEN b + c2 > 0 THEN
                 (CAST(abs(b - c2) AS DOUBLE) - 1)
                 * (CAST(abs(b - c2) AS DOUBLE) - 1) / (b + c2)
                 ELSE 0 END, 6) AS chi2_r6,
           CASE WHEN b + c2 > 0 AND
                (CAST(abs(b - c2) AS DOUBLE) - 1)
                * (CAST(abs(b - c2) AS DOUBLE) - 1) / (b + c2)
                > {MCNEMAR_CRIT} THEN 1 ELSE 0 END AS significant_5pct
    FROM m
    """,
)
def q_ml_eval_mcnemar(spark, sf_dir: str) -> DataFrame:
    """McNemar's test (continuity-corrected) between the two in-engine
    language raters — the content-based marker heuristic vs the
    metadata rater (per-source majority label) — on the SAME
    documents against the gold label. This is THE test for 'is
    classifier A actually better than B', because paired discordant
    counts throw away the documents both get right or both get wrong
    (which dominate and would drown an unpaired comparison):
    χ² = (|b−c|−1)²/(b+c) on the two discordant cells only.

    All counts are exact integers from one corpus aggregation; the
    statistic is a fixed-shape double against a literal critical
    value (the MWU contract — no stats library on either engine).

    Scale: marker rater map-side, metadata rater one bounded
    aggregate broadcast back, then a single combinable count."""
    docs = load(spark, sf_dir, "documents")
    pred = _lang_pred(spark, sf_dir).select("doc_id", "pred")
    srcmaj = (
        docs.groupBy("source", F.col("lang").alias("lab"))
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.desc("cnt"), F.col("lab")
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .select("source", F.col("lab").alias("src_pred"))
    )
    u = (
        docs.select("doc_id", "lang", "source")
        .join(pred, "doc_id")
        .join(F.broadcast(srcmaj), "source")
        .select(
            F.when(F.col("pred") == F.col("lang"), 1).otherwise(0).alias("ok1"),
            F.when(F.col("src_pred") == F.col("lang"), 1)
            .otherwise(0)
            .alias("ok2"),
        )
    )
    m = u.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when((F.col("ok1") == 1) & (F.col("ok2") == 0), 1).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when((F.col("ok1") == 0) & (F.col("ok2") == 1), 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    bc = F.col("b") + F.col("c2")
    chi2 = (
        (F.abs(F.col("b") - F.col("c2")).cast("double") - 1)
        * (F.abs(F.col("b") - F.col("c2")).cast("double") - 1)
        / bc
    )
    return m.select(
        "n",
        F.col("b").alias("only_marker_right"),
        F.col("c2").alias("only_metadata_right"),
        F.round(F.when(bc > 0, chi2).otherwise(0.0), 6).alias("chi2_r6"),
        F.when((bc > 0) & (chi2 > MCNEMAR_CRIT), 1)
        .otherwise(0)
        .alias("significant_5pct"),
    )


#: Asymmetric decision costs: a missed positive is 5x a false alarm.
COST_FP = 1
COST_FN = 5


@query(
    "ml_threshold_cost_min",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             round(-0.25
               + 1.8 * (CAST(len(list_filter(string_split(text, ' '),
                       x -> x IN ('the','a','of','and','to','in')))
                       AS DOUBLE)
                 / len(list_filter(string_split(text, ' '), x -> x <> '')))
               + 0.05 * (CAST(len(text) AS DOUBLE)
                 / len(list_filter(string_split(text, ' '), x -> x <> '')))
               + 0.001 * len(list_filter(string_split(text, ' '),
                             x -> x <> '')), 6) AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    bounds AS (SELECT MIN(s) AS lo, MAX(s) AS hi FROM scored),
    grid AS (
      SELECT k, lo + k * (hi - lo) / {F1_GRID + 1} AS theta
      FROM bounds, unnest(generate_series(1, {F1_GRID})) AS t(k)
    ),
    sweep AS (
      SELECT g.k, g.theta,
             CAST(SUM(CASE WHEN s.s >= g.theta AND s.y = 1
                  THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN s.s >= g.theta AND s.y = 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN s.s < g.theta AND s.y = 1
                  THEN 1 ELSE 0 END) AS BIGINT) AS fn
      FROM scored s CROSS JOIN grid g
      GROUP BY g.k, g.theta
    ),
    costed AS (
      SELECT k, theta, tp, fp, fn,
             CAST({COST_FP} * fp + {COST_FN} * fn AS BIGINT) AS cost,
             ROW_NUMBER() OVER (ORDER BY {COST_FP} * fp + {COST_FN} * fn,
                                theta) AS rk
      FROM sweep
    )
    SELECT CAST(k AS INT) AS k, round(theta, 6) AS theta_r6,
           tp, fp, fn, cost
    FROM costed WHERE rk = 1
    """,
    tags=("evaluation", "beyond"),
)
def q_ml_threshold_cost_min(spark, sf_dir: str) -> DataFrame:
    """Cost-sensitive threshold selection on the same quality-score
    sweep as ml_threshold_tune_f1, but minimizing EXPECTED COST with
    asymmetric literal costs (a missed positive = {COST_FN}× a false
    alarm) — the decision rule production filters actually ship,
    because F1's implicit 1:1 cost trade is almost never the business
    trade (letting spam into a 100 TB corpus costs retraining;
    over-filtering costs tokens). Returns the argmin grid row
    (cost ties break toward the lower threshold — favor recall).

    Counts are exact integers, the cost is integer arithmetic, and
    the argmin rank runs over the {F1_GRID}-row sweep (bounded,
    allowlisted).

    Scale: one conditional-agg pass over scored docs × the broadcast
    grid, then constant-size selection."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    n_tokens = F.size(toks).cast("long")
    n_stop = F.size(
        F.filter(toks, lambda x: x.isin("the", "a", "of", "and", "to", "in"))
    ).cast("long")
    s = F.round(
        F.lit(-0.25)
        + F.lit(1.8) * (n_stop.cast("double") / n_tokens)
        + F.lit(0.05)
        * (F.length("text").cast("long").cast("double") / n_tokens)
        + F.lit(0.001) * n_tokens,
        6,
    )
    scored = docs.select(
        s.alias("s"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    bounds = scored.agg(F.min("s").alias("lo"), F.max("s").alias("hi"))
    grid = bounds.select(
        F.explode(F.sequence(F.lit(1), F.lit(F1_GRID))).alias("k"),
        "lo",
        "hi",
    ).select(
        "k",
        (F.col("lo") + F.col("k") * (F.col("hi") - F.col("lo")) / (F1_GRID + 1))
        .alias("theta"),
    )
    sweep = (
        scored.crossJoin(F.broadcast(grid))
        .groupBy("k", "theta")
        .agg(
            F.sum(F.when((F.col("s") >= F.col("theta")) & (F.col("y") == 1), 1).otherwise(0))
            .cast("long")
            .alias("tp"),
            F.sum(F.when((F.col("s") >= F.col("theta")) & (F.col("y") == 0), 1).otherwise(0))
            .cast("long")
            .alias("fp"),
            F.sum(F.when((F.col("s") < F.col("theta")) & (F.col("y") == 1), 1).otherwise(0))
            .cast("long")
            .alias("fn"),
        )
    )
    costed = sweep.withColumn(
        "cost", (COST_FP * F.col("fp") + COST_FN * F.col("fn")).cast("long")
    ).withColumn(
        "rk",
        F.row_number().over(Window.orderBy("cost", "theta")),
    )
    return costed.filter(F.col("rk") == 1).select(
        F.col("k").cast("int").alias("k"),
        F.round("theta", 6).alias("theta_r6"),
        "tp",
        "fp",
        "fn",
        "cost",
    )


@query(
    "ml_bandit_ucb1",
    oracle="""
    WITH arms AS (
      SELECT event_type AS arm,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN value > 75 THEN 1 ELSE 0 END) AS BIGINT)
               AS wins
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM arms)
    SELECT arm, n, wins,
           round(CAST(wins AS DOUBLE) / n, 6) AS mean_r6,
           round(CAST(wins AS DOUBLE) / n
                 + sqrt(2.0 * ln(CAST(nt AS DOUBLE)) / n), 6) AS ucb1_r6,
           CASE WHEN ROW_NUMBER() OVER (
                  ORDER BY round(CAST(wins AS DOUBLE) / n
                    + sqrt(2.0 * ln(CAST(nt AS DOUBLE)) / n), 6) DESC,
                  arm) = 1
                THEN 1 ELSE 0 END AS chosen
    FROM arms CROSS JOIN tot ORDER BY arm
    """,
    tags=("ml", "bandit", "beyond"),
)
def q_ml_bandit_ucb1(spark, sf_dir: str) -> DataFrame:
    """UCB1 bandit state from logged exposures: per arm (event type)
    the empirical high-value rate plus the exploration bonus
    √(2·ln N / n), and the deterministic argmax choice — the batch
    'which variant does the policy pull next' computation an
    experimentation platform materializes between serving windows
    (Thompson needs a random draw; UCB1 is the deterministic member
    of the family, which is also what makes it cross-engine
    replayable). Arms with few pulls win through the bonus even at
    lower means — the whole point.

    Counts are exact integers; mean and bonus are fixed-shape doubles
    rounded 6 BEFORE the argmax rank, so tie-breaks (bonus ties on
    the rounded value) resolve identically by arm name.

    Scale: one combinable corpus aggregation to |arms| rows; the
    rank runs on that bounded table (allowlisted)."""
    arms = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(F.col("event_type").alias("arm"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.when(F.col("value") > 75, 1).otherwise(0))
            .cast("long")
            .alias("wins"),
        )
    )
    tot = arms.agg(F.sum("n").cast("long").alias("nt"))
    scored = arms.crossJoin(F.broadcast(tot)).select(
        "arm",
        "n",
        "wins",
        F.round(F.col("wins").cast("double") / F.col("n"), 6).alias("mean_r6"),
        F.round(
            F.col("wins").cast("double") / F.col("n")
            + F.sqrt(2.0 * F.log(F.col("nt").cast("double")) / F.col("n")),
            6,
        ).alias("ucb1_r6"),
    )
    return scored.select(
        "arm",
        "n",
        "wins",
        "mean_r6",
        "ucb1_r6",
        F.when(
            F.row_number().over(Window.orderBy(F.desc("ucb1_r6"), "arm")) == 1,
            1,
        )
        .otherwise(0)
        .alias("chosen"),
    ).orderBy("arm")


@query(
    "ml_eval_slice_accuracy",
    oracle=f"""
    WITH c AS ({_MARKER_SQL}),
    p AS ({_PRED_SQL}),
    lab AS (
      SELECT d.source,
             CASE WHEN p.pred = d.lang THEN 1 ELSE 0 END AS ok
      FROM documents d JOIN p USING (doc_id)
    ),
    sl AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(ok) AS BIGINT) AS n_ok
      FROM lab GROUP BY source
    ),
    g AS (
      SELECT CAST(SUM(n) AS BIGINT) AS ng, CAST(SUM(n_ok) AS BIGINT) AS sg
      FROM sl
    )
    SELECT sl.source, sl.n, sl.n_ok,
           round(CAST(sl.n_ok AS DOUBLE) / sl.n, 6) AS acc_r6,
           round(CAST(sl.n_ok AS DOUBLE) / sl.n
                 - CAST(g.sg AS DOUBLE) / g.ng, 6) AS gap_vs_overall_r6,
           CASE WHEN ROW_NUMBER() OVER (
                  ORDER BY round(CAST(sl.n_ok AS DOUBLE) / sl.n, 6),
                           sl.source) = 1
                THEN 1 ELSE 0 END AS worst_slice
    FROM sl CROSS JOIN g ORDER BY source
    """,
)
def q_ml_eval_slice_accuracy(spark, sf_dir: str) -> DataFrame:
    """Slice-based evaluation of the lang-id heuristic: accuracy per
    SOURCE slice with each slice's gap against the pooled accuracy
    and a deterministic worst-slice marker — the MLOps discipline
    that catches 'the model is 95% overall and 60% on the slice that
    matters' before deployment (aggregate metrics hide exactly the
    failure modes slicing reveals; worst-group accuracy is also the
    quantity group-DRO training targets).

    Counts are exact integers from one corpus aggregation; accuracies
    and gaps are fixed-shape count ratios rounded 6, and the
    worst-slice rank runs on the bounded |sources| table with a
    round-6-then-name tie-break identical on both engines.

    Scale: map-side rater, one combinable (source) aggregation,
    constant-size algebra."""
    docs = load(spark, sf_dir, "documents")
    pred = _lang_pred(spark, sf_dir).select("doc_id", "pred")
    lab = docs.select("doc_id", "lang", "source").join(pred, "doc_id").select(
        "source",
        F.when(F.col("pred") == F.col("lang"), 1).otherwise(0).alias("ok"),
    )
    sl = lab.groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("ok").cast("long").alias("n_ok"),
    )
    g = sl.agg(
        F.sum("n").cast("long").alias("ng"),
        F.sum("n_ok").cast("long").alias("sg"),
    )
    acc = F.round(F.col("n_ok").cast("double") / F.col("n"), 6)
    scored = sl.crossJoin(F.broadcast(g)).select(
        "source",
        "n",
        "n_ok",
        acc.alias("acc_r6"),
        F.round(
            F.col("n_ok").cast("double") / F.col("n")
            - F.col("sg").cast("double") / F.col("ng"),
            6,
        ).alias("gap_vs_overall_r6"),
    )
    return scored.select(
        "source",
        "n",
        "n_ok",
        "acc_r6",
        "gap_vs_overall_r6",
        F.when(
            F.row_number().over(Window.orderBy("acc_r6", "source")) == 1, 1
        )
        .otherwise(0)
        .alias("worst_slice"),
    ).orderBy("source")


#: Two-sided 5% normal critical value (shared literal convention).
AUC_CI_CRIT = 1.959964


@query(
    "ml_eval_auc_delong_ci",
    oracle=f"""
    WITH scored AS (
      SELECT CAST(LEAST(floor(value), {AUC_MAX_BAND}) AS BIGINT) AS band,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL
    ),
    b AS (
      SELECT band,
             CAST(SUM(y) AS BIGINT) AS pos,
             CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg
      FROM scored GROUP BY band
    ),
    tot AS (
      SELECT CAST(SUM(pos) AS BIGINT) AS p, CAST(SUM(neg) AS BIGINT) AS q
      FROM b
    ),
    cum AS (
      SELECT band, pos, neg,
             COALESCE(SUM(neg) OVER (ORDER BY band
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cneg,
             COALESCE(SUM(pos) OVER (ORDER BY band DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cpos_above
      FROM b
    ),
    placed AS (
      SELECT pos, neg,
             CAST(round((cneg + neg / 2.0) / t.q, 9) AS DECIMAL(18,9))
               AS v10,
             CAST(round((cpos_above + pos / 2.0) / t.p, 9) AS DECIMAL(18,9))
               AS v01
      FROM cum CROSS JOIN tot t
    ),
    m AS (
      SELECT CAST(SUM(pos * CAST(v10 AS DECIMAL(19,9))) AS DOUBLE) AS s10,
             CAST(SUM(pos * (CAST(v10 AS DECIMAL(19,9))
                             * CAST(v10 AS DECIMAL(19,9)))) AS DOUBLE)
               AS q10,
             CAST(SUM(neg * CAST(v01 AS DECIMAL(19,9))) AS DOUBLE) AS s01,
             CAST(SUM(neg * (CAST(v01 AS DECIMAL(19,9))
                             * CAST(v01 AS DECIMAL(19,9)))) AS DOUBLE)
               AS q01
      FROM placed
    )
    SELECT t.p AS n_pos, t.q AS n_neg,
           round(m.s10 / t.p, 6) AS auc_r6,
           round(sqrt(
             ((m.q10 - m.s10 * m.s10 / t.p) / (t.p - 1)) / t.p
             + ((m.q01 - m.s01 * m.s01 / t.q) / (t.q - 1)) / t.q), 6)
             AS se_r6,
           round(m.s10 / t.p - {AUC_CI_CRIT} * sqrt(
             ((m.q10 - m.s10 * m.s10 / t.p) / (t.p - 1)) / t.p
             + ((m.q01 - m.s01 * m.s01 / t.q) / (t.q - 1)) / t.q), 6)
             AS ci_lo_r6,
           round(m.s10 / t.p + {AUC_CI_CRIT} * sqrt(
             ((m.q10 - m.s10 * m.s10 / t.p) / (t.p - 1)) / t.p
             + ((m.q01 - m.s01 * m.s01 / t.q) / (t.q - 1)) / t.q), 6)
             AS ci_hi_r6
    FROM m CROSS JOIN tot t
    """,
)
def q_ml_eval_auc_delong_ci(spark, sf_dir: str) -> DataFrame:
    """DeLong confidence interval for the banded ROC AUC — the error
    bar ml_eval_auc_roc's point estimate needs before anyone compares
    two models' AUCs: each positive's PLACEMENT (share of negatives
    below it, ties half) and each negative's dual placement are
    constant within a score band, so the DeLong structural variances
    collapse to band-weighted moments of two bounded columns —
    SE² = Var(V₁₀)/P + Var(V₀₁)/N, normal CI at the literal 1.96.

    Placements are round-9 decimals; their weighted moments are exact
    DECIMAL sums over the ≤ AUC_MAX_BAND+1 band table; SE and CI are
    fixed-shape double closed forms. (AUC here equals mean placement
    — the same tie-corrected value the point-estimate query reports.)

    Scale: identical bounded shape to ml_eval_auc_roc — one
    combinable band aggregation, two cumulative passes on the bounded
    table (allowlisted), 1-row closing algebra."""
    scored = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.least(F.floor("value"), F.lit(AUC_MAX_BAND))
            .cast("long")
            .alias("band"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("y"),
        )
    )
    b = scored.groupBy("band").agg(
        F.sum("y").cast("long").alias("pos"),
        (F.count("*") - F.sum("y")).cast("long").alias("neg"),
    )
    tot = b.agg(
        F.sum("pos").cast("long").alias("p"),
        F.sum("neg").cast("long").alias("q"),
    )
    w_up = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    w_dn = Window.orderBy(F.desc("band")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = b.select(
        "pos",
        "neg",
        F.coalesce(F.sum("neg").over(w_up), F.lit(0)).alias("cneg"),
        F.coalesce(F.sum("pos").over(w_dn), F.lit(0)).alias("cpos_above"),
    )
    placed = cum.crossJoin(F.broadcast(tot)).select(
        "pos",
        "neg",
        F.round((F.col("cneg") + F.col("neg") / 2.0) / F.col("q"), 9)
        .cast("decimal(18,9)")
        .alias("v10"),
        F.round((F.col("cpos_above") + F.col("pos") / 2.0) / F.col("p"), 9)
        .cast("decimal(18,9)")
        .alias("v01"),
    )
    m = placed.agg(
        F.sum(F.col("pos") * F.col("v10").cast("decimal(19,9)"))
        .cast("double")
        .alias("s10"),
        F.sum(
            F.col("pos")
            * (F.col("v10").cast("decimal(19,9)") * F.col("v10").cast("decimal(19,9)"))
        )
        .cast("double")
        .alias("q10"),
        F.sum(F.col("neg") * F.col("v01").cast("decimal(19,9)"))
        .cast("double")
        .alias("s01"),
        F.sum(
            F.col("neg")
            * (F.col("v01").cast("decimal(19,9)") * F.col("v01").cast("decimal(19,9)"))
        )
        .cast("double")
        .alias("q01"),
    )
    p = F.col("p").cast("double")
    q = F.col("q").cast("double")
    auc = F.col("s10") / p
    se = F.sqrt(
        ((F.col("q10") - F.col("s10") * F.col("s10") / p) / (p - 1)) / p
        + ((F.col("q01") - F.col("s01") * F.col("s01") / q) / (q - 1)) / q
    )
    return m.crossJoin(F.broadcast(tot)).select(
        F.col("p").alias("n_pos"),
        F.col("q").alias("n_neg"),
        F.round(auc, 6).alias("auc_r6"),
        F.round(se, 6).alias("se_r6"),
        F.round(auc - AUC_CI_CRIT * se, 6).alias("ci_lo_r6"),
        F.round(auc + AUC_CI_CRIT * se, 6).alias("ci_hi_r6"),
    )

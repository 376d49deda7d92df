"""Robust statistics over bounded aggregates (beyond-reference).

`agg_theil_sen_trend`: the Theil–Sen estimator — median of all
pairwise slopes — is the robust answer to "is this metric trending",
immune to the single-day outliers that wreck an OLS fit (up to 29%
contamination). Naively it is O(n²) in the CORPUS; the scale-correct
form runs the pairwise step on the per-(type, day) AGGREGATE, which is
bounded by history length — the same collapse-then-compute discipline
as window_changepoint_detect and ml_ols_closed_form (those fit or
test the mean path; this one survives outliers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.registry import query

#: Day width in epoch microseconds (shared with the sweep operators).
_DAY_US = 86_400_000_000


@query(
    "agg_theil_sen_trend",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    x0 AS (SELECT MIN(day) AS min_day FROM daily),
    d AS (
      SELECT event_type, CAST(day - min_day AS BIGINT) AS x, y
      FROM daily, x0
    ),
    slopes AS (
      SELECT a.event_type,
             round(CAST(b.y - a.y AS DOUBLE) / (b.x - a.x), 6) AS slope
      FROM d a JOIN d b
        ON a.event_type = b.event_type AND a.x < b.x
    ),
    med AS (
      SELECT event_type, round(quantile_cont(slope, 0.5), 6) AS slope_r6
      FROM slopes GROUP BY event_type
    ),
    resid AS (
      SELECT d.event_type, m.slope_r6,
             round(d.y - m.slope_r6 * d.x, 6) AS r
      FROM d JOIN med m USING (event_type)
    )
    SELECT event_type,
           CAST((SELECT COUNT(*) FROM d dd
                 WHERE dd.event_type = resid.event_type) AS BIGINT) AS n_days,
           slope_r6,
           round(quantile_cont(r, 0.5), 6) AS intercept_r6
    FROM resid GROUP BY event_type, slope_r6 ORDER BY event_type
    """,
    tags=("timeseries", "robust", "beyond"),
)
def q_agg_theil_sen_trend(spark, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per event type: median pairwise slope of
    the daily-count series, intercept = median residual at that slope
    (the standard Theil–Sen intercept). Pairs are generated ONLY on
    the bounded per-day aggregate (|days|² per type, not corpus²);
    the corpus itself contributes one map-side-combinable count.

    Exactness: slopes are integer-difference ratios rounded to 6
    before the median; `F.percentile` ↔ `quantile_cont` interpolate
    identically on identical doubles (agg_percentiles convention);
    the intercept medians round-6 residuals of the round-6 slope."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            (F.unix_micros("ts") / _DAY_US).cast("long").alias("day"),
        )
        .agg(F.count("*").alias("y"))
    )
    x0 = daily.agg(F.min("day").alias("min_day"))
    d = daily.crossJoin(F.broadcast(x0)).select(
        "event_type", (F.col("day") - F.col("min_day")).alias("x"), "y"
    )
    a = d.select(
        F.col("event_type"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = d.select(
        F.col("event_type").alias("et_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
    )
    slopes = (
        a.join(
            b,
            (a.event_type == b.et_b) & (F.col("xa") < F.col("xb")),
        )
        .select(
            "event_type",
            F.round(
                (F.col("yb") - F.col("ya")).cast("double")
                / (F.col("xb") - F.col("xa")),
                6,
            ).alias("slope"),
        )
    )
    med = slopes.groupBy("event_type").agg(
        F.round(F.percentile("slope", F.lit(0.5)), 6).alias("slope_r6")
    )
    resid = d.join(F.broadcast(med), "event_type").select(
        "event_type",
        "slope_r6",
        F.round(F.col("y") - F.col("slope_r6") * F.col("x"), 6).alias("r"),
    )
    n_days = d.groupBy("event_type").agg(F.count("*").cast("long").alias("n_days"))
    return (
        resid.groupBy("event_type", "slope_r6")
        .agg(F.round(F.percentile("r", F.lit(0.5)), 6).alias("intercept_r6"))
        .join(F.broadcast(n_days), "event_type")
        .select("event_type", "n_days", "slope_r6", "intercept_r6")
        .orderBy("event_type")
    )


@query(
    "profile_degree_powerlaw",
    oracle="""
    WITH deg AS (
      SELECT o_custkey, COUNT(*) AS d FROM orders GROUP BY o_custkey
    ),
    hist AS (SELECT d, COUNT(*) AS nd FROM deg GROUP BY d),
    pts AS (
      SELECT CAST(round(ln(CAST(d AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
             CAST(round(ln(CAST(nd AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
      FROM hist
    ),
    m AS (
      SELECT COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(CAST(x * y AS DECIMAL(38,12))) AS sxy,
             SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx
      FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_points,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
             AS slope_r6,
           round((CAST(sy AS DOUBLE)
                  - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
             AS intercept_r6
    FROM m
    """,
    tags=("profile", "graph", "beyond"),
)
def q_profile_degree_powerlaw(spark, sf_dir: str) -> DataFrame:
    """Degree-distribution power-law fit: log-log OLS over the
    orders-per-customer histogram — the one-number answer to "is this
    activity graph heavy-tailed, and how heavy" (slope ≈ −α; a steep
    α says salting/df-caps are optional, a shallow one says they are
    load-bearing — this profiler is how the skew mitigations in
    operators/skew.py get their evidence at 100 TB).

    Scale: corpus → |customers| degrees (one count) → |distinct
    degrees| histogram rows (bounded by max activity, ~dozens) — all
    regression algebra happens on that bounded table. Exactness: ln
    values round-6 then DECIMAL (exact, order-free sums; the
    perplexity discipline), closed-form slope/intercept from the
    moment sums with one double division at the end."""
    deg = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("d"))
    )
    hist = deg.groupBy("d").agg(F.count("*").alias("nd"))
    pts = hist.select(
        F.round(F.log(F.col("d").cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("x"),
        F.round(F.log(F.col("nd").cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("y"),
    )
    m = pts.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,12)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,12)")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        F.col("n").cast("long").alias("n_points"),
        F.round(slope, 6).alias("slope_r6"),
        F.round((sy - slope * sx) / n, 6).alias("intercept_r6"),
    )

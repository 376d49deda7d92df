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

from pyspark.sql import DataFrame, Window, functions as F

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
    the intercept medians round-6 residuals of the round-6 slope.

    Measured boundary (r14): the census's 8 initial-plan scans are
    NOT 8 executions — the six consumers' daily-count subtrees are
    IDENTICAL, so the executed plan carries 4 ReusedExchange nodes
    and runs the corpus aggregation once. Staging the daily table
    instead was A/B'd at sf0.1 (3 fresh JVMs each, interleaved):
    0.66-1.01 s inline vs 0.98-1.04 s staged — the persist
    round-trip costs more than the already-deduped recompute, the
    same boundary as dedup_simhash's inline self-join. Kept inline
    deliberately; this is the ReuseExchange counterpart to the
    staged-frame rule (stage only what ReuseExchange cannot dedupe:
    differing subtrees or cross-query reuse)."""
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


#: MAD anomaly knobs: consistency constant (σ ≈ 1.4826·MAD for a
#: normal) and the flag threshold in robust sigmas.
MAD_K = 1.4826
MAD_SIGMAS = 3.0
#: Planted burst: the 6th observed day's purchase events re-emitted
#: this many extra times (the corpus has no natural burst days — the
#: text_pii_redact seeding discipline, so the detector demonstrably
#: fires and the oracle replays the same spike).
MAD_BURST_X = 4


@query(
    "window_anomaly_mad",
    oracle=f"""
    WITH seeded AS (
      SELECT event_type, ts FROM events
      UNION ALL
      SELECT event_type, ts
      FROM events, unnest(range(0, {MAD_BURST_X})) AS r(k)
      WHERE event_type = 'purchase'
        AND epoch_us(ts) // {_DAY_US} = (
          SELECT MIN(epoch_us(ts) // {_DAY_US}) + 5 FROM events)
    ),
    daily AS (
      SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM seeded GROUP BY 1, 2
    ),
    med AS (
      SELECT event_type, round(quantile_cont(y, 0.5), 6) AS med_y
      FROM daily GROUP BY event_type
    ),
    dev AS (
      SELECT d.event_type, d.day, d.y, m.med_y,
             round(abs(d.y - m.med_y), 6) AS adev
      FROM daily d JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, round(quantile_cont(adev, 0.5), 6) AS mad_y
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type, CAST(d.day AS BIGINT) AS day, d.y,
           d.med_y, md.mad_y,
           round(abs(d.y - d.med_y)
                 / ({MAD_K} * greatest(md.mad_y, 0.5)), 6) AS robust_z_r6
    FROM dev d JOIN mad md USING (event_type)
    WHERE abs(d.y - d.med_y)
          > {MAD_SIGMAS} * {MAD_K} * greatest(md.mad_y, 0.5)
    ORDER BY event_type, day
    """,
    tags=("timeseries", "robust", "anomaly", "beyond"),
)
def q_window_anomaly_mad(spark, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation anomaly days per event type — the
    robust twin of window_zscore_anomaly: mean/std move WITH the
    outliers they are supposed to flag (masking), median/MAD do not,
    so a burst day cannot hide itself by inflating the threshold.
    MAD=0 degenerates (an over-half-constant series flags everything),
    so the denominator floors at 0.5 counts — standard practice.

    Scale: corpus → bounded per-(type, day) table in one count; both
    medians and the flag scan run on that bounded table (the Theil–Sen
    discipline). r14 restructure: the medians are WINDOW aggregates
    over event_type partitions instead of groupBy+rejoin — the old
    join shape consumed `daily` twice and `dev` twice, and Catalyst
    re-derives shared subtrees per consumer (census: 12 scans, 23
    exchanges); the linear window pipeline derives each frame once
    (3 scans — the seeded union's burst legs — 5 exchanges). The
    window partitions are the BOUNDED per-type day series (|days|
    rows per type), never corpus rows. Exactness: medians via
    percentile↔quantile_cont on integer counts, round-6 before every
    ratio."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", "ts", (F.unix_micros("ts") / _DAY_US).cast("long").alias("day")
    )
    burst_day = ev.agg((F.min("day") + 5).alias("bday"))
    burst = (
        ev.crossJoin(F.broadcast(burst_day))
        .filter((F.col("event_type") == "purchase") & (F.col("day") == F.col("bday")))
        .crossJoin(F.broadcast(
            ev.sparkSession.range(MAD_BURST_X).select(F.col("id").alias("k"))
        ))
        .select("event_type", "ts", "day")
    )
    seeded = ev.select("event_type", "ts", "day").unionByName(burst)
    daily = seeded.groupBy("event_type", "day").agg(F.count("*").alias("y"))
    per_type = Window.partitionBy("event_type")
    dev = daily.withColumn(
        "med_y", F.round(F.percentile("y", F.lit(0.5)).over(per_type), 6)
    ).withColumn("adev", F.round(F.abs(F.col("y") - F.col("med_y")), 6))
    scored = dev.withColumn(
        "mad_y", F.round(F.percentile("adev", F.lit(0.5)).over(per_type), 6)
    )
    denom = MAD_K * F.greatest(F.col("mad_y"), F.lit(0.5))
    return (
        scored
        .filter(F.abs(F.col("y") - F.col("med_y")) > MAD_SIGMAS * denom)
        .select(
            "event_type",
            "day",
            "y",
            "med_y",
            "mad_y",
            F.round(F.abs(F.col("y") - F.col("med_y")) / denom, 6).alias(
                "robust_z_r6"
            ),
        )
        .orderBy("event_type", "day")
    )


#: Neyman allocation: total sample budget to split across strata.
NEYMAN_BUDGET = 100


@query(
    "sample_neyman_allocation",
    oracle=f"""
    WITH s AS (
      SELECT c_mktsegment AS stratum,
             CAST(COUNT(*) AS BIGINT) AS n_h,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))
                      * CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS syy
      FROM customer GROUP BY 1
    ),
    sd AS (
      SELECT stratum, n_h,
             round(sqrt((syy - sy * sy / n_h) / n_h), 6) AS sd_r6
      FROM s
    ),
    tot AS (SELECT CAST(SUM(CAST(n_h * sd_r6 AS DECIMAL(28,6)))
                        AS DOUBLE) AS z FROM sd)
    SELECT stratum, n_h, sd_r6,
           round(n_h * sd_r6 / z, 6) AS share_r6,
           CAST(round({NEYMAN_BUDGET} * round(n_h * sd_r6 / z, 6))
                AS BIGINT) AS alloc_n
    FROM sd, tot ORDER BY stratum
    """,
    tags=("sampling", "stats", "beyond"),
)
def q_sample_neyman_allocation(spark, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation: split a fixed
    budget across strata proportionally to N_h·σ_h (minimizes the
    stratified estimator's variance) — the design step BEFORE
    sample_stratified draws anything; at 100 TB you allocate from a
    one-pass moment profile instead of equal shares and stop
    oversampling homogeneous strata.

    Exactness: per-stratum sums/sum-of-squares in exact DECIMAL, the
    population σ as one deterministic sqrt rounded to 6, shares as
    round-6 ratios, integer allocations from the ROUNDED share (both
    engines round the same double). One map-side-combinable pass;
    |strata| rows out."""
    s = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_mktsegment").alias("stratum"))
        .agg(
            F.count("*").cast("long").alias("n_h"),
            F.sum(F.col("c_acctbal").cast("decimal(18,4)"))
            .cast("double")
            .alias("sy"),
            F.sum(
                F.col("c_acctbal").cast("decimal(18,4)")
                * F.col("c_acctbal").cast("decimal(18,4)")
            )
            .cast("double")
            .alias("syy"),
        )
    )
    sd = s.select(
        "stratum",
        "n_h",
        F.round(
            F.sqrt(
                (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n_h"))
                / F.col("n_h")
            ),
            6,
        ).alias("sd_r6"),
    )
    # z sums DOUBLE products across strata — DECIMAL-cast each term so
    # the reduce is order-independent (each n_h·sd_r6 product is the
    # same double on both engines; only the summation order varies)
    tot = sd.agg(
        F.sum((F.col("n_h") * F.col("sd_r6")).cast("decimal(28,6)"))
        .cast("double")
        .alias("z")
    )
    share = F.round(F.col("n_h") * F.col("sd_r6") / F.col("z"), 6)
    return (
        sd.crossJoin(F.broadcast(tot))
        .select(
            "stratum",
            "n_h",
            "sd_r6",
            share.alias("share_r6"),
            F.round(NEYMAN_BUDGET * share).cast("long").alias("alloc_n"),
        )
        .orderBy("stratum")
    )


#: Welch test: the two arms and the normal critical value literal.
AB_ARM_A = "view"
AB_ARM_B = "purchase"
AB_CRIT = 1.959964


@query(
    "agg_welch_ttest",
    oracle=f"""
    WITH s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(value AS DECIMAL(28,10))
                      * CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS syy
      FROM events WHERE event_type IN ('{AB_ARM_A}', '{AB_ARM_B}')
        AND value IS NOT NULL
      GROUP BY event_type
    ),
    m AS (
      SELECT event_type, n, sy / n AS mean,
             (syy - sy * sy / n) / (n - 1) AS var
      FROM s
    ),
    w AS (
      SELECT a.n AS n_a, b.n AS n_b,
             round(a.mean, 6) AS mean_a_r6, round(b.mean, 6) AS mean_b_r6,
             (a.mean - b.mean)
               / sqrt(a.var / a.n + b.var / b.n) AS t,
             power(a.var / a.n + b.var / b.n, 2)
               / (power(a.var / a.n, 2) / (a.n - 1)
                  + power(b.var / b.n, 2) / (b.n - 1)) AS df
      FROM (SELECT * FROM m WHERE event_type = '{AB_ARM_A}') a,
           (SELECT * FROM m WHERE event_type = '{AB_ARM_B}') b
    )
    SELECT n_a, n_b, mean_a_r6, mean_b_r6,
           round(t, 6) AS t_stat_r6,
           round(df, 6) AS welch_df_r6,
           CASE WHEN abs(t) > {AB_CRIT} THEN 1 ELSE 0 END AS significant_5pct
    FROM w
    """,
    tags=("stats", "abtest", "beyond"),
)
def q_agg_welch_ttest(spark, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between two event arms — the
    A/B-testing primitive: per-arm mean/variance from ONE exact-
    DECIMAL moment pass, t statistic and Welch–Satterthwaite degrees
    of freedom in closed form, significance against the two-sided 5%
    normal critical value (a literal — no special functions, so no
    libm divergence risk beyond the final round-6). The p-value knob
    every experimentation platform turns into a shipped/not-shipped
    decision, computed in-engine at corpus scale.

    Scale: one map-side-combinable aggregation over the filtered
    scan; everything after is 2-row algebra."""
    # events.value is 2dp money (generator contract, probed in
    # scripts/scale_probe.py's 'exact' family head), so v2 = round(v*100)
    # is exactly DECIMAL(28,10)'s unscaled value / 1e8 and the
    # scaled-long limb sums below are the SAME rationals as the
    # wide-decimal sums they replace (r17; bit-identity at 10x volume
    # in the probe). Magnitudes: |v2| <= ~5.6e4 -> 1-limb plain sum
    # (N_safe 1.6e14 rows/group); v2^2 <= ~3.2e9 -> 2-limb
    # (N_safe 8.8e12). value IS NOT NULL is already filtered.
    from job_market_research_spark.exact import limb_sum_scaled

    v2 = F.round(F.col("value") * 100).cast("long")
    s = (
        load(spark, sf_dir, "events")
        .filter(
            F.col("event_type").isin(AB_ARM_A, AB_ARM_B)
            & F.col("value").isNotNull()
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            limb_sum_scaled(v2, 2, 32, limbs=1).cast("double").alias("sy"),
            limb_sum_scaled(v2 * v2, 4, 32).cast("double").alias("syy"),
        )
    )
    m = s.select(
        "event_type",
        "n",
        (F.col("sy") / F.col("n")).alias("mean"),
        ((F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")) / (F.col("n") - 1)).alias(
            "var"
        ),
    )
    a = m.filter(F.col("event_type") == AB_ARM_A).select(
        F.col("n").alias("n_a"), F.col("mean").alias("mean_a"), F.col("var").alias("var_a")
    )
    b = m.filter(F.col("event_type") == AB_ARM_B).select(
        F.col("n").alias("n_b"), F.col("mean").alias("mean_b"), F.col("var").alias("var_b")
    )
    va = F.col("var_a") / F.col("n_a")
    vb = F.col("var_b") / F.col("n_b")
    t = (F.col("mean_a") - F.col("mean_b")) / F.sqrt(va + vb)
    df = F.pow(va + vb, 2) / (
        F.pow(va, 2) / (F.col("n_a") - 1) + F.pow(vb, 2) / (F.col("n_b") - 1)
    )
    return a.crossJoin(F.broadcast(b)).select(
        "n_a",
        "n_b",
        F.round("mean_a", 6).alias("mean_a_r6"),
        F.round("mean_b", 6).alias("mean_b_r6"),
        F.round(t, 6).alias("t_stat_r6"),
        F.round(df, 6).alias("welch_df_r6"),
        F.when(F.abs(t) > AB_CRIT, 1).otherwise(0).alias("significant_5pct"),
    )


#: CUPED: the pre-period used for the covariate, the measurement
#: period, and the metric arms (user-level daily value sums).
CUPED_SPLIT_DAY = 15


@query(
    "agg_cuped_adjustment",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN epoch_us(ts) // {_DAY_US}
                            - (SELECT MIN(epoch_us(ts) // {_DAY_US})
                               FROM events) < {CUPED_SPLIT_DAY}
                           THEN CAST(value AS DECIMAL(28,10)) END)
                  AS DOUBLE) AS x,
             CAST(SUM(CASE WHEN epoch_us(ts) // {_DAY_US}
                            - (SELECT MIN(epoch_us(ts) // {_DAY_US})
                               FROM events) >= {CUPED_SPLIT_DAY}
                           THEN CAST(value AS DECIMAL(28,10)) END)
                  AS DOUBLE) AS y
      FROM events WHERE value IS NOT NULL GROUP BY user_id
    ),
    filled AS (
      SELECT user_id, coalesce(x, 0.0) AS x, coalesce(y, 0.0) AS y
      FROM per_user
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(28,10))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(28,10))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(28,10))
                      * CAST(y AS DECIMAL(28,10))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x AS DECIMAL(28,10))
                      * CAST(x AS DECIMAL(28,10))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y AS DECIMAL(28,10))
                      * CAST(y AS DECIMAL(28,10))) AS DOUBLE) AS syy
      FROM filled
    )
    SELECT n,
           round((sxy - sx * sy / n) / (sxx - sx * sx / n), 6) AS theta_r6,
           round((syy - sy * sy / n) / n, 6) AS var_y_r6,
           round(((syy - sy * sy / n)
                  - power(sxy - sx * sy / n, 2) / (sxx - sx * sx / n)) / n, 6)
             AS var_cuped_r6,
           round(power(sxy - sx * sy / n, 2)
                 / ((sxx - sx * sx / n) * (syy - sy * sy / n)), 6)
             AS var_reduction_r6
    FROM mom
    """,
    tags=("stats", "abtest", "beyond"),
)
def q_agg_cuped_adjustment(spark, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013): per-user pre-
    period spend (days < {CUPED_SPLIT_DAY}) as the covariate for the
    measurement-period metric; θ = cov(x,y)/var(x), and the adjusted
    metric's variance drops by exactly the squared correlation — the
    experiment-sensitivity multiplier every large A/B platform ships.
    Var(y_cuped) = Var(y)·(1 − ρ²) is reported next to the raw
    variance so the reduction is auditable.

    Scale: corpus → one user-keyed conditional aggregation (the
    pre/post split rides the same pass as CASE arms) → ONE 5-moment
    exact-DECIMAL aggregate → 1-row closed-form algebra. No joins at
    corpus size. Missing pre-period users coalesce to 0 (kept — at
    100 TB dropping them biases θ toward heavy users)."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    day = (F.unix_micros("ts") / _DAY_US).cast("long")
    d0 = ev.agg(F.min(day).alias("d0"))
    # Per-user conditional sums on the scaled-long path (r17; same
    # certifiable 2dp-events class as agg_welch_ttest — v2 is exactly
    # the DECIMAL(28,10) unscaled value / 1e8, |v2| <= ~5.6e4, plain
    # long sums safe to 1.6e14 rows/user). CASE-arm NULLs skip rows
    # identically; an all-NULL arm stays NULL into the same coalesce.
    # The OUTER x/y moments below stay wide-decimal: they sum derived
    # per-user TOTALS whose magnitude grows with corpus volume (at the
    # 100 TB design point a hot user's x2*y2 product exceeds the long
    # range), so the scaled-long equivalence is not provably safe
    # there (OPTIMIZATION_r17.md).
    from job_market_research_spark.exact import limb_sum_scaled

    v2 = F.round(F.col("value") * 100).cast("long")
    per_user = (
        ev.crossJoin(F.broadcast(d0))
        .groupBy("user_id")
        .agg(
            F.coalesce(
                limb_sum_scaled(
                    F.when(day - F.col("d0") < CUPED_SPLIT_DAY, v2),
                    2,
                    32,
                    limbs=1,
                ).cast("double"),
                F.lit(0.0),
            ).alias("x"),
            F.coalesce(
                limb_sum_scaled(
                    F.when(day - F.col("d0") >= CUPED_SPLIT_DAY, v2),
                    2,
                    32,
                    limbs=1,
                ).cast("double"),
                F.lit(0.0),
            ).alias("y"),
        )
    )
    mom = per_user.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("x").cast("decimal(28,10)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(28,10)")).cast("double").alias("sy"),
        F.sum(
            F.col("x").cast("decimal(28,10)") * F.col("y").cast("decimal(28,10)")
        )
        .cast("double")
        .alias("sxy"),
        F.sum(
            F.col("x").cast("decimal(28,10)") * F.col("x").cast("decimal(28,10)")
        )
        .cast("double")
        .alias("sxx"),
        F.sum(
            F.col("y").cast("decimal(28,10)") * F.col("y").cast("decimal(28,10)")
        )
        .cast("double")
        .alias("syy"),
    )
    n = F.col("n")
    cxy = F.col("sxy") - F.col("sx") * F.col("sy") / n
    cxx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / n
    return mom.select(
        "n",
        F.round(cxy / cxx, 6).alias("theta_r6"),
        F.round(cyy / n, 6).alias("var_y_r6"),
        F.round((cyy - F.pow(cxy, 2) / cxx) / n, 6).alias("var_cuped_r6"),
        F.round(F.pow(cxy, 2) / (cxx * cyy), 6).alias("var_reduction_r6"),
    )


@query(
    "agg_diff_in_diff",
    oracle=f"""
    WITH cells AS (
      SELECT CAST(user_id % 2 AS INT) AS treated,
             CASE WHEN epoch_us(ts) // {_DAY_US}
                   - (SELECT MIN(epoch_us(ts) // {_DAY_US}) FROM events)
                  < {CUPED_SPLIT_DAY} THEN 0 ELSE 1 END AS post,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*)
               AS mean_v
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT
      round(MAX(CASE WHEN treated = 1 AND post = 1 THEN mean_v END), 6)
        AS t_post_r6,
      round(MAX(CASE WHEN treated = 1 AND post = 0 THEN mean_v END), 6)
        AS t_pre_r6,
      round(MAX(CASE WHEN treated = 0 AND post = 1 THEN mean_v END), 6)
        AS c_post_r6,
      round(MAX(CASE WHEN treated = 0 AND post = 0 THEN mean_v END), 6)
        AS c_pre_r6,
      round((MAX(CASE WHEN treated = 1 AND post = 1 THEN mean_v END)
             - MAX(CASE WHEN treated = 1 AND post = 0 THEN mean_v END))
            - (MAX(CASE WHEN treated = 0 AND post = 1 THEN mean_v END)
               - MAX(CASE WHEN treated = 0 AND post = 0 THEN mean_v END)), 6)
        AS did_r6,
      CAST(SUM(n) AS BIGINT) AS n_events
    FROM cells
    """,
    tags=("stats", "abtest", "causal", "beyond"),
)
def q_agg_diff_in_diff(spark, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimator: (treated post − treated
    pre) − (control post − control pre) over the four (arm, period)
    cell means — the causal-inference workhorse for launches that
    can't be randomized per-user (arm here is the deterministic
    user_id parity; period splits at day {CUPED_SPLIT_DAY}, the CUPED
    boundary). Controls for both arm-level baseline differences and
    period-level shocks in one subtraction.

    Scale: the whole estimator is ONE conditional aggregation to a
    4-cell table (map-side combinable), then literal algebra. Cell
    means are exact-DECIMAL sums over exact counts."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    day = (F.unix_micros("ts") / _DAY_US).cast("long")
    d0 = ev.agg(F.min(day).alias("d0"))
    cells = (
        ev.crossJoin(F.broadcast(d0))
        .groupBy(
            (F.col("user_id") % 2).cast("int").alias("treated"),
            F.when(day - F.col("d0") < CUPED_SPLIT_DAY, 0)
            .otherwise(1)
            .alias("post"),
        )
        .agg(
            F.count("*").alias("n"),
            (
                F.sum(F.col("value").cast("decimal(28,10)")).cast("double")
                / F.count("*")
            ).alias("mean_v"),
        )
    )
    cell = lambda t, p: F.max(  # noqa: E731
        F.when((F.col("treated") == t) & (F.col("post") == p), F.col("mean_v"))
    )
    did = (cell(1, 1) - cell(1, 0)) - (cell(0, 1) - cell(0, 0))
    return cells.agg(
        F.round(cell(1, 1), 6).alias("t_post_r6"),
        F.round(cell(1, 0), 6).alias("t_pre_r6"),
        F.round(cell(0, 1), 6).alias("c_post_r6"),
        F.round(cell(0, 0), 6).alias("c_pre_r6"),
        F.round(did, 6).alias("did_r6"),
        F.sum("n").cast("long").alias("n_events"),
    )


#: SRM gate: chi-square critical value at 5%, 1 dof (a literal).
SRM_CRIT = 3.841459
SRM_SALT = "exp1#"


@query(
    "agg_srm_check",
    oracle=f"""
    WITH assign AS (
      SELECT DISTINCT user_id,
             CAST(('0x' || substr(md5('{SRM_SALT}'
                   || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS arm
      FROM events
    ),
    counts AS (
      SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM assign
    )
    SELECT n_a, n_b,
           round(power(n_a - (n_a + n_b) / 2.0, 2) / ((n_a + n_b) / 2.0)
                 + power(n_b - (n_a + n_b) / 2.0, 2) / ((n_a + n_b) / 2.0), 6)
             AS chi2_r6,
           CASE WHEN power(n_a - (n_a + n_b) / 2.0, 2) / ((n_a + n_b) / 2.0)
                     + power(n_b - (n_a + n_b) / 2.0, 2) / ((n_a + n_b) / 2.0)
                     > {SRM_CRIT} THEN 1 ELSE 0 END AS srm_flag
    FROM counts
    """,
    tags=("stats", "abtest", "beyond"),
)
def q_agg_srm_check(spark, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch gate: users are hash-assigned to two
    50/50 arms (seeded md5 — the deterministic assignment function an
    experimentation platform actually ships, replayable on both
    engines) and the observed split is chi-square-tested against the
    design ratio. An SRM flag invalidates an experiment BEFORE anyone
    reads its metrics — the first gate in every A/B pipeline. Chi-
    square is rational arithmetic (the monitor_feature_drift policy:
    no libm in the decision).

    Scale: distinct users (one shuffle), a 2-cell conditional count,
    literal algebra."""
    from job_market_research_spark.ml.neardup import portable_hash

    assign = (
        load(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select(
            F.pmod(
                portable_hash(
                    F.concat(F.lit(SRM_SALT), F.col("user_id").cast("string"))
                ),
                F.lit(2),
            ).alias("arm")
        )
    )
    counts = assign.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    e = (F.col("n_a") + F.col("n_b")) / 2.0
    chi2 = F.pow(F.col("n_a") - e, 2) / e + F.pow(F.col("n_b") - e, 2) / e
    return counts.select(
        "n_a",
        "n_b",
        F.round(chi2, 6).alias("chi2_r6"),
        F.when(chi2 > SRM_CRIT, 1).otherwise(0).alias("srm_flag"),
    )


#: mSPRT knobs: pre-period length (days) that fixes mu0/sigma, the
#: mixture variance tau^2 = sigma^2, and ln(1/alpha) at alpha = 5%.
MSPRT_PRE_DAYS = 5
MSPRT_LOG_CRIT = 2.995732


@query(
    "agg_sequential_msprt",
    oracle=f"""
    WITH ev AS (
      SELECT event_type, value,
             epoch_us(ts) // {_DAY_US}
               - (SELECT MIN(epoch_us(ts) // {_DAY_US}) FROM events) AS day
      FROM events WHERE value IS NOT NULL
    ),
    pre AS (
      SELECT event_type,
             CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*)
               AS mu0,
             (CAST(SUM(CAST(value AS DECIMAL(28,10))
                       * CAST(value AS DECIMAL(28,10))) AS DOUBLE)
              - power(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 2)
                / COUNT(*)) / (COUNT(*) - 1) AS var0
      FROM ev WHERE day < {MSPRT_PRE_DAYS} GROUP BY event_type
    ),
    daily AS (
      SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS n_d,
             SUM(CAST(value AS DECIMAL(28,10))) AS s_d
      FROM ev WHERE day >= {MSPRT_PRE_DAYS} GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, day,
             SUM(n_d) OVER w AS n_cum,
             CAST(SUM(s_d) OVER w AS DOUBLE) AS s_cum
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT c.event_type, CAST(c.day AS BIGINT) AS day,
           CAST(c.n_cum AS BIGINT) AS n_cum,
           round(0.5 * ln(p.var0 / (p.var0 + c.n_cum * p.var0))
                 + power(CAST(c.n_cum AS DOUBLE), 2) * p.var0
                   * power(c.s_cum / c.n_cum - p.mu0, 2)
                   / (2 * p.var0 * (p.var0 + c.n_cum * p.var0)), 6)
             AS log_lambda_r6,
           CASE WHEN 0.5 * ln(p.var0 / (p.var0 + c.n_cum * p.var0))
                     + power(CAST(c.n_cum AS DOUBLE), 2) * p.var0
                       * power(c.s_cum / c.n_cum - p.mu0, 2)
                       / (2 * p.var0 * (p.var0 + c.n_cum * p.var0))
                     > {MSPRT_LOG_CRIT} THEN 1 ELSE 0 END AS reject
    FROM cum c JOIN pre p USING (event_type)
    ORDER BY event_type, day
    """,
    tags=("stats", "abtest", "sequential", "beyond"),
)
def q_agg_sequential_msprt(spark, sf_dir: str) -> DataFrame:
    """Always-valid sequential test (mixture SPRT, Johari et al.
    2017): per event type, the cumulative post-period mean is tested
    daily against the pre-period baseline with the normal-mixture
    likelihood ratio (τ² = σ²) — the monitor an experimentation
    platform keeps open so it can STOP EARLY without inflating false
    positives the way repeated fixed-horizon t-tests do (the Welch
    query answers one look; this one answers every look). Emitted as
    log Λ against ln(1/α) to avoid exp overflow on long drifts.

    Scale: baseline moments and daily partials are one conditional
    aggregation each; the cumulative window runs PER EVENT TYPE over
    the bounded day table. ln/pow on deterministic doubles, round-6
    on output."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    day_abs = (F.unix_micros("ts") / _DAY_US).cast("long")
    d0 = ev.agg(F.min(day_abs).alias("d0"))
    ev = ev.crossJoin(F.broadcast(d0)).select(
        "event_type", "value", (day_abs - F.col("d0")).alias("day")
    )
    dec = F.col("value").cast("decimal(28,10)")
    pre = (
        ev.filter(F.col("day") < MSPRT_PRE_DAYS)
        .groupBy("event_type")
        .agg(
            (F.sum(dec).cast("double") / F.count("*")).alias("mu0"),
            (
                (
                    F.sum(dec * dec).cast("double")
                    - F.pow(F.sum(dec).cast("double"), 2) / F.count("*")
                )
                / (F.count("*") - 1)
            ).alias("var0"),
        )
    )
    daily = (
        ev.filter(F.col("day") >= MSPRT_PRE_DAYS)
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("n_d"), F.sum(dec).alias("s_d"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = daily.select(
        "event_type",
        "day",
        F.sum("n_d").over(w).alias("n_cum"),
        F.sum("s_d").over(w).cast("double").alias("s_cum"),
    )
    n = F.col("n_cum").cast("double")
    delta = F.col("s_cum") / F.col("n_cum") - F.col("mu0")
    v = F.col("var0")
    log_lam = 0.5 * F.log(v / (v + n * v)) + F.pow(n, 2) * v * F.pow(delta, 2) / (
        2 * v * (v + n * v)
    )
    return (
        cum.join(F.broadcast(pre), "event_type")
        .select(
            "event_type",
            F.col("day").cast("long").alias("day"),
            F.col("n_cum").cast("long").alias("n_cum"),
            F.round(log_lam, 6).alias("log_lambda_r6"),
            F.when(log_lam > MSPRT_LOG_CRIT, 1).otherwise(0).alias("reject"),
        )
        .orderBy("event_type", "day")
    )


#: Post-stratification: fixed pre-period activity bands (no quantile
#: window — band edges are literals, so strata never need a sort).
STRATA_EDGES = (1, 5, 20)


@query(
    "ml_ate_poststratified",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, CAST(user_id % 2 AS INT) AS treated,
             CAST(SUM(CASE WHEN epoch_us(ts) // {_DAY_US}
                            - (SELECT MIN(epoch_us(ts) // {_DAY_US})
                               FROM events) < {CUPED_SPLIT_DAY}
                           THEN 1 ELSE 0 END) AS BIGINT) AS pre_n,
             CAST(coalesce(SUM(CASE WHEN epoch_us(ts) // {_DAY_US}
                            - (SELECT MIN(epoch_us(ts) // {_DAY_US})
                               FROM events) >= {CUPED_SPLIT_DAY}
                           THEN CAST(value AS DECIMAL(28,10)) END), 0)
                  AS DOUBLE) AS y
      FROM events WHERE value IS NOT NULL GROUP BY user_id
    ),
    banded AS (
      SELECT CASE WHEN pre_n < {STRATA_EDGES[0]} THEN 0
                  WHEN pre_n < {STRATA_EDGES[1]} THEN 1
                  WHEN pre_n < {STRATA_EDGES[2]} THEN 2
                  ELSE 3 END AS stratum,
             treated, y
      FROM per_user
    ),
    cells AS (
      SELECT stratum,
             CAST(COUNT(*) AS BIGINT) AS n_h,
             CAST(SUM(treated) AS BIGINT) AS n_t,
             CAST(SUM(CASE WHEN treated = 1
                           THEN CAST(y AS DECIMAL(28,10)) END) AS DOUBLE)
               / nullif(SUM(treated), 0) AS mean_t,
             CAST(SUM(CASE WHEN treated = 0
                           THEN CAST(y AS DECIMAL(28,10)) END) AS DOUBLE)
               / nullif(SUM(1 - treated), 0) AS mean_c
      FROM banded GROUP BY stratum
    ),
    tot AS (SELECT SUM(n_h) AS n FROM cells)
    SELECT stratum, n_h, n_t,
           round(mean_t, 6) AS mean_t_r6,
           round(mean_c, 6) AS mean_c_r6,
           round(mean_t - mean_c, 6) AS ate_h_r6,
           round((mean_t - mean_c) * n_h / tot.n, 6) AS weighted_term_r6
    FROM cells, tot ORDER BY stratum
    """,
    tags=("stats", "causal", "beyond"),
)
def q_ml_ate_poststratified(spark, sf_dir: str) -> DataFrame:
    """Post-stratified average treatment effect: users band by FIXED
    pre-period activity edges {STRATA_EDGES} (literal edges — no
    quantile sort at corpus scale), the per-stratum treated/control
    mean gap is the stratum ATE, and the N_h/N-weighted terms sum to
    the adjusted estimate — the standard bias correction when arms
    are imbalanced on a pre-treatment covariate (simple mean
    difference mixes the activity imbalance into the effect).

    Scale: one user-keyed conditional aggregation (pre-count and
    post-outcome in the same pass), one |strata|-cell aggregate,
    broadcast total. Cell means are exact-decimal sums over exact
    counts; empty cells null out via nullif rather than dividing by
    zero."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    day = (F.unix_micros("ts") / _DAY_US).cast("long")
    d0 = ev.agg(F.min(day).alias("d0"))
    per_user = (
        ev.crossJoin(F.broadcast(d0))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(day - F.col("d0") < CUPED_SPLIT_DAY, 1).otherwise(0)
            )
            .cast("long")
            .alias("pre_n"),
            F.coalesce(
                F.sum(
                    F.when(
                        day - F.col("d0") >= CUPED_SPLIT_DAY,
                        F.col("value").cast("decimal(28,10)"),
                    )
                ).cast("double"),
                F.lit(0.0),
            ).alias("y"),
        )
        .select(
            (F.col("user_id") % 2).cast("int").alias("treated"),
            F.when(F.col("pre_n") < STRATA_EDGES[0], 0)
            .when(F.col("pre_n") < STRATA_EDGES[1], 1)
            .when(F.col("pre_n") < STRATA_EDGES[2], 2)
            .otherwise(3)
            .alias("stratum"),
            "y",
        )
    )
    ydec = F.col("y").cast("decimal(28,10)")
    cells = per_user.groupBy("stratum").agg(
        F.count("*").cast("long").alias("n_h"),
        F.sum("treated").cast("long").alias("n_t"),
        (
            F.sum(F.when(F.col("treated") == 1, ydec)).cast("double")
            / F.nullif(F.sum("treated"), F.lit(0))
        ).alias("mean_t"),
        (
            F.sum(F.when(F.col("treated") == 0, ydec)).cast("double")
            / F.nullif(F.sum(1 - F.col("treated")), F.lit(0))
        ).alias("mean_c"),
    )
    tot = cells.agg(F.sum("n_h").alias("n"))
    ate = F.col("mean_t") - F.col("mean_c")
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "stratum",
            "n_h",
            "n_t",
            F.round("mean_t", 6).alias("mean_t_r6"),
            F.round("mean_c", 6).alias("mean_c_r6"),
            F.round(ate, 6).alias("ate_h_r6"),
            F.round(ate * F.col("n_h") / F.col("n"), 6).alias(
                "weighted_term_r6"
            ),
        )
        .orderBy("stratum")
    )


#: Seasonal decomposition: centered moving-average half-window (±3
#: days ⇒ a 7-day trend window aligned with the weekly cycle).
STL_HALF_W = 3


@query(
    "window_seasonal_decompose",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    trend AS (
      SELECT event_type, day, y,
             CASE WHEN COUNT(*) OVER w = 2 * {STL_HALF_W} + 1
                  THEN SUM(y) OVER w END AS t7
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN {STL_HALF_W} PRECEDING
                            AND {STL_HALF_W} FOLLOWING)
    ),
    season AS (
      SELECT event_type, day % 7 AS dow,
             7 * SUM(y) - SUM(t7) AS num,
             7 * COUNT(*) AS den
      FROM trend WHERE t7 IS NOT NULL
      GROUP BY event_type, day % 7
    )
    SELECT t.event_type, CAST(t.day AS BIGINT) AS day, t.y,
           t.t7 / 7.0 AS trend,
           s.num / CAST(s.den AS DOUBLE) AS seasonal,
           (s.den * t.y - (s.den // 7) * t.t7 - s.num)
             / CAST(s.den AS DOUBLE) AS residual
    FROM trend t JOIN season s
      ON s.event_type = t.event_type AND s.dow = t.day % 7
    WHERE t.t7 IS NOT NULL
    ORDER BY t.event_type, t.day
    """,
    tags=("timeseries", "decompose", "beyond"),
)
def q_window_seasonal_decompose(spark, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the daily count series:
    trend = 7-day centered moving average (full windows only — edge
    days have no unbiased trend and are excluded, not zero-filled),
    seasonal = day-of-week mean of the detrended series, residual =
    the rest. agg_seasonal_anomaly COMPARES against a seasonal
    baseline; this op actually SEPARATES the components, which is
    what forecasting and anomaly thresholds both consume.

    Scale: everything beyond the one daily count runs on the bounded
    (type, day) table — type-keyed windows, a 7-row seasonal profile
    per type, one join back. Exactness: every component is an
    INTEGER numerator over an integer denominator with exactly ONE
    double division at output (seasonal = (7·Σy − ΣT)/(7n)) — no
    rounding anywhere, so the cross-engine half-rounding trap (Spark
    rounds a decimal rendering, C rounds the binary value; they
    disagree on exact halves) cannot occur by construction."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            (F.unix_micros("ts") / _DAY_US).cast("long").alias("day"),
        )
        .agg(F.count("*").alias("y"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-STL_HALF_W, STL_HALF_W)
    )
    trend = daily.select(
        "event_type",
        "day",
        "y",
        F.when(
            F.count("*").over(w) == 2 * STL_HALF_W + 1, F.sum("y").over(w)
        ).alias("t7"),
    ).filter(F.col("t7").isNotNull())
    season = trend.groupBy(
        "event_type", (F.col("day") % 7).alias("dow")
    ).agg(
        (7 * F.sum("y") - F.sum("t7")).alias("num"),
        (7 * F.count("*")).alias("den"),
    )
    den_d = F.col("den").cast("double")
    return (
        trend.withColumn("dow", F.col("day") % 7)
        .join(F.broadcast(season), ["event_type", "dow"])
        .select(
            "event_type",
            F.col("day").cast("long").alias("day"),
            "y",
            (F.col("t7") / 7.0).alias("trend"),
            (F.col("num") / den_d).alias("seasonal"),
            (
                (
                    F.col("den") * F.col("y")
                    - (F.col("den") / 7).cast("long") * F.col("t7")
                    - F.col("num")
                )
                / den_d
            ).alias("residual"),
        )
        .orderBy("event_type", "day")
    )


#: Split conformal: hash split into calibration/test, miscoverage
#: level alpha = 0.1 (90% intervals).
CONF_ALPHA = 0.1


@query(
    "ml_conformal_prediction",
    oracle=f"""
    WITH ev AS (
      SELECT event_type, event_id, value,
             CASE WHEN CAST(('0x' || substr(md5('conf#'
                    || CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 0
                  THEN 'cal' ELSE 'test' END AS split
      FROM events WHERE value IS NOT NULL
    ),
    model AS (
      SELECT event_type,
             CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*)
               AS pred
      FROM ev WHERE split = 'cal' GROUP BY event_type
    ),
    cal_resid AS (
      SELECT e.event_type, round(abs(e.value - m.pred), 6) AS r
      FROM ev e JOIN model m USING (event_type) WHERE e.split = 'cal'
    ),
    counts AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_cal
      FROM cal_resid GROUP BY event_type
    ),
    ranked AS (
      SELECT event_type, r,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY r) AS rk
      FROM cal_resid
    ),
    q AS (
      SELECT ra.event_type, c.n_cal, ra.r AS qhat
      FROM ranked ra JOIN counts c USING (event_type)
      WHERE ra.rk = least(c.n_cal,
              CAST(ceil((1 - {CONF_ALPHA}) * (c.n_cal + 1)) AS BIGINT))
    )
    SELECT e.event_type, q.n_cal,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           q.qhat AS qhat_r6,
           round(CAST(SUM(CASE WHEN abs(e.value - m.pred) <= q.qhat
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS coverage_r6
    FROM ev e
    JOIN model m USING (event_type)
    JOIN q USING (event_type)
    WHERE e.split = 'test'
    GROUP BY e.event_type, q.n_cal, q.qhat
    ORDER BY e.event_type
    """,
    tags=("stats", "uncertainty", "beyond"),
)
def q_ml_conformal_prediction(spark, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals (Vovk; Lei et al. 2018):
    hash-split the events, fit the trivial per-type mean predictor on
    the calibration half, take the ceil((1-α)(n+1))/n-th DISCRETE
    quantile of absolute calibration residuals as the interval
    half-width, and AUDIT the finite-sample guarantee on the held-out
    half — coverage ≥ 1−α by exchangeability, model quality
    irrelevant. The distribution-free uncertainty wrapper any
    in-engine predictor (OLS, kNN, quality model) can wear.

    Exactness: the split is a seeded md5 parity; residuals round-6
    before ranking; BOTH engines select the identical order statistic
    with an explicit row_number-over-sorted-residuals rank filter
    (no engine-specific quantile semantics in the loop). Coverage is
    a ratio of exact counts."""
    from job_market_research_spark.ml.neardup import portable_hash

    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            "value",
            (
                F.pmod(
                    portable_hash(
                        F.concat(
                            F.lit("conf#"), F.col("event_id").cast("string")
                        )
                    ),
                    F.lit(2),
                )
                == 0
            ).alias("is_cal"),
        )
    )
    model = (
        ev.filter(F.col("is_cal"))
        .groupBy("event_type")
        .agg(
            (
                F.sum(F.col("value").cast("decimal(28,10)")).cast("double")
                / F.count("*")
            ).alias("pred")
        )
    )
    cal = (
        ev.filter(F.col("is_cal"))
        .join(F.broadcast(model), "event_type")
        .select(
            "event_type",
            F.round(F.abs(F.col("value") - F.col("pred")), 6).alias("r"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("r")
    counted = cal.withColumn("rk", F.row_number().over(w)).withColumn(
        "n_cal", F.count("*").over(Window.partitionBy("event_type"))
    )
    qhat = (
        counted.filter(
            F.col("rk")
            == F.least(
                F.col("n_cal"),
                F.ceil((1 - CONF_ALPHA) * (F.col("n_cal") + 1)).cast("int"),
            )
        )
        .select(
            "event_type",
            F.col("n_cal").cast("long").alias("n_cal"),
            F.col("r").alias("qhat_r6"),
        )
    )
    test = ev.filter(~F.col("is_cal")).join(F.broadcast(model), "event_type")
    return (
        test.join(F.broadcast(qhat), "event_type")
        .groupBy("event_type", "n_cal", "qhat_r6")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.round(
                F.sum(
                    F.when(
                        F.abs(F.col("value") - F.col("pred"))
                        <= F.col("qhat_r6"),
                        1,
                    ).otherwise(0)
                ).cast("double")
                / F.count("*"),
                6,
            ).alias("coverage_r6"),
        )
        .select(
            "event_type", "n_cal", "n_test", "qhat_r6", "coverage_r6"
        )
        .orderBy("event_type")
    )


#: Winsorization caps (5th / 95th percentile of each group).
WINSOR_LO = 0.05
WINSOR_HI = 0.95


@query(
    "window_winsorize_trim",
    oracle=f"""
    WITH caps AS (
      SELECT event_type,
             round(quantile_cont(value, {WINSOR_LO}), 6) AS lo,
             round(quantile_cont(value, {WINSOR_HI}), 6) AS hi
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    capped AS (
      SELECT e.event_type,
             CAST(least(greatest(e.value, c.lo), c.hi)
                  AS DECIMAL(28,10)) AS wv,
             CASE WHEN e.value >= c.lo AND e.value <= c.hi
                  THEN CAST(e.value AS DECIMAL(28,10)) END AS tv
      FROM events e JOIN caps c USING (event_type)
      WHERE e.value IS NOT NULL
    )
    SELECT cp.event_type, c.lo AS cap_lo_r6, c.hi AS cap_hi_r6,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(tv) AS BIGINT) AS n_kept,
           CAST(SUM(wv) AS DOUBLE) / COUNT(*) AS winsor_mean,
           CAST(SUM(tv) AS DOUBLE) / COUNT(tv) AS trimmed_mean
    FROM capped cp JOIN caps c ON c.event_type = cp.event_type
    GROUP BY cp.event_type, c.lo, c.hi
    ORDER BY cp.event_type
    """,
    tags=("stats", "robust", "beyond"),
)
def q_window_winsorize_trim(spark, sf_dir: str) -> DataFrame:
    """Winsorized and trimmed means per event type: values clamp to
    (or drop outside) the round-6 5th/95th percentile caps — the
    robust location estimates a metrics platform reports next to the
    raw mean so one fat-finger value can't move a dashboard. Both
    estimates in ONE pass over the cap-joined scan.

    Exactness: caps are round-6 interpolated percentiles
    (`agg_percentiles` convention); the clamped/kept values sum in
    exact DECIMAL, and the means are emitted as unrounded
    sum/count doubles (the exact_avg convention — no round-6 of a
    possibly-half mean)."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    caps = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(WINSOR_LO)), 6).alias("lo"),
        F.round(F.percentile("value", F.lit(WINSOR_HI)), 6).alias("hi"),
    )
    capped = ev.join(F.broadcast(caps), "event_type").select(
        "event_type",
        "lo",
        "hi",
        F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
        .cast("decimal(28,10)")
        .alias("wv"),
        F.when(
            (F.col("value") >= F.col("lo")) & (F.col("value") <= F.col("hi")),
            F.col("value").cast("decimal(28,10)"),
        ).alias("tv"),
    )
    return (
        capped.groupBy(
            "event_type",
            F.col("lo").alias("cap_lo_r6"),
            F.col("hi").alias("cap_hi_r6"),
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.count("tv").cast("long").alias("n_kept"),
            (F.sum("wv").cast("double") / F.count("*")).alias("winsor_mean"),
            (F.sum("tv").cast("double") / F.count("tv")).alias("trimmed_mean"),
        )
        .orderBy("event_type")
    )


#: Power analysis literals: z_{1-alpha/2} at 5% two-sided, z_{1-beta}
#: at 80% power, and the relative effect sizes to tabulate.
POWER_Z_ALPHA = 1.959964
POWER_Z_BETA = 0.841621
POWER_EFFECTS = (0.01, 0.02, 0.05, 0.10)


@query(
    "agg_power_analysis",
    oracle=f"""
    WITH m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*)
               AS mean_v,
             (CAST(SUM(CAST(value AS DECIMAL(28,10))
                       * CAST(value AS DECIMAL(28,10))) AS DOUBLE)
              - power(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 2)
                / COUNT(*)) / (COUNT(*) - 1) AS var_v
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, CAST(eff AS DOUBLE) AS rel_effect,
           round(mean_v, 6) AS mean_r6,
           CAST(ceil(2.0 * var_v
                * power({POWER_Z_ALPHA} + {POWER_Z_BETA}, 2)
                / power(eff * mean_v, 2)) AS BIGINT) AS n_per_arm
    FROM m, unnest([{", ".join(str(e) for e in POWER_EFFECTS)}]) AS t(eff)
    ORDER BY event_type, rel_effect
    """,
    tags=("stats", "abtest", "beyond"),
)
def q_agg_power_analysis(spark, sf_dir: str) -> DataFrame:
    """Experiment power calculator: per-arm sample size needed to
    detect a 1/2/5/10% relative lift of each metric at 5% two-sided
    significance and 80% power — n = 2σ²(z_α + z_β)²/Δ², the closed
    form behind every experimentation platform's duration estimator,
    fed by one exact-DECIMAL moment pass over the corpus (the power
    table and the Welch test share the same moments). z values are
    literals, so no special functions anywhere.

    The reading: the metric with the largest σ/μ needs the longest
    experiment — this table is why platforms prefer low-variance
    proxy metrics."""
    dec = F.col("value").cast("decimal(28,10)")
    m = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            (F.sum(dec).cast("double") / F.count("*")).alias("mean_v"),
            (
                (
                    F.sum(dec * dec).cast("double")
                    - F.pow(F.sum(dec).cast("double"), 2) / F.count("*")
                )
                / (F.count("*") - 1)
            ).alias("var_v"),
        )
    )
    effects = F.array(*[F.lit(float(e)) for e in POWER_EFFECTS])
    z2 = (POWER_Z_ALPHA + POWER_Z_BETA) ** 2
    return (
        m.select(
            "event_type",
            "mean_v",
            "var_v",
            F.explode(effects).alias("rel_effect"),
        )
        .select(
            "event_type",
            "rel_effect",
            F.round("mean_v", 6).alias("mean_r6"),
            F.ceil(
                2.0
                * F.col("var_v")
                * z2
                / F.pow(F.col("rel_effect") * F.col("mean_v"), 2)
            )
            .cast("long")
            .alias("n_per_arm"),
        )
        .orderBy("event_type", "rel_effect")
    )


#: Mann-Whitney arms (reused from the Welch pair) and z critical.
MWU_CRIT = 1.959964


@query(
    "agg_mann_whitney_u",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
             round(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE)
                   / COUNT(*), 6) AS m
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('{AB_ARM_A}', '{AB_ARM_B}')
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT event_type, m,
             RANK() OVER (ORDER BY m) AS rk,
             COUNT(*) OVER (PARTITION BY m) AS nt
      FROM daily
    ),
    avg_ranked AS (
      SELECT event_type, rk + (nt - 1) / 2.0 AS ar FROM ranked
    ),
    s AS (
      SELECT
        CAST(SUM(CASE WHEN event_type = '{AB_ARM_A}' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN event_type = '{AB_ARM_B}' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_b,
        CAST(SUM(CASE WHEN event_type = '{AB_ARM_A}' THEN
             CAST(ar * 2 AS BIGINT) END) AS BIGINT) AS r2_a
      FROM avg_ranked
    )
    SELECT n_a, n_b,
           round(r2_a / 2.0 - n_a * (n_a + 1) / 2.0, 6) AS u_stat,
           round((r2_a / 2.0 - n_a * (n_a + 1) / 2.0 - n_a * n_b / 2.0)
                 / sqrt(n_a * n_b * (n_a + n_b + 1) / 12.0), 6) AS z_r6,
           CASE WHEN abs((r2_a / 2.0 - n_a * (n_a + 1) / 2.0
                          - n_a * n_b / 2.0)
                 / sqrt(n_a * n_b * (n_a + n_b + 1) / 12.0)) > {MWU_CRIT}
                THEN 1 ELSE 0 END AS significant_5pct
    FROM s
    """,
    tags=("stats", "abtest", "nonparametric", "beyond"),
)
def q_agg_mann_whitney_u(spark, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) between the two arms' DAILY
    mean values — the nonparametric twin of agg_welch_ttest for when
    the metric distribution is too heavy-tailed to trust a t-test
    (ranks are immune to the outliers the MAD detector flags). Tied
    round-6 day means take average ranks; doubling the average rank
    keeps the rank sum an exact INTEGER (half-ranks end in .5) until
    one final division.

    Scale: corpus → the bounded per-(arm, day) mean table; the global
    rank window runs over those ≤ 2·|days| rows only (allowlisted
    bounded window), and the U/z algebra is a 1-row closed form with
    a literal critical value."""
    daily = (
        load(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull()
            & F.col("event_type").isin(AB_ARM_A, AB_ARM_B)
        )
        .groupBy("event_type", (F.unix_micros("ts") / _DAY_US).cast("long"))
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(28,10)")).cast("double")
                / F.count("*"),
                6,
            ).alias("m")
        )
    )
    w_rank = Window.orderBy("m")
    w_ties = Window.partitionBy("m")
    ranked = daily.select(
        "event_type",
        (F.rank().over(w_rank) + (F.count("*").over(w_ties) - 1) / 2.0).alias(
            "ar"
        ),
    )
    s = ranked.agg(
        F.sum(F.when(F.col("event_type") == AB_ARM_A, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("event_type") == AB_ARM_B, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(
            F.when(
                F.col("event_type") == AB_ARM_A,
                (F.col("ar") * 2).cast("long"),
            )
        )
        .cast("long")
        .alias("r2_a"),
    )
    u = F.col("r2_a") / 2.0 - F.col("n_a") * (F.col("n_a") + 1) / 2.0
    z = (u - F.col("n_a") * F.col("n_b") / 2.0) / F.sqrt(
        F.col("n_a") * F.col("n_b") * (F.col("n_a") + F.col("n_b") + 1) / 12.0
    )
    return s.select(
        "n_a",
        "n_b",
        F.round(u, 6).alias("u_stat"),
        F.round(z, 6).alias("z_r6"),
        F.when(F.abs(z) > MWU_CRIT, 1).otherwise(0).alias("significant_5pct"),
    )


@query(
    "ml_shapley_r2_features",
    oracle=f"""
    WITH m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(hour(ts) AS DECIMAL(28,10))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(dayofweek(ts) AS DECIMAL(28,10))) AS DOUBLE) AS sz,
             CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(hour(ts) AS DECIMAL(28,10))
                      * CAST(hour(ts) AS DECIMAL(28,10))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(dayofweek(ts) AS DECIMAL(28,10))
                      * CAST(dayofweek(ts) AS DECIMAL(28,10))) AS DOUBLE) AS szz,
             CAST(SUM(CAST(hour(ts) AS DECIMAL(28,10))
                      * CAST(dayofweek(ts) AS DECIMAL(28,10))) AS DOUBLE) AS sxz,
             CAST(SUM(CAST(hour(ts) AS DECIMAL(28,10))
                      * CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(dayofweek(ts) AS DECIMAL(28,10))
                      * CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS szy,
             CAST(SUM(CAST(value AS DECIMAL(28,10))
                      * CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS syy
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    c AS (
      SELECT event_type,
             sxx - sx * sx / n AS cxx, szz - sz * sz / n AS czz,
             sxz - sx * sz / n AS cxz, sxy - sx * sy / n AS cxy,
             szy - sz * sy / n AS czy, syy - sy * sy / n AS cyy
      FROM m
    ),
    r AS (
      SELECT event_type,
             cxy * cxy / (cxx * cyy) AS r2_x,
             czy * czy / (czz * cyy) AS r2_z,
             ((cxy * czz - czy * cxz) * cxy
              + (czy * cxx - cxy * cxz) * czy)
               / ((cxx * czz - cxz * cxz) * cyy) AS r2_xz
      FROM c
    )
    SELECT event_type,
           round(r2_xz, 6) AS r2_full_r6,
           round((r2_x + (r2_xz - r2_z)) / 2, 6) AS phi_hour_r6,
           round((r2_z + (r2_xz - r2_x)) / 2, 6) AS phi_dow_r6
    FROM r ORDER BY event_type
    """,
    tags=("ml", "attribution", "beyond"),
)
def q_ml_shapley_r2_features(spark, sf_dir: str) -> DataFrame:
    """Shapley decomposition of the two-feature OLS R² (value ~ hour +
    day-of-week, per event type): each feature's attribution averages
    its marginal R² contribution over both insertion orders — the
    LMG/Shapley answer to "which feature carries the fit" that
    (unlike raw per-feature R²) is immune to the double-counting
    collinearity causes, and sums exactly to the full-model R²
    (pinned by test). The feature-importance sibling of
    agg_shapley_attribution's conversion-credit query.

    Scale: ONE exact-DECIMAL 9-moment pass; every R² (single and
    two-feature via Cramer) and both Shapley terms are closed-form
    algebra on the |types|-row moment table."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    x = F.hour("ts").cast("decimal(28,10)")
    z = F.dayofweek("ts").cast("decimal(28,10)")
    y = F.col("value").cast("decimal(28,10)")
    m = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(z).cast("double").alias("sz"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(z * z).cast("double").alias("szz"),
        F.sum(x * z).cast("double").alias("sxz"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(z * y).cast("double").alias("szy"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n = F.col("n")
    cxx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    czz = F.col("szz") - F.col("sz") * F.col("sz") / n
    cxz = F.col("sxz") - F.col("sx") * F.col("sz") / n
    cxy = F.col("sxy") - F.col("sx") * F.col("sy") / n
    czy = F.col("szy") - F.col("sz") * F.col("sy") / n
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / n
    r2_x = cxy * cxy / (cxx * cyy)
    r2_z = czy * czy / (czz * cyy)
    r2_xz = ((cxy * czz - czy * cxz) * cxy + (czy * cxx - cxy * cxz) * czy) / (
        (cxx * czz - cxz * cxz) * cyy
    )
    return m.select(
        "event_type",
        F.round(r2_xz, 6).alias("r2_full_r6"),
        F.round((r2_x + (r2_xz - r2_z)) / 2, 6).alias("phi_hour_r6"),
        F.round((r2_z + (r2_xz - r2_x)) / 2, 6).alias("phi_dow_r6"),
    ).orderBy("event_type")


@query(
    "agg_price_elasticity",
    oracle="""
    WITH pts AS (
      SELECT p_type,
             CAST(round(ln(l_extendedprice / l_quantity), 6)
                  AS DECIMAL(18,6)) AS x,
             CAST(round(ln(l_quantity), 6) AS DECIMAL(18,6)) AS y
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_quantity > 0 AND l_extendedprice > 0
    ),
    m AS (
      SELECT p_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(CAST(x * y AS DECIMAL(38,12))) AS sxy,
             SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx
      FROM pts GROUP BY p_type
    )
    SELECT p_type, n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
             AS elasticity_r6
    FROM m ORDER BY p_type
    """,
    tags=("stats", "econometrics", "beyond"),
)
def q_agg_price_elasticity(spark, sf_dir: str) -> DataFrame:
    """Price elasticity of demand per part type: the log-log OLS slope
    of quantity on unit price (extendedprice/quantity) — the classic
    econometric read of the fact table (slope ≈ −ε; near 0 means
    demand ignores price). Methodologically the retail twin of
    profile_degree_powerlaw: ln-transform, round-6 into exact DECIMAL
    moments (order-free sums), closed-form slope, one corpus pass.

    At 100 TB the moment aggregation is map-side combinable per type
    and nothing else scales with data."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)
    )
    part = load(spark, sf_dir, "part")
    pts = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "p_type",
        F.round(F.log(F.col("l_extendedprice") / F.col("l_quantity")), 6)
        .cast("decimal(18,6)")
        .alias("x"),
        F.round(F.log("l_quantity"), 6).cast("decimal(18,6)").alias("y"),
    )
    m = pts.groupBy("p_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,12)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,12)")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    return m.select(
        "p_type",
        F.col("n").cast("long").alias("n"),
        F.round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6).alias(
            "elasticity_r6"
        ),
    ).orderBy("p_type")


@query(
    "agg_retention_halflife",
    oracle=f"""
    WITH firstseen AS (
      SELECT user_id, MIN(epoch_us(ts) // {_DAY_US}) AS d0
      FROM events GROUP BY user_id
    ),
    weekly AS (
      SELECT CAST((epoch_us(e.ts) // {_DAY_US} - f.d0) // 7 AS BIGINT)
               AS week_offset,
             COUNT(DISTINCT e.user_id) AS n_users
      FROM events e JOIN firstseen f ON e.user_id = f.user_id
      GROUP BY 1
    ),
    pts AS (
      SELECT CAST(week_offset AS DECIMAL(18,6)) AS x,
             CAST(round(ln(CAST(n_users AS DOUBLE)), 6)
                  AS DECIMAL(18,6)) AS y
      FROM weekly WHERE n_users > 0
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(CAST(x * y AS DECIMAL(38,12))) AS sxy,
             SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx
      FROM pts
    )
    SELECT n AS n_weeks,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0), 6)
             AS decay_rate_r6,
           round(-0.693147 / nullif((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0), 0), 6)
             AS halflife_weeks_r6
    FROM m
    """,
    tags=("stats", "retention", "beyond"),
)
def q_agg_retention_halflife(spark, sf_dir: str) -> DataFrame:
    """Retention half-life: fit ln(active users) ~ week-offset on the
    cohort-collapsed weekly activity curve and convert the decay rate
    to a half-life (−ln2/slope) — the single number product teams
    quote from the retention triangle agg_retention_cohort reports in
    full. Exponential decay is THE null model for retention; a
    half-life materially longer than the null is the signal.

    Scale: the fit runs on the ≤|weeks| aggregate; ln values round-6
    into exact DECIMAL moments (the powerlaw/elasticity discipline)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", (F.unix_micros("ts") / _DAY_US).cast("long").alias("d")
    )
    firstseen = ev.groupBy("user_id").agg(F.min("d").alias("d0"))
    weekly = (
        ev.join(firstseen, "user_id")
        .groupBy(((F.col("d") - F.col("d0")) / 7).cast("long").alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
        .filter(F.col("n_users") > 0)
    )
    pts = weekly.select(
        F.col("week_offset").cast("decimal(18,6)").alias("x"),
        F.round(F.log(F.col("n_users").cast("double")), 6)
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
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    # nullif guards: a single week (zero x-variance) or a perfectly
    # flat curve (zero slope) yields NULL, not a crash — ANSI mode
    # makes unguarded zero division a runtime error.
    slope = (n * sxy - sx * sy) / F.nullif(n * sxx - sx * sx, F.lit(0.0))
    return m.select(
        F.col("n").cast("long").alias("n_weeks"),
        F.round(slope, 6).alias("decay_rate_r6"),
        F.round(-0.693147 / F.nullif(slope, F.lit(0.0)), 6).alias(
            "halflife_weeks_r6"
        ),
    )


#: Range-bucket count for the distributed ECDF prefix sum. The
#: bucket-level cumulative window runs over exactly this many rows
#: regardless of corpus size (cluster-config bound, not data bound).
KS_BUCKETS = 64


@query(
    "stat_ks_two_sample",
    oracle="""
    WITH vals AS (
      SELECT c_acctbal AS v,
             CAST(SUM(CASE WHEN c_custkey % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN c_custkey % 2 = 0 THEN 0 ELSE 1 END)
                  AS BIGINT) AS n2
      FROM customer GROUP BY 1
    ),
    cum AS (
      SELECT v,
             SUM(n1) OVER (ORDER BY v) AS f1,
             SUM(n2) OVER (ORDER BY v) AS f2
      FROM vals
    ),
    tot AS (SELECT SUM(n1) AS t1, SUM(n2) AS t2 FROM vals),
    d AS (
      SELECT v, ABS(f1 * tot.t2 - f2 * tot.t1) AS dn FROM cum, tot
    ),
    best AS (SELECT v, dn FROM d ORDER BY dn DESC, v LIMIT 1)
    SELECT CAST(tot.t1 AS BIGINT) AS n1,
           CAST(tot.t2 AS BIGINT) AS n2,
           CAST(best.dn AS BIGINT) AS d_num,
           round(CAST(best.dn AS DOUBLE) / (tot.t1 * tot.t2), 6)
             AS ks_d_r6,
           best.v AS at_value
    FROM tot, best
    """,
    tags=("stats", "drift", "beyond"),
)
def q_stat_ks_two_sample(spark, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov D statistic between the hash-split
    halves of customer account balances (the monitor_feature_drift
    snapshot pair, tested on the FULL distribution instead of binned
    counts). D is computed EXACTLY in integers — max |F1·N2 − F2·N1|
    over distinct values — so the statistic hash-matches across
    engines with no libm anywhere; the report is one row: both sample
    sizes, the integer numerator, D itself, and the value where the
    ECDFs diverge most (ties broken toward the smallest value).

    Scale shape — a distributed ECDF via the two-level prefix sum
    (window_concurrency_sweep's design): distinct values are range-
    bucketed by a PURE FUNCTION of the value (KS_BUCKETS literal
    boundaries, no sampling); within-bucket cumulative counts use a
    bucket-PARTITIONED window; the bucket-level offsets come from a
    global window over exactly KS_BUCKETS rows (bounded by config,
    not data — allowlisted in test_plan_hygiene) broadcast back onto
    the per-value rows. No corpus-sized single-partition sort exists
    anywhere in the plan; the oracle replays the same ECDF with one
    flat window, bit-for-bit equal because everything is integer."""
    vals = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_acctbal").alias("v"))
        .agg(
            F.sum(F.when(F.col("c_custkey") % 2 == 0, 1).otherwise(0))
            .cast("long")
            .alias("n1"),
            F.sum(F.when(F.col("c_custkey") % 2 == 0, 0).otherwise(1))
            .cast("long")
            .alias("n2"),
        )
        .withColumn(
            "bkt",
            F.least(
                F.greatest(
                    F.floor((F.col("v") + 1000.0) / 11000.0 * KS_BUCKETS).cast(
                        "long"
                    ),
                    F.lit(0),
                ),
                F.lit(KS_BUCKETS - 1),
            ),
        )
    )
    win_in = (
        Window.partitionBy("bkt")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cums = vals.select(
        "bkt",
        "v",
        F.sum("n1").over(win_in).alias("c1"),
        F.sum("n2").over(win_in).alias("c2"),
    )
    win_b = (
        Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = (
        vals.groupBy("bkt")
        .agg(F.sum("n1").alias("t1"), F.sum("n2").alias("t2"))
        .select(
            "bkt",
            F.coalesce(F.sum("t1").over(win_b), F.lit(0)).alias("o1"),
            F.coalesce(F.sum("t2").over(win_b), F.lit(0)).alias("o2"),
        )
    )
    tot = vals.agg(
        F.sum("n1").alias("t1"), F.sum("n2").alias("t2")
    )
    d = (
        cums.join(F.broadcast(offs), "bkt")
        .crossJoin(F.broadcast(tot))
        .select(
            "v",
            "t1",
            "t2",
            F.abs(
                (F.col("o1") + F.col("c1")) * F.col("t2")
                - (F.col("o2") + F.col("c2")) * F.col("t1")
            ).alias("dn"),
        )
    )
    return d.agg(
        F.max("t1").cast("long").alias("n1"),
        F.max("t2").cast("long").alias("n2"),
        F.max("dn").cast("long").alias("d_num"),
        F.round(
            F.max("dn").cast("double") / (F.max("t1") * F.max("t2")), 6
        ).alias("ks_d_r6"),
        F.max_by("v", F.struct(F.col("dn"), (-F.col("v")).alias("nv"))).alias(
            "at_value"
        ),
    )


#: Order statistics used by the Hill estimator (top HILL_K + 1 rows).
HILL_K = 50


@query(
    "agg_hill_tail_index",
    oracle=f"""
    WITH counts AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY user_id
    ),
    topk AS (
      SELECT x, row_number() OVER (ORDER BY x DESC, user_id) AS rk
      FROM (SELECT * FROM counts ORDER BY x DESC, user_id
            LIMIT {HILL_K + 1})
    ),
    m AS (SELECT MAX(rk) AS nsel FROM topk),
    thr AS (SELECT x AS xk1 FROM topk, m WHERE rk = m.nsel),
    lns AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             SUM(CAST(round(ln(CAST(x AS DOUBLE)), 6)
                      AS DECIMAL(18,6))) AS sumln
      FROM topk, m WHERE rk < m.nsel
    )
    SELECT lns.k,
           thr.xk1,
           round((CAST(sumln AS DOUBLE)
                  - lns.k * round(ln(CAST(thr.xk1 AS DOUBLE)), 6))
                 / lns.k, 6) AS hill_h_r6,
           round(lns.k / nullif(CAST(sumln AS DOUBLE)
                  - lns.k * round(ln(CAST(thr.xk1 AS DOUBLE)), 6), 0), 6)
             AS tail_alpha_r6
    FROM lns, thr
    """,
    tags=("stats", "tail", "beyond"),
)
def q_agg_hill_tail_index(spark, sf_dir: str) -> DataFrame:
    """Hill estimator of the tail exponent of per-user activity: on
    the top min(HILL_K+1, |users|) order statistics of events-per-user,
    H = mean(ln X(i) − ln X(k+1)) and the tail index α = 1/H — the
    standard answer to "how heavy is the whale tail", sharper than
    fitting the whole histogram (the degree power-law profiler) when
    only the extreme tail matters for capacity/skew planning.

    Scale: one groupBy(user) shuffle, then a TakeOrderedAndProject
    top-(k+1) cut — the rank window that separates the threshold
    order statistic runs on exactly HILL_K+1 rows by construction
    (allowlisted; ir_hybrid_rrf precedent). ln values round-6 into
    exact decimals before summation (the repo's libm policy)."""
    counts = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("x"))
    )
    topk = (
        counts.orderBy(F.desc("x"), "user_id")
        .limit(HILL_K + 1)
        .withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.desc("x"), "user_id")),
        )
    )
    m = topk.agg(F.max("rk").alias("nsel"))
    t = topk.crossJoin(F.broadcast(m))
    thr = t.filter(F.col("rk") == F.col("nsel")).select(
        F.col("x").alias("xk1")
    )
    lns = t.filter(F.col("rk") < F.col("nsel")).agg(
        F.count("*").cast("long").alias("k"),
        F.sum(
            F.round(F.log(F.col("x").cast("double")), 6).cast("decimal(18,6)")
        ).alias("sumln"),
    )
    a = F.col("sumln").cast("double") - F.col("k") * F.round(
        F.log(F.col("xk1").cast("double")), 6
    )
    return (
        lns.crossJoin(F.broadcast(thr))
        .select(
            "k",
            "xk1",
            F.round(a / F.col("k"), 6).alias("hill_h_r6"),
            F.round(F.col("k") / F.nullif(a, F.lit(0.0)), 6).alias(
                "tail_alpha_r6"
            ),
        )
    )


#: MI feature-ranking geometry: bin counts per candidate feature.
MI_PRICE_BINS = 16
MI_DISC_BINS = 11


@query(
    "agg_mutual_information",
    oracle=f"""
    WITH base AS (
      SELECT CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS y,
             CAST(least(greatest(floor(l_extendedprice / 120000.0
                  * {MI_PRICE_BINS}), 0), {MI_PRICE_BINS - 1}) AS BIGINT)
               AS price_bin,
             CAST(least(greatest(floor(l_discount / 0.11
                  * {MI_DISC_BINS}), 0), {MI_DISC_BINS - 1}) AS BIGINT)
               AS disc_bin
      FROM lineitem
    ),
    long_ AS (
      SELECT 'price' AS feature, price_bin AS bin, y FROM base
      UNION ALL
      SELECT 'discount' AS feature, disc_bin AS bin, y FROM base
    ),
    joint AS (
      SELECT feature, bin, y, CAST(COUNT(*) AS BIGINT) AS nxy
      FROM long_ GROUP BY 1, 2, 3
    ),
    mx AS (
      SELECT feature, bin, CAST(SUM(nxy) AS BIGINT) AS nx
      FROM joint GROUP BY 1, 2
    ),
    my AS (
      SELECT feature, y, CAST(SUM(nxy) AS BIGINT) AS ny
      FROM joint GROUP BY 1, 2
    ),
    tot AS (
      SELECT feature, CAST(SUM(nxy) AS BIGINT) AS n
      FROM joint GROUP BY 1
    ),
    terms AS (
      SELECT j.feature,
             CAST(round((CAST(j.nxy AS DOUBLE) / t.n)
                  * ln(CAST(j.nxy AS DOUBLE) * t.n
                       / (CAST(mx.nx AS DOUBLE) * my.ny)), 6)
                  AS DECIMAL(18,6)) AS term
      FROM joint j
      JOIN mx USING (feature, bin)
      JOIN my ON my.feature = j.feature AND my.y = j.y
      JOIN tot t ON t.feature = j.feature
    )
    SELECT feature,
           round(CAST(SUM(term) AS DOUBLE), 6) AS mi_nats_r6
    FROM terms GROUP BY feature ORDER BY feature
    """,
    tags=("stats", "ml", "beyond"),
)
def q_agg_mutual_information(spark, sf_dir: str) -> DataFrame:
    """Mutual information I(feature; label) per candidate feature —
    the model-free feature-ranking primitive (and the data-valuation
    screen for "does this column carry signal about the target"):
    label = quantity > 25, candidates = binned price and discount,
    MI = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))) over the contingency table.
    Discount should score ≈ 0 (independent of quantity) and price
    above it — the ranking a feature-selection pass would read off.

    Scale: ONE corpus aggregation builds the joint contingency table
    (a 2-row stack explode, then groupBy(feature, bin, y) — bounded
    output: Σ bins × 2 rows); marginals, totals and the p·ln p terms
    are joins and expressions over that bounded table. Log terms
    round-6 into exact decimals before the final sum (libm policy)."""
    li = load(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_quantity") > 25, 1).otherwise(0).alias("y"),
        F.least(
            F.greatest(
                F.floor(
                    F.col("l_extendedprice") / 120000.0 * MI_PRICE_BINS
                ).cast("long"),
                F.lit(0),
            ),
            F.lit(MI_PRICE_BINS - 1),
        ).alias("price_bin"),
        F.least(
            F.greatest(
                F.floor(F.col("l_discount") / 0.11 * MI_DISC_BINS).cast(
                    "long"
                ),
                F.lit(0),
            ),
            F.lit(MI_DISC_BINS - 1),
        ).alias("disc_bin"),
    )
    long_ = li.selectExpr(
        "stack(2, 'price', price_bin, 'discount', disc_bin)"
        " AS (feature, bin)",
        "y",
    )
    joint = long_.groupBy("feature", "bin", "y").agg(
        F.count("*").cast("long").alias("nxy")
    )
    mx = joint.groupBy("feature", "bin").agg(
        F.sum("nxy").cast("long").alias("nx")
    )
    my = joint.groupBy("feature", "y").agg(
        F.sum("nxy").cast("long").alias("ny")
    )
    tot = joint.groupBy("feature").agg(F.sum("nxy").cast("long").alias("n"))
    term = F.round(
        (F.col("nxy").cast("double") / F.col("n"))
        * F.log(
            F.col("nxy").cast("double")
            * F.col("n")
            / (F.col("nx").cast("double") * F.col("ny"))
        ),
        6,
    ).cast("decimal(18,6)")
    return (
        joint.join(F.broadcast(mx), ["feature", "bin"])
        .join(F.broadcast(my), ["feature", "y"])
        .join(F.broadcast(tot), "feature")
        .select("feature", term.alias("term"))
        .groupBy("feature")
        .agg(F.round(F.sum("term").cast("double"), 6).alias("mi_nats_r6"))
        .orderBy("feature")
    )


#: Wilson interval: success threshold and z for a 95% two-sided CI.
WILSON_THRESHOLD = 100.0
WILSON_Z = 1.96

#: The Wilson score interval, written ONCE as SQL so Spark (via
#: F.expr) and DuckDB evaluate the IDENTICAL expression tree: +,*,/
#: are IEEE-deterministic and sqrt is exactly rounded by IEEE-754
#: (unlike exp/ln, which are only faithfully rounded and ulp-drift
#: between libms), so the bounds are bit-equal cross-engine with no
#: rounding-contract gymnastics beyond the display round.
_WILSON_CENTER = (
    f"((s / n) + {WILSON_Z} * {WILSON_Z} / (2.0 * n))"
    f" / (1.0 + {WILSON_Z} * {WILSON_Z} / n)"
)
_WILSON_HALF = (
    f"({WILSON_Z} / (1.0 + {WILSON_Z} * {WILSON_Z} / n))"
    f" * sqrt((s / n) * (1.0 - s / n) / n"
    f" + {WILSON_Z} * {WILSON_Z} / (4.0 * n * n))"
)


@query(
    "agg_wilson_ci_winrate",
    oracle=f"""
    WITH g AS (
      SELECT event_type,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CASE WHEN value >= {WILSON_THRESHOLD}
                           THEN 1 ELSE 0 END) AS DOUBLE) AS s
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_trials,
           CAST(s AS BIGINT) AS n_success,
           round(s / n, 6) AS rate_r6,
           round({_WILSON_CENTER} - {_WILSON_HALF}, 6) AS wilson_lo_r6,
           round({_WILSON_CENTER} + {_WILSON_HALF}, 6) AS wilson_hi_r6
    FROM g ORDER BY event_type
    """,
)
def q_agg_wilson_ci_winrate(spark, sf_dir: str) -> DataFrame:
    """Wilson score interval per arm — THE interval for binomial
    rates (win rates, pass rates, judge preferences): unlike the
    normal approximation it never leaves [0, 1] and stays calibrated
    at small n or extreme rates. One map-side-combinable aggregation
    to (n, successes) per arm, then closed-form expression arithmetic
    on the bounded arm table (see _WILSON_CENTER: the formula is
    shared VERBATIM with the oracle via F.expr, and IEEE's
    exactly-rounded sqrt makes the bounds bit-equal cross-engine).

    Scale: the shuffle carries two numbers per arm; arms are bounded
    by the type vocabulary. The interval check lo ≤ p̂ ≤ hi is pinned
    by test."""
    g = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").cast("double").alias("n"),
            F.sum(
                F.when(F.col("value") >= WILSON_THRESHOLD, 1).otherwise(0)
            )
            .cast("double")
            .alias("s"),
        )
    )
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n_trials"),
        F.col("s").cast("long").alias("n_success"),
        F.round(F.expr("s / n"), 6).alias("rate_r6"),
        F.round(F.expr(f"{_WILSON_CENTER} - {_WILSON_HALF}"), 6).alias(
            "wilson_lo_r6"
        ),
        F.round(F.expr(f"{_WILSON_CENTER} + {_WILSON_HALF}"), 6).alias(
            "wilson_hi_r6"
        ),
    ).orderBy("event_type")


#: Benjamini-Hochberg target false-discovery rate.
FDR_Q = 0.1

#: Two-sided normal critical values -> discretized p upper bound.
#: Literal constants on both engines: no inverse-CDF / erf calls, so
#: no libm divergence — the established significance technique
#: (AB_CRIT) extended to a p-value ladder.
_P_LADDER = (
    (3.290527, 0.001),
    (2.575829, 0.01),
    (1.959964, 0.05),
    (1.644854, 0.1),
    (1.281552, 0.2),
    (0.674490, 0.5),
)

_P_DISC_SQL = (
    "CAST(CASE "
    + " ".join(f"WHEN abs(z) >= {t} THEN {p}" for t, p in _P_LADDER)
    + " ELSE 1.0 END AS DOUBLE)"
)


@query(
    "agg_bh_fdr",
    oracle=f"""
    WITH g AS (
      SELECT p_type, COUNT(*) AS n,
             SUM(CAST(p_retailprice AS DECIMAL(28,10))) AS sd,
             SUM(CAST(p_retailprice AS DECIMAL(28,10))
                 * CAST(p_retailprice AS DECIMAL(28,10))) AS ssd
      FROM part GROUP BY p_type
    ),
    tot AS (
      SELECT CAST(SUM(n) AS DOUBLE) AS nn,
             CAST(SUM(sd) AS DOUBLE) AS s0,
             CAST(SUM(ssd) AS DOUBLE) AS ss0,
             CAST(COUNT(*) AS BIGINT) AS m
      FROM g
    ),
    z AS (
      SELECT p_type, n, m,
             (CAST(sd AS DOUBLE) / n - s0 / nn)
             / sqrt(((ss0 - s0 * s0 / nn) / (nn - 1)) / n) AS z
      FROM g CROSS JOIN tot
    ),
    ranked AS (
      SELECT p_type, n, m, z, {_P_DISC_SQL} AS p_disc,
             ROW_NUMBER() OVER (ORDER BY {_P_DISC_SQL}, abs(z) DESC, p_type)
               AS i
      FROM z
    ),
    kk AS (
      SELECT COALESCE(MAX(CASE WHEN p_disc <= {FDR_Q} * i / m
                               THEN i END), 0) AS k
      FROM ranked
    )
    SELECT p_type, CAST(n AS BIGINT) AS n, round(z, 6) AS z_r6,
           p_disc, CAST(i AS BIGINT) AS bh_rank,
           round({FDR_Q} * i / m, 6) AS bh_thresh_r6,
           i <= k AS rejected
    FROM ranked CROSS JOIN kk
    ORDER BY bh_rank
    """,
    tags=("stats", "abtest", "beyond"),
)
def q_agg_bh_fdr(spark, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg step-up FDR control across one hypothesis
    per part type (~150 simultaneous "is this type priced off the
    global mean?" z-tests) — the multiple-testing correction an
    experimentation platform applies before reading a metrics
    dashboard with hundreds of cells: rank p-values ascending, find
    the largest i with p_(i) ≤ q·i/m, reject exactly the first i.

    Determinism: p-values are DISCRETIZED through a literal
    critical-value ladder (two-sided normal, the AB_CRIT technique
    extended to 6 rungs) — a conservative upper bound on the exact p,
    so the BH mechanics are exact while no erf/inverse-CDF ever runs;
    z itself comes from exact-DECIMAL moments (group sums kept in
    DECIMAL through the global roll-up, cast to double once) and every
    comparison is against literal constants or exact double ratios.

    Spark-first shape: one map-side-combinable moment pass per part
    type; the global moments are the decimal SUM of the per-group
    sums (order-free) plumbed back by a broadcast 1-row cross join;
    the step-up cutoff k is a second 1-row broadcast — the rank
    window is the only single-partition step and runs on the
    |p_type| hypothesis table, never the corpus.

    Scale: the corpus is scanned once; everything downstream operates
    on ~150 rows regardless of SF."""
    g = (
        load(spark, sf_dir, "part")
        .groupBy("p_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("p_retailprice").cast("decimal(28,10)")).alias("sd"),
            F.sum(
                F.col("p_retailprice").cast("decimal(28,10)")
                * F.col("p_retailprice").cast("decimal(28,10)")
            ).alias("ssd"),
        )
    )
    tot = g.agg(
        F.sum("n").cast("double").alias("nn"),
        F.sum("sd").cast("double").alias("s0"),
        F.sum("ssd").cast("double").alias("ss0"),
        F.count("*").cast("long").alias("m"),
    )
    z_expr = (F.col("sd").cast("double") / F.col("n") - F.col("s0") / F.col("nn")) / F.sqrt(
        ((F.col("ss0") - F.col("s0") * F.col("s0") / F.col("nn")) / (F.col("nn") - 1))
        / F.col("n")
    )
    z = g.crossJoin(F.broadcast(tot)).select(
        "p_type", "n", "m", z_expr.alias("z")
    )
    p_disc = F.lit(1.0)
    for t, p in reversed(_P_LADDER):
        p_disc = F.when(F.abs("z") >= t, F.lit(p)).otherwise(p_disc)
    ranked = z.select(
        "p_type", "n", "m", "z", p_disc.alias("p_disc")
    ).withColumn(
        "i",
        F.row_number().over(
            Window.orderBy("p_disc", F.abs("z").desc(), "p_type")
        ),
    )
    cond = F.col("p_disc") <= F.lit(FDR_Q) * F.col("i") / F.col("m")
    kk = ranked.agg(
        F.coalesce(F.max(F.when(cond, F.col("i"))), F.lit(0)).alias("k")
    )
    return (
        ranked.crossJoin(F.broadcast(kk))
        .select(
            "p_type",
            F.col("n").cast("long").alias("n"),
            F.round("z", 6).alias("z_r6"),
            "p_disc",
            F.col("i").cast("long").alias("bh_rank"),
            F.round(F.lit(FDR_Q) * F.col("i") / F.col("m"), 6).alias(
                "bh_thresh_r6"
            ),
            (F.col("i") <= F.col("k")).alias("rejected"),
        )
        .orderBy("bh_rank")
    )


@query(
    "agg_cramers_v",
    oracle="""
    WITH cells AS (
      SELECT o_orderpriority AS pr, o_orderstatus AS st,
             CAST(COUNT(*) AS BIGINT) AS obs
      FROM orders GROUP BY 1, 2
    ),
    rt AS (SELECT pr, CAST(SUM(obs) AS BIGINT) AS r FROM cells GROUP BY pr),
    ct AS (SELECT st, CAST(SUM(obs) AS BIGINT) AS c FROM cells GROUP BY st),
    tot AS (
      SELECT CAST(SUM(obs) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT pr) AS BIGINT) AS nr,
             CAST(COUNT(DISTINCT st) AS BIGINT) AS nc
      FROM cells
    ),
    terms AS (
      SELECT CAST(round(
               power(CAST(obs AS DOUBLE)
                     - CAST(r AS DOUBLE) * c / n, 2)
               / (CAST(r AS DOUBLE) * c / n), 6) AS DECIMAL(18,6)) AS term
      FROM cells JOIN rt USING (pr) JOIN ct USING (st) CROSS JOIN tot
    ),
    chi AS (SELECT CAST(SUM(term) AS DOUBLE) AS chi2 FROM terms)
    SELECT n, nr AS n_priorities, nc AS n_statuses,
           round(chi2, 6) AS chi2_r6,
           round(sqrt(chi2 / (n * least(nr - 1, nc - 1))), 6)
             AS cramers_v_r6
    FROM chi CROSS JOIN tot
    """,
    tags=("stats", "beyond"),
)
def q_agg_cramers_v(spark, sf_dir: str) -> DataFrame:
    """Cramér's V association between order priority and order status
    — the normalized-chi-square effect size ([0,1]) that answers "are
    these two categorical columns related at all" before anyone fits a
    model on them; the profiling primitive behind automatic
    feature-redundancy screens.

    Exactness: chi-square cell terms (obs − exp)²/exp are computed in
    double from EXACT integer counts (deterministic scalar
    expression), rounded to 6 decimals, then summed in DECIMAL — the
    round-6-then-DECIMAL order-free-sum contract the MI and power-law
    queries use — so the 15-term sum is identical regardless of
    reduction order; V itself is one sqrt of exact ratios.

    Spark-first shape: ONE corpus aggregation to the contingency
    cells; row totals, column totals, and the grand total are
    re-aggregations of the |priorities|×|statuses| cell table (≤15
    rows), joined back broadcast. The corpus is never touched twice.

    Scale: a billion-row orders table still reduces to 15 cells in
    the map-side combine; everything downstream is constant-size."""
    cells = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("pr"),
            F.col("o_orderstatus").alias("st"),
        )
        .agg(F.count("*").alias("obs"))
    )
    rt = cells.groupBy("pr").agg(F.sum("obs").alias("r"))
    ct = cells.groupBy("st").agg(F.sum("obs").alias("c"))
    tot = cells.agg(
        F.sum("obs").cast("long").alias("n"),
        F.countDistinct("pr").cast("long").alias("nr"),
        F.countDistinct("st").cast("long").alias("nc"),
    )
    exp = F.col("r").cast("double") * F.col("c") / F.col("n")
    terms = (
        cells.join(F.broadcast(rt), "pr")
        .join(F.broadcast(ct), "st")
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(
                F.pow(F.col("obs").cast("double") - exp, 2) / exp, 6
            )
            .cast("decimal(18,6)")
            .alias("term")
        )
    )
    chi = terms.agg(F.sum("term").cast("double").alias("chi2"))
    return chi.crossJoin(F.broadcast(tot)).select(
        "n",
        F.col("nr").alias("n_priorities"),
        F.col("nc").alias("n_statuses"),
        F.round("chi2", 6).alias("chi2_r6"),
        F.round(
            F.sqrt(
                F.col("chi2") / (F.col("n") * F.least(F.col("nr") - 1, F.col("nc") - 1))
            ),
            6,
        ).alias("cramers_v_r6"),
    )


@query(
    "agg_anova_oneway",
    oracle="""
    WITH g AS (
      SELECT o_orderpriority AS grp, COUNT(*) AS n,
             SUM(CAST(o_totalprice AS DECIMAL(28,10))) AS sd,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10)))
                  AS DECIMAL(19,4)) AS sd4,
             SUM(CAST(o_totalprice AS DECIMAL(28,10))
                 * CAST(o_totalprice AS DECIMAL(28,10))) AS ssd
      FROM orders GROUP BY o_orderpriority
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(sd) AS DOUBLE) AS s0,
             CAST(SUM(ssd) AS DOUBLE) AS ss0,
             CAST(SUM(CAST(CAST(sd4 * sd4 AS DOUBLE) / n
                           AS DECIMAL(28,2))) AS DOUBLE) AS sum_gsq
      FROM g
    )
    SELECT nn AS n, k AS n_groups,
           round(((sum_gsq - s0 * s0 / nn) / (k - 1))
                 / ((ss0 - sum_gsq) / (nn - k)), 6) AS f_stat_r6,
           round((sum_gsq - s0 * s0 / nn) / (ss0 - s0 * s0 / nn), 6)
             AS eta_sq_r6,
           ((sum_gsq - s0 * s0 / nn) / (k - 1))
             / ((ss0 - sum_gsq) / (nn - k)) > 3.32 AS significant_1pct
    FROM tot
    """,
    tags=("stats", "abtest", "beyond"),
)
def q_agg_anova_oneway(spark, sf_dir: str) -> DataFrame:
    """One-way ANOVA across order priorities on order value — the
    k-group generalization of the two-arm Welch test: does ANY
    priority class price differently? F = (SSB/(k−1)) / (SSW/(N−k)),
    judged against the literal 1% critical value for (4, ∞) df
    (the AB_CRIT technique — no F-distribution CDF, no libm); η² is
    the companion effect size (SSB/SST, an O(1) ratio).

    Exactness: everything reduces to per-group exact-DECIMAL moments
    (n, Σx, Σx²) in ONE map-side-combinable pass. The group terms
    (Σx_g)²/n_g are built WITHOUT large-value round(): the square is
    exact decimal (sd quantized to scale 4 first so p₁+p₂ ≤ 38), the
    division is one deterministic double op, and the k terms are
    summed order-free via a DECIMAL(28,2) cast — round() at scale 6
    on 1e13-magnitude doubles diverges between engines (the scaling
    multiply exceeds double precision), which is why only O(1)-scale
    quantities (F, η²) are emitted rounded.

    Scale: one corpus aggregation; k = |priorities| rows downstream."""
    g = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("grp"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(28,10)")).alias("sd"),
            F.sum(F.col("o_totalprice").cast("decimal(28,10)"))
            .cast("decimal(19,4)")
            .alias("sd4"),
            F.sum(
                F.col("o_totalprice").cast("decimal(28,10)")
                * F.col("o_totalprice").cast("decimal(28,10)")
            ).alias("ssd"),
        )
    )
    tot = g.agg(
        F.sum("n").cast("long").alias("nn"),
        F.count("*").cast("long").alias("k"),
        F.sum("sd").cast("double").alias("s0"),
        F.sum("ssd").cast("double").alias("ss0"),
        F.sum(
            (
                (F.col("sd4") * F.col("sd4")).cast("double") / F.col("n")
            ).cast("decimal(28,2)")
        )
        .cast("double")
        .alias("sum_gsq"),
    )
    ssb = F.col("sum_gsq") - F.col("s0") * F.col("s0") / F.col("nn")
    ssw = F.col("ss0") - F.col("sum_gsq")
    sst = F.col("ss0") - F.col("s0") * F.col("s0") / F.col("nn")
    f_stat = (ssb / (F.col("k") - 1)) / (ssw / (F.col("nn") - F.col("k")))
    return tot.select(
        F.col("nn").alias("n"),
        F.col("k").alias("n_groups"),
        F.round(f_stat, 6).alias("f_stat_r6"),
        F.round(ssb / sst, 6).alias("eta_sq_r6"),
        (f_stat > 3.32).alias("significant_1pct"),
    )


@query(
    "agg_delta_method_ratio_ci",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(value AS DECIMAL(18,4))
                           ELSE CAST(0 AS DECIMAL(18,4)) END)
                  AS DECIMAL(18,4)) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL GROUP BY user_id
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,4))) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(19,4))
                      * CAST(x AS DECIMAL(19,4))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y AS DECIMAL(19,0))
                      * CAST(y AS DECIMAL(19,0))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(x AS DECIMAL(19,4)) * y) AS DOUBLE) AS sxy
      FROM per_user
    )
    SELECT n,
           round(sx / sy, 6) AS ratio_r6,
           round(sqrt((((sxx / n - (sx / n) * (sx / n))
                  - 2 * (sx / sy) * (sxy / n - (sx / n) * (sy / n))
                  + (sx / sy) * (sx / sy)
                    * (syy / n - (sy / n) * (sy / n))))
                 / ((sy / n) * (sy / n) * n)), 6) AS se_r6,
           round(sx / sy - 1.959964
                 * sqrt((((sxx / n - (sx / n) * (sx / n))
                    - 2 * (sx / sy) * (sxy / n - (sx / n) * (sy / n))
                    + (sx / sy) * (sx / sy)
                      * (syy / n - (sy / n) * (sy / n))))
                   / ((sy / n) * (sy / n) * n)), 6) AS ci_lo_r6,
           round(sx / sy + 1.959964
                 * sqrt((((sxx / n - (sx / n) * (sx / n))
                    - 2 * (sx / sy) * (sxy / n - (sx / n) * (sy / n))
                    + (sx / sy) * (sx / sy)
                      * (syy / n - (sy / n) * (sy / n))))
                   / ((sy / n) * (sy / n) * n)), 6) AS ci_hi_r6
    FROM m
    """,
    tags=("stats", "abtest", "beyond"),
)
def q_agg_delta_method_ratio_ci(spark, sf_dir: str) -> DataFrame:
    """Delta-method confidence interval for a RATIO metric (revenue
    per event, the "ratio of sums over the same randomization unit"
    case from Deng et al.'s metric-analysis playbook): the naive
    per-row variance is wrong because numerator and denominator are
    correlated within a user, so the variance comes from the
    user-level joint moments — Var(X̄/Ȳ) ≈ (σx² − 2Rσxy + R²σy²)
    / (μy²·n) — and the CI uses the literal 1.959964 normal critical
    value (no inverse CDF).

    Exactness: ONE map-side-combinable pass to user-level (x, y) with
    x an exact DECIMAL revenue sum, then one pass to the six joint
    moments — every sum and cross-product accumulates in DECIMAL
    (operand widths chosen so DuckDB's p₁+p₂ ≤ 38 multiply bound
    holds); the CI algebra is a single deterministic double
    expression replayed verbatim in the oracle.

    Scale: two shuffles (user roll-up, then a 1-row moment combine);
    user cardinality bounds stage two. Population (not n−1)
    variances — the bias is O(1/n), far below the CI width."""
    per_user = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.col("value").cast("decimal(18,4)"),
                ).otherwise(F.lit(0).cast("decimal(18,4)"))
            )
            .cast("decimal(18,4)")
            .alias("x"),
            F.count("*").cast("long").alias("y"),
        )
    )
    m = per_user.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("x").cast("decimal(38,4)")).cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x").cast("decimal(19,4)") * F.col("x").cast("decimal(19,4)"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.col("y").cast("decimal(19,0)") * F.col("y").cast("decimal(19,0)"))
        .cast("double")
        .alias("syy"),
        F.sum(F.col("x").cast("decimal(19,4)") * F.col("y"))
        .cast("double")
        .alias("sxy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx"), F.col("sy")
    r = sx / sy
    vx = F.col("sxx") / n - (sx / n) * (sx / n)
    vy = F.col("syy") / n - (sy / n) * (sy / n)
    cxy = F.col("sxy") / n - (sx / n) * (sy / n)
    var_r = (vx - 2 * r * cxy + r * r * vy) / ((sy / n) * (sy / n) * n)
    se = F.sqrt(var_r)
    return m.select(
        "n",
        F.round(r, 6).alias("ratio_r6"),
        F.round(se, 6).alias("se_r6"),
        F.round(r - 1.959964 * se, 6).alias("ci_lo_r6"),
        F.round(r + 1.959964 * se, 6).alias("ci_hi_r6"),
    )


@query(
    "agg_spearman_corr",
    oracle=f"""
    WITH daily AS (
      SELECT epoch_us(ts) // {_DAY_US} AS day,
             CAST(COUNT(*) AS BIGINT) AS x,
             round(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 6)
               AS y
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    rx AS (
      SELECT day,
             CAST(2 * RANK() OVER (ORDER BY x)
                  + COUNT(*) OVER (PARTITION BY x) - 1 AS BIGINT) AS r2x,
             CAST(2 * RANK() OVER (ORDER BY y)
                  + COUNT(*) OVER (PARTITION BY y) - 1 AS BIGINT) AS r2y
      FROM daily
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(r2x) AS BIGINT) AS sx,
             CAST(SUM(r2y) AS BIGINT) AS sy,
             CAST(SUM(r2x * r2x) AS BIGINT) AS sxx,
             CAST(SUM(r2y * r2y) AS BIGINT) AS syy,
             CAST(SUM(r2x * r2y) AS BIGINT) AS sxy
      FROM rx
    )
    SELECT n AS n_days,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                      * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
                 6) AS spearman_r6
    FROM m
    """,
    tags=("stats", "nonparametric", "beyond"),
)
def q_agg_spearman_corr(spark, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between two daily series — daily
    event volume vs daily value mass — the monotone-association test
    analysts reach for when the relationship is nonlinear or
    heavy-tailed (Pearson on raw values is wrecked by one whale day).

    Tie handling is exact: average ranks, carried as the INTEGER
    2·rank_avg = 2·RANK() + ties − 1 (half-ranks end in .5), so every
    moment (Σr, Σr², Σrxry) is exact integer arithmetic; Pearson on
    2·ranks equals Pearson on ranks (scale/shift invariant), and the
    only float work is one fixed-shape closed form, rounded 6.

    Scale: the corpus collapses to the |days| table in one map-side
    combinable aggregation; both rank windows run on that bounded
    table only (allowlisted). A per-row corpus rank is exactly what
    this shape avoids at 100 TB."""
    daily = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy((F.unix_micros("ts") / _DAY_US).cast("long").alias("day"))
        .agg(
            F.count("*").cast("long").alias("x"),
            F.round(
                F.sum(F.col("value").cast("decimal(28,10)")).cast("double"), 6
            ).alias("y"),
        )
    )
    r2 = lambda c: (
        2 * F.rank().over(Window.orderBy(c))
        + F.count("*").over(Window.partitionBy(c))
        - 1
    ).cast("long")
    rx = daily.select(r2("x").alias("r2x"), r2("y").alias("r2y"))
    m = rx.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("r2x").cast("long").alias("sx"),
        F.sum("r2y").cast("long").alias("sy"),
        F.sum(F.col("r2x") * F.col("r2x")).cast("long").alias("sxx"),
        F.sum(F.col("r2y") * F.col("r2y")).cast("long").alias("syy"),
        F.sum(F.col("r2x") * F.col("r2y")).cast("long").alias("sxy"),
    )
    n, sx, sy = F.col("n").cast("double"), F.col("sx").cast("double"), F.col("sy").cast("double")
    return m.select(
        F.col("n").alias("n_days"),
        F.round(
            (n * F.col("sxy") - sx * F.col("sy"))
            / F.sqrt(
                (n * F.col("sxx") - sx * F.col("sx"))
                * (n * F.col("syy") - sy * F.col("sy"))
            ),
            6,
        ).alias("spearman_r6"),
    )


#: Weighted-quantile probe points (percent) and the value-bucketing
#: resolution of the distributed prefix sum (literal price-domain
#: boundaries, no sampling).
WQ_PCTS: tuple[int, ...] = (25, 50, 75, 90, 99)
WQ_BUCKETS = 64
WQ_DOMAIN_MAX = 110_000.0


@query(
    "agg_weighted_quantile",
    oracle=f"""
    WITH vals AS (
      SELECT l_extendedprice AS v,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY 1
    ),
    cum AS (SELECT v, SUM(w) OVER (ORDER BY v) AS cw FROM vals),
    tot AS (SELECT CAST(SUM(w) AS BIGINT) AS wt FROM vals),
    thr AS (
      SELECT CAST(t.k AS BIGINT) AS pct, wt,
             (t.k * wt + 99) // 100 AS thr
      FROM (VALUES {", ".join(f"({k})" for k in WQ_PCTS)}) t(k), tot
    )
    SELECT pct, wt AS w_total, CAST(thr AS BIGINT) AS thr,
           MIN(cum.v) AS wq
    FROM thr JOIN cum ON cum.cw >= thr.thr
    GROUP BY 1, 2, 3 ORDER BY pct
    """,
    tags=("stats", "quantile", "beyond"),
)
def q_agg_weighted_quantile(spark, sf_dir: str) -> DataFrame:
    """Exact weighted quantiles — the statistic an importance-weighted
    corpus mix actually needs (e.g. 'what quality-score cutoff keeps
    75% of the token MASS', not 75% of the documents). Quantile q is
    the smallest value whose cumulative weight reaches ceil(q·W) —
    the lower weighted quantile, an exact integer comparison with no
    interpolation, so both engines agree bit-for-bit.

    Scale shape: the two-level distributed prefix sum
    (stat_ks_two_sample's design) — distinct values get per-value
    weight sums in one aggregation, within-bucket cumulative weights
    use a bucket-PARTITIONED window, bucket offsets come from a
    global window over exactly WQ_BUCKETS rows (bounded by config,
    allowlisted), and the probe thresholds ride a 5-row broadcast
    range join. No corpus-sized single-partition sort anywhere."""
    vals = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_extendedprice").alias("v"))
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("w"))
        .withColumn(
            "bkt",
            F.least(
                F.greatest(
                    F.floor(F.col("v") / WQ_DOMAIN_MAX * WQ_BUCKETS).cast(
                        "long"
                    ),
                    F.lit(0),
                ),
                F.lit(WQ_BUCKETS - 1),
            ),
        )
    )
    win_in = (
        Window.partitionBy("bkt")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cums = vals.select(
        "bkt", "v", F.sum("w").over(win_in).alias("c")
    )
    win_b = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        vals.groupBy("bkt")
        .agg(F.sum("w").alias("t"))
        .select(
            "bkt", F.coalesce(F.sum("t").over(win_b), F.lit(0)).alias("o")
        )
    )
    cum = cums.join(F.broadcast(offs), "bkt").select(
        "v", (F.col("o") + F.col("c")).cast("long").alias("cw")
    )
    thr = (
        vals.agg(F.sum("w").cast("long").alias("wt"))
        .select(
            "wt",
            F.explode(F.array(*[F.lit(k) for k in WQ_PCTS])).alias("k"),
        )
        .select(
            F.col("k").cast("long").alias("pct"),
            "wt",
            # integer `div`, not `/`: the float path loses exactness
            # past 2^53, which a 100 TB weight total can reach
            F.expr("(CAST(k AS BIGINT) * wt + 99) div 100")
            .cast("long")
            .alias("thr"),
        )
    )
    return (
        cum.join(F.broadcast(thr), F.col("cw") >= F.col("thr"))
        .groupBy("pct", "wt", "thr")
        .agg(F.min("v").alias("wq"))
        .select(
            "pct",
            F.col("wt").alias("w_total"),
            "thr",
            "wq",
        )
        .orderBy("pct")
    )


@query(
    "ml_iv_wald",
    oracle="""
    WITH cu AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    ct AS (
      SELECT CAST(SUM(c) AS BIGINT) AS sc, CAST(COUNT(*) AS BIGINT) AS nu
      FROM cu
    ),
    u AS (
      SELECT user_id,
             CAST(CASE WHEN cu.c * ct.nu > ct.sc THEN 1 ELSE 0 END
                  AS BIGINT) AS z,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(round(CAST(SUM(CASE WHEN event_type = 'purchase'
                                      THEN CAST(value AS DECIMAL(28,10))
                                      ELSE 0 END) AS DOUBLE), 6)
                  AS DECIMAL(18,6)) AS y
      FROM events
      JOIN cu USING (user_id) CROSS JOIN ct
      WHERE value IS NOT NULL GROUP BY user_id, cu.c, ct.nu, ct.sc
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(z) AS BIGINT) AS n1,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * y) AS DOUBLE) AS sxy,
             CAST(SUM(CASE WHEN z = 1 THEN x ELSE 0 END) AS BIGINT) AS sx1,
             CAST(SUM(CASE WHEN z = 1 THEN y END) AS DOUBLE) AS sy1
      FROM u
    )
    SELECT n AS n_users, n1 AS n_encouraged,
           round(CAST(sx1 AS DOUBLE) / n1
                 - CAST(sx - sx1 AS DOUBLE) / (n - n1), 6) AS first_stage_r6,
           round((sy1 / n1 - (sy - sy1) / (n - n1))
                 / (CAST(sx1 AS DOUBLE) / n1
                    - CAST(sx - sx1 AS DOUBLE) / (n - n1)), 6) AS beta_iv_r6,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)
             AS beta_ols_r6
    FROM m
    """,
    tags=("stats", "causal", "beyond"),
)
def q_ml_iv_wald(spark, sf_dir: str) -> DataFrame:
    """Instrumental-variable (Wald) estimate of spend-per-purchase with
    ABOVE-AVERAGE click exposure as the encouragement instrument
    (z = c_u·N > Σc, an exact integer comparison — no float mean) — the estimator an
    experimentation platform reports when the treatment (purchase
    intensity) is self-selected but an upstream nudge (the click) is
    as-good-as-random: β_IV = (ȳ₁−ȳ₀)/(x̄₁−x̄₀), the reduced form over
    the first stage, next to the naive OLS slope whose selection bias
    the IV exists to remove. First-stage strength is emitted so the
    weak-instrument check is part of the report, not an afterthought.

    Exactness: per-user outcomes are DECIMAL-summed then rounded 6 and
    re-carried as DECIMAL(18,6), so every downstream moment (Σy, Σxy
    with integer x) is exact decimal arithmetic; the estimators are
    fixed-shape double closed forms with one round each.

    Scale: corpus → |users| table in one combinable aggregation →
    1-row moment table. No window, no join."""
    per_user = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("long")
            .alias("c"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("x"),
            F.round(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.col("value").cast("decimal(28,10)"),
                    ).otherwise(F.lit(0).cast("decimal(28,10)"))
                ).cast("double"),
                6,
            )
            .cast("decimal(18,6)")
            .alias("y"),
        )
    )
    ct = per_user.agg(
        F.sum("c").cast("long").alias("sc"),
        F.count("*").cast("long").alias("nu"),
    )
    u = per_user.crossJoin(F.broadcast(ct)).select(
        (F.col("c") * F.col("nu") > F.col("sc"))
        .cast("long")
        .alias("z"),
        "x",
        "y",
    )
    m = u.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("z").cast("long").alias("n1"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.when(F.col("z") == 1, F.col("x")).otherwise(0))
        .cast("long")
        .alias("sx1"),
        F.sum(F.when(F.col("z") == 1, F.col("y"))).cast("double").alias("sy1"),
    )
    n, n1 = F.col("n").cast("double"), F.col("n1").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy")
    first = F.col("sx1").cast("double") / F.col("n1") - (
        F.col("sx") - F.col("sx1")
    ).cast("double") / (F.col("n") - F.col("n1"))
    reduced = F.col("sy1") / F.col("n1") - (F.col("sy") - F.col("sy1")) / (
        F.col("n") - F.col("n1")
    )
    return m.select(
        F.col("n").alias("n_users"),
        F.col("n1").alias("n_encouraged"),
        F.round(first, 6).alias("first_stage_r6"),
        F.round(reduced / first, 6).alias("beta_iv_r6"),
        F.round(
            (n * F.col("sxy") - sx * sy) / (n * F.col("sxx") - sx * F.col("sx")),
            6,
        ).alias("beta_ols_r6"),
    )


#: Delete-one-bucket jackknife resolution (deterministic user buckets).
JK_BUCKETS = 32


@query(
    "agg_jackknife_ratio_var",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(value AS DECIMAL(18,4))
                           ELSE CAST(0 AS DECIMAL(18,4)) END)
                  AS DECIMAL(18,4)) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL GROUP BY user_id
    ),
    bkt AS (
      SELECT user_id % {JK_BUCKETS} AS b,
             CAST(SUM(CAST(x AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS sxb,
             CAST(SUM(y) AS BIGINT) AS syb,
             CAST(COUNT(*) AS BIGINT) AS nb
      FROM per_user GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(sxb) AS DECIMAL(38,4)) AS sx,
             CAST(SUM(syb) AS BIGINT) AS sy,
             CAST(SUM(nb) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS nb_tot
      FROM bkt
    ),
    loo AS (
      SELECT CAST(round(CAST(sx - sxb AS DOUBLE) / (sy - syb), 6)
                  AS DECIMAL(18,6)) AS r
      FROM bkt CROSS JOIN tot
    ),
    s AS (
      SELECT CAST(SUM(r) AS DOUBLE) AS sr,
             CAST(SUM(CAST(r AS DECIMAL(19,6))
                      * CAST(r AS DECIMAL(19,6))) AS DOUBLE) AS srr,
             CAST(COUNT(*) AS BIGINT) AS nb2
      FROM loo
    )
    SELECT n AS n_users, nb_tot AS n_buckets,
           round(CAST(sx AS DOUBLE) / sy, 6) AS ratio_r6,
           round(sqrt((CAST(nb_tot AS DOUBLE) - 1) / nb_tot
                      * (srr - sr * sr / nb_tot)), 6) AS jk_se_r6
    FROM tot CROSS JOIN s
    """,
    tags=("stats", "abtest", "beyond"),
)
def q_agg_jackknife_ratio_var(spark, sf_dir: str) -> DataFrame:
    """Delete-one-bucket jackknife standard error of the
    spend-per-event ratio — the resampling twin of
    agg_delta_method_ratio_ci, and the estimator large experimentation
    platforms actually run (bucketed jackknife needs only per-bucket
    sums, no per-user joint moments, and catches nonlinearity the
    delta expansion misses). Users land in JK_BUCKETS deterministic
    buckets (user_id mod — retry-proof, no sampling state); each
    leave-one-bucket-out ratio is a fixed-shape double rounded 6 and
    re-carried as DECIMAL so Σr and Σr² over the bucket table are
    exact; SE = sqrt((B−1)/B · (Σr² − (Σr)²/B)).

    Scale: corpus → |users| → JK_BUCKETS rows in two combinable
    aggregations; the LOO algebra is constant-size. No window."""
    per_user = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.col("value").cast("decimal(18,4)"),
                ).otherwise(F.lit(0).cast("decimal(18,4)"))
            )
            .cast("decimal(18,4)")
            .alias("x"),
            F.count("*").cast("long").alias("y"),
        )
    )
    bkt = per_user.groupBy((F.col("user_id") % JK_BUCKETS).alias("b")).agg(
        F.sum(F.col("x").cast("decimal(38,4)"))
        .cast("decimal(38,4)")
        .alias("sxb"),
        F.sum("y").cast("long").alias("syb"),
        F.count("*").cast("long").alias("nb"),
    )
    tot = bkt.agg(
        F.sum("sxb").cast("decimal(38,4)").alias("sx"),
        F.sum("syb").cast("long").alias("sy"),
        F.sum("nb").cast("long").alias("n"),
        F.count("*").cast("long").alias("nb_tot"),
    )
    loo = (
        bkt.crossJoin(F.broadcast(tot))
        .select(
            F.round(
                (F.col("sx") - F.col("sxb")).cast("double")
                / (F.col("sy") - F.col("syb")),
                6,
            )
            .cast("decimal(18,6)")
            .alias("r")
        )
    )
    s = loo.agg(
        F.sum("r").cast("double").alias("sr"),
        F.sum(F.col("r").cast("decimal(19,6)") * F.col("r").cast("decimal(19,6)"))
        .cast("double")
        .alias("srr"),
        F.count("*").cast("long").alias("nb2"),
    )
    nb = F.col("nb_tot").cast("double")
    return tot.crossJoin(F.broadcast(s)).select(
        F.col("n").alias("n_users"),
        F.col("nb_tot").alias("n_buckets"),
        F.round(F.col("sx").cast("double") / F.col("sy"), 6).alias("ratio_r6"),
        F.round(
            F.sqrt(
                (nb - 1) / nb * (F.col("srr") - F.col("sr") * F.col("sr") / nb)
            ),
            6,
        ).alias("jk_se_r6"),
    )


@query(
    "agg_xi_correlation",
    oracle=f"""
    WITH daily AS (
      SELECT epoch_us(ts) // {_DAY_US} AS day,
             CAST(COUNT(*) AS BIGINT) AS x,
             round(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 6)
               AS y
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    r AS (
      SELECT day, x,
             CAST(RANK() OVER (ORDER BY y)
                  + COUNT(*) OVER (PARTITION BY y) - 1 AS BIGINT) AS rmax
      FROM daily
    ),
    d AS (
      SELECT CAST(abs(rmax - LAG(rmax) OVER (ORDER BY x, day)) AS BIGINT)
               AS step
      FROM r
    ),
    m AS (
      SELECT CAST(SUM(step) AS BIGINT) AS sd,
             CAST(COUNT(*) + 1 AS BIGINT) AS n
      FROM d WHERE step IS NOT NULL
    )
    SELECT n AS n_days,
           round(1.0 - 3.0 * sd / (CAST(n AS DOUBLE) * n - 1), 6) AS xi_r6
    FROM m
    """,
    tags=("stats", "nonparametric", "beyond"),
)
def q_agg_xi_correlation(spark, sf_dir: str) -> DataFrame:
    """Chatterjee's ξ coefficient (JASA 2021) between daily event
    volume and daily value mass — the modern dependence measure that
    detects NON-monotone relationships (a U-shape scores ξ > 0 but
    Spearman ≈ 0): sort days by x, rank the y's, and measure how
    wildly consecutive y-ranks jump; ξ = 1 − 3·Σ|r_{{i+1}}−r_i| /
    (n²−1). Ties in y use the max-rank convention from Chatterjee's
    definition (r_i = #{{j: y_j ≤ y_i}} = RANK + ties − 1, an exact
    integer); ties in x are broken by day for a deterministic
    permutation on both engines.

    Everything is integer arithmetic — ranks, |Δrank| steps, their
    sum — with one fixed-shape closing division, so the value
    hash-matches with no float policy needed beyond the round-6 day
    metric it consumes.

    Scale: corpus → |days| table in one combinable aggregation; the
    rank and lag windows run on that bounded table only
    (allowlisted)."""
    daily = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy((F.unix_micros("ts") / _DAY_US).cast("long").alias("day"))
        .agg(
            F.count("*").cast("long").alias("x"),
            F.round(
                F.sum(F.col("value").cast("decimal(28,10)")).cast("double"), 6
            ).alias("y"),
        )
    )
    r = daily.select(
        "day",
        "x",
        (
            F.rank().over(Window.orderBy("y"))
            + F.count("*").over(Window.partitionBy("y"))
            - 1
        )
        .cast("long")
        .alias("rmax"),
    )
    d = r.select(
        F.abs(
            F.col("rmax") - F.lag("rmax").over(Window.orderBy("x", "day"))
        )
        .cast("long")
        .alias("step")
    ).filter(F.col("step").isNotNull())
    m = d.agg(
        F.sum("step").cast("long").alias("sd"),
        (F.count("*") + 1).cast("long").alias("n"),
    )
    n = F.col("n").cast("double")
    return m.select(
        F.col("n").alias("n_days"),
        F.round(1.0 - 3.0 * F.col("sd") / (n * n - 1), 6).alias("xi_r6"),
    )


@query(
    "agg_hodges_lehmann_shift",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
             round(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE)
                   / COUNT(*), 6) AS m
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('{AB_ARM_A}', '{AB_ARM_B}')
      GROUP BY 1, 2
    ),
    a AS (SELECT m FROM daily WHERE event_type = '{AB_ARM_A}'),
    b AS (SELECT m FROM daily WHERE event_type = '{AB_ARM_B}'),
    diffs AS (
      SELECT round(b.m - a.m, 6) AS d FROM a CROSS JOIN b
    )
    SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS n_a,
           CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(quantile_cont(d, 0.5), 6) AS hl_shift_r6
    FROM diffs
    """,
    tags=("stats", "abtest", "nonparametric", "beyond"),
)
def q_agg_hodges_lehmann_shift(spark, sf_dir: str) -> DataFrame:
    """Hodges–Lehmann shift estimate between the two arms' daily mean
    values — the EFFECT SIZE that pairs with agg_mann_whitney_u's
    significance verdict (the median of all between-arm differences:
    robust to the same outliers that make the raw mean difference
    untrustworthy, and the estimator whose confidence interval
    inverts the rank-sum test). Reported with the pair count so the
    reader sees the estimate's support.

    The all-pairs step runs on the two BOUNDED per-(arm, day) mean
    tables (|days|² pairs, the theil_sen contract — never corpus²);
    pair differences are round-6 of round-6 inputs, and
    `F.percentile` ↔ `quantile_cont` interpolate identically on
    identical doubles (agg_percentiles convention).

    Scale: one corpus-sized combinable aggregation, then
    constant-size pair algebra. The broadcast pair join is |days|
    rows a side."""
    daily = (
        load(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull()
            & F.col("event_type").isin(AB_ARM_A, AB_ARM_B)
        )
        .groupBy(
            "event_type",
            (F.unix_micros("ts") / _DAY_US).cast("long").alias("day"),
        )
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(28,10)")).cast("double")
                / F.count("*"),
                6,
            ).alias("m")
        )
    )
    a = daily.filter(F.col("event_type") == AB_ARM_A).select(
        F.col("m").alias("ma")
    )
    b = daily.filter(F.col("event_type") == AB_ARM_B).select(
        F.col("m").alias("mb")
    )
    diffs = a.crossJoin(F.broadcast(b)).select(
        F.round(F.col("mb") - F.col("ma"), 6).alias("d")
    )
    na = a.agg(F.count("*").cast("long").alias("n_a"))
    nb = b.agg(F.count("*").cast("long").alias("n_b"))
    return (
        diffs.agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.percentile("d", F.lit(0.5)), 6).alias("hl_shift_r6"),
        )
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select("n_a", "n_b", "n_pairs", "hl_shift_r6")
    )


@query(
    "window_seasonality_strength",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    trend AS (
      SELECT event_type, day, y,
             CASE WHEN COUNT(*) OVER w = 2 * {STL_HALF_W} + 1
                  THEN SUM(y) OVER w END AS t7
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN {STL_HALF_W} PRECEDING
                            AND {STL_HALF_W} FOLLOWING)
    ),
    season AS (
      SELECT event_type, day % 7 AS dow,
             7 * SUM(y) - SUM(t7) AS num,
             7 * COUNT(*) AS den
      FROM trend WHERE t7 IS NOT NULL
      GROUP BY event_type, day % 7
    ),
    comp AS (
      SELECT t.event_type,
             CAST(round((s.den * t.y - (s.den // 7) * t.t7 - s.num)
                        / CAST(s.den AS DOUBLE), 6) AS DECIMAL(18,6)) AS r,
             CAST(round((7 * t.y - t.t7) / 7.0, 6) AS DECIMAL(18,6)) AS sr,
             CAST(round((s.den * t.y - s.num) / CAST(s.den AS DOUBLE), 6)
                  AS DECIMAL(18,6)) AS tr
      FROM trend t JOIN season s
        ON s.event_type = t.event_type AND s.dow = t.day % 7
      WHERE t.t7 IS NOT NULL
    ),
    m AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(r) AS DOUBLE) AS s_r,
             CAST(SUM(CAST(r AS DECIMAL(19,6)) * CAST(r AS DECIMAL(19,6)))
                  AS DOUBLE) AS q_r,
             CAST(SUM(sr) AS DOUBLE) AS s_sr,
             CAST(SUM(CAST(sr AS DECIMAL(19,6)) * CAST(sr AS DECIMAL(19,6)))
                  AS DOUBLE) AS q_sr,
             CAST(SUM(tr) AS DOUBLE) AS s_tr,
             CAST(SUM(CAST(tr AS DECIMAL(19,6)) * CAST(tr AS DECIMAL(19,6)))
                  AS DOUBLE) AS q_tr
      FROM comp GROUP BY event_type
    )
    SELECT event_type, n AS n_days,
           round(greatest(0.0, 1.0 - ((q_r - s_r * s_r / n) / n)
                 / ((q_sr - s_sr * s_sr / n) / n)), 6)
             AS seasonal_strength_r6,
           round(greatest(0.0, 1.0 - ((q_r - s_r * s_r / n) / n)
                 / ((q_tr - s_tr * s_tr / n) / n)), 6)
             AS trend_strength_r6
    FROM m ORDER BY event_type
    """,
    tags=("timeseries", "decompose", "beyond"),
)
def q_window_seasonality_strength(spark, sf_dir: str) -> DataFrame:
    """Hyndman's seasonality/trend strength (the `feasts` FS/FT
    features) per event type: F_s = max(0, 1 − Var(R)/Var(S+R)) and
    F_t = max(0, 1 − Var(R)/Var(T+R)) over the same moving-average
    decomposition window_seasonal_decompose emits. This is the
    one-number-per-series summary a monitoring fleet stores instead
    of the full decomposition — 'is this metric seasonal enough that
    the anomaly detector must deseasonalize first'.

    Components are exact rationals rounded 6 and carried as DECIMAL,
    so every moment is order-free; the strengths are fixed-shape
    double closing forms (population variances) with a greatest(0,·)
    floor, rounded 6.

    Scale: corpus → per-(type, day) table; centered window and dow
    aggregation on that bounded table (the decompose contract), then
    |event_type| moment rows."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            (F.unix_micros("ts") / _DAY_US).cast("long").alias("day"),
        )
        .agg(F.count("*").cast("long").alias("y"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-STL_HALF_W, STL_HALF_W)
    )
    trend = daily.select(
        "event_type",
        "day",
        "y",
        F.when(
            F.count("*").over(w) == 2 * STL_HALF_W + 1, F.sum("y").over(w)
        ).alias("t7"),
    ).filter(F.col("t7").isNotNull())
    season = trend.groupBy(
        "event_type", (F.col("day") % 7).alias("dow")
    ).agg(
        (7 * F.sum("y") - F.sum("t7")).alias("num"),
        (7 * F.count("*")).alias("den"),
    )
    t_a = trend.alias("t")
    s_a = season.withColumnRenamed("event_type", "et_s").alias("s")
    joined = t_a.join(
        F.broadcast(s_a),
        (F.col("t.event_type") == F.col("s.et_s"))
        & (F.col("s.dow") == F.col("t.day") % 7),
    ).select(
        F.col("t.event_type").alias("et"),
        F.round(
            (
                F.col("den") * F.col("y")
                - (F.col("den") / 7).cast("long") * F.col("t7")
                - F.col("num")
            )
            / F.col("den").cast("double"),
            6,
        )
        .cast("decimal(18,6)")
        .alias("r"),
        F.round((7 * F.col("y") - F.col("t7")) / 7.0, 6)
        .cast("decimal(18,6)")
        .alias("sr"),
        F.round(
            (F.col("den") * F.col("y") - F.col("num"))
            / F.col("den").cast("double"),
            6,
        )
        .cast("decimal(18,6)")
        .alias("tr"),
    )
    def _mom(c):
        return [
            F.sum(c).cast("double").alias(f"s_{c}"),
            F.sum(
                F.col(c).cast("decimal(19,6)") * F.col(c).cast("decimal(19,6)")
            )
            .cast("double")
            .alias(f"q_{c}"),
        ]

    m = joined.groupBy(F.col("et").alias("event_type")).agg(
        F.count("*").cast("long").alias("n"),
        *_mom("r"),
        *_mom("sr"),
        *_mom("tr"),
    )
    n = F.col("n").cast("double")
    var = lambda s, q: (F.col(q) - F.col(s) * F.col(s) / n) / n
    return m.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.round(
            F.greatest(F.lit(0.0), 1.0 - var("s_r", "q_r") / var("s_sr", "q_sr")),
            6,
        ).alias("seasonal_strength_r6"),
        F.round(
            F.greatest(F.lit(0.0), 1.0 - var("s_r", "q_r") / var("s_tr", "q_tr")),
            6,
        ).alias("trend_strength_r6"),
    ).orderBy("event_type")


@query(
    "agg_eb_shrunk_rates",
    oracle="""
    WITH g AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x
      FROM events GROUP BY user_id
    ),
    r AS (
      SELECT user_id, n, x,
             CAST(round(CAST(x AS DOUBLE) / n, 6) AS DECIMAL(18,6)) AS p
      FROM g
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(n) AS BIGINT) AS sn,
             CAST(SUM(p) AS DOUBLE) AS sp,
             CAST(SUM(CAST(p AS DECIMAL(19,6)) * CAST(p AS DECIMAL(19,6)))
                  AS DOUBLE) AS qp,
             CAST(SUM(CAST(1000000 AS BIGINT) / n) AS BIGINT) AS shm
      FROM r
    ),
    prior AS (
      SELECT k, sx, sn,
             CAST(sx AS DOUBLE) / sn AS mu,
             greatest(1.0,
               (CAST(sx AS DOUBLE) / sn) * (1 - CAST(sx AS DOUBLE) / sn)
               / greatest(1e-12,
                   (qp - sp * sp / k) / k
                   - (CAST(sx AS DOUBLE) / sn)
                     * (1 - CAST(sx AS DOUBLE) / sn)
                     * (CAST(shm AS DOUBLE) / 1000000.0 / k))
               - 1.0) AS m
      FROM mom
    )
    SELECT r.user_id, r.n, r.x,
           round(CAST(r.p AS DOUBLE), 6) AS raw_rate_r6,
           round((r.x + prior.m * prior.mu) / (r.n + prior.m), 6)
             AS shrunk_rate_r6
    FROM r CROSS JOIN prior
    ORDER BY r.user_id LIMIT 40
    """,
    tags=("stats", "bayes", "beyond"),
)
def q_agg_eb_shrunk_rates(spark, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-user purchase rates toward the
    pooled rate (beta-binomial, method-of-moments prior) — the
    estimator every leaderboard/segment report needs so a 1-for-2
    user doesn't outrank a 400-for-1000 one: shrunk = (x + m·μ) /
    (n + m), with the pseudo-count m = μ(1−μ)/τ² − 1 estimated from
    the between-user variance τ² (observed rate variance minus the
    binomial sampling share, floored at 1e-12; m floored at 1).

    Exactness: raw rates are round-6 decimals, their moments are
    exact decimal sums; the harmonic term Σ1/n is carried as the
    exact integer Σ(10⁶ div n) microparts on both engines (integer
    division — no float sum of reciprocals); the prior and the
    shrunk rates are fixed-shape double closed forms.

    Scale: corpus → |users| table in one combinable aggregation →
    1-row prior broadcast back; report capped at 40 rows."""
    g = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("x"),
        )
    )
    r = g.select(
        "user_id",
        "n",
        "x",
        F.round(F.col("x").cast("double") / F.col("n"), 6)
        .cast("decimal(18,6)")
        .alias("p"),
    )
    mom = r.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("n").cast("long").alias("sn"),
        F.sum("p").cast("double").alias("sp"),
        F.sum(F.col("p").cast("decimal(19,6)") * F.col("p").cast("decimal(19,6)"))
        .cast("double")
        .alias("qp"),
        F.sum(F.expr("CAST(1000000 AS BIGINT) div n")).cast("long").alias("shm"),
    )
    k = F.col("k").cast("double")
    mu = F.col("sx").cast("double") / F.col("sn")
    tau2 = F.greatest(
        F.lit(1e-12),
        (F.col("qp") - F.col("sp") * F.col("sp") / k) / k
        - mu * (1 - mu) * (F.col("shm").cast("double") / 1000000.0 / k),
    )
    prior = mom.select(
        mu.alias("mu"),
        F.greatest(F.lit(1.0), mu * (1 - mu) / tau2 - 1.0).alias("m"),
    )
    return (
        r.crossJoin(F.broadcast(prior))
        .select(
            "user_id",
            "n",
            "x",
            F.round(F.col("p").cast("double"), 6).alias("raw_rate_r6"),
            F.round(
                (F.col("x") + F.col("m") * F.col("mu"))
                / (F.col("n") + F.col("m")),
                6,
            ).alias("shrunk_rate_r6"),
        )
        .orderBy("user_id")
        .limit(40)
    )


#: QTE probe quantiles (percent).
QTE_PCTS: tuple[int, ...] = (25, 50, 75)


@query(
    "agg_quantile_treatment_effect",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
             round(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE)
                   / COUNT(*), 6) AS m
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('{AB_ARM_A}', '{AB_ARM_B}')
      GROUP BY 1, 2
    ),
    q AS (
      SELECT round(quantile_cont(m, 0.25) FILTER (WHERE event_type = '{AB_ARM_A}'), 6) AS qa_25,
             round(quantile_cont(m, 0.25) FILTER (WHERE event_type = '{AB_ARM_B}'), 6) AS qb_25,
             round(quantile_cont(m, 0.5) FILTER (WHERE event_type = '{AB_ARM_A}'), 6) AS qa_50,
             round(quantile_cont(m, 0.5) FILTER (WHERE event_type = '{AB_ARM_B}'), 6) AS qb_50,
             round(quantile_cont(m, 0.75) FILTER (WHERE event_type = '{AB_ARM_A}'), 6) AS qa_75,
             round(quantile_cont(m, 0.75) FILTER (WHERE event_type = '{AB_ARM_B}'), 6) AS qb_75
      FROM daily
    )
    SELECT * FROM (
      SELECT CAST(25 AS BIGINT) AS pct, qa_25 AS q_a_r6, qb_25 AS q_b_r6,
             round(qb_25 - qa_25, 6) AS qte_r6 FROM q
      UNION ALL SELECT CAST(50 AS BIGINT) AS pct, qa_50 AS q_a_r6, qb_50 AS q_b_r6,
             round(qb_50 - qa_50, 6) AS qte_r6 FROM q
      UNION ALL SELECT CAST(75 AS BIGINT) AS pct, qa_75 AS q_a_r6, qb_75 AS q_b_r6,
             round(qb_75 - qa_75, 6) AS qte_r6 FROM q
    ) ORDER BY pct
    """,
    tags=("stats", "abtest", "nonparametric", "beyond"),
)
def q_agg_quantile_treatment_effect(spark, sf_dir: str) -> DataFrame:
    """Quantile treatment effects between the two arms' daily mean
    values — the DISTRIBUTIONAL readout that completes the A/B family
    (welch/MWU say WHETHER the arms differ, Hodges–Lehmann gives one
    shift number; QTE says WHERE in the distribution the effect
    lives: a lift concentrated in the upper quartile with a flat
    median is a whale effect, not a typical-user one).

    Quantiles interpolate identically on identical round-6 doubles
    (`F.percentile` ↔ `quantile_cont`, the agg_percentiles
    convention); the probe grid is a literal, and each QTE is one
    fixed-shape subtraction rounded 6.

    Scale: corpus → bounded per-(arm, day) table; the quantile
    aggregation runs on those ≤ 2·|days| rows fanned across the
    3-point literal grid."""
    daily = (
        load(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull()
            & F.col("event_type").isin(AB_ARM_A, AB_ARM_B)
        )
        .groupBy(
            "event_type",
            (F.unix_micros("ts") / _DAY_US).cast("long").alias("day"),
        )
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(28,10)")).cast("double")
                / F.count("*"),
                6,
            ).alias("m")
        )
    )
    # Spark's percentile fraction must be FOLDABLE — the probe grid
    # is therefore unrolled as literal columns in ONE aggregation and
    # stacked back to rows (3 fixed quantiles, not a data fan-out).
    agg_cols = []
    for k in QTE_PCTS:
        agg_cols.append(
            F.round(
                F.percentile(
                    F.when(F.col("event_type") == AB_ARM_A, F.col("m")),
                    F.lit(k / 100.0),
                ),
                6,
            ).alias(f"qa_{k}")
        )
        agg_cols.append(
            F.round(
                F.percentile(
                    F.when(F.col("event_type") == AB_ARM_B, F.col("m")),
                    F.lit(k / 100.0),
                ),
                6,
            ).alias(f"qb_{k}")
        )
    wide = daily.agg(*agg_cols)
    stack_expr = ", ".join(
        f"CAST({k} AS BIGINT), qa_{k}, qb_{k}" for k in QTE_PCTS
    )
    q = wide.select(
        F.expr(
            f"stack({len(QTE_PCTS)}, {stack_expr}) AS (pct, q_a_r6, q_b_r6)"
        )
    )
    return q.select(
        "pct",
        "q_a_r6",
        "q_b_r6",
        F.round(F.col("q_b_r6") - F.col("q_a_r6"), 6).alias("qte_r6"),
    ).orderBy("pct")


@query(
    "agg_capture_recapture",
    oracle="""
    WITH half AS (
      SELECT user_id,
             CAST(MAX(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS in_a,
             CAST(MAX(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS in_b
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT CAST(SUM(in_a) AS BIGINT) AS n1,
             CAST(SUM(in_b) AS BIGINT) AS n2,
             CAST(SUM(in_a * in_b) AS BIGINT) AS m12,
             CAST(COUNT(*) AS BIGINT) AS seen
      FROM half
    )
    SELECT n1, n2, m12 AS overlap, seen AS distinct_seen,
           round((CAST(n1 + 1 AS DOUBLE) * (n2 + 1)) / (m12 + 1) - 1, 6)
             AS chapman_estimate_r6,
           round(((CAST(n1 + 1 AS DOUBLE) * (n2 + 1)) / (m12 + 1) - 1)
                 / seen, 6) AS coverage_ratio_r6
    FROM m
    """,
    tags=("stats", "species", "beyond"),
)
def q_agg_capture_recapture(spark, sf_dir: str) -> DataFrame:
    """Capture–recapture (Chapman) estimate of the TOTAL distinct-user
    population from two overlapping observation channels — the
    estimator for 'how many entities exist that we have not seen',
    which a crawl/dedup pipeline uses to decide whether another crawl
    round is worth it. Channels are the even/odd event-id halves;
    N̂ = (n1+1)(n2+1)/(m+1) − 1 (Chapman's bias-corrected form, which
    also never divides by zero). coverage_ratio = N̂ / distinct_seen
    ≈ 1 means the two channels already saw everyone.

    All counts are exact integers from ONE per-user aggregation; the
    estimate is a fixed-shape double closed form.

    Scale: one combinable groupBy(user) — the membership flags are
    MAX of indicator, no distinct needed — then a 1-row reduce."""
    half = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_id") % 2 == 0, 1).otherwise(0))
            .cast("long")
            .alias("in_a"),
            F.max(F.when(F.col("event_id") % 2 == 1, 1).otherwise(0))
            .cast("long")
            .alias("in_b"),
        )
    )
    m = half.agg(
        F.sum("in_a").cast("long").alias("n1"),
        F.sum("in_b").cast("long").alias("n2"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("m12"),
        F.count("*").cast("long").alias("seen"),
    )
    est = (F.col("n1") + 1).cast("double") * (F.col("n2") + 1) / (
        F.col("m12") + 1
    ) - 1
    return m.select(
        "n1",
        "n2",
        F.col("m12").alias("overlap"),
        F.col("seen").alias("distinct_seen"),
        F.round(est, 6).alias("chapman_estimate_r6"),
        F.round(est / F.col("seen"), 6).alias("coverage_ratio_r6"),
    )


#: Simpson detector: the binary "treatment" split on order priority.
_SIMPSON_URGENT = ("1-URGENT", "2-HIGH")


@query(
    "agg_simpson_paradox_detector",
    oracle=f"""
    WITH lab AS (
      SELECT o_orderstatus AS seg,
             CASE WHEN o_orderpriority IN
               {str(tuple(_SIMPSON_URGENT))} THEN 1 ELSE 0 END AS t,
             CAST(o_totalprice AS DECIMAL(18,2)) AS y
      FROM orders
    ),
    seg AS (
      SELECT seg,
             CAST(SUM(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN t = 1 THEN CAST(y AS DECIMAL(38,2))
                           ELSE 0 END) AS DOUBLE) AS s1,
             CAST(SUM(CASE WHEN t = 0 THEN CAST(y AS DECIMAL(38,2))
                           ELSE 0 END) AS DOUBLE) AS s0
      FROM lab GROUP BY seg
    ),
    segd AS (
      SELECT seg, n1, n0,
             round(s1 / n1 - s0 / n0, 6) AS seg_diff
      FROM seg WHERE n1 > 0 AND n0 > 0
    ),
    pooled AS (
      SELECT round(CAST(SUM(s1) AS DOUBLE) / SUM(n1)
                   - CAST(SUM(s0) AS DOUBLE) / SUM(n0), 6) AS pooled_diff
      FROM seg
    )
    SELECT (SELECT pooled_diff FROM pooled) AS pooled_diff_r6,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(CASE WHEN sign(seg_diff)
                         <> sign((SELECT pooled_diff FROM pooled))
                         AND seg_diff <> 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sign_flips,
           CASE WHEN SUM(CASE WHEN sign(seg_diff)
                         <> sign((SELECT pooled_diff FROM pooled))
                         AND seg_diff <> 0 THEN 1 ELSE 0 END) > 0
                THEN 1 ELSE 0 END AS simpson_flag
    FROM segd
    """,
    tags=("stats", "guardrail", "beyond"),
)
def q_agg_simpson_paradox_detector(spark, sf_dir: str) -> DataFrame:
    """Simpson's-paradox guardrail: does the pooled effect of urgent
    priority on order value keep its SIGN inside every order-status
    stratum? The check every self-serve analytics layer should run
    before letting a pooled 'X lifts Y' readout ship — a flip means
    the pooled number is a mix-composition artifact, not an effect
    (the UC-Berkeley admissions shape). Emits the pooled difference,
    the stratum count, how many strata reverse the sign, and the
    boolean flag.

    Exactness: all means are exact DECIMAL sums over exact integer
    counts; differences are round-6 fixed-shape doubles; the sign
    comparison happens on those round-6 values identically on both
    engines (exact zero differences are excluded from flips).

    Scale: ONE combinable aggregation to |status| rows; everything
    downstream is constant-size."""
    lab = load(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("seg"),
        F.when(F.col("o_orderpriority").isin(*_SIMPSON_URGENT), 1)
        .otherwise(0)
        .alias("t"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
    )
    seg = lab.groupBy("seg").agg(
        F.sum(F.when(F.col("t") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("t") == 0, 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(
            F.when(F.col("t") == 1, F.col("y").cast("decimal(38,2)")).otherwise(
                F.lit(0).cast("decimal(38,2)")
            )
        )
        .cast("double")
        .alias("s1"),
        F.sum(
            F.when(F.col("t") == 0, F.col("y").cast("decimal(38,2)")).otherwise(
                F.lit(0).cast("decimal(38,2)")
            )
        )
        .cast("double")
        .alias("s0"),
    )
    pooled = seg.agg(
        F.round(
            F.sum("s1") / F.sum("n1") - F.sum("s0") / F.sum("n0"), 6
        ).alias("pooled_diff")
    )
    segd = (
        seg.filter((F.col("n1") > 0) & (F.col("n0") > 0))
        .select(
            F.round(
                F.col("s1") / F.col("n1") - F.col("s0") / F.col("n0"), 6
            ).alias("seg_diff")
        )
        .crossJoin(F.broadcast(pooled))
    )
    flip = (
        (F.signum("seg_diff") != F.signum("pooled_diff"))
        & (F.col("seg_diff") != 0)
    )
    return segd.agg(
        F.max("pooled_diff").alias("pooled_diff_r6"),
        F.count("*").cast("long").alias("n_segments"),
        F.sum(F.when(flip, 1).otherwise(0)).cast("long").alias("n_sign_flips"),
        F.max(F.when(flip, 1).otherwise(0)).alias("simpson_flag"),
    )


@query(
    "agg_kendall_tau_daily",
    oracle=f"""
    WITH daily AS (
      SELECT epoch_us(ts) // {_DAY_US} AS day,
             CAST(COUNT(*) AS BIGINT) AS x,
             round(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 6)
               AS y
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    pairs AS (
      SELECT CASE WHEN (a.x < b.x AND a.y < b.y)
                    OR (a.x > b.x AND a.y > b.y) THEN 1 ELSE 0 END AS con,
             CASE WHEN (a.x < b.x AND a.y > b.y)
                    OR (a.x > b.x AND a.y < b.y) THEN 1 ELSE 0 END AS dis,
             CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
             CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
      FROM daily a JOIN daily b ON a.day < b.day
    ),
    m AS (
      SELECT CAST(SUM(con) AS BIGINT) AS nc,
             CAST(SUM(dis) AS BIGINT) AS nd,
             CAST(SUM(tx) AS BIGINT) AS ntx,
             CAST(SUM(ty) AS BIGINT) AS nty,
             CAST(COUNT(*) AS BIGINT) AS np
      FROM pairs
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
           nc AS concordant, nd AS discordant,
           round((CAST(nc AS DOUBLE) - nd)
                 / sqrt((CAST(np AS DOUBLE) - ntx)
                        * (CAST(np AS DOUBLE) - nty)), 6) AS tau_b_r6
    FROM m
    """,
    tags=("stats", "nonparametric", "beyond"),
)
def q_agg_kendall_tau_daily(spark, sf_dir: str) -> DataFrame:
    """Kendall's τ-b between daily event volume and daily value mass —
    the third member of the rank-dependence panel (Spearman measures
    monotone rank agreement, ξ catches non-monotone dependence, τ
    counts concordant vs discordant PAIRS, the most interpretable and
    the one with the cleanest confidence theory). τ-b's denominator
    corrects for ties on either axis: (C−D)/√((N−Tx)(N−Ty)).

    The pairwise step is all exact integer flags over the BOUNDED
    per-day table (|days|² pairs — the theil_sen contract, never
    corpus²); one fixed-shape double closing form.

    Scale: one corpus-sized combinable aggregation, then bounded pair
    algebra (broadcast join)."""
    daily = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy((F.unix_micros("ts") / _DAY_US).cast("long").alias("day"))
        .agg(
            F.count("*").cast("long").alias("x"),
            F.round(
                F.sum(F.col("value").cast("decimal(28,10)")).cast("double"), 6
            ).alias("y"),
        )
    )
    a = daily.select(
        F.col("day").alias("da"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = daily.select(
        F.col("day").alias("db"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    pairs = a.join(F.broadcast(b), F.col("da") < F.col("db")).select(
        F.when(
            ((F.col("xa") < F.col("xb")) & (F.col("ya") < F.col("yb")))
            | ((F.col("xa") > F.col("xb")) & (F.col("ya") > F.col("yb"))),
            1,
        )
        .otherwise(0)
        .alias("con"),
        F.when(
            ((F.col("xa") < F.col("xb")) & (F.col("ya") > F.col("yb")))
            | ((F.col("xa") > F.col("xb")) & (F.col("ya") < F.col("yb"))),
            1,
        )
        .otherwise(0)
        .alias("dis"),
        F.when(F.col("xa") == F.col("xb"), 1).otherwise(0).alias("tx"),
        F.when(F.col("ya") == F.col("yb"), 1).otherwise(0).alias("ty"),
    )
    m = pairs.agg(
        F.sum("con").cast("long").alias("nc"),
        F.sum("dis").cast("long").alias("nd"),
        F.sum("tx").cast("long").alias("ntx"),
        F.sum("ty").cast("long").alias("nty"),
        F.count("*").cast("long").alias("np"),
    )
    nd_days = daily.agg(F.count("*").cast("long").alias("n_days"))
    return m.crossJoin(F.broadcast(nd_days)).select(
        "n_days",
        F.col("nc").alias("concordant"),
        F.col("nd").alias("discordant"),
        F.round(
            (F.col("nc").cast("double") - F.col("nd"))
            / F.sqrt(
                (F.col("np").cast("double") - F.col("ntx"))
                * (F.col("np").cast("double") - F.col("nty"))
            ),
            6,
        ).alias("tau_b_r6"),
    )


#: Two-sided 5% critical value for the paired t (normal approx, the
#: MWU/Welch literal-critical-value convention).
PAIRED_T_CRIT = 1.959964


@query(
    "agg_paired_ttest",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
             round(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE)
                   / COUNT(*), 6) AS m
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('{AB_ARM_A}', '{AB_ARM_B}')
      GROUP BY 1, 2
    ),
    paired AS (
      SELECT a.day,
             CAST(round(b.m - a.m, 6) AS DECIMAL(18,6)) AS d
      FROM daily a JOIN daily b ON a.day = b.day
      WHERE a.event_type = '{AB_ARM_A}' AND b.event_type = '{AB_ARM_B}'
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(d) AS DOUBLE) AS sd,
             CAST(SUM(CAST(d AS DECIMAL(19,6)) * CAST(d AS DECIMAL(19,6)))
                  AS DOUBLE) AS qd
      FROM paired
    )
    SELECT n AS n_pairs,
           round(sd / n, 6) AS mean_diff_r6,
           round((sd / n) / sqrt((qd - sd * sd / n) / (n - 1.0) / n), 6)
             AS t_r6,
           CASE WHEN abs((sd / n)
                / sqrt((qd - sd * sd / n) / (n - 1.0) / n))
                > {PAIRED_T_CRIT} THEN 1 ELSE 0 END AS significant_5pct
    FROM m
    """,
    tags=("stats", "abtest", "beyond"),
)
def q_agg_paired_ttest(spark, sf_dir: str) -> DataFrame:
    """Paired t test between the two arms' daily means, paired BY DAY
    — the blocked design that removes day-level variance (weekday
    cycles, launch spikes) the unpaired agg_welch_ttest must absorb
    into its error term: with both arms observed on the same days,
    only the per-day DIFFERENCE's variance matters, typically a much
    tighter test on the same data. Completes the A/B panel:
    welch (unpaired mean), MWU (rank), paired-t (blocked mean),
    Hodges–Lehmann (shift), QTE (distributional).

    Per-day differences are round-6 decimals; their moments (Σd,
    Σd²) are exact DECIMAL sums; t and the verdict are one
    fixed-shape double closed form against a literal critical value.

    Scale: corpus → bounded per-(arm, day) table → day-key self-join
    (|days| rows) → 1-row moments."""
    daily = (
        load(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull()
            & F.col("event_type").isin(AB_ARM_A, AB_ARM_B)
        )
        .groupBy(
            "event_type",
            (F.unix_micros("ts") / _DAY_US).cast("long").alias("day"),
        )
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(28,10)")).cast("double")
                / F.count("*"),
                6,
            ).alias("m")
        )
    )
    a = daily.filter(F.col("event_type") == AB_ARM_A).select(
        "day", F.col("m").alias("ma")
    )
    b = daily.filter(F.col("event_type") == AB_ARM_B).select(
        "day", F.col("m").alias("mb")
    )
    paired = a.join(b, "day").select(
        F.round(F.col("mb") - F.col("ma"), 6).cast("decimal(18,6)").alias("d")
    )
    m = paired.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("d").cast("double").alias("sd"),
        F.sum(F.col("d").cast("decimal(19,6)") * F.col("d").cast("decimal(19,6)"))
        .cast("double")
        .alias("qd"),
    )
    n = F.col("n").cast("double")
    mean_d = F.col("sd") / n
    t = mean_d / F.sqrt(
        (F.col("qd") - F.col("sd") * F.col("sd") / n) / (n - 1.0) / n
    )
    return m.select(
        F.col("n").alias("n_pairs"),
        F.round(mean_d, 6).alias("mean_diff_r6"),
        F.round(t, 6).alias("t_r6"),
        F.when(F.abs(t) > PAIRED_T_CRIT, 1).otherwise(0).alias(
            "significant_5pct"
        ),
    )


#: Two-sided 5% normal critical value (shared literal convention).
MK_CRIT = 1.959964


@query(
    "agg_mann_kendall_trend",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.event_type,
             CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END
               AS sgn
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day < b.day
    ),
    s AS (
      SELECT event_type, CAST(SUM(sgn) AS BIGINT) AS mk_s
      FROM pairs GROUP BY event_type
    ),
    ties AS (
      SELECT event_type,
             CAST(SUM(c * (c - 1) * (2 * c + 5)) AS BIGINT) AS tie_term
      FROM (
        SELECT event_type, y, CAST(COUNT(*) AS BIGINT) AS c
        FROM daily GROUP BY event_type, y
      ) GROUP BY event_type
    ),
    n_ AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM daily GROUP BY event_type
    )
    SELECT s.event_type, n_.n AS n_days, s.mk_s,
           round((CASE WHEN s.mk_s > 0 THEN s.mk_s - 1
                       WHEN s.mk_s < 0 THEN s.mk_s + 1 ELSE 0 END)
                 / sqrt((CAST(n_.n AS DOUBLE) * (n_.n - 1) * (2 * n_.n + 5)
                         - ties.tie_term) / 18.0), 6) AS z_r6,
           CASE WHEN abs((CASE WHEN s.mk_s > 0 THEN s.mk_s - 1
                       WHEN s.mk_s < 0 THEN s.mk_s + 1 ELSE 0 END)
                 / sqrt((CAST(n_.n AS DOUBLE) * (n_.n - 1) * (2 * n_.n + 5)
                         - ties.tie_term) / 18.0)) > {MK_CRIT}
                THEN 1 ELSE 0 END AS trend_5pct
    FROM s JOIN ties USING (event_type) JOIN n_ USING (event_type)
    ORDER BY s.event_type
    """,
    tags=("stats", "timeseries", "nonparametric", "beyond"),
)
def q_agg_mann_kendall_trend(spark, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test per event type — the significance
    verdict that pairs with agg_theil_sen_trend's slope estimate (the
    two are THE standard nonparametric monotone-trend kit:
    Theil–Sen says how steep, Mann–Kendall says whether it's real):
    S = Σ_{{i<j}} sign(y_j − y_i), continuity-corrected z with the
    exact tie-corrected variance (n(n−1)(2n+5) − Σ c(c−1)(2c+5))/18.

    Everything before the closing form is exact integers — pair
    signs, S, the tie term — over the BOUNDED per-day table (the
    theil_sen |days|² contract); z compares to the literal critical
    value identically on both engines.

    Scale: one corpus-sized combinable aggregation, then bounded
    pair algebra per type."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            (F.unix_micros("ts") / _DAY_US).cast("long").alias("day"),
        )
        .agg(F.count("*").cast("long").alias("y"))
    )
    a = daily.select(
        "event_type", F.col("day").alias("da"), F.col("y").alias("ya")
    )
    b = daily.select(
        F.col("event_type").alias("et_b"),
        F.col("day").alias("db"),
        F.col("y").alias("yb"),
    )
    s = (
        a.join(
            F.broadcast(b),
            (F.col("event_type") == F.col("et_b")) & (F.col("da") < F.col("db")),
        )
        .select(
            "event_type",
            F.when(F.col("yb") > F.col("ya"), 1)
            .when(F.col("yb") < F.col("ya"), -1)
            .otherwise(0)
            .alias("sgn"),
        )
        .groupBy("event_type")
        .agg(F.sum("sgn").cast("long").alias("mk_s"))
    )
    ties = (
        daily.groupBy("event_type", "y")
        .agg(F.count("*").cast("long").alias("c"))
        .groupBy("event_type")
        .agg(
            F.sum(F.col("c") * (F.col("c") - 1) * (2 * F.col("c") + 5))
            .cast("long")
            .alias("tie_term")
        )
    )
    n_ = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n")
    )
    j = s.join(ties, "event_type").join(n_, "event_type")
    nn = F.col("n").cast("double")
    s_cc = (
        F.when(F.col("mk_s") > 0, F.col("mk_s") - 1)
        .when(F.col("mk_s") < 0, F.col("mk_s") + 1)
        .otherwise(0)
    )
    z = s_cc / F.sqrt(
        (nn * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie_term"))
        / 18.0
    )
    return j.select(
        "event_type",
        F.col("n").alias("n_days"),
        "mk_s",
        F.round(z, 6).alias("z_r6"),
        F.when(F.abs(z) > MK_CRIT, 1).otherwise(0).alias("trend_5pct"),
    ).orderBy("event_type")


#: Positivity floor: each stratum needs ≥ this share in BOTH arms.
POSITIVITY_EPS_MICRO = 50_000  # 5% in parts-per-million


@query(
    "ml_positivity_check",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, CAST(user_id % 2 AS INT) AS treated,
             CAST(SUM(CASE WHEN epoch_us(ts) // {_DAY_US}
                            - (SELECT MIN(epoch_us(ts) // {_DAY_US})
                               FROM events) < {CUPED_SPLIT_DAY}
                           THEN 1 ELSE 0 END) AS BIGINT) AS pre_n
      FROM events WHERE value IS NOT NULL GROUP BY user_id
    ),
    banded AS (
      SELECT CASE WHEN pre_n < {STRATA_EDGES[0]} THEN 0
                  WHEN pre_n < {STRATA_EDGES[1]} THEN 1
                  WHEN pre_n < {STRATA_EDGES[2]} THEN 2
                  ELSE 3 END AS stratum,
             treated
      FROM per_user
    ),
    cells AS (
      SELECT CAST(stratum AS BIGINT) AS stratum,
             CAST(COUNT(*) AS BIGINT) AS n_h,
             CAST(SUM(treated) AS BIGINT) AS n_t
      FROM banded GROUP BY stratum
    )
    SELECT stratum, n_h, n_t, CAST(n_h - n_t AS BIGINT) AS n_c,
           round(CAST(n_t AS DOUBLE) / n_h, 6) AS treated_share_r6,
           CASE WHEN n_t * 1000000 >= {POSITIVITY_EPS_MICRO} * n_h
                 AND (n_h - n_t) * 1000000 >= {POSITIVITY_EPS_MICRO} * n_h
                THEN 1 ELSE 0 END AS positivity_ok
    FROM cells ORDER BY stratum
    """,
    tags=("stats", "causal", "guardrail", "beyond"),
)
def q_ml_positivity_check(spark, sf_dir: str) -> DataFrame:
    """Positivity / overlap diagnostic for the post-stratified ATE:
    per stratum (the SAME pre-period-activity bands
    ml_ate_poststratified weights by), the treated share and a flag
    that BOTH arms hold at least 5% of the stratum. Stratification
    and IPW estimators silently blow up when a stratum is (nearly)
    all-treated or all-control — the assumption everyone forgets to
    check; this is the check, run BEFORE trusting the ATE.

    The share compare is INTEGER (n·10⁶ ≥ ε·n_h — no float
    threshold), all counts exact from one per-user aggregation.

    Scale: corpus → |users| → |strata| rows, all combinable
    aggregations."""
    day = (F.unix_micros("ts") / _DAY_US).cast("long")
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    day0 = ev.agg(F.min(day).alias("d0"))
    per_user = (
        ev.crossJoin(F.broadcast(day0))
        .groupBy("user_id")
        .agg(
            F.max((F.col("user_id") % 2).cast("int")).alias("treated"),
            F.sum(
                F.when(day - F.col("d0") < CUPED_SPLIT_DAY, 1).otherwise(0)
            )
            .cast("long")
            .alias("pre_n"),
        )
    )
    banded = per_user.select(
        F.when(F.col("pre_n") < STRATA_EDGES[0], 0)
        .when(F.col("pre_n") < STRATA_EDGES[1], 1)
        .when(F.col("pre_n") < STRATA_EDGES[2], 2)
        .otherwise(3)
        .cast("long")
        .alias("stratum"),
        "treated",
    )
    cells = banded.groupBy("stratum").agg(
        F.count("*").cast("long").alias("n_h"),
        F.sum("treated").cast("long").alias("n_t"),
    )
    ok = (
        (F.col("n_t") * 1_000_000 >= POSITIVITY_EPS_MICRO * F.col("n_h"))
        & (
            (F.col("n_h") - F.col("n_t")) * 1_000_000
            >= POSITIVITY_EPS_MICRO * F.col("n_h")
        )
    )
    return cells.select(
        "stratum",
        "n_h",
        "n_t",
        (F.col("n_h") - F.col("n_t")).cast("long").alias("n_c"),
        F.round(F.col("n_t").cast("double") / F.col("n_h"), 6).alias(
            "treated_share_r6"
        ),
        F.when(ok, 1).otherwise(0).alias("positivity_ok"),
    ).orderBy("stratum")


@query(
    "agg_mix_shift_decomposition",
    oracle="""
    WITH base AS (
      SELECT CASE WHEN c_custkey % 2 = 0 THEN 0 ELSE 1 END AS period,
             c_mktsegment AS seg,
             CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END AS y
      FROM customer
    ),
    cells AS (
      SELECT period, seg,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS s
      FROM base GROUP BY 1, 2
    ),
    tot AS (
      SELECT period, CAST(SUM(n) AS BIGINT) AS nt FROM cells GROUP BY 1
    ),
    wide AS (
      SELECT c.seg,
             MAX(CASE WHEN c.period = 0 THEN CAST(c.n AS DOUBLE) / t.nt END)
               AS w0,
             MAX(CASE WHEN c.period = 1 THEN CAST(c.n AS DOUBLE) / t.nt END)
               AS w1,
             MAX(CASE WHEN c.period = 0 THEN CAST(c.s AS DOUBLE) / c.n END)
               AS r0,
             MAX(CASE WHEN c.period = 1 THEN CAST(c.s AS DOUBLE) / c.n END)
               AS r1
      FROM cells c JOIN tot t USING (period)
      GROUP BY c.seg
    ),
    terms AS (
      SELECT seg,
             CAST(round(COALESCE(w0, 0)
                        * (COALESCE(r1, 0) - COALESCE(r0, 0)), 9)
                  AS DECIMAL(28,9)) AS within_t,
             CAST(round((COALESCE(w1, 0) - COALESCE(w0, 0))
                        * COALESCE(r1, 0), 9)
                  AS DECIMAL(28,9)) AS mix_t
      FROM wide
    )
    SELECT CAST((SELECT COUNT(*) FROM wide) AS BIGINT) AS n_segments,
           round(CAST(SUM(within_t) AS DOUBLE), 6) AS within_effect_r6,
           round(CAST(SUM(mix_t) AS DOUBLE), 6) AS mix_effect_r6,
           round(CAST(SUM(within_t) AS DOUBLE)
                 + CAST(SUM(mix_t) AS DOUBLE), 6) AS total_delta_r6
    FROM terms
    """,
    tags=("stats", "guardrail", "beyond"),
)
def q_agg_mix_shift_decomposition(spark, sf_dir: str) -> DataFrame:
    """Mix-shift decomposition of a rate change between two snapshots
    (custkey-parity halves; rate = share of high-balance customers,
    segments = market segment): Δrate = Σ w₀·Δr (the WITHIN effect —
    segments actually changed) + Σ Δw·r₁ (the MIX effect — the
    population re-weighted toward different segments). The follow-up
    question to agg_simpson_paradox_detector: once you know the
    pooled number is compositional, this says HOW MUCH of the move is
    mix. The identity Δ = within + mix is exact under this (Laspeyres
    weights / current rates) convention, stated in the docstring
    because the other convention splits differently.

    All shares and rates are exact count ratios; per-segment terms
    are fixed-shape doubles rounded 9 then DECIMAL-summed over the
    |segments| table, with one closing round-6 each.

    Scale: one combinable aggregation to |period|×|segments| cells;
    constant-size algebra after."""
    base = load(spark, sf_dir, "customer").select(
        (F.col("c_custkey") % 2).alias("period"),
        F.col("c_mktsegment").alias("seg"),
        F.when(F.col("c_acctbal") > 5000, 1).otherwise(0).alias("y"),
    )
    cells = base.groupBy("period", "seg").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
    )
    tot = cells.groupBy("period").agg(F.sum("n").cast("long").alias("nt"))
    wide = (
        cells.join(tot, "period")
        .groupBy("seg")
        .agg(
            F.max(
                F.when(
                    F.col("period") == 0,
                    F.col("n").cast("double") / F.col("nt"),
                )
            ).alias("w0"),
            F.max(
                F.when(
                    F.col("period") == 1,
                    F.col("n").cast("double") / F.col("nt"),
                )
            ).alias("w1"),
            F.max(
                F.when(
                    F.col("period") == 0,
                    F.col("s").cast("double") / F.col("n"),
                )
            ).alias("r0"),
            F.max(
                F.when(
                    F.col("period") == 1,
                    F.col("s").cast("double") / F.col("n"),
                )
            ).alias("r1"),
        )
    )
    z = lambda c: F.coalesce(F.col(c), F.lit(0.0))
    terms = wide.select(
        F.round(z("w0") * (z("r1") - z("r0")), 9)
        .cast("decimal(28,9)")
        .alias("within_t"),
        F.round((z("w1") - z("w0")) * z("r1"), 9)
        .cast("decimal(28,9)")
        .alias("mix_t"),
    )
    nseg = wide.agg(F.count("*").cast("long").alias("n_segments"))
    s = terms.agg(
        F.sum("within_t").cast("double").alias("w"),
        F.sum("mix_t").cast("double").alias("m"),
    )
    return nseg.crossJoin(F.broadcast(s)).select(
        "n_segments",
        F.round(F.col("w"), 6).alias("within_effect_r6"),
        F.round(F.col("m"), 6).alias("mix_effect_r6"),
        F.round(F.col("w") + F.col("m"), 6).alias("total_delta_r6"),
    )


#: RDD cutoff on the running variable (account balance) + bandwidth.
RDD_CUTOFF = 5000.0
RDD_BW = 3000.0


@query(
    "ml_rdd_sharp",
    oracle=f"""
    WITH oc AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY o_custkey
    ),
    pop AS (
      SELECT CAST(c.c_acctbal - {RDD_CUTOFF} AS DECIMAL(18,2)) AS u,
             CAST(COALESCE(oc.n_orders, 0) AS BIGINT) AS y,
             CASE WHEN c.c_acctbal >= {RDD_CUTOFF} THEN 1 ELSE 0 END AS side
      FROM customer c LEFT JOIN oc ON oc.o_custkey = c.c_custkey
      WHERE abs(c.c_acctbal - {RDD_CUTOFF}) <= {RDD_BW}
    ),
    m AS (
      SELECT side, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(u AS DECIMAL(38,2))) AS DOUBLE) AS su,
             CAST(SUM(CAST(u AS DECIMAL(19,2)) * CAST(u AS DECIMAL(19,2)))
                  AS DOUBLE) AS suu,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(CAST(u AS DECIMAL(19,2)) * y) AS DOUBLE) AS suy
      FROM pop GROUP BY side
    ),
    fits AS (
      SELECT side, n,
             (sy * suu - su * suy)
             / (CAST(n AS DOUBLE) * suu - su * su) AS a,
             (CAST(n AS DOUBLE) * suy - su * sy)
             / (CAST(n AS DOUBLE) * suu - su * su) AS b
      FROM m
    )
    SELECT (SELECT n FROM fits WHERE side = 0) AS n_left,
           (SELECT n FROM fits WHERE side = 1) AS n_right,
           round((SELECT a FROM fits WHERE side = 0), 6)
             AS intercept_left_r6,
           round((SELECT a FROM fits WHERE side = 1), 6)
             AS intercept_right_r6,
           round((SELECT a FROM fits WHERE side = 1)
                 - (SELECT a FROM fits WHERE side = 0), 6) AS rdd_jump_r6
    """,
    tags=("stats", "causal", "beyond"),
)
def q_ml_rdd_sharp(spark, sf_dir: str) -> DataFrame:
    """Sharp regression-discontinuity estimate: does crossing the
    {RDD_CUTOFF} account-balance threshold shift order volume? Local
    LINEAR fits on each side of the cutoff within a ±{RDD_BW}
    bandwidth (uniform kernel, stated), both extrapolated TO the
    cutoff; the causal jump is the difference of intercepts. The
    design experimentation teams reach for when treatment is assigned
    by a threshold rule and randomization is impossible — completing
    the causal kit (diff-in-diff, CUPED, post-stratified ATE, IV,
    positivity) with the discontinuity member.

    Each side's fit is the closed-form OLS from exact DECIMAL moments
    (centered running variable u = x − c, integer outcome), so both
    intercepts and the jump are fixed-shape double expressions,
    round-6.

    Scale: one broadcast-ready per-customer order count join, one
    bandwidth filter pushed to the scan, one 2-row moment
    aggregation. No window."""
    oc = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").cast("long").alias("n_orders"))
    )
    pop = (
        load(spark, sf_dir, "customer")
        .filter(F.abs(F.col("c_acctbal") - RDD_CUTOFF) <= RDD_BW)
        .join(oc, F.col("o_custkey") == F.col("c_custkey"), "left")
        .select(
            (F.col("c_acctbal") - RDD_CUTOFF)
            .cast("decimal(18,2)")
            .alias("u"),
            F.coalesce("n_orders", F.lit(0)).cast("long").alias("y"),
            F.when(F.col("c_acctbal") >= RDD_CUTOFF, 1)
            .otherwise(0)
            .alias("side"),
        )
    )
    m = pop.groupBy("side").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("u").cast("decimal(38,2)")).cast("double").alias("su"),
        F.sum(F.col("u").cast("decimal(19,2)") * F.col("u").cast("decimal(19,2)"))
        .cast("double")
        .alias("suu"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("u").cast("decimal(19,2)") * F.col("y"))
        .cast("double")
        .alias("suy"),
    )
    n = F.col("n").cast("double")
    a = (F.col("sy") * F.col("suu") - F.col("su") * F.col("suy")) / (
        n * F.col("suu") - F.col("su") * F.col("su")
    )
    fits = m.select("side", "n", a.alias("a"))
    left = fits.filter(F.col("side") == 0).select(
        F.col("n").alias("n_left"), F.col("a").alias("a_l")
    )
    right = fits.filter(F.col("side") == 1).select(
        F.col("n").alias("n_right"), F.col("a").alias("a_r")
    )
    return left.crossJoin(F.broadcast(right)).select(
        "n_left",
        "n_right",
        F.round(F.col("a_l"), 6).alias("intercept_left_r6"),
        F.round(F.col("a_r"), 6).alias("intercept_right_r6"),
        F.round(F.col("a_r") - F.col("a_l"), 6).alias("rdd_jump_r6"),
    )


@query(
    "agg_price_index_fisher",
    oracle="""
    WITH li AS (
      SELECT l.l_partkey AS pk,
             CASE WHEN EXTRACT(year FROM o.o_orderdate) < 1998
                  THEN 0 ELSE 1 END AS period,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,4)))
                  AS DECIMAL(28,4)) AS spend
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2
    ),
    paired AS (
      SELECT a.pk,
             CAST(a.spend AS DOUBLE) / a.q AS p0,
             CAST(b.spend AS DOUBLE) / b.q AS p1,
             a.q AS q0, b.q AS q1
      FROM li a JOIN li b ON a.pk = b.pk
      WHERE a.period = 0 AND b.period = 1
    ),
    terms AS (
      SELECT CAST(round(p1 * q0, 6) AS DECIMAL(28,6)) AS l_num,
             CAST(round(p0 * q0, 6) AS DECIMAL(28,6)) AS l_den,
             CAST(round(p1 * q1, 6) AS DECIMAL(28,6)) AS p_num,
             CAST(round(p0 * q1, 6) AS DECIMAL(28,6)) AS p_den
      FROM paired
    ),
    s AS (
      SELECT CAST((SELECT COUNT(*) FROM paired) AS BIGINT) AS n_parts,
             CAST(SUM(l_num) AS DOUBLE) AS ln_, CAST(SUM(l_den) AS DOUBLE)
               AS ld_,
             CAST(SUM(p_num) AS DOUBLE) AS pn_, CAST(SUM(p_den) AS DOUBLE)
               AS pd_
      FROM terms
    )
    SELECT n_parts,
           round(ln_ / ld_, 6) AS laspeyres_r6,
           round(pn_ / pd_, 6) AS paasche_r6,
           round(sqrt((ln_ / ld_) * (pn_ / pd_)), 6) AS fisher_r6
    FROM s
    """,
    tags=("stats", "econ", "beyond"),
)
def q_agg_price_index_fisher(spark, sf_dir: str) -> DataFrame:
    """Price-index panel between the pre-1998 and 1998+ order halves
    over parts sold in BOTH periods: Laspeyres (base-period basket —
    overstates inflation when buyers substitute), Paasche (current
    basket — understates it), and Fisher's ideal index (their
    geometric mean, the one national statistics agencies publish).
    The composition-honest way to answer 'did prices move or did the
    mix move' for a catalog — the price-side complement to
    agg_mix_shift_decomposition's rate-side split.

    Per-part unit prices are spend/quantity ratios of exact DECIMAL
    and integer sums; each basket term p·q is a fixed-shape double
    rounded 6 then DECIMAL-summed across parts (order-free); three
    closing divisions and one sqrt.

    Scale (r14 linearization): one fact-to-orders join (both
    corpus-sized, equi-join on the order key), then ONE (part)
    aggregation with per-period conditional sums — the old shape
    self-joined the per-(part, period) table to pair the halves and
    consumed both it and the pair table twice, so Catalyst re-derived
    the fact join four times (census 8 scans; now 2). The pair count
    folds into the same closing aggregation as the four basket sums,
    so the whole query is one linear pipeline: join → pivot agg →
    per-row terms → bounded reduce."""
    # Per-period spend sums on the scaled-long path (r17): price is
    # raw 2dp money, so p2l = round(price*100) is exactly the
    # DECIMAL(28,4) value's unscaled digits / 100 and the recombined
    # decimal is the same rational as the conditional decimal SUM
    # (|p2l| <= 1.2e7 -> 2-limb, N_safe ~8.8e12 rows/part). spend is
    # only consumed as CAST(... AS DOUBLE)/q, a value-based conversion.
    from job_market_research_spark.exact import limb_sum_scaled

    period0 = F.year("o_orderdate") < 1998
    p2l = F.round(F.col("l_extendedprice") * 100).cast("long")
    pivot = (
        load(spark, sf_dir, "lineitem")
        .join(
            load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(
            F.sum(F.when(period0, F.col("l_quantity").cast("long")))
            .cast("long")
            .alias("q0"),
            limb_sum_scaled(F.when(period0, p2l), 2, 32).alias("spend0"),
            F.sum(F.when(~period0, F.col("l_quantity").cast("long")))
            .cast("long")
            .alias("q1"),
            limb_sum_scaled(F.when(~period0, p2l), 2, 32).alias("spend1"),
        )
        .filter(F.col("q0").isNotNull() & F.col("q1").isNotNull())
    )
    p0 = F.col("spend0").cast("double") / F.col("q0")
    p1 = F.col("spend1").cast("double") / F.col("q1")
    terms = pivot.select(
        F.round(p1 * F.col("q0"), 6).cast("decimal(28,6)").alias("l_num"),
        F.round(p0 * F.col("q0"), 6).cast("decimal(28,6)").alias("l_den"),
        F.round(p1 * F.col("q1"), 6).cast("decimal(28,6)").alias("p_num"),
        F.round(p0 * F.col("q1"), 6).cast("decimal(28,6)").alias("p_den"),
    )
    s = terms.agg(
        F.count("*").cast("long").alias("n_parts"),
        F.sum("l_num").cast("double").alias("ln_"),
        F.sum("l_den").cast("double").alias("ld_"),
        F.sum("p_num").cast("double").alias("pn_"),
        F.sum("p_den").cast("double").alias("pd_"),
    )
    lasp = F.col("ln_") / F.col("ld_")
    paas = F.col("pn_") / F.col("pd_")
    return s.select(
        "n_parts",
        F.round(lasp, 6).alias("laspeyres_r6"),
        F.round(paas, 6).alias("paasche_r6"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher_r6"),
    )


#: Two-sided 5% normal critical value (shared literal convention).
CA_CRIT = 1.959964


@query(
    "agg_cochran_armitage_trend",
    oracle=f"""
    WITH g AS (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    m AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nt,
             CAST(SUM(x) AS BIGINT) AS xt,
             CAST(SUM(s * n) AS BIGINT) AS sn,
             CAST(SUM(s * s * n) AS BIGINT) AS ssn,
             CAST(SUM(s * x) AS BIGINT) AS sx
      FROM g
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM g) AS n_levels,
           nt AS n, xt AS n_pos,
           round((sx - CAST(sn AS DOUBLE) * xt / nt)
                 / sqrt((CAST(xt AS DOUBLE) / nt)
                        * (1 - CAST(xt AS DOUBLE) / nt)
                        * (ssn - CAST(sn AS DOUBLE) * sn / nt)), 6) AS z_r6,
           CASE WHEN abs((sx - CAST(sn AS DOUBLE) * xt / nt)
                 / sqrt((CAST(xt AS DOUBLE) / nt)
                        * (1 - CAST(xt AS DOUBLE) / nt)
                        * (ssn - CAST(sn AS DOUBLE) * sn / nt)))
                > {CA_CRIT} THEN 1 ELSE 0 END AS trend_5pct
    FROM m
    """,
    tags=("stats", "trend", "beyond"),
)
def q_agg_cochran_armitage_trend(spark, sf_dir: str) -> DataFrame:
    """Cochran–Armitage test for trend in proportions across ORDERED
    categories — is the high-value-order rate monotonically related
    to the priority level (scores 1..5 from the priority prefix)?
    The right test when the x-axis is ordinal: a plain chi-square
    (agg_cramers_v) ignores the ordering and wastes its power across
    all departures; CA spends it all on the monotone alternative:
    T = Σ s·x − x̄·Σ s·n, Var = p̄(1−p̄)(Σ s²n − (Σ sn)²/N).

    Every moment is an exact integer from ONE combinable corpus
    aggregation over ≤5 category rows; z is a fixed-shape double
    against the literal critical value.

    Scale: one aggregation to |levels| rows; constant-size algebra."""
    g = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.substring("o_orderpriority", 1, 1).cast("long").alias("s")
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.when(F.col("o_totalprice") > 150000, 1).otherwise(0))
            .cast("long")
            .alias("x"),
        )
    )
    m = g.agg(
        F.count("*").cast("long").alias("n_levels"),
        F.sum("n").cast("long").alias("nt"),
        F.sum("x").cast("long").alias("xt"),
        F.sum(F.col("s") * F.col("n")).cast("long").alias("sn"),
        F.sum(F.col("s") * F.col("s") * F.col("n")).cast("long").alias("ssn"),
        F.sum(F.col("s") * F.col("x")).cast("long").alias("sx"),
    )
    nt = F.col("nt").cast("double")
    p = F.col("xt").cast("double") / nt
    t = F.col("sx") - F.col("sn").cast("double") * F.col("xt") / nt
    var = p * (1 - p) * (F.col("ssn") - F.col("sn").cast("double") * F.col("sn") / nt)
    z = t / F.sqrt(var)
    return m.select(
        "n_levels",
        F.col("nt").alias("n"),
        F.col("xt").alias("n_pos"),
        F.round(z, 6).alias("z_r6"),
        F.when(F.abs(z) > CA_CRIT, 1).otherwise(0).alias("trend_5pct"),
    )


#: chi-square(1) critical value at 0.01 — the Bonferroni-adjusted
#: per-segment level for a 5-segment family at ~0.05 overall.
SRM_SEG_CRIT = 6.634897


@query(
    "agg_srm_by_segment",
    oracle=f"""
    WITH seg AS (
      SELECT event_type AS segment,
             CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n1
      FROM events GROUP BY event_type
    )
    SELECT segment, n0, n1,
           round(CAST((n0 - n1) AS DOUBLE) * (n0 - n1) / (n0 + n1), 6)
             AS chi2_r6,
           CASE WHEN CAST((n0 - n1) AS DOUBLE) * (n0 - n1) / (n0 + n1)
                > {SRM_SEG_CRIT} THEN 1 ELSE 0 END AS srm_alert
    FROM seg ORDER BY segment
    """,
    tags=("stats", "abtest", "guardrail", "beyond"),
)
def q_agg_srm_by_segment(spark, sf_dir: str) -> DataFrame:
    """Sample-ratio mismatch localized BY SEGMENT: the 50/50 arm
    balance (user-parity arms) checked per event type with a
    Bonferroni-adjusted literal critical value — because a global SRM
    check (agg_srm_check) passing does NOT mean assignment is clean:
    a logging bug that drops one arm's events on one surface shows up
    only in that segment's ratio, and segment-level SRM is how
    experimentation platforms actually localize it. χ² for a 50/50
    split reduces to (n₀−n₁)²/(n₀+n₁), exact integers until one
    division.

    Scale: one combinable corpus aggregation to |segments| rows."""
    seg = (
        load(spark, sf_dir, "events")
        .groupBy(F.col("event_type").alias("segment"))
        .agg(
            F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
            .cast("long")
            .alias("n0"),
            F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
            .cast("long")
            .alias("n1"),
        )
    )
    chi2 = (
        (F.col("n0") - F.col("n1")).cast("double")
        * (F.col("n0") - F.col("n1"))
        / (F.col("n0") + F.col("n1"))
    )
    return seg.select(
        "segment",
        "n0",
        "n1",
        F.round(chi2, 6).alias("chi2_r6"),
        F.when(chi2 > SRM_SEG_CRIT, 1).otherwise(0).alias("srm_alert"),
    ).orderBy("segment")


@query(
    "agg_anova_twoway",
    oracle="""
    WITH base AS (
      SELECT o_orderpriority AS a, o_orderstatus AS b,
             CAST(round(o_totalprice * 100) AS BIGINT) AS y
      FROM orders
    ),
    cells AS (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS s,
             CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                  AS DOUBLE) AS q
      FROM base GROUP BY 1, 2
    ),
    ma AS (SELECT a, CAST(SUM(n) AS BIGINT) AS n, SUM(s) AS s
           FROM cells GROUP BY a),
    mb AS (SELECT b, CAST(SUM(n) AS BIGINT) AS n, SUM(s) AS s
           FROM cells GROUP BY b),
    g AS (SELECT CAST(SUM(n) AS BIGINT) AS n, SUM(s) AS s, SUM(q) AS q
          FROM cells),
    ss AS (
      SELECT
        (SELECT q - s * s / n FROM g) AS ss_total,
        (SELECT SUM(s * s / n) FROM ma) - (SELECT s * s / n FROM g) AS ss_a,
        (SELECT SUM(s * s / n) FROM mb) - (SELECT s * s / n FROM g) AS ss_b,
        (SELECT SUM(s * s / n) FROM cells) - (SELECT s * s / n FROM g)
          AS ss_cells,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM ma) AS ka,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM mb) AS kb,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM cells) AS kc,
        (SELECT n FROM g) AS n
    )
    SELECT n, ka AS levels_a, kb AS levels_b,
           round((ss_a / (ka - 1))
                 / ((ss_total - ss_cells) / (n - kc)), 6) AS f_a_r6,
           round((ss_b / (kb - 1))
                 / ((ss_total - ss_cells) / (n - kc)), 6) AS f_b_r6,
           round(((ss_cells - ss_a - ss_b) / ((ka - 1) * (kb - 1)))
                 / ((ss_total - ss_cells) / (n - kc)), 6)
             AS f_interaction_r6,
           round(ss_cells / ss_total, 6) AS eta2_cells_r6
    FROM ss
    """,
    tags=("stats", "anova", "beyond"),
)
def q_agg_anova_twoway(spark, sf_dir: str) -> DataFrame:
    """Two-way ANOVA of order value by priority × status, WITH the
    interaction term — the question one-way ANOVA
    (agg_anova_oneway) can't ask: does the priority effect DEPEND on
    the order's status? F for each main effect and the interaction
    (the unbalanced-design caveat — these are Type-I-style sums on
    the cell decomposition — is stated), plus the cells' η² effect
    size.

    Cell moments (Σy, Σy² over integer cents) are SUMMED in DECIMAL —
    order-independent, so Spark's partial aggregation matches DuckDB
    bit-for-bit — then carried as DOUBLE through the s²/n algebra
    (both engines identically; beyond ~2^53 cents² the moments are
    double-precision, not exact). Only O(1) F-ratios and η² are
    emitted (raw SS is cents²-scale, the round-unsafe class).

    Scale: ONE combinable corpus aggregation to |A|×|B| cells;
    everything else is algebra on that bounded table."""
    base = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("a"),
        F.col("o_orderstatus").alias("b"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
    )
    # Cell moments on the scaled-long path (r17): y is already an exact
    # long (integer cents, |y| <= ~5.6e7), so sum(y) and sum(y*y) as
    # limb sums are the same rationals as the decimal SUMs they
    # replace. |y| -> 2-limb (N_safe 8.8e12 rows/cell); y*y <= 3.2e15
    # exceeds the 2-limb bound (N_safe would be ~3e9, under the 100 TB
    # cell size) -> 3-limb (N_safe 8.8e12).
    from job_market_research_spark.exact import (
        _hilo3_sum_as_decimal,
        _hilo_sum_as_decimal,
    )

    cells = base.groupBy("a", "b").agg(
        F.count("*").cast("long").alias("n"),
        _hilo_sum_as_decimal(F.col("y")).cast("double").alias("s"),
        _hilo3_sum_as_decimal(F.col("y") * F.col("y"))
        .cast("double")
        .alias("q"),
    )
    def _margin(key):
        return cells.groupBy(key).agg(
            F.sum("n").cast("long").alias("n"), F.sum("s").alias("s")
        )

    ma, mb = _margin("a"), _margin("b")
    g = cells.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("s").alias("s"),
        F.sum("q").alias("q"),
    )
    part = lambda df: df.agg(
        F.sum(F.col("s") * F.col("s") / F.col("n")).alias("p"),
        F.count("*").cast("long").alias("k"),
    )
    pa = part(ma).select(F.col("p").alias("pa"), F.col("k").alias("ka"))
    pb = part(mb).select(F.col("p").alias("pb"), F.col("k").alias("kb"))
    pc = part(cells).select(F.col("p").alias("pc"), F.col("k").alias("kc"))
    j = (
        g.crossJoin(F.broadcast(pa))
        .crossJoin(F.broadcast(pb))
        .crossJoin(F.broadcast(pc))
    )
    grand = F.col("s") * F.col("s") / F.col("n")
    ss_total = F.col("q") - grand
    ss_a = F.col("pa") - grand
    ss_b = F.col("pb") - grand
    ss_cells = F.col("pc") - grand
    ss_err = ss_total - ss_cells
    df_err = F.col("n") - F.col("kc")
    return j.select(
        "n",
        F.col("ka").alias("levels_a"),
        F.col("kb").alias("levels_b"),
        F.round((ss_a / (F.col("ka") - 1)) / (ss_err / df_err), 6).alias(
            "f_a_r6"
        ),
        F.round((ss_b / (F.col("kb") - 1)) / (ss_err / df_err), 6).alias(
            "f_b_r6"
        ),
        F.round(
            ((ss_cells - ss_a - ss_b) / ((F.col("ka") - 1) * (F.col("kb") - 1)))
            / (ss_err / df_err),
            6,
        ).alias("f_interaction_r6"),
        F.round(ss_cells / ss_total, 6).alias("eta2_cells_r6"),
    )

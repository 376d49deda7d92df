"""Event-stream product analytics: funnel, retention cohorts,
first/last-touch attribution (beyond-reference).

The reference's dashboards aggregate a static star schema; an event
table (the driver's `events`) asks the classic product-analytics
questions instead. All three operators are single-key-shuffle plans on
`user_id` — the natural partitioning for event data at scale (events
co-partition by user once; every per-user derivation reuses the
layout).

- `agg_funnel_conversion`: ordered-step funnel (view → click →
  purchase) where each step must occur AT OR AFTER the previous
  step's first occurrence — the sequential semantics a naive
  per-step COUNT(DISTINCT) gets wrong.
- `agg_retention_cohort`: users grouped by first-seen date, activity
  bucketed into week offsets — the retention triangle.
- `window_first_last_touch`: first/last event per user under a total
  (ts, event_id) order — deterministic attribution under timestamp
  ties, where bare `first_value(… ORDER BY ts)` is not.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.registry import query


@query(
    "agg_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts >= v.t
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.t
      GROUP BY e.user_id
    )
    SELECT * FROM (
      SELECT '1_view' AS step, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
      UNION ALL
      SELECT '2_click_after_view', CAST(COUNT(*) AS BIGINT) FROM c
      UNION ALL
      SELECT '3_purchase_after_click', CAST(COUNT(*) AS BIGINT) FROM p
    ) ORDER BY step
    """,
)
def q_agg_funnel_conversion(spark, sf_dir: str) -> DataFrame:
    """Sequential funnel: per-user first 'view', first 'click' at or
    after it, first 'purchase' at or after that. Each stage is a
    per-user aggregate joined to the previous stage on user_id — all
    three shuffles share the user_id key, so on a user-partitioned
    event store the whole funnel is map-side. Step labels are
    prefix-numbered so the report sorts in funnel order."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def first_after(prev: DataFrame, etype: str) -> DataFrame:
        e = ev.filter(F.col("event_type") == etype)
        return (
            e.join(prev, "user_id")
            .filter(F.col("ts") >= F.col("t"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t2"))
            .withColumnRenamed("t2", "t")
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )
    c = first_after(v, "click")
    p = first_after(c, "purchase")

    def step(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count("*").cast("long").alias("n_users")).select(
            F.lit(label).alias("step"), "n_users"
        )

    return (
        step(v, "1_view")
        .unionByName(step(c, "2_click_after_view"))
        .unionByName(step(p, "3_purchase_after_click"))
        .orderBy("step")
    )


@query(
    "agg_retention_cohort",
    oracle="""
    WITH firstseen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
      FROM events GROUP BY user_id
    )
    SELECT f.cohort_date,
           CAST(date_diff('day', f.cohort_date, CAST(e.ts AS DATE)) // 7
                AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN firstseen f ON e.user_id = f.user_id
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_agg_retention_cohort(spark, sf_dir: str) -> DataFrame:
    """Retention triangle: cohort = first-seen date per user, activity
    bucketed into week offsets from the cohort date, distinct active
    users per (cohort, offset). Two shuffles, both on user_id-derived
    keys; the cohort join broadcasts when the user dimension is
    bounded and degrades to a co-partitioned join when it is not."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    firstseen = ev.groupBy("user_id").agg(F.min("day").alias("cohort_date"))
    return (
        ev.join(firstseen, "user_id")
        .groupBy(
            "cohort_date",
            F.expr("datediff(day, cohort_date) div 7").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
        .orderBy("cohort_date", "week_offset")
    )


@query(
    "window_first_last_touch",
    oracle="""
    SELECT DISTINCT user_id,
           first_value(event_type) OVER w AS first_touch,
           last_value(event_type) OVER w AS last_touch,
           CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_events
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY user_id
    """,
)
def q_window_first_last_touch(spark, sf_dir: str) -> DataFrame:
    """First/last-touch attribution per user. The window orders by
    (ts, event_id) — a TOTAL order — so attribution is deterministic
    under same-timestamp ties on any engine and any partitioning; the
    full frame makes last_value see the real last row. One shuffle on
    user_id."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        ev.select(
            "user_id",
            F.first("event_type").over(w).alias("first_touch"),
            F.last("event_type").over(w).alias("last_touch"),
            F.count("*").over(Window.partitionBy("user_id")).cast("long").alias(
                "n_events"
            ),
        )
        .distinct()
        .orderBy("user_id")
    )


@query(
    "window_activity_streak",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    islands AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (PARTITION BY user_id
                                           ORDER BY day) AS INTEGER)
               AS island
      FROM days
    ),
    streaks AS (
      SELECT user_id, COUNT(*) AS streak
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(MAX(streak) AS BIGINT) AS longest_streak,
           CAST(SUM(streak) AS BIGINT) AS n_active_days
    FROM streaks GROUP BY user_id ORDER BY user_id
    """,
)
def q_window_activity_streak(spark, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands pattern: distinct active days, island key =
    day − row_number (constant within a consecutive run), then
    max run length. Every stage keys on user_id (plus the
    bounded-cardinality island suffix), so the whole plan rides the
    same single user partitioning as the rest of the family; per-user
    window state is that user's distinct days, never corpus-sized."""
    days = (
        load(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.select(
        "user_id",
        F.date_sub("day", F.row_number().over(w)).alias("island"),
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count("*").alias("streak")
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.max("streak").cast("long").alias("longest_streak"),
            F.sum("streak").cast("long").alias("n_active_days"),
        )
        .orderBy("user_id")
    )


#: Trailing-window parameters for the z-score anomaly gate.
ZS_LOOKBACK = 10
ZS_MIN_N = 5
ZS_THRESHOLD = 2.0


@query(
    "window_zscore_anomaly",
    oracle=f"""
    WITH st AS (
      SELECT event_id, user_id, value,
             CAST(COUNT(*) OVER w AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(28,10))) OVER w AS DOUBLE) AS s,
             CAST(SUM(CAST(value AS DECIMAL(28,10))
                      * CAST(value AS DECIMAL(28,10))) OVER w AS DOUBLE)
               AS sq
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {ZS_LOOKBACK} PRECEDING AND 1 PRECEDING)
    ),
    z AS (
      SELECT event_id, user_id, value, n,
             (value - s / n)
               / sqrt(greatest((sq - s * s / n) / (n - 1), 1e-12)) AS z
      FROM st WHERE n >= {ZS_MIN_N}
    )
    SELECT event_id, user_id, value, round(z, 6) AS z
    FROM z WHERE abs(z) > {ZS_THRESHOLD}
    ORDER BY user_id, event_id
    """,
)
def q_window_zscore_anomaly(spark, sf_dir: str) -> DataFrame:
    """Per-user trailing z-score anomaly gate: each event's value is
    scored against the mean/stddev of that user's previous
    ZS_LOOKBACK events (current row excluded — no self-masking), and
    events beyond ZS_THRESHOLD sigmas are flagged.

    Determinism/scale shape: the window orders by the total (ts,
    event_id) key; sum and sum-of-squares accumulate in exact DECIMAL
    (order-independent), then mean/variance/sqrt are single
    double-precision expressions identical on both engines. The
    variance is clamped at 1e-12 before sqrt so fp cancellation on a
    constant-valued window can't produce NaN (and constant windows
    score z≈huge → flagged, which is the desired behavior for a
    frozen sensor that suddenly moves). One shuffle on user_id, frame
    bounded at ZS_LOOKBACK rows — O(1) state per row at any scale.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ZS_LOOKBACK, -1)
    )
    dec = F.col("value").cast("decimal(28,10)")
    st = ev.select(
        "event_id",
        "user_id",
        "value",
        F.count("*").over(w).cast("long").alias("n"),
        F.sum(dec).over(w).cast("double").alias("s"),
        F.sum(dec * dec).over(w).cast("double").alias("sq"),
    ).filter(F.col("n") >= ZS_MIN_N)
    z = (F.col("value") - F.col("s") / F.col("n")) / F.sqrt(
        F.greatest(
            (F.col("sq") - F.col("s") * F.col("s") / F.col("n"))
            / (F.col("n") - 1),
            F.lit(1e-12),
        )
    )
    return (
        st.withColumn("z", z)
        .filter(F.abs("z") > ZS_THRESHOLD)
        .select("event_id", "user_id", "value", F.round("z", 6).alias("z"))
        .orderBy("user_id", "event_id")
    )


#: Trailing window width (days) for the sliding distinct-user metric.
SLIDE_DAYS = 7


@query(
    "agg_sliding_distinct_users",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    days AS (SELECT DISTINCT day FROM ud),
    mx AS (SELECT MAX(day) AS max_day FROM ud)
    SELECT w.day,
           CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS dau_{SLIDE_DAYS}d
    FROM days w
    JOIN ud u ON u.day BETWEEN w.day - {SLIDE_DAYS - 1} AND w.day
    GROUP BY w.day ORDER BY w.day
    """,
)
def q_agg_sliding_distinct_users(spark, sf_dir: str) -> DataFrame:
    """Trailing {SLIDE}-day distinct active users per day — the
    rolling-DAU metric. COUNT(DISTINCT) does not decompose over
    sliding windows, so the scalable plan inverts the membership:
    each distinct (user, day) pair is exploded into the ≤SLIDE_DAYS
    window-days it contributes to, then one two-phase distinct count
    per window-day. Shuffle volume is SLIDE_DAYS × |user-days| — 
    linear, bounded fan-out, no self-join of the event table and no
    per-window rescans. Window-days past the observed max are dropped
    via a broadcast 1-row max (they would report partial futures).
    At 100 TB the same shape runs with an HLL sketch per window-day
    (`agg_sketch_prod`) instead of the exact distinct."""
    ev = load(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    mx = ud.agg(F.max("day").alias("max_day"))
    exploded = ud.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"), F.date_add(F.col("day"), SLIDE_DAYS - 1)
            )
        ).alias("wday"),
    )
    days = ud.select(F.col("day").alias("wday")).distinct()
    return (
        exploded.join(days, "wday")
        .crossJoin(F.broadcast(mx))
        .filter(F.col("wday") <= F.col("max_day"))
        .groupBy(F.col("wday").alias("day"))
        .agg(
            F.count_distinct("user_id").cast("long").alias(f"dau_{SLIDE_DAYS}d")
        )
        .orderBy("day")
    )


@query(
    "agg_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    trans AS (
      SELECT prev_type, event_type AS next_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT prev_type, CAST(SUM(n) AS BIGINT) AS n_out FROM trans GROUP BY 1
    )
    SELECT t.prev_type, t.next_type, t.n,
           round(CAST(t.n AS DOUBLE) / o.n_out, 6) AS p
    FROM trans t JOIN tot o USING (prev_type)
    ORDER BY prev_type, next_type
    """,
)
def q_agg_event_transitions(spark, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user event flows:
    counts and conditional probabilities of (prev event type → next
    event type) under the total per-user (ts, event_id) order.

    One shuffle on user_id for the lag window, then the transition
    count collapses to an event-type² key space — bounded — so the
    aggregation is map-side-combine dominated; row totals join back
    as a broadcast dictionary. Probabilities = exact int counts
    divided once in double, round-6."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count("*").alias("n"))
    tot = trans.groupBy("prev_type").agg(F.sum("n").cast("long").alias("n_out"))
    return (
        trans.join(F.broadcast(tot), "prev_type")
        .select(
            "prev_type",
            "next_type",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n").cast("double") / F.col("n_out"), 6).alias("p"),
        )
        .orderBy("prev_type", "next_type")
    )


#: Rolling-median frame: current row + the ROLLMED_LOOKBACK before it.
ROLLMED_LOOKBACK = 10
ROLLMED_MIN_N = 5


@query(
    "window_rolling_median",
    oracle=f"""
    WITH st AS (
      SELECT event_id, user_id,
             CAST(COUNT(*) OVER w AS BIGINT) AS n,
             round(quantile_cont(value, 0.5) OVER w, 6) AS med
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {ROLLMED_LOOKBACK} PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, med FROM st
    WHERE n >= {ROLLMED_MIN_N} ORDER BY user_id, event_id
    """,
)
def q_window_rolling_median(spark, sf_dir: str) -> DataFrame:
    """Per-user rolling median of event values — the robust companion
    to `window_zscore_anomaly` (a median baseline shrugs off the very
    outliers a mean-based z-score is distorted by).

    One shuffle on user_id, frame bounded at ROLLMED_LOOKBACK+1 rows
    → O(frame log frame) per row, O(1) state. Exact interpolated
    percentile over the frame is engine-identical (proven by
    `agg_percentiles`); at 100 TB the same call shape swaps to
    `approx_percentile` t-digests. Total (ts, event_id) frame order
    keeps results retry-stable."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ROLLMED_LOOKBACK, 0)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.count("*").over(w).alias("n"),
            F.round(F.percentile("value", F.lit(0.5)).over(w), 6).alias("med"),
        )
        .filter(F.col("n") >= ROLLMED_MIN_N)
        .select("event_id", "user_id", "med")
        .orderBy("user_id", "event_id")
    )


#: Equal-width histogram bins per event type.
HIST_BINS = 10


@query(
    "agg_value_histogram",
    oracle=f"""
    WITH bounds AS (
      SELECT event_type, MIN(value) AS mn, MAX(value) AS mx
      FROM events GROUP BY 1
    ),
    binned AS (
      SELECT e.event_type,
             CAST(least({HIST_BINS - 1},
                  floor((e.value - b.mn) * {HIST_BINS} / (b.mx - b.mn)))
               AS BIGINT) AS bin,
             b.mn, b.mx
      FROM events e JOIN bounds b USING (event_type)
    )
    SELECT event_type, bin,
           round(mn + bin * (mx - mn) / {HIST_BINS}, 6) AS bin_lo,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM binned GROUP BY event_type, bin, mn, mx
    ORDER BY event_type, bin
    """,
)
def q_agg_value_histogram(spark, sf_dir: str) -> DataFrame:
    """Equal-width per-type value histogram — the one-pass profiling
    staple (drift baselines, bin boundaries for equi-width bucketing).

    Two aggregations, both bounded: per-type min/max (|types| rows,
    broadcast back), then a (type, bin) count whose key space is
    |types| × HIST_BINS — pure map-side combine territory. The bin
    expression is one double multiply/divide identical on both
    engines; the top bin absorbs value == max via `least`."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    bounds = ev.groupBy("event_type").agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    binned = ev.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "mn",
        "mx",
        F.least(
            F.lit(HIST_BINS - 1),
            F.floor(
                (F.col("value") - F.col("mn"))
                * HIST_BINS
                / (F.col("mx") - F.col("mn"))
            ),
        )
        .cast("long")
        .alias("bin"),
    )
    return (
        binned.groupBy("event_type", "bin", "mn", "mx")
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            "event_type",
            "bin",
            F.round(
                F.col("mn") + F.col("bin") * (F.col("mx") - F.col("mn")) / HIST_BINS,
                6,
            ).alias("bin_lo"),
            "n",
        )
        .orderBy("event_type", "bin")
    )


@query(
    "agg_interarrival_stats",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
           round(CAST(SUM(CAST(gap_us AS DECIMAL(28,0))) AS DOUBLE)
                 / COUNT(gap_us) / 1e6, 6) AS avg_gap_s,
           round(quantile_cont(gap_us, 0.5) / 1e6, 6) AS p50_gap_s,
           round(quantile_cont(gap_us, 0.9) / 1e6, 6) AS p90_gap_s
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def q_agg_interarrival_stats(spark, sf_dir: str) -> DataFrame:
    """Inter-arrival-time distribution per event type: each event's
    gap to the SAME USER's previous event (any type), aggregated by
    the current event's type — mean plus exact p50/p90.

    One lag window on user_id (integer microsecond arithmetic — no
    float time math), then a |types|-cardinality aggregation; gap
    sums ride DECIMAL, percentiles are the proven exact-interpolation
    call (t-digest-swappable at 100 TB)."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("gap_us").cast("long").alias("n_gaps"),
            F.round(
                F.sum(F.col("gap_us").cast("decimal(28,0)")).cast("double")
                / F.count("gap_us")
                / 1e6,
                6,
            ).alias("avg_gap_s"),
            F.round(F.percentile("gap_us", F.lit(0.5)) / 1e6, 6).alias(
                "p50_gap_s"
            ),
            F.round(F.percentile("gap_us", F.lit(0.9)) / 1e6, 6).alias(
                "p90_gap_s"
            ),
        )
        .orderBy("event_type")
    )


@query(
    "agg_audience_overlap",
    oracle="""
    WITH pairs AS (
      SELECT a.t AS type_a, b.t AS type_b
      FROM (SELECT DISTINCT event_type AS t FROM events) a
      JOIN (SELECT DISTINCT event_type AS t FROM events) b ON a.t < b.t
    ),
    ut AS (SELECT DISTINCT event_type, user_id FROM events),
    sizes AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM ut GROUP BY 1
    ),
    inter AS (
      SELECT x.event_type AS type_a, y.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_both
      FROM ut x JOIN ut y
        ON x.user_id = y.user_id AND x.event_type < y.event_type
      GROUP BY 1, 2
    )
    SELECT p.type_a AS type_a, p.type_b AS type_b,
           sa.n AS n_a, sb.n AS n_b,
           COALESCE(i.n_both, 0) AS n_both,
           round(CAST(COALESCE(i.n_both, 0) AS DOUBLE)
                 / (sa.n + sb.n - COALESCE(i.n_both, 0)), 6) AS jaccard
    FROM pairs p
    JOIN sizes sa ON sa.event_type = p.type_a
    JOIN sizes sb ON sb.event_type = p.type_b
    LEFT JOIN inter i ON i.type_a = p.type_a AND i.type_b = p.type_b
    ORDER BY type_a, type_b
    """,
)
def q_agg_audience_overlap(spark, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: for every pair of event types, the
    distinct-user intersection, union sizes and Jaccard — the
    "segment overlap" question every analytics deployment asks (and
    the distinct-set algebra theta sketches exist for).

    Scale shape: the corpus collapses FIRST to distinct (type, user)
    pairs — one two-phase distinct whose output is |types|·|users| at
    worst. The intersection self-join is keyed on user_id with
    fan-out bounded by |types|² per user (types is a bounded
    vocabulary); per-type sizes and the |types|²-row pair frame are
    broadcast-sized. At 100 TB swap the exact sets for theta/HLL
    sketches per type and the pair matrix needs no user-level join at
    all — this exact form is the oracle-checkable twin."""
    ev = load(spark, sf_dir, "events")
    ut = ev.select("event_type", "user_id").distinct()
    types = ut.select(F.col("event_type").alias("t")).distinct()
    pairs = (
        types.select(F.col("t").alias("type_a"))
        .join(
            types.select(F.col("t").alias("type_b")),
            F.col("type_a") < F.col("type_b"),
        )
    )
    sizes = ut.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    x = ut.select(F.col("event_type").alias("type_a"), "user_id")
    y = ut.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        x.join(y, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("long").alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .join(F.broadcast(inter), ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            F.coalesce(F.col("n_both"), F.lit(0)).cast("long").alias("n_both"),
            F.round(
                F.coalesce(F.col("n_both"), F.lit(0)).cast("double")
                / (
                    F.col("n_a")
                    + F.col("n_b")
                    - F.coalesce(F.col("n_both"), F.lit(0))
                ),
                6,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


#: Two-level rank buckets for the exact Gini (see q_agg_gini_concentration).
GINI_RANK_BUCKETS = 64


@query(
    "agg_gini_concentration",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS i
      FROM events
    ),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(i AS DECIMAL(28,0))
                      * CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS siy
      FROM ranked GROUP BY event_type
    )
    SELECT event_type, n,
           round(2.0 * siy / (n * sy) - (n + 1.0) / n, 6) AS gini
    FROM s ORDER BY event_type
    """,
)
def q_agg_gini_concentration(spark, sf_dir: str) -> DataFrame:
    """Gini coefficient of the value distribution per event type —
    the inequality/concentration metric curation pipelines use to
    spot sources where a few items dominate the mass (G = 2·Σi·yᵢ /
    (n·Σy) − (n+1)/n over values ranked ascending).

    The ascending rank is a TWO-LEVEL prefix count (round 9, the
    weighted-quantile design): rows bucket by value range — the
    bucket function is monotone in value, so bucket order IS value
    order and equal values share a bucket — rank within
    (type, bucket), then add the bucket's cumulative row-count offset
    from the bounded (types × GINI_RANK_BUCKETS) table. Bit-identical
    to a single type-partitioned window (which would run each type's
    entire value set through one task at 100 TB); ties on value
    ordered by event_id — the Σi·yᵢ term is invariant under
    permutations of equal values, so the tie-break affects nothing
    but determinism of the plan itself. Then a |types|-row moment
    aggregation with DECIMAL sums."""
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    bounds = ev.groupBy("event_type").agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    bucket = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.least(
            F.lit(GINI_RANK_BUCKETS - 1),
            F.floor(
                (F.col("value") - F.col("mn"))
                * GINI_RANK_BUCKETS
                / (F.col("mx") - F.col("mn"))
            ),
        )
    )
    bucketed = ev.join(F.broadcast(bounds), "event_type").withColumn(
        "b", bucket.cast("int")
    )
    wb = Window.partitionBy("event_type", "b").orderBy("value", "event_id")
    within = bucketed.withColumn("ri", F.row_number().over(wb))
    woff = Window.partitionBy("event_type").orderBy("b")
    offs = (
        bucketed.groupBy("event_type", "b")
        .agg(F.count("*").alias("nb"))
        .withColumn(
            "off",
            F.coalesce(
                F.sum("nb").over(
                    woff.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0).cast("long"),
            ),
        )
        .select("event_type", "b", "off")
    )
    ranked = within.join(F.broadcast(offs), ["event_type", "b"]).select(
        "event_type",
        "value",
        (F.col("off") + F.col("ri")).alias("i"),
    )
    s = ranked.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("value").cast("decimal(28,10)")).cast("double").alias("sy"),
        F.sum(
            F.col("i").cast("decimal(28,0)") * F.col("value").cast("decimal(28,10)")
        )
        .cast("double")
        .alias("siy"),
    )
    return s.select(
        "event_type",
        "n",
        F.round(
            2.0 * F.col("siy") / (F.col("n") * F.col("sy"))
            - (F.col("n") + 1.0) / F.col("n"),
            6,
        ).alias("gini"),
    ).orderBy("event_type")


#: Conversion window for the time-boxed funnel (days).
CONV_WINDOW_DAYS = 3


@query(
    "agg_funnel_windowed",
    oracle=f"""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts >= v.t
        AND e.ts < v.t + INTERVAL {CONV_WINDOW_DAYS} DAY
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.t
        AND e.ts < c.t + INTERVAL {CONV_WINDOW_DAYS} DAY
      GROUP BY e.user_id
    )
    SELECT * FROM (
      SELECT '1_view' AS step, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
      UNION ALL
      SELECT '2_click_within_window', CAST(COUNT(*) AS BIGINT) FROM c
      UNION ALL
      SELECT '3_purchase_within_window', CAST(COUNT(*) AS BIGINT) FROM p
    ) ORDER BY step
    """,
)
def q_agg_funnel_windowed(spark, sf_dir: str) -> DataFrame:
    """Time-boxed funnel: each step must occur within CONV_WINDOW_DAYS
    of the previous step's first occurrence, not merely after it — the
    'conversion window' semantics every product-analytics tool applies
    (an unbounded funnel credits conversions that took months). Same
    all-user_id-keyed plan as `agg_funnel_conversion`: the window
    bound is one more filter inside each co-partitioned stage join —
    zero extra shuffles. The bound compares exact timestamps (integer
    microseconds under the hood), so window-edge events cannot flip
    between engines."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    window_us = CONV_WINDOW_DAYS * 86400 * 1000000

    def first_within(prev: DataFrame, etype: str) -> DataFrame:
        e = ev.filter(F.col("event_type") == etype)
        return (
            e.join(prev, "user_id")
            .filter(
                (F.col("ts") >= F.col("t"))
                & (F.unix_micros("ts") < F.unix_micros("t") + window_us)
            )
            .groupBy("user_id")
            .agg(F.min("ts").alias("t2"))
            .withColumnRenamed("t2", "t")
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )
    c = first_within(v, "click")
    p = first_within(c, "purchase")

    def step(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count("*").cast("long").alias("n_users")).select(
            F.lit(label).alias("step"), "n_users"
        )

    return (
        step(v, "1_view")
        .unionByName(step(c, "2_click_within_window"))
        .unionByName(step(p, "3_purchase_within_window"))
        .orderBy("step")
    )


@query(
    "agg_cohort_ltv",
    oracle="""
    WITH firstseen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
      FROM events GROUP BY user_id
    ),
    wk AS (
      SELECT f.cohort_date,
             CAST(date_diff('day', f.cohort_date, CAST(e.ts AS DATE)) // 7
                  AS BIGINT) AS week_offset,
             SUM(CASE WHEN e.event_type = 'purchase'
                      THEN CAST(e.value AS DECIMAL(18,6)) END) AS rev
      FROM events e JOIN firstseen f ON e.user_id = f.user_id
      GROUP BY 1, 2
    )
    SELECT cohort_date, week_offset,
           round(CAST(COALESCE(rev, 0) AS DOUBLE), 6) AS week_rev_r6,
           round(CAST(SUM(COALESCE(rev, 0)) OVER (
                    PARTITION BY cohort_date ORDER BY week_offset
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE), 6) AS cum_ltv_r6
    FROM wk ORDER BY cohort_date, week_offset
    """,
)
def q_agg_cohort_ltv(spark, sf_dir: str) -> DataFrame:
    """Cohort lifetime value: purchase revenue per (first-seen cohort,
    week offset) and its running cumulative — the LTV curve that turns
    the retention triangle into money. Same user_id-keyed two-shuffle
    shape as `agg_retention_cohort`; the cumulative window runs over
    the BOUNDED (cohorts × weeks) rollup, and revenue stays in exact
    DECIMAL through the running sum (a double running sum would
    diverge between Spark's sequential and DuckDB's segment-tree
    evaluation), cast to double only at output."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("ts").cast("date").alias("day"),
        F.col("value").cast("decimal(18,6)").alias("v_dec"),
    )
    firstseen = ev.groupBy("user_id").agg(F.min("day").alias("cohort_date"))
    wk = (
        ev.join(firstseen, "user_id")
        .groupBy(
            "cohort_date",
            (F.datediff(F.col("day"), F.col("cohort_date")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("v_dec"))
            ).alias("rev")
        )
    )
    rev0 = F.coalesce(F.col("rev"), F.lit(0).cast("decimal(18,6)"))
    wcum = (
        Window.partitionBy("cohort_date")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return wk.select(
        "cohort_date",
        "week_offset",
        F.round(rev0.cast("double"), 6).alias("week_rev_r6"),
        F.round(F.sum(rev0).over(wcum).cast("double"), 6).alias("cum_ltv_r6"),
    ).orderBy("cohort_date", "week_offset")


#: KMV sketch size (k minimum hash values per set).
KMV_K = 64

#: 60-bit hash space size as a double (hash/2^60 → uniform in [0,1)).
_KMV_SPACE = float(2**60)


@query(
    "agg_kmv_audience_sketch",
    oracle=f"""
    WITH ut AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM events
    ),
    sk AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk
      FROM ut QUALIFY rk <= {KMV_K}
    ),
    est AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS kk,
             MAX(h) AS hk
      FROM sk GROUP BY event_type
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM est a JOIN est b ON a.event_type < b.event_type
    ),
    merged AS (
      SELECT p.type_a, p.type_b, s.h,
             MAX(CASE WHEN s.event_type = p.type_a THEN 1 ELSE 0 END)
               AS in_a,
             MAX(CASE WHEN s.event_type = p.type_b THEN 1 ELSE 0 END)
               AS in_b
      FROM pairs p
      JOIN sk s ON s.event_type IN (p.type_a, p.type_b)
      GROUP BY p.type_a, p.type_b, s.h
    ),
    unionk AS (
      SELECT type_a, type_b, h, in_a, in_b,
             ROW_NUMBER() OVER (PARTITION BY type_a, type_b ORDER BY h)
               AS rk
      FROM merged QUALIFY rk <= {KMV_K}
    ),
    ustats AS (
      SELECT type_a, type_b,
             CAST(COUNT(*) AS BIGINT) AS uk,
             MAX(h) AS uhk,
             CAST(SUM(in_a * in_b) AS BIGINT) AS n_both
      FROM unionk GROUP BY type_a, type_b
    )
    SELECT u.type_a, u.type_b,
           round(CASE WHEN ea.kk < {KMV_K} THEN CAST(ea.kk AS DOUBLE)
                 ELSE ({KMV_K} - 1) * {_KMV_SPACE} / ea.hk END, 6)
             AS est_a,
           round(CASE WHEN eb.kk < {KMV_K} THEN CAST(eb.kk AS DOUBLE)
                 ELSE ({KMV_K} - 1) * {_KMV_SPACE} / eb.hk END, 6)
             AS est_b,
           round(CASE WHEN u.uk < {KMV_K} THEN CAST(u.uk AS DOUBLE)
                 ELSE ({KMV_K} - 1) * {_KMV_SPACE} / u.uhk END, 6)
             AS est_union,
           round(CAST(u.n_both AS DOUBLE) / u.uk, 6) AS jaccard_kmv
    FROM ustats u
    JOIN est ea ON ea.event_type = u.type_a
    JOIN est eb ON eb.event_type = u.type_b
    ORDER BY u.type_a, u.type_b
    """,
    tags=("sketch", "events", "beyond"),
)
def q_agg_kmv_audience_sketch(spark, sf_dir: str) -> DataFrame:
    """Audience set algebra on K-MINIMUM-VALUES sketches (the
    theta-sketch family; Bar-Yossef et al. 2002, Beyer et al. 2007) —
    the promised scale swap for `agg_audience_overlap`: per-type
    distinct-user estimates, pairwise union estimates and KMV-Jaccard
    WITHOUT any user-level pair join. Each type keeps only its KMV_K
    smallest user-id hashes; merging two sketches = k smallest of the
    union of two k-row sets; |A∩B estimates flow from the classic
    (k-1)/u_(k) estimator and the union-k co-membership count.

    Why KMV and not HLL here: the sketch CONTENT is just min-hashes,
    so DuckDB replays every estimate bit-for-bit (md5-portable
    60-bit hashes, integer ranks, one double division round-6) —
    unlike HLL whose register layout is engine-private
    (`agg_approx_count_distinct` handles that case as a bounds
    contract instead).

    Scale shape: one distinct (type, user-hash) pass, then a
    type-PARTITIONED rank window cut at k — everything downstream
    (pair frame, merged sketches, estimates) operates on k-row
    sketches, |types|²·k rows total, broadcastable. Exactly how a
    100 TB deployment answers overlap queries: sketches are tiny,
    mergeable, and the raw corpus is touched once. Small sets
    (|set| < k) estimate EXACTLY (the sketch IS the set) on both
    engines."""
    from job_market_research_spark.ml.neardup import portable_hash60

    ut = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            portable_hash60(F.col("user_id").cast("string")).alias("h"),
        )
        .distinct()
    )
    wk = Window.partitionBy("event_type").orderBy("h")
    sk = (
        ut.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= KMV_K)
        .select("event_type", "h")
    )
    est = sk.groupBy("event_type").agg(
        F.count("*").cast("long").alias("kk"), F.max("h").alias("hk")
    )
    pairs = est.select(F.col("event_type").alias("type_a")).join(
        est.select(F.col("event_type").alias("type_b")),
        F.col("type_a") < F.col("type_b"),
    )
    merged = (
        F.broadcast(pairs)
        .join(
            sk,
            (F.col("event_type") == F.col("type_a"))
            | (F.col("event_type") == F.col("type_b")),
        )
        .groupBy("type_a", "type_b", "h")
        .agg(
            F.max(
                F.when(F.col("event_type") == F.col("type_a"), 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("event_type") == F.col("type_b"), 1).otherwise(0)
            ).alias("in_b"),
        )
    )
    wu = Window.partitionBy("type_a", "type_b").orderBy("h")
    unionk = merged.withColumn("rk", F.row_number().over(wu)).filter(
        F.col("rk") <= KMV_K
    )
    ustats = unionk.groupBy("type_a", "type_b").agg(
        F.count("*").cast("long").alias("uk"),
        F.max("h").alias("uhk"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_both"),
    )

    def kmv_est(kk, hk):
        return F.round(
            F.when(kk < KMV_K, kk.cast("double")).otherwise(
                (KMV_K - 1) * F.lit(_KMV_SPACE) / hk
            ),
            6,
        )

    ea = est.select(
        F.col("event_type").alias("type_a"),
        F.col("kk").alias("kka"),
        F.col("hk").alias("hka"),
    )
    eb = est.select(
        F.col("event_type").alias("type_b"),
        F.col("kk").alias("kkb"),
        F.col("hk").alias("hkb"),
    )
    return (
        ustats.join(F.broadcast(ea), "type_a")
        .join(F.broadcast(eb), "type_b")
        .select(
            "type_a",
            "type_b",
            kmv_est(F.col("kka"), F.col("hka")).alias("est_a"),
            kmv_est(F.col("kkb"), F.col("hkb")).alias("est_b"),
            kmv_est(F.col("uk"), F.col("uhk")).alias("est_union"),
            F.round(F.col("n_both").cast("double") / F.col("uk"), 6).alias(
                "jaccard_kmv"
            ),
        )
        .orderBy("type_a", "type_b")
    )


#: Shapley attribution: the fixed channel alphabet (bit positions) and
#: the conversion event. Production derives the map from a broadcast
#: channel dimension; n must stay small (coalitions = 2^n).
ATTR_CHANNELS = ("click", "error", "signup", "view")
ATTR_CONVERSION = "purchase"

#: s!·(n-1-s)! numerators for n=4 (denominator n! = 24), by |S|.
_SHAP_W = {0: 6, 1: 2, 2: 2, 3: 6}
_SHAP_DEN = 24

_BIT_SQL = " + ".join(
    f"MAX(CASE WHEN event_type = '{c}' THEN {1 << i} ELSE 0 END)"
    for i, c in enumerate(ATTR_CHANNELS)
)
_POPCNT_SQL = " + ".join(f"((S >> {i}) & 1)" for i in range(len(ATTR_CHANNELS)))
@query(
    "agg_shapley_attribution",
    oracle=f"""
    WITH um AS (
      SELECT user_id,
             {_BIT_SQL} AS mask,
             MAX(CASE WHEN event_type = '{ATTR_CONVERSION}' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    ),
    conv AS (
      SELECT mask, CAST(COUNT(*) AS BIGINT) AS n
      FROM um WHERE converted = 1 GROUP BY mask
    ),
    spine AS (SELECT g AS S FROM generate_series(0, {(1 << len(ATTR_CHANNELS)) - 1}) AS t(g)),
    v AS (
      SELECT s.S, CAST(COALESCE(SUM(c.n), 0) AS BIGINT) AS v
      FROM spine s LEFT JOIN conv c ON (c.mask & s.S) = c.mask
      GROUP BY s.S
    ),
    terms AS (
      SELECT ch.i, ch.name,
             (CASE WHEN ({_POPCNT_SQL.replace('S', 'vs.S')}) = 0 THEN 6
                   WHEN ({_POPCNT_SQL.replace('S', 'vs.S')}) = 1 THEN 2
                   WHEN ({_POPCNT_SQL.replace('S', 'vs.S')}) = 2 THEN 2
                   ELSE 6 END) * (vi.v - vs.v) AS t
      FROM (VALUES {", ".join(f"({i}, '{c}')" for i, c in enumerate(ATTR_CHANNELS))})
             AS ch(i, name)
      JOIN v vs ON (vs.S & (1 << ch.i)) = 0
      JOIN v vi ON vi.S = (vs.S | (1 << ch.i))
    )
    SELECT name AS channel,
           CAST(SUM(t) AS BIGINT) AS phi_scaled,
           round(CAST(SUM(t) AS DOUBLE) / {_SHAP_DEN}, 6) AS shapley_r6
    FROM terms GROUP BY name ORDER BY channel
    """,
    tags=("events", "attribution", "beyond"),
)
def q_agg_shapley_attribution(spark, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value conversion attribution (Shapley 1953;
    data-driven attribution à la Zhao et al. 2018): each converting
    user's touched-channel SET defines coalition data
    v(S) = conversions among users whose channel set ⊆ S, and each
    channel's credit is its exact Shapley value over the n=4 channel
    game — the attribution scheme that, unlike first/last-touch
    (`window_first_last_touch`), provably splits credit fairly
    (efficiency: Σφ_i = v(full) − v(∅), pinned in tests).

    EVERYTHING is integer arithmetic: user masks are bit-sums of
    distinct channel flags, v comes from a subset-containment join of
    the 16-row coalition spine against the ≤16-row exact-mask count
    table, and Shapley weights s!(n−1−s)!/n! are pre-scaled by
    n! = 24 so φ accumulates as exact integers (the single division
    happens once at output). The corpus collapses to one user-keyed
    aggregate in the first step; every later table is 2^n-bounded —
    at 100 TB this is one shuffle plus constant-size algebra,
    regardless of event volume."""
    ev = load(spark, sf_dir, "events")
    um = ev.groupBy("user_id").agg(
        sum(
            (
                F.max(
                    F.when(F.col("event_type") == c, F.lit(1 << i)).otherwise(0)
                )
                for i, c in enumerate(ATTR_CHANNELS)
            ),
            F.lit(0),
        ).alias("mask"),
        F.max(
            F.when(F.col("event_type") == ATTR_CONVERSION, 1).otherwise(0)
        ).alias("converted"),
    )
    conv = (
        um.filter(F.col("converted") == 1)
        .groupBy("mask")
        .agg(F.count("*").cast("long").alias("n"))
    )
    n_ch = len(ATTR_CHANNELS)
    spine = spark.range(1 << n_ch).select(F.col("id").cast("int").alias("S"))
    v = (
        spine.join(
            F.broadcast(conv),
            (F.col("mask").bitwiseAND(F.col("S")) == F.col("mask")),
            "left",
        )
        .groupBy("S")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("v"))
    )
    ch = spark.createDataFrame(
        [(i, c) for i, c in enumerate(ATTR_CHANNELS)], "i int, name string"
    )
    vs = v.select(F.col("S").alias("S0"), F.col("v").alias("v0"))
    vi = v.select(F.col("S").alias("S1"), F.col("v").alias("v1"))
    popcnt = sum(
        (F.shiftright(F.col("S0"), i).bitwiseAND(F.lit(1)) for i in range(n_ch)),
        F.lit(0),
    )
    w = (
        F.when(popcnt == 0, _SHAP_W[0])
        .when(popcnt == 1, _SHAP_W[1])
        .when(popcnt == 2, _SHAP_W[2])
        .otherwise(_SHAP_W[3])
    )
    terms = (
        F.broadcast(ch)
        .join(vs, F.col("S0").bitwiseAND(F.expr("shiftleft(1, i)")) == 0)
        .join(vi, F.col("S1") == F.col("S0").bitwiseOR(F.expr("shiftleft(1, i)")))
        .select("name", (w * (F.col("v1") - F.col("v0"))).alias("t"))
    )
    return (
        terms.groupBy(F.col("name").alias("channel"))
        .agg(
            F.sum("t").cast("long").alias("phi_scaled"),
            F.round(F.sum("t").cast("double") / _SHAP_DEN, 6).alias(
                "shapley_r6"
            ),
        )
        .orderBy("channel")
    )


#: Journey analysis: path prefix length and report size.
PATH_LEN = 3
PATH_TOP = 15


@query(
    "agg_user_path_topk",
    oracle=f"""
    WITH ranked AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rk
      FROM events
    ),
    paths AS (
      SELECT user_id,
             string_agg(event_type, ' > ' ORDER BY rk) AS path
      FROM ranked WHERE rk <= {PATH_LEN}
      GROUP BY user_id
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM paths GROUP BY path
    ORDER BY n_users DESC, path LIMIT {PATH_TOP}
    """,
    tags=("events", "beyond"),
)
def q_agg_user_path_topk(spark, sf_dir: str) -> DataFrame:
    """Top user journeys: each user's first {PATH_LEN} events (by
    time, event_id tie-break) folded into an ordered path string, then
    the most common paths — the "how do sessions actually start"
    question behind every onboarding-funnel redesign, and the raw
    input to the Markov transition model (`agg_event_transitions`
    models pairs; this surfaces whole prefixes).

    One user-keyed rank window + one user-keyed ordered string fold +
    a path-keyed count (map-side combinable; path vocabulary is
    \\|types\\|^{PATH_LEN}-bounded). Deterministic: the (ts, event_id)
    order is total, and the fold order is pinned on both engines."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    rk = F.row_number().over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
    )
    ranked = ev.select("user_id", "event_type", rk.alias("rk")).filter(
        F.col("rk") <= PATH_LEN
    )
    paths = ranked.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rk", "event_type"))),
                lambda s: s.event_type,
            ),
            " > ",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(PATH_TOP)
    )


@query(
    "agg_kaplan_meier",
    oracle="""
    WITH span AS (
      SELECT user_id,
             min(ts) AS first_ts,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS conv_ts
      FROM events GROUP BY user_id
    ),
    obs AS (SELECT max(ts) AS end_ts FROM events),
    durs AS (
      SELECT s.user_id,
             CASE WHEN s.conv_ts IS NOT NULL
                  THEN date_diff('day', s.first_ts, s.conv_ts)
                  ELSE date_diff('day', s.first_ts, o.end_ts) END AS t,
             (s.conv_ts IS NOT NULL) AS died
      FROM span s CROSS JOIN obs o
    ),
    n_total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM durs),
    death_times AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS d
      FROM durs WHERE died GROUP BY t
    ),
    risk AS (
      SELECT dt.t, dt.d,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM durs u
              WHERE u.t >= dt.t) AS n_risk
      FROM death_times dt
    ),
    surv AS (
      SELECT t, d, n_risk,
             CASE WHEN SUM(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
                       OVER (ORDER BY t) > 0 THEN 0.0
                  ELSE exp(CAST(SUM(CASE WHEN d < n_risk THEN
                       CAST(ln(1.0 - CAST(d AS DOUBLE) / n_risk)
                            AS DECIMAL(28,14)) END)
                       OVER (ORDER BY t) AS DOUBLE)) END AS s
      FROM risk
    )
    SELECT CAST(t AS BIGINT) AS t_days, d, n_risk, round(s, 6) AS survival_r6
    FROM surv ORDER BY t_days
    """,
    tags=("events", "stats", "beyond"),
)
def q_agg_kaplan_meier(spark, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimate (Kaplan & Meier 1958) of
    time-to-conversion: per user, days from first event to first
    purchase (event) or to the end of observation (right-CENSORED —
    the reason the naive conversion-rate-by-day curve is biased and KM
    exists), then Ŝ(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) over the distinct event
    times. The churn/retention analysis every subscription business
    runs; genuinely non-telescoping because censoring shrinks the risk
    set independently of deaths.

    Scale shape: the corpus collapses to one row per user (first/conv
    timestamps), the observation end rides a broadcast 1-row agg, and
    all KM algebra runs on the DISTINCT-death-day table (bounded by
    the observation window, ≤ a few hundred rows — its cumulative
    window is allowlisted). The risk-set count joins the bounded death
    table against the per-user durations on an inequality — at the
    bounded size that is a broadcast-range probe, not a shuffle.
    Factors are rational (integer d/n); the running product is the
    ln-sum in exact DECIMAL (order-free) exponentiated once, round-6."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    span = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "conv_ts"
        ),
    )
    obs = ev.agg(F.max("ts").alias("end_ts"))
    durs = span.crossJoin(F.broadcast(obs)).select(
        F.when(
            F.col("conv_ts").isNotNull(),
            F.datediff("conv_ts", "first_ts"),
        )
        .otherwise(F.datediff("end_ts", "first_ts"))
        .alias("t"),
        F.col("conv_ts").isNotNull().alias("died"),
    )
    death_times = (
        durs.filter("died").groupBy("t").agg(F.count("*").alias("d"))
    )
    risk = (
        F.broadcast(death_times)
        .join(durs.select(F.col("t").alias("ut")), F.col("ut") >= F.col("t"))
        .groupBy("t", "d")
        .agg(F.count("*").cast("long").alias("n_risk"))
    )
    w = Window.orderBy("t")
    # A time where d == n_risk empties the risk set: survival is 0
    # from there on (and ln(0) must never be evaluated).
    dead = F.sum(
        F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
    ).over(w)
    ln_sum = F.sum(
        F.when(
            F.col("d") < F.col("n_risk"),
            F.log(1.0 - F.col("d").cast("double") / F.col("n_risk")).cast(
                "decimal(28,14)"
            ),
        )
    ).over(w)
    surv = risk.withColumn(
        "s",
        F.when(dead > 0, F.lit(0.0)).otherwise(F.exp(ln_sum.cast("double"))),
    )
    return surv.select(
        F.col("t").cast("long").alias("t_days"),
        "d",
        "n_risk",
        F.round("s", 6).alias("survival_r6"),
    ).orderBy("t_days")


#: Poisson bootstrap: replicate count, CI rank cut (2.5%/97.5% of 64),
#: and the exact Poisson(1) CDF thresholds (identical literals on both
#: engines — the draw is a pure function of (event_id, replicate)).
BOOT_B = 64
BOOT_LO_RK = 2
BOOT_HI_RK = 63
_BOOT_CDF = (0.367879441, 0.735758882, 0.919698603, 0.981011843, 0.996340153)

#: The CDF translated onto the 15-bit integer lattice: with
#: u = (li + 0.5)/32768, u < c  ⟺  li ≤ floor(32768·c − 0.5) — the
#: draw becomes five INTEGER compares per row, no double math at all.
_BOOT_T = tuple(int(math.floor(32768 * c - 0.5)) for c in _BOOT_CDF)

_BOOT_W_SQL = (
    "CASE WHEN li <= {t0} THEN 0 WHEN li <= {t1} THEN 1 WHEN li <= {t2} "
    "THEN 2 WHEN li <= {t3} THEN 3 WHEN li <= {t4} THEN 4 ELSE 5 END"
).format(
    t0=_BOOT_T[0], t1=_BOOT_T[1], t2=_BOOT_T[2], t3=_BOOT_T[3], t4=_BOOT_T[4]
)


@query(
    "stat_poisson_bootstrap_ci",
    oracle=f"""
    WITH hashed AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c, g,
             CAST(('0x' || substr(md5('boot#' || CAST(event_id AS VARCHAR)
                 || '#' || CAST(g AS VARCHAR)), 1, 15)) AS BIGINT) AS h60
      FROM events, unnest(range(0, {BOOT_B // 4})) AS t(g)
    ),
    drawn AS (
      SELECT event_type, c, g * 4 + lane AS b,
             (h60 >> CAST(15 * lane AS INT)) & 32767 AS li
      FROM hashed, unnest(range(0, 4)) AS t2(lane)
    ),
    weighted AS (
      SELECT event_type, b, {_BOOT_W_SQL} AS w, c FROM drawn
    ),
    reps AS (
      SELECT event_type, b,
             CAST(SUM(w * c) AS DOUBLE) / 100 / SUM(w) AS mean_b
      FROM weighted GROUP BY event_type, b HAVING SUM(w) > 0
    ),
    ranked AS (
      SELECT event_type, mean_b,
             ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY mean_b, b) AS rk
      FROM reps
    ),
    base AS (
      SELECT event_type,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
               / 100 / COUNT(*) AS mean_v
      FROM events GROUP BY event_type
    )
    SELECT b.event_type, round(b.mean_v, 6) AS mean_r6,
           round(MAX(CASE WHEN r.rk = {BOOT_LO_RK} THEN r.mean_b END), 6)
             AS ci_lo_r6,
           round(MAX(CASE WHEN r.rk = {BOOT_HI_RK} THEN r.mean_b END), 6)
             AS ci_hi_r6
    FROM base b JOIN ranked r USING (event_type)
    GROUP BY b.event_type, b.mean_v
    ORDER BY b.event_type
    """,
    tags=("stats", "beyond"),
)
def q_stat_poisson_bootstrap_ci(spark, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for the per-type mean
    value (the streaming/MapReduce bootstrap of Chamandy et al. 2012:
    resampling-with-replacement replaced by independent Poisson(1)
    row weights, which needs NO global sample size and parallelizes
    embarrassingly). {BOOT_B} replicates; the 2nd/63rd ranked
    replicate means bound the ≈95% interval.

    Every draw is a pure hash function of (event_id, replicate) via
    the exact Poisson(1) CDF literals — retries, partitioning and
    engines all see identical weights (the same seeded-inverse-CDF
    discipline as `privacy_dp_count_release`). One md5 feeds FOUR
    replicates: the 60-bit portable hash splits into four independent
    15-bit lanes by integer shift/mask, and the Poisson CDF is
    pre-translated onto the integer lattice (_BOOT_T), so the per-row
    fan-out work is a shift, a mask and five integer compares — no
    fresh md5, no double math. The 15-bit lattice quantizes the CDF at
    3e-5 — two orders below the smallest threshold gap.

    Round 6 removed the second (lane) explode AND the decimal tower:
    the four lanes of each md5 aggregate as four WIDE column pairs
    under a (type, g) grouping — rows flowing through explode +
    hash-agg drop 4× (64× → 16× fan-out) — and, since `value` is a
    2-dp price (the testdata doubles sit within 4e-12 of an integer
    number of cents), the weighted sums run in exact LONG cents
    instead of DECIMAL(38,10) (decimal hash-agg measured 2.2× the
    long-sum cost at sf0.1). Division back to a mean is the same
    IEEE double op sequence (S → double, /100, /n) on both engines,
    so results stay bit-identical. The `base` mean also folds into
    the SAME scan as a g=0-conditional sum (each replicate group sees
    every event exactly once), deleting the separate corpus read
    (9.6 s → 5.8 s → 2.6 s warm at sf0.1). Long-cents overflow bound:
    |cents| ≤ ~5.6e4 here and weights ≤ 5, so a per-(type, g) group
    stays exact up to ~3e13 rows; at 100 TB with wider values switch
    the two sum columns back to DECIMAL — the plan shape is unchanged.
    The rank window is type-keyed over a B-bounded table. One fan-out
    scan (rows × B/4 — at 100 TB pick B by budget and fan out via the
    same explode, still one shuffle of (type, g) partials)."""
    from pyspark.sql.window import Window

    from job_market_research_spark.ml.neardup import portable_hash60

    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    hashed = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("c"),
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_B // 4 - 1))).alias("g"),
        "event_id",
    ).select(
        "event_type",
        "c",
        "g",
        portable_hash60(
            F.concat(
                F.lit("boot#"),
                F.col("event_id").cast("string"),
                F.lit("#"),
                F.col("g").cast("string"),
            )
        ).alias("h60"),
    )

    def lane_w(lane: int):
        li = F.expr(f"shiftright(h60, {15 * lane}) & 32767L")
        return (
            F.when(li <= _BOOT_T[0], 0)
            .when(li <= _BOOT_T[1], 1)
            .when(li <= _BOOT_T[2], 2)
            .when(li <= _BOOT_T[3], 3)
            .when(li <= _BOOT_T[4], 4)
            .otherwise(5)
        )

    lane_aggs = []
    for lane in range(4):
        w = lane_w(lane)
        lane_aggs.append(F.sum(w * F.col("c")).alias(f"wv{lane}"))
        lane_aggs.append(F.sum(w).alias(f"ws{lane}"))
    aggd = hashed.groupBy("event_type", "g").agg(
        *lane_aggs,
        # base-mean partials, paid only in the g=0 groups: every
        # replicate group contains each event of its type exactly once.
        F.sum(F.when(F.col("g") == 0, F.col("c"))).alias("vsum0"),
        F.count(F.when(F.col("g") == 0, F.lit(1))).alias("vn0"),
    )
    # Both the replicate table and the base mean branch off this
    # (types × B/4)-bounded frame; without a lineage cut each branch
    # would recompute the whole 16× md5 fan-out scan (plan-verified).
    # Lazy local checkpoint materializes the 80-row frame once.
    aggd = aggd.localCheckpoint(eager=False)
    lanes = F.array(
        *[
            F.struct(
                F.lit(lane).alias("lane"),
                F.col(f"wv{lane}").alias("wv"),
                F.col(f"ws{lane}").alias("ws"),
            )
            for lane in range(4)
        ]
    )
    reps = (
        aggd.select(
            "event_type", "g", F.explode(lanes).alias("lw")
        )
        .select(
            "event_type",
            (F.col("g") * 4 + F.col("lw.lane")).alias("b"),
            (
                F.col("lw.wv").cast("double") / F.lit(100) / F.col("lw.ws")
            ).alias("mean_b"),
            F.col("lw.ws").alias("wsum"),
        )
        .filter(F.col("wsum") > 0)
        .drop("wsum")
    )
    rk = F.row_number().over(
        Window.partitionBy("event_type").orderBy("mean_b", "b")
    )
    ranked = reps.withColumn("rk", rk)
    base = (
        aggd.filter(F.col("g") == 0)
        .select(
            "event_type",
            (
                F.col("vsum0").cast("double") / F.lit(100) / F.col("vn0")
            ).alias("mean_v"),
        )
    )
    return (
        base.join(ranked, "event_type")
        .groupBy("event_type", "mean_v")
        .agg(
            F.round(
                F.max(F.when(F.col("rk") == BOOT_LO_RK, F.col("mean_b"))), 6
            ).alias("ci_lo_r6"),
            F.round(
                F.max(F.when(F.col("rk") == BOOT_HI_RK, F.col("mean_b"))), 6
            ).alias("ci_hi_r6"),
        )
        .select(
            "event_type",
            F.round("mean_v", 6).alias("mean_r6"),
            "ci_lo_r6",
            "ci_hi_r6",
        )
        .orderBy("event_type")
    )


#: Stationary-distribution power-iteration rounds.
MARKOV_ROUNDS = 3

_MARKOV_BASE_SQL = """
    seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    trans AS (
      SELECT prev_type, event_type AS next_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    ),
    p AS (
      SELECT t.prev_type, t.next_type,
             CAST(t.n AS DOUBLE) / s.n_out AS p
      FROM trans t
      JOIN (SELECT prev_type, CAST(SUM(n) AS BIGINT) AS n_out
            FROM trans GROUP BY 1) s USING (prev_type)
    ),
    states AS (SELECT DISTINCT prev_type AS st FROM trans),
    pi0 AS (
      SELECT st, 1.0 / (SELECT COUNT(*) FROM states) AS pi FROM states
    )"""


def _markov_oracle(rounds: int = MARKOV_ROUNDS) -> str:
    parts = ["    WITH" + _MARKOV_BASE_SQL]
    for t in range(1, rounds + 1):
        parts.append(
            f""",
    pi{t} AS (
      SELECT p.next_type AS st,
             CAST(SUM(CAST(prev.pi * p.p AS DECIMAL(28,14))) AS DOUBLE)
               AS pi
      FROM p JOIN pi{t - 1} prev ON prev.st = p.prev_type
      GROUP BY p.next_type
    )"""
        )
    parts.append(
        f"""
    SELECT st AS event_type, round(pi, 9) AS pi_r9
    FROM pi{rounds} ORDER BY st"""
    )
    return "".join(parts)


@query("agg_markov_stationary", oracle=_markov_oracle())
def q_agg_markov_stationary(spark, sf_dir: str) -> DataFrame:
    """Where user flows settle: {MARKOV_ROUNDS} power-iteration rounds
    of π ← πP over the empirical transition matrix from
    `agg_event_transitions` — the stationary occupancy that says which
    event types dominate the long-run journey (same algebra as
    PageRank without damping, on the |types|-state chain).

    After the single user-keyed lag window, EVERYTHING is bounded:
    the matrix is |types|² rows, each iteration a |types|²-row join +
    decimal-summed aggregation. At 100 TB the transition counting is
    the only corpus-sized work — the chain algebra is constant-size
    and could run on the driver; keeping it relational keeps the whole
    plan one lazy DAG and the oracle replayable.

    The |types|² transition table is staged (r14): it is consumed by
    every unrolled power-iteration round plus the row-normalizer and
    the state list, and Catalyst re-derives shared subtrees per
    consumer — the unstaged plan re-ran the corpus scan AND the
    user-keyed lag window 8 times (census 8 scans / 31 exchanges;
    staged: 1 scan, the lineage-collapse discipline of
    graph_hits/kcore)."""
    from job_market_research_spark.staging import staged_frame

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    trans = staged_frame(spark, "markov_trans", sf_dir,
        lambda: seq.groupBy(
            "prev_type", F.col("event_type").alias("next_type")
        ).agg(F.count("*").alias("n")),
    )
    tot = trans.groupBy("prev_type").agg(F.sum("n").alias("n_out"))
    p = trans.join(F.broadcast(tot), "prev_type").select(
        "prev_type",
        "next_type",
        (F.col("n").cast("double") / F.col("n_out")).alias("p"),
    )
    states = trans.select(F.col("prev_type").alias("st")).distinct()
    n_states = states.agg(F.count("*").alias("ns"))
    pi = states.crossJoin(F.broadcast(n_states)).select(
        "st", (F.lit(1.0) / F.col("ns")).alias("pi")
    )
    for _ in range(MARKOV_ROUNDS):
        pi = (
            p.join(
                F.broadcast(pi.withColumnRenamed("st", "prev_type")),
                "prev_type",
            )
            .groupBy(F.col("next_type").alias("st"))
            .agg(
                F.sum(
                    (F.col("pi") * F.col("p")).cast("decimal(28,14)")
                )
                .cast("double")
                .alias("pi")
            )
        )
    return pi.select(
        F.col("st").alias("event_type"), F.round("pi", 9).alias("pi_r9")
    ).orderBy("event_type")


#: MAU trailing window (days) for the stickiness ratio.
MAU_DAYS = 28


@query(
    "window_dau_mau_stickiness",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    days AS (SELECT DISTINCT day FROM ud),
    dau AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day
    ),
    mau AS (
      SELECT w.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS mau
      FROM days w
      JOIN ud u ON u.day BETWEEN w.day - {MAU_DAYS - 1} AND w.day
      GROUP BY w.day
    )
    SELECT dau.day, dau.dau, mau.mau,
           round(CAST(dau.dau AS DOUBLE) / mau.mau, 6) AS stickiness_r6
    FROM dau JOIN mau USING (day)
    ORDER BY day
    """,
)
def q_window_dau_mau_stickiness(spark, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per day — the product-analytics engagement
    KPI (what share of the trailing-{MAU_DAYS}-day actives showed up
    today; ~50% is a daily habit, ~3% is a monthly chore). DAU is a
    per-day distinct; MAU uses the membership-inversion shape from
    agg_sliding_distinct_users (each distinct (user, day) explodes
    into the ≤{MAU_DAYS} window-days it supports — COUNT(DISTINCT)
    doesn't decompose over sliding windows, re-scanning per window
    does not scale, the inversion is linear with bounded fan-out).

    Counts are exact integers; stickiness is one division rounded 6.

    Scale: shuffle volume {MAU_DAYS}×|user-days|; at 100 TB swap the
    exact distinct for the HLL sketch per window-day, same plan."""
    ud = (
        load(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    dau = ud.groupBy("day").agg(F.count("*").cast("long").alias("dau"))
    days = ud.select(F.col("day").alias("wday")).distinct()
    exploded = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), MAU_DAYS - 1))
        ).alias("wday"),
    )
    mau = (
        exploded.join(days, "wday")
        .groupBy(F.col("wday").alias("day"))
        .agg(F.count_distinct("user_id").cast("long").alias("mau"))
    )
    return (
        dau.join(mau, "day")
        .select(
            "day",
            "dau",
            "mau",
            F.round(F.col("dau").cast("double") / F.col("mau"), 6).alias(
                "stickiness_r6"
            ),
        )
        .orderBy("day")
    )


@query(
    "agg_growth_accounting",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    first_ AS (
      SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY user_id
    ),
    lagged AS (
      SELECT u.user_id, u.day, f.first_day,
             LAG(u.day) OVER (PARTITION BY u.user_id ORDER BY u.day)
               AS prev_day
      FROM ud u JOIN first_ f USING (user_id)
    ),
    classified AS (
      SELECT day,
             CASE WHEN day = first_day THEN 'new'
                  WHEN prev_day = day - 1 THEN 'retained'
                  ELSE 'resurrected' END AS kind
      FROM lagged
    ),
    active AS (
      SELECT day,
             CAST(SUM(CASE WHEN kind = 'new' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new,
             CAST(SUM(CASE WHEN kind = 'retained' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_retained,
             CAST(SUM(CASE WHEN kind = 'resurrected' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_resurrected
      FROM classified GROUP BY day
    ),
    churn AS (
      SELECT a.day + 1 AS day, CAST(COUNT(*) AS BIGINT) AS n_churned
      FROM ud a
      LEFT JOIN ud b ON b.user_id = a.user_id AND b.day = a.day + 1
      WHERE b.user_id IS NULL
      GROUP BY a.day + 1
    )
    SELECT active.day, n_new, n_retained, n_resurrected,
           CAST(COALESCE(churn.n_churned, 0) AS BIGINT) AS n_churned,
           round(CASE WHEN COALESCE(churn.n_churned, 0) > 0
                 THEN CAST(n_new + n_resurrected AS DOUBLE)
                      / churn.n_churned END, 6) AS quick_ratio_r6
    FROM active LEFT JOIN churn USING (day)
    ORDER BY active.day
    """,
)
def q_agg_growth_accounting(spark, sf_dir: str) -> DataFrame:
    """Daily growth accounting — every active user classified as NEW
    (first day ever), RETAINED (also active yesterday), or
    RESURRECTED (returning after a gap), plus yesterday's actives who
    did NOT return counted as CHURNED into today; quick ratio =
    (new + resurrected) / churned, the one-number 'is this product
    filling the bucket faster than it leaks' readout (NULL when
    nothing churned). The standard growth-team decomposition that
    cohort retention matrices (agg_retention_cohort) are too coarse
    for.

    All classes are exact integer counts off the distinct (user, day)
    grid: the new/retained/resurrected split uses a USER-partitioned
    lag (no global window), churn is an anti-join against tomorrow.

    Scale: one distinct on (user, day), one user-keyed window, one
    self-anti-join on (user, day+1) — all hash-partitioned on user or
    (user, day); report is |days| rows."""
    ud = (
        load(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    first_ = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    lagged = ud.join(first_, "user_id").select(
        "day",
        "first_day",
        F.lag("day")
        .over(Window.partitionBy("user_id").orderBy("day"))
        .alias("prev_day"),
    )
    classified = lagged.select(
        "day",
        F.when(F.col("day") == F.col("first_day"), "new")
        .when(F.col("prev_day") == F.date_sub("day", 1), "retained")
        .otherwise("resurrected")
        .alias("kind"),
    )
    active = classified.groupBy("day").agg(
        F.sum(F.when(F.col("kind") == "new", 1).otherwise(0))
        .cast("long")
        .alias("n_new"),
        F.sum(F.when(F.col("kind") == "retained", 1).otherwise(0))
        .cast("long")
        .alias("n_retained"),
        F.sum(F.when(F.col("kind") == "resurrected", 1).otherwise(0))
        .cast("long")
        .alias("n_resurrected"),
    )
    tomorrow = ud.select(
        "user_id", F.date_sub("day", 1).alias("day")
    )
    churn = (
        ud.join(tomorrow, ["user_id", "day"], "left_anti")
        .groupBy(F.date_add("day", 1).alias("day"))
        .agg(F.count("*").cast("long").alias("n_churned"))
    )
    return (
        active.join(churn, "day", "left")
        .select(
            "day",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce("n_churned", F.lit(0)).cast("long").alias("n_churned"),
            F.round(
                F.when(
                    F.coalesce("n_churned", F.lit(0)) > 0,
                    (F.col("n_new") + F.col("n_resurrected")).cast("double")
                    / F.col("n_churned"),
                ),
                6,
            ).alias("quick_ratio_r6"),
        )
        .orderBy("day")
    )


@query(
    "agg_attribution_position",
    oracle=f"""
    WITH conv AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type = '{ATTR_CONVERSION}'
    ),
    touches AS (
      SELECT e.user_id, e.event_type AS channel,
             ROW_NUMBER() OVER (PARTITION BY e.user_id
                                ORDER BY e.ts, e.event_id) AS rn,
             COUNT(*) OVER (PARTITION BY e.user_id) AS n
      FROM events e JOIN conv USING (user_id)
      WHERE e.event_type <> '{ATTR_CONVERSION}'
    ),
    credited AS (
      SELECT channel,
             CAST(round(CASE
               WHEN n = 1 THEN 1.0
               WHEN n = 2 THEN 0.5
               WHEN rn = 1 OR rn = n THEN 0.4
               ELSE 0.2 / (n - 2) END, 9) AS DECIMAL(28,9)) AS credit
      FROM touches
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_conv FROM conv)
    SELECT c.channel,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           round(CAST(SUM(c.credit) AS DOUBLE) / t.n_conv, 6)
             AS credit_share_r6
    FROM credited c CROSS JOIN tot t
    GROUP BY c.channel, t.n_conv ORDER BY channel
    """,
    tags=("attribution", "beyond"),
)
def q_agg_attribution_position(spark, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped, 40/20/40) attribution: each
    converting user's non-conversion touches are ordered by time,
    first and last touch earn 40% of the conversion credit each, the
    middle touches split the remaining 20% — the marketing-standard
    compromise between first-touch and last-touch that the Shapley
    operator (agg_shapley_attribution) generalizes but that teams
    actually configure in practice. Reported as each channel's share
    of total conversions.

    Per-touch credits are exact-literal rationals (1, ½, 0.4) except
    the middle split, which is round-9 then DECIMAL-summed (order-free
    on both engines); the closing division normalizes by the exact
    converter count.

    Scale: one user-keyed window over the converting users' touch
    lists (hash-partitioned by user — no global window), one
    combinable channel aggregation."""
    ev = load(spark, sf_dir, "events")
    conv = (
        ev.filter(F.col("event_type") == ATTR_CONVERSION)
        .select("user_id")
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id")
    touches = (
        ev.join(conv, "user_id")
        .filter(F.col("event_type") != ATTR_CONVERSION)
        .select(
            F.col("event_type").alias("channel"),
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wn).alias("n"),
        )
    )
    credit = (
        F.when(F.col("n") == 1, 1.0)
        .when(F.col("n") == 2, 0.5)
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), 0.4)
        .otherwise(0.2 / (F.col("n") - 2))
    )
    credited = touches.select(
        "channel",
        F.round(credit, 9).cast("decimal(28,9)").alias("credit"),
    )
    tot = conv.agg(F.count("*").cast("long").alias("n_conv"))
    return (
        credited.crossJoin(F.broadcast(tot))
        .groupBy("channel", "n_conv")
        .agg(
            F.count("*").cast("long").alias("n_touches"),
            F.round(
                F.sum("credit").cast("double") / F.first("n_conv"), 6
            ).alias("credit_share_r6"),
        )
        .select("channel", "n_touches", "credit_share_r6")
        .orderBy("channel")
    )


#: chi-square(1) critical value at 5% (literal, the shared convention).
LOGRANK_CRIT = 3.841459


@query(
    "agg_logrank_test",
    oracle=f"""
    WITH span AS (
      SELECT user_id, user_id % 2 AS g,
             min(ts) AS first_ts,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS conv_ts
      FROM events GROUP BY user_id
    ),
    obs AS (SELECT max(ts) AS end_ts FROM events),
    durs AS (
      SELECT s.g,
             CASE WHEN s.conv_ts IS NOT NULL
                  THEN date_diff('day', s.first_ts, s.conv_ts)
                  ELSE date_diff('day', s.first_ts, o.end_ts) END AS t,
             CASE WHEN s.conv_ts IS NOT NULL THEN 1 ELSE 0 END AS died
      FROM span s CROSS JOIN obs o
    ),
    per_t AS (
      SELECT t,
             CAST(COUNT(*) AS BIGINT) AS enter_all,
             CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS enter_g1,
             CAST(SUM(died) AS BIGINT) AS d_all,
             CAST(SUM(CASE WHEN g = 1 THEN died ELSE 0 END) AS BIGINT)
               AS d_g1
      FROM durs GROUP BY t
    ),
    risk AS (
      SELECT t, d_all, d_g1,
             SUM(enter_all) OVER (ORDER BY t DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_all,
             SUM(enter_g1) OVER (ORDER BY t DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_g1
      FROM per_t
    ),
    terms AS (
      SELECT d_g1,
             CAST(round(d_all * (CAST(n_g1 AS DOUBLE) / n_all), 9)
                  AS DECIMAL(28,9)) AS e,
             CAST(round(CASE WHEN n_all > 1 THEN
               d_all * (CAST(n_g1 AS DOUBLE) / n_all)
               * (1 - CAST(n_g1 AS DOUBLE) / n_all)
               * (n_all - d_all) / (n_all - 1.0) ELSE 0 END, 9)
                  AS DECIMAL(28,9)) AS v
      FROM risk WHERE d_all > 0
    ),
    s AS (
      SELECT CAST(SUM(d_g1) AS BIGINT) AS o,
             CAST(SUM(e) AS DOUBLE) AS e,
             CAST(SUM(v) AS DOUBLE) AS v
      FROM terms
    )
    SELECT o AS observed_g1,
           round(e, 6) AS expected_g1_r6,
           round((o - e) * (o - e) / v, 6) AS chi2_r6,
           CASE WHEN (o - e) * (o - e) / v > {LOGRANK_CRIT}
                THEN 1 ELSE 0 END AS curves_differ_5pct
    FROM s
    """,
    tags=("stats", "survival", "beyond"),
)
def q_agg_logrank_test(spark, sf_dir: str) -> DataFrame:
    """Log-rank test between the two user cohorts' time-to-purchase
    survival curves — the significance verdict that pairs with
    agg_kaplan_meier's curves (KM shows the separation, log-rank says
    whether it's real): at each death day, observed group-1
    conversions vs the at-risk-proportional expectation, χ² = (O−E)²/V
    with the hypergeometric variance, against the literal χ²(1)
    critical value.

    At-risk counts come from a DESCENDING cumulative over the bounded
    per-day entry table — no correlated per-death re-scan of the
    cohort — and per-day E/V terms are fixed-shape doubles rounded 9
    then DECIMAL-summed (order-free); O is an exact integer.

    Scale: corpus → |users| span table → |days| per-day table;
    cumulative windows on that bounded table (allowlisted)."""
    ev = load(spark, sf_dir, "events")
    span = ev.groupBy("user_id").agg(
        (F.col("user_id") % 2).alias("g"),
        F.min("ts").alias("first_ts"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("conv_ts"),
    ).select(
        (F.col("user_id") % 2).alias("g"), "first_ts", "conv_ts"
    )
    obs = ev.agg(F.max("ts").alias("end_ts"))
    durs = span.crossJoin(F.broadcast(obs)).select(
        "g",
        F.when(
            F.col("conv_ts").isNotNull(),
            F.datediff("conv_ts", "first_ts"),
        )
        .otherwise(F.datediff("end_ts", "first_ts"))
        .alias("t"),
        F.when(F.col("conv_ts").isNotNull(), 1).otherwise(0).alias("died"),
    )
    per_t = durs.groupBy("t").agg(
        F.count("*").cast("long").alias("enter_all"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0))
        .cast("long")
        .alias("enter_g1"),
        F.sum("died").cast("long").alias("d_all"),
        F.sum(F.when(F.col("g") == 1, F.col("died")).otherwise(0))
        .cast("long")
        .alias("d_g1"),
    )
    w = Window.orderBy(F.desc("t")).rowsBetween(Window.unboundedPreceding, 0)
    risk = per_t.select(
        "d_all",
        "d_g1",
        F.sum("enter_all").over(w).alias("n_all"),
        F.sum("enter_g1").over(w).alias("n_g1"),
    ).filter(F.col("d_all") > 0)
    share = F.col("n_g1").cast("double") / F.col("n_all")
    terms = risk.select(
        "d_g1",
        F.round(F.col("d_all") * share, 9).cast("decimal(28,9)").alias("e"),
        F.round(
            F.when(
                F.col("n_all") > 1,
                F.col("d_all")
                * share
                * (1 - share)
                * (F.col("n_all") - F.col("d_all"))
                / (F.col("n_all") - 1.0),
            ).otherwise(0.0),
            9,
        )
        .cast("decimal(28,9)")
        .alias("v"),
    )
    s = terms.agg(
        F.sum("d_g1").cast("long").alias("o"),
        F.sum("e").cast("double").alias("e"),
        F.sum("v").cast("double").alias("v"),
    )
    chi2 = (F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("v")
    return s.select(
        F.col("o").alias("observed_g1"),
        F.round(F.col("e"), 6).alias("expected_g1_r6"),
        F.round(chi2, 6).alias("chi2_r6"),
        F.when(chi2 > LOGRANK_CRIT, 1).otherwise(0).alias(
            "curves_differ_5pct"
        ),
    )


#: DiD design: pre/post cut inside the events window, treatment by
#: portable user hash parity.
DID_CUT = "2024-01-16 00:00:00"


@query(
    "ml_cohort_did",
    oracle=f"""
    WITH tagged AS (
      SELECT CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                    1, 15)) AS BIGINT) % 2 = 1
                  THEN 'treat' ELSE 'ctrl' END AS grp,
             CASE WHEN ts >= TIMESTAMP '{DID_CUT}'
                  THEN 'post' ELSE 'pre' END AS period,
             value
      FROM events
    ),
    cells AS (
      SELECT grp, period,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(value AS DECIMAL(18,4))) AS s
      FROM tagged GROUP BY 1, 2
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN grp = 'treat' AND period = 'pre'  THEN n END) AS n_tp,
        MAX(CASE WHEN grp = 'treat' AND period = 'post' THEN n END) AS n_tq,
        MAX(CASE WHEN grp = 'ctrl'  AND period = 'pre'  THEN n END) AS n_cp,
        MAX(CASE WHEN grp = 'ctrl'  AND period = 'post' THEN n END) AS n_cq,
        CAST(MAX(CASE WHEN grp = 'treat' AND period = 'pre'  THEN s END)
             AS DOUBLE) AS s_tp,
        CAST(MAX(CASE WHEN grp = 'treat' AND period = 'post' THEN s END)
             AS DOUBLE) AS s_tq,
        CAST(MAX(CASE WHEN grp = 'ctrl'  AND period = 'pre'  THEN s END)
             AS DOUBLE) AS s_cp,
        CAST(MAX(CASE WHEN grp = 'ctrl'  AND period = 'post' THEN s END)
             AS DOUBLE) AS s_cq
      FROM cells
    )
    SELECT n_tp AS n_treat_pre, n_tq AS n_treat_post,
           n_cp AS n_ctrl_pre, n_cq AS n_ctrl_post,
           round(s_tp / n_tp, 6) AS mean_treat_pre_r6,
           round(s_tq / n_tq, 6) AS mean_treat_post_r6,
           round(s_cp / n_cp, 6) AS mean_ctrl_pre_r6,
           round(s_cq / n_cq, 6) AS mean_ctrl_post_r6,
           round((s_tq / n_tq - s_tp / n_tp)
                 - (s_cq / n_cq - s_cp / n_cp), 6) AS did_r6
    FROM wide
    """,
)
def q_ml_cohort_did(spark, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimator — the workhorse of
    staged-rollout measurement when randomized assignment is not per
    event: users hash into treated/control cohorts (deterministic,
    coordination-free, the same portable md5 parity every sampler
    here uses), the window splits pre/post at a pinned cut, and the
    effect is the treated group's mean-value change minus the control
    group's — differencing out both the cohort baseline and the
    shared time trend that a naive post-mean comparison conflates.

    Exactness: the only corpus pass is one aggregation onto 4 cells
    with exact DECIMAL value sums (order-independent partials); the
    four means and the DiD are double expressions over those exact
    sums, identical on both engines from identical inputs; rounding
    is display-only (the DiD derives from the UNROUNDED means).

    Scale: one map-side-combinable aggregation to 4 rows, then a
    4-row pivot — no joins, no windows, no second corpus touch. At
    100 TB the cut and the hash are pure row-local functions, so the
    plan is a single exact pass whatever the event volume."""
    from job_market_research_spark.ml.neardup import portable_hash60

    tagged = load(spark, sf_dir, "events").select(
        F.when(
            portable_hash60(F.col("user_id").cast("string")) % 2 == 1,
            F.lit("treat"),
        )
        .otherwise(F.lit("ctrl"))
        .alias("grp"),
        F.when(
            F.col("ts") >= F.lit(DID_CUT).cast("timestamp"), F.lit("post")
        )
        .otherwise(F.lit("pre"))
        .alias("period"),
        "value",
    )
    cells = tagged.groupBy("grp", "period").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("s"),
    )

    def cell(g: str, p: str, col: str):
        return F.max(
            F.when((F.col("grp") == g) & (F.col("period") == p), F.col(col))
        )

    wide = cells.agg(
        cell("treat", "pre", "n").alias("n_tp"),
        cell("treat", "post", "n").alias("n_tq"),
        cell("ctrl", "pre", "n").alias("n_cp"),
        cell("ctrl", "post", "n").alias("n_cq"),
        cell("treat", "pre", "s").cast("double").alias("s_tp"),
        cell("treat", "post", "s").cast("double").alias("s_tq"),
        cell("ctrl", "pre", "s").cast("double").alias("s_cp"),
        cell("ctrl", "post", "s").cast("double").alias("s_cq"),
    )
    m_tp = F.col("s_tp") / F.col("n_tp")
    m_tq = F.col("s_tq") / F.col("n_tq")
    m_cp = F.col("s_cp") / F.col("n_cp")
    m_cq = F.col("s_cq") / F.col("n_cq")
    return wide.select(
        F.col("n_tp").alias("n_treat_pre"),
        F.col("n_tq").alias("n_treat_post"),
        F.col("n_cp").alias("n_ctrl_pre"),
        F.col("n_cq").alias("n_ctrl_post"),
        F.round(m_tp, 6).alias("mean_treat_pre_r6"),
        F.round(m_tq, 6).alias("mean_treat_post_r6"),
        F.round(m_cp, 6).alias("mean_ctrl_pre_r6"),
        F.round(m_cq, 6).alias("mean_ctrl_post_r6"),
        F.round((m_tq - m_tp) - (m_cq - m_cp), 6).alias("did_r6"),
    )

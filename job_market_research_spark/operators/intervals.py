"""Interval analytics via boundary sweeps (beyond-reference).

The classic interval question — "how many sessions are open at once"
— is an O(n²) interval-overlap join done naively, and a LINEAR
prefix-sum over sorted +1/−1 boundaries done right. The catch at
scale: the prefix sum needs a global order, and a partitionBy-less
window funnels the corpus through one task (the exact plan shape the
star-schema rework removed).

`window_concurrency_sweep` implements the scale-correct two-level
form: boundaries bucket by calendar day, per-bucket delta totals
(a BOUNDED table — days of history) take a cumulative window, and the
running offset broadcasts back so each bucket computes its local
prefix sum independently. Associativity of addition makes the result
identical to the single-partition sweep — which is exactly what the
DuckDB oracle computes, so the equivalence is hash-proven, not
asserted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.operators.sessionize import sessionize
from job_market_research_spark.registry import query

#: Sweep bucket width: one calendar day of microseconds. Bounded by
#: history length, not corpus size (30 buckets on the testdata).
SWEEP_BUCKET_US = 86_400_000_000


@query(
    "window_concurrency_sweep",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                       > {30 * 60 * 1_000_000}
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id)
               AS session_idx,
             us
      FROM marked
    ),
    spans AS (
      SELECT user_id, session_idx, MIN(us) AS start_us, MAX(us) AS end_us
      FROM sess GROUP BY 1, 2
    ),
    bounds AS (
      SELECT start_us AS t, 1 AS delta, 0 AS is_end, user_id, session_idx
      FROM spans
      UNION ALL
      SELECT end_us AS t, -1 AS delta, 1 AS is_end, user_id, session_idx
      FROM spans
    ),
    swept AS (
      SELECT t, SUM(delta) OVER (
               ORDER BY t, is_end, user_id, session_idx) AS conc
      FROM bounds
    )
    SELECT CAST(t // {SWEEP_BUCKET_US} AS BIGINT) AS day_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_boundaries,
           CAST(MAX(conc) AS BIGINT) AS peak_concurrency
    FROM swept GROUP BY 1 ORDER BY 1
    """,
    tags=("interval", "window", "beyond"),
)
def q_window_concurrency_sweep(spark, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day via a bucketed boundary sweep.
    Sessions (30-min gap rule, reusing `sessionize`) emit +1/−1
    boundaries; concurrency is their running sum in global
    (t, end-flag, user, session) order — starts sort before ends at
    the same microsecond, so back-to-back sessions touching at t count
    as concurrent (inclusive-interval convention, same on both
    engines).

    Scale shape — the two-level prefix sum: (1) per-day-bucket delta
    totals aggregate map-side into a BOUNDED day table; (2) the
    cumulative offset window runs over that bounded table only
    (|days| rows — the allowlisted-bounded-window discipline);
    (3) offsets broadcast-join back and each bucket computes its local
    running sum under partitionBy(day) — the corpus-sized window is
    day-partitioned, never global. Addition's associativity makes
    this bit-identical to the oracle's single-ordered-window sweep,
    so the driver hash IS the equivalence proof."""
    events = load(spark, sf_dir, "events")
    spans = (
        sessionize(events)
        .groupBy("user_id", "session_idx")
        .agg(F.min("_us").alias("start_us"), F.max("_us").alias("end_us"))
    )
    bounds = spans.select(
        F.col("start_us").alias("t"),
        F.lit(1).alias("delta"),
        F.lit(0).alias("is_end"),
        "user_id",
        "session_idx",
    ).unionByName(
        spans.select(
            F.col("end_us").alias("t"),
            F.lit(-1).alias("delta"),
            F.lit(1).alias("is_end"),
            "user_id",
            "session_idx",
        )
    ).withColumn("day_bucket", (F.col("t") / SWEEP_BUCKET_US).cast("long"))
    # (1) bounded per-day totals; (2) cumulative offset over the day
    # table only (rows = days of history, not corpus size).
    day_tot = bounds.groupBy("day_bucket").agg(F.sum("delta").alias("d"))
    w_days = Window.orderBy("day_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = day_tot.select(
        "day_bucket", F.coalesce(F.sum("d").over(w_days), F.lit(0)).alias("off")
    )
    # (3) local prefix sums under partitionBy(day) + broadcast offset.
    w_in = (
        Window.partitionBy("day_bucket")
        .orderBy("t", "is_end", "user_id", "session_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    swept = bounds.join(F.broadcast(offsets), "day_bucket").select(
        "day_bucket",
        (F.col("off") + F.sum("delta").over(w_in)).alias("conc"),
    )
    return (
        swept.groupBy("day_bucket")
        .agg(
            F.count("*").cast("long").alias("n_boundaries"),
            F.max("conc").cast("long").alias("peak_concurrency"),
        )
        .orderBy("day_bucket")
    )


#: Bucket width for the bucketized interval-overlap join: one hour of
#: microseconds. Replication factor per interval = its span in hours
#: (≤ 24 here — both interval sets are day-scoped).
OVERLAP_BUCKET_US = 3_600_000_000


@query(
    "join_interval_overlap",
    oracle=f"""
    WITH a AS (
      SELECT user_id, epoch_us(ts) // {SWEEP_BUCKET_US} AS d,
             MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
      FROM events GROUP BY 1, 2
    ),
    b AS (
      SELECT event_type, epoch_us(ts) // {SWEEP_BUCKET_US} AS d,
             MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
      FROM events GROUP BY 1, 2
    ),
    pairs AS (
      SELECT b.event_type,
             least(a.hi, b.hi) - greatest(a.lo, b.lo) AS ov
      FROM a JOIN b ON a.d = b.d
      WHERE a.lo <= b.hi AND b.lo <= a.hi
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_overlaps,
           CAST(SUM(ov) AS BIGINT) AS total_overlap_us
    FROM pairs GROUP BY event_type ORDER BY event_type
    """,
    tags=("join", "intervals", "beyond"),
)
def q_join_interval_overlap(spark, sf_dir: str) -> DataFrame:
    """BIG×BIG interval-overlap join, bucketized to equi — the shape
    `join_range`'s docstring points to when NEITHER side fits in a
    broadcast: per-(user, day) activity spans against per-(type, day)
    activity spans. Each interval replicates to every OVERLAP_BUCKET
    (hour) it covers — replication bounded by span/width, ≤ 24 here —
    the join becomes a plain hash equi-join on the bucket id, and the
    classic FIRST-OVERLAP-BUCKET rule (keep a pair only in the bucket
    containing max(lo_a, lo_b)) dedups replicated matches WITHOUT a
    distinct shuffle. Overlap lengths are integer microseconds, so
    the naive day-equi oracle join hash-proves the bucketized plan
    returns exactly the same pairs.

    At 100 TB this is the interval join that works: no broadcast of a
    corpus-sized side, no nested-loop, fan-out a constant, and the
    bucket key near-uniform (hot hours salt like any hot key)."""
    us = F.unix_micros("ts")
    ev = load(spark, sf_dir, "events")
    a = (
        ev.groupBy(
            "user_id",
            (us / SWEEP_BUCKET_US).cast("long").alias("d"),
        )
        .agg(F.min(us).alias("lo_a"), F.max(us).alias("hi_a"))
    )
    b = (
        ev.groupBy(
            "event_type",
            (us / SWEEP_BUCKET_US).cast("long").alias("d"),
        )
        .agg(F.min(us).alias("lo_b"), F.max(us).alias("hi_b"))
    )
    W = OVERLAP_BUCKET_US
    a_r = a.select(
        "user_id",
        "lo_a",
        "hi_a",
        F.explode(
            F.sequence(
                (F.col("lo_a") / W).cast("long"),
                (F.col("hi_a") / W).cast("long"),
            )
        ).alias("bkt"),
    )
    b_r = b.select(
        "event_type",
        "lo_b",
        "hi_b",
        F.explode(
            F.sequence(
                (F.col("lo_b") / W).cast("long"),
                (F.col("hi_b") / W).cast("long"),
            )
        ).alias("bkt"),
    )
    pairs = (
        a_r.join(b_r, "bkt")
        .filter(
            (F.col("lo_a") <= F.col("hi_b"))
            & (F.col("lo_b") <= F.col("hi_a"))
            # first-overlap-bucket dedup: count each pair exactly once
            & (
                F.col("bkt")
                == (F.greatest("lo_a", "lo_b") / W).cast("long")
            )
        )
        .select(
            "event_type",
            (
                F.least("hi_a", "hi_b") - F.greatest("lo_a", "lo_b")
            ).alias("ov"),
        )
    )
    return (
        pairs.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_overlaps"),
            F.sum("ov").cast("long").alias("total_overlap_us"),
        )
        .orderBy("event_type")
    )

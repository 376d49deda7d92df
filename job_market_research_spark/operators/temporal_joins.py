"""As-of and range joins — temporal operators Spark lacks natively.

Neither exists in the reference (SURVEY §2.4: "No theta, range, as-of,
or interval joins") or in Spark's built-in join menu, but both are
table stakes for event/feature pipelines (latest dimension state as of
an event; value-to-bucket classification). Re-expressed as compositions
of existing DataFrame ops — no UDF, no cartesian:

- **as-of join**: union both sides tagged, one window pass per key
  carrying the last-seen right-side row forward (`last(ignorenulls)`
  over an ordered frame). ONE shuffle on the join key, state flows
  within partitions — at 100 TB this beats the naive range-join plan
  (which explodes to |left|×|right-per-key| intermediate rows).
- **range join**: non-equi predicate against a broadcast bucket table
  (BroadcastNestedLoopJoin). Legal only because the bucket side is
  tiny-by-construction; for two large range sides you'd bucketize to
  convert it into an equi-join first.

The DuckDB oracle replays the as-of join with its native `ASOF JOIN` —
an independent implementation agreeing value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.registry import query


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_payload: str,
) -> DataFrame:
    """For each left row: the right row with the greatest `right_ts`
    <= `left_ts` within the same key (ties: the right row wins, i.e.
    "on or before"). Right side must be unique per (key, ts) —
    pre-aggregate if not.

    Plan: tag + unionByName + `last(struct, ignorenulls)` over a
    per-key window ordered by (ts, side) with side=right first, then
    keep left rows. Single hash shuffle on the key; no row explosion.
    """
    l_tagged = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
        F.lit(None).cast(right.schema[right_payload].dataType).alias("_rp"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_rt"),
    )
    r_tagged = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tagged.schema["_left"].dataType).alias("_left"),
        F.col(right_payload).alias("_rp"),
        F.col(right_ts).alias("_rt"),
    )
    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # The carried struct must be NULL (not struct(NULL, NULL)) on left
    # rows, or last(ignorenulls) would pick the left row's own empties.
    right_struct = F.when(F.col("_side") == 0, F.struct("_rt", "_rp"))
    carried = u.select(
        "*",
        F.last(right_struct, ignorenulls=True).over(w).alias("_match"),
    )
    return carried.filter(F.col("_side") == 1).select(
        F.col("_left.*"),
        F.col("_match._rp").alias("matched_payload"),
        F.col("_match._rt").alias("matched_ts"),
    )


@query(
    "join_asof",
    oracle="""
    WITH o1 AS (
      SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS odate,
             MAX(o_orderkey) AS okey
      FROM orders GROUP BY 1, 2
    )
    SELECT e.event_id, e.user_id, e.ts,
           o.okey AS matched_payload, o.odate AS matched_ts
    FROM events e ASOF LEFT JOIN o1 o
      ON e.user_id = o.o_custkey AND e.ts >= o.odate
    ORDER BY e.event_id
    """,
)
def q_join_asof(spark, sf_dir: str) -> DataFrame:
    """Each event matched to the user's most recent order on-or-before
    the event time — the canonical feature-lookup as-of join. The
    oracle replays it with DuckDB's native ASOF JOIN; the Spark plan is
    the union+window composition (one shuffle on user key)."""
    events = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey", F.col("o_orderdate").alias("odate"))
        .agg(F.max("o_orderkey").alias("okey"))
    )
    return asof_join(
        events,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="odate",
        right_payload="okey",
    ).orderBy("event_id")


@query(
    "join_range",
    oracle="""
    WITH buckets AS (
      SELECT r AS lo, r + 10 AS hi,
             'q' || CAST(r AS VARCHAR) AS bucket
      FROM unnest(range(0, 50, 10)) AS t(r)
    )
    SELECT b.bucket, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty_sum
    FROM lineitem l JOIN buckets b
      ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
    GROUP BY 1 ORDER BY bucket
    """,
)
def q_join_range(spark, sf_dir: str) -> DataFrame:
    """Value-to-interval classification: lineitem quantities against a
    generated bucket table via a non-equi range predicate. The bucket
    side is broadcast (5 rows) so the plan is a broadcast nested-loop
    — the right call when one side is tiny; bucketize-to-equi when
    both sides are large."""
    li = load(spark, sf_dir, "lineitem").select("l_quantity")
    buckets = spark.range(0, 50, 10).select(
        F.col("id").cast("double").alias("lo"),
        (F.col("id") + 10).cast("double").alias("hi"),
        F.concat(F.lit("q"), F.col("id").cast("string")).alias("bucket"),
    )
    joined = li.join(
        F.broadcast(buckets),
        (li.l_quantity >= buckets.lo) & (li.l_quantity < buckets.hi),
    )
    return (
        joined.groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)"))
            .cast("double")
            .alias("qty_sum"),
        )
        .orderBy("bucket")
    )


#: Max staleness for a valid as-of match (days).
ASOF_TOLERANCE_DAYS = 3


@query(
    "join_asof_tolerance",
    oracle=f"""
    WITH p AS (
      SELECT user_id, ts AS pts, MAX(event_id) AS pid
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ),
    m AS (
      SELECT e.event_id, e.user_id, e.ts,
             p.pid AS rp, p.pts AS rt
      FROM events e ASOF LEFT JOIN p
        ON e.user_id = p.user_id AND e.ts >= p.pts
    )
    SELECT event_id, user_id, ts,
           CASE WHEN rt IS NOT NULL
                 AND date_diff('microsecond', rt, ts)
                     <= {ASOF_TOLERANCE_DAYS} * CAST(86400 AS BIGINT) * 1000000
                THEN rp END AS matched_payload,
           CASE WHEN rt IS NOT NULL
                THEN date_diff('microsecond', rt, ts)
                     > {ASOF_TOLERANCE_DAYS} * CAST(86400 AS BIGINT) * 1000000
                END AS stale
    FROM m ORDER BY event_id
    """,
)
def q_join_asof_tolerance(spark, sf_dir: str) -> DataFrame:
    """As-of join with a staleness bound: each event looks up the
    user's most recent PURCHASE at-or-before it, but a match older
    than ASOF_TOLERANCE_DAYS is REJECTED (payload nulled, flagged
    stale) — the feature-store rule that a lookup must not silently
    serve week-old state. Same single-shuffle union+window plan as
    `join_asof`; the tolerance is a post-projection on exact integer
    microseconds, so the validity boundary cannot flip between
    engines. DuckDB replays with native ASOF JOIN + the same bound."""
    events = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("pts"))
        .agg(F.max("event_id").alias("pid"))
    )
    m = asof_join(
        events.drop("event_type"),
        purchases,
        left_key="user_id",
        right_key="user_id",
        left_ts="ts",
        right_ts="pts",
        right_payload="pid",
    )
    tol_us = ASOF_TOLERANCE_DAYS * 86400 * 1000000
    age = F.unix_micros("ts") - F.unix_micros("matched_ts")
    return m.select(
        "event_id",
        "user_id",
        "ts",
        F.when(
            F.col("matched_ts").isNotNull() & (age <= tol_us),
            F.col("matched_payload"),
        ).alias("matched_payload"),
        F.when(F.col("matched_ts").isNotNull(), age > tol_us).alias("stale"),
    ).orderBy("event_id")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_payload: str,
) -> DataFrame:
    """Forward as-of: for each left row, the right row with the
    SMALLEST `right_ts` >= `left_ts` within the key (ties: the right
    row at the same instant matches). Mirror of `asof_join` with
    `first(ignorenulls)` over the forward frame — same single hash
    shuffle on the key, no row explosion."""
    l_tagged = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
        F.lit(None).cast(right.schema[right_payload].dataType).alias("_rp"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_rt"),
    )
    r_tagged = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(l_tagged.schema["_left"].dataType).alias("_left"),
        F.col(right_payload).alias("_rp"),
        F.col(right_ts).alias("_rt"),
    )
    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    right_struct = F.when(F.col("_side") == 1, F.struct("_rt", "_rp"))
    carried = u.select(
        "*",
        F.first(right_struct, ignorenulls=True).over(w).alias("_match"),
    )
    return carried.filter(F.col("_side") == 0).select(
        F.col("_left.*"),
        F.col("_match._rp").alias("matched_payload"),
        F.col("_match._rt").alias("matched_ts"),
    )


@query(
    "join_asof_forward",
    oracle="""
    WITH p AS (
      SELECT user_id AS pu, ts AS pts, MAX(event_id) AS pid
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT e.event_id, e.user_id, e.ts,
           p.pid AS matched_payload, p.pts AS matched_ts
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type <> 'purchase') e
    ASOF LEFT JOIN p
      ON e.user_id = p.pu AND e.ts <= p.pts
    ORDER BY e.event_id
    """,
)
def q_join_asof_forward(spark, sf_dir: str) -> DataFrame:
    """Each non-purchase event matched to the user's NEXT purchase
    at-or-after it — the label-attribution direction of the as-of
    family (training-example construction: "did a purchase follow this
    exposure, and when"), where the backward join (`join_asof`) is the
    feature-lookup direction. Looking FORWARD is only legal at
    label-building time; the backward join is what a leak-free feature
    pipeline uses — keeping the two as distinct operators is the
    guard-rail. Same one-shuffle union+window plan, forward frame;
    DuckDB replays with native ASOF and the inverted comparison."""
    ev = load(spark, sf_dir, "events")
    exposures = ev.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("pts"))
        .agg(F.max("event_id").alias("pid"))
    )
    return asof_join_forward(
        exposures,
        purchases,
        left_key="user_id",
        right_key="user_id",
        left_ts="ts",
        right_ts="pts",
        right_payload="pid",
    ).orderBy("event_id")


@query(
    "join_asof_nearest",
    oracle="""
    WITH o1 AS (
      SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS odate,
             MAX(o_orderkey) AS okey
      FROM orders GROUP BY 1, 2
    ),
    back AS (
      SELECT e.event_id, e.user_id, e.ts, o.okey AS b_okey,
             o.odate AS b_odate
      FROM events e ASOF LEFT JOIN o1 o
        ON e.user_id = o.o_custkey AND e.ts >= o.odate
    ),
    fwd AS (
      SELECT e.event_id, o.okey AS f_okey, o.odate AS f_odate
      FROM events e ASOF LEFT JOIN o1 o
        ON e.user_id = o.o_custkey AND e.ts <= o.odate
    ),
    bf AS (
      SELECT b.event_id, b.user_id, b.ts,
             b.b_okey, b.b_odate, f.f_okey, f.f_odate,
             epoch_us(b.ts) - epoch_us(b.b_odate) AS db,
             epoch_us(f.f_odate) - epoch_us(b.ts) AS df
      FROM back b JOIN fwd f USING (event_id)
    )
    SELECT event_id, user_id, ts,
           CASE WHEN db IS NOT NULL AND (df IS NULL OR db <= df)
                THEN b_okey ELSE f_okey END AS near_okey,
           CASE WHEN db IS NOT NULL AND (df IS NULL OR db <= df)
                THEN b_odate ELSE f_odate END AS near_odate,
           CASE WHEN db IS NULL AND df IS NULL THEN NULL
                WHEN df IS NULL OR (db IS NOT NULL AND db <= df)
                THEN 'past' ELSE 'future' END AS direction,
           CASE WHEN db IS NOT NULL AND (df IS NULL OR db <= df)
                THEN db ELSE df END AS delta_us
    FROM bf ORDER BY event_id
    """,
)
def q_join_asof_nearest(spark, sf_dir: str) -> DataFrame:
    """NEAREST-neighbor as-of join: each event matched to the user's
    order closest in time in EITHER direction (ties → the past match)
    — the alignment semantics sensor-fusion and feature-backfill
    pipelines need when "latest before" alone throws away a reading
    that landed a second later. Completes the as-of family
    (backward / forward / tolerance / nearest).

    Spark-first shape: ONE union + ONE hash shuffle on the user key,
    then BOTH directions from the same sorted partition — backward as
    last(ignorenulls) over (-∞, 0], forward as first(ignorenulls)
    over [0, +∞) — Spark computes the two frames from one sort, so
    nearest costs the same as one as-of join. A right row at exactly
    the event timestamp sorts before the left row (side order), so
    the forward frame misses it — harmless by construction: the
    backward frame catches it at delta 0, which wins every tie. The
    oracle composes DuckDB's native ASOF twice and re-derives the
    pick, an independent implementation agreeing row-for-row.

    Scale: identical cost envelope to join_asof (no second shuffle,
    no row explosion); a hot user key reduces to one sorted run."""
    events = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey", F.col("o_orderdate").alias("odate"))
        .agg(F.max("o_orderkey").alias("okey"))
    )
    l_tagged = events.select(
        F.col("user_id").alias("_k"),
        F.col("ts").alias("_t"),
        F.lit(1).alias("_side"),
        "event_id",
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("_rp"),
        F.lit(None).cast("timestamp").alias("_rt"),
    )
    r_tagged = orders.select(
        F.col("o_custkey").alias("_k"),
        F.col("odate").cast("timestamp").alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("long").alias("user_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.col("okey").alias("_rp"),
        F.col("odate").cast("timestamp").alias("_rt"),
    )
    u = l_tagged.unionByName(r_tagged)
    right_struct = F.when(F.col("_side") == 0, F.struct("_rt", "_rp"))
    wb = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carried = u.select(
        "*",
        F.last(right_struct, ignorenulls=True).over(wb).alias("_b"),
        F.first(right_struct, ignorenulls=True).over(wf).alias("_f"),
    ).filter(F.col("_side") == 1)
    db = F.unix_micros("ts") - F.unix_micros("_b._rt")
    df_ = F.unix_micros("_f._rt") - F.unix_micros("ts")
    pick_back = db.isNotNull() & (df_.isNull() | (db <= df_))
    return carried.select(
        "event_id",
        "user_id",
        "ts",
        F.when(pick_back, F.col("_b._rp")).otherwise(F.col("_f._rp")).alias(
            "near_okey"
        ),
        F.when(pick_back, F.col("_b._rt")).otherwise(F.col("_f._rt")).alias(
            "near_odate"
        ),
        F.when(db.isNull() & df_.isNull(), F.lit(None).cast("string"))
        .when(df_.isNull() | (db.isNotNull() & (db <= df_)), F.lit("past"))
        .otherwise(F.lit("future"))
        .alias("direction"),
        F.when(pick_back, db).otherwise(df_).alias("delta_us"),
    ).orderBy("event_id")

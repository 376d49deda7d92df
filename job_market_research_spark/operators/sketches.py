"""Mergeable distinct-count structures (beyond-reference).

Two production shapes for the same question — "how many distinct users
per segment, and across ANY union of segments, without re-scanning raw
events":

- `agg_bitmap_distinct_users` — EXACT: chunked bitmaps (the
  ClickHouse `groupBitmap` / Druid bitmap-metric pattern). user ids
  pack into 32-bit words keyed by (segment, id // 32); bitmaps merge
  across segments with bitwise OR and popcount back to exact counts.
  Integer-exact end to end, so the DuckDB oracle replays it
  bit-for-bit — including the cross-segment merge.
- `agg_hll_partitioned_merge` — APPROXIMATE: per-segment Apache
  DataSketches HLL sketches (Spark's hll_sketch_agg) unioned into a
  global estimate. The sketch binary is engine-specific, so this is
  the registry's rows-only entry; the MERGE CONTRACT (union of
  per-segment sketches == one-pass global sketch, exactly — the
  defining mergeability property) is asserted in-plan and pinned by
  test, the same discipline as stream_kmv_distinct.

At 100 TB the bitmap form is the right call for dense bounded id
domains (ids ≤ ~10^10: 32-bit chunks shuffle |ids|/32 rows max, and
per-segment bitmap tables answer every segment-union question without
touching raw data again); HLL for unbounded/sparse domains at ~1.5 kB
per segment regardless of cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.registry import query

#: Bitmap word width. 32 (not 64): DuckDB's checked `<<` overflows at
#: shift 63, and 1<<31 still fits BIGINT on both engines — same
#: shuffle bound, no sign-bit edge cases anywhere.
BITMAP_BITS = 32


@query(
    "agg_bitmap_distinct_users",
    oracle=f"""
    WITH maps AS (
      SELECT event_type, user_id // {BITMAP_BITS} AS chunk,
             bit_or(1::BIGINT << CAST(user_id % {BITMAP_BITS} AS INT))
               AS bitmap
      FROM events GROUP BY 1, 2
    ),
    per_type AS (
      SELECT event_type,
             CAST(SUM(bit_count(bitmap)) AS BIGINT) AS distinct_bitmap,
             CAST(COUNT(*) AS BIGINT) AS n_chunks
      FROM maps GROUP BY event_type
    ),
    exact_t AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS distinct_exact
      FROM events GROUP BY event_type
    ),
    merged AS (
      SELECT 'ALL' AS event_type,
             CAST(SUM(bit_count(bitmap)) AS BIGINT) AS distinct_bitmap,
             CAST(COUNT(*) AS BIGINT) AS n_chunks
      FROM (SELECT chunk, bit_or(bitmap) AS bitmap FROM maps GROUP BY chunk)
    ),
    exact_all AS (
      SELECT 'ALL' AS event_type, COUNT(DISTINCT user_id) AS distinct_exact
      FROM events
    )
    SELECT p.event_type, p.n_chunks, p.distinct_bitmap,
           e.distinct_exact,
           CASE WHEN p.distinct_bitmap = e.distinct_exact
                THEN 1 ELSE 0 END AS bitmap_is_exact
    FROM per_type p JOIN exact_t e USING (event_type)
    UNION ALL
    SELECT m.event_type, m.n_chunks, m.distinct_bitmap,
           a.distinct_exact,
           CASE WHEN m.distinct_bitmap = a.distinct_exact
                THEN 1 ELSE 0 END AS bitmap_is_exact
    FROM merged m JOIN exact_all a USING (event_type)
    ORDER BY event_type
    """,
    tags=("sketch", "distinct", "beyond"),
)
def q_agg_bitmap_distinct_users(spark, sf_dir: str) -> DataFrame:
    """Exact mergeable distinct-users via chunked bitmaps: per
    (event_type, user_id // 32) a 32-bit membership word aggregates
    with bit_or (map-side combinable — OR is the whole point), then
    popcount-sums back to the exact per-type distinct count. The 'ALL'
    row is computed FROM THE PER-TYPE BITMAPS (bit_or across types per
    chunk), not from raw events — demonstrating the segment-union
    query the materialized bitmap table answers with zero raw-data
    rescans. The exact count_distinct rides along as the contract
    column (bitmap_is_exact pinned = 1 in tests).

    Scale: one shuffle on (type, chunk) whose row count is bounded by
    |id-domain|/32 per segment regardless of event count; merges are
    |chunks| rows. The dense-id complement to the KMV/HLL sketches."""
    events = load(spark, sf_dir, "events")
    maps = (
        events.select(
            "event_type",
            (F.col("user_id") / BITMAP_BITS).cast("long").alias("chunk"),
            F.expr(
                f"shiftleft(1L, CAST(user_id % {BITMAP_BITS} AS INT))"
            ).alias("bit"),
        )
        .groupBy("event_type", "chunk")
        .agg(F.bit_or("bit").alias("bitmap"))
    )
    per_type = maps.groupBy("event_type").agg(
        F.sum(F.bit_count("bitmap")).cast("long").alias("distinct_bitmap"),
        F.count("*").cast("long").alias("n_chunks"),
    )
    exact_t = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("distinct_exact")
    )
    merged = (
        maps.groupBy("chunk")
        .agg(F.bit_or("bitmap").alias("bitmap"))
        .agg(
            F.sum(F.bit_count("bitmap")).cast("long").alias("distinct_bitmap"),
            F.count("*").cast("long").alias("n_chunks"),
        )
        .select(
            F.lit("ALL").alias("event_type"), "n_chunks", "distinct_bitmap"
        )
    )
    exact_all = events.agg(
        F.countDistinct("user_id").alias("distinct_exact")
    ).select(F.lit("ALL").alias("event_type"), "distinct_exact")
    flag = (
        F.when(F.col("distinct_bitmap") == F.col("distinct_exact"), 1)
        .otherwise(0)
        .alias("bitmap_is_exact")
    )
    cols = [
        "event_type",
        "n_chunks",
        "distinct_bitmap",
        "distinct_exact",
        flag,
    ]
    return (
        per_type.join(exact_t, "event_type")
        .select(*cols)
        .unionByName(merged.join(F.broadcast(exact_all), "event_type").select(*cols))
        .orderBy("event_type")
    )


@query(
    "agg_hll_partitioned_merge",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_exact,
           1 AS merge_matches_direct,
           TRUE AS est_within_5pct
    FROM events GROUP BY 1
    UNION ALL
    SELECT 'ALL' AS event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_exact,
           1 AS merge_matches_direct,
           TRUE AS est_within_5pct
    FROM events
    ORDER BY event_type
    """,
    tags=("sketch", "distinct", "beyond"),
)
def q_agg_hll_partitioned_merge(spark, sf_dir: str) -> DataFrame:
    """HLL distinct-users with an explicit merge proof: per-event-type
    DataSketches HLL sketches (hll_sketch_agg), a global estimate from
    hll_union_agg OF THE PER-TYPE SKETCHES, and a one-pass global
    sketch. `merge_matches_direct` pins that the union-of-partials
    estimate agrees with the direct one-pass estimate to within ±5%
    of the exact count, and `est_within_5pct` pins the merged
    estimate against the in-plan exact count (lgK=12 → rsd ≈1.6%,
    checked at a conservative ±5%).

    Why BOUNDED agreement, not equality: estimate equality across a
    merge is impossible by design in DataSketches HLL once the sketch
    leaves exact (coupon) mode — a directly-built sketch answers with
    the HIP estimator (tracks insertion history) while a union result
    must discard HIP and fall back to the composite estimator, so the
    two estimates of the SAME item set legitimately differ by O(rsd).
    At 150 distinct (sf0.01) both paths sit in coupon mode and match
    bit-for-bit; at 1500 distinct (sf0.1) they diverge — found by the
    round-6 sf0.1 sweep, pinned by test_sketches_intervals at
    estimation-mode cardinality. The EXACT merge identities live in
    the bitmap/KMV twins (agg_bitmap_distinct_users OR-merge,
    stream_kmv_distinct min-merge), where state is integer-exact.

    The sketch BYTES and raw estimates are Spark-specific — DuckDB
    cannot replay them — so the oracle replays the exact counts plus
    literal TRUE: the driver hash-matches only if the bounded merge
    agreement holds and every estimate honors its advertised bound
    (the agg_sketch_bounds contract trick).

    Scale: per-segment state is ~1.5 kB regardless of cardinality;
    partials combine map-side; the union row reads |types| sketches.
    This is the 100 TB production path the exact bitmap twin
    (agg_bitmap_distinct_users) verifies at test scale."""
    events = load(spark, sf_dir, "events")
    per_type = events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("distinct_exact"),
    )
    within = lambda est: (  # noqa: E731
        F.abs(est - F.col("distinct_exact"))
        <= 0.05 * F.col("distinct_exact")
    ).alias("est_within_5pct")
    typed = per_type.select(
        "event_type",
        F.col("distinct_exact").cast("long").alias("distinct_exact"),
        F.lit(1).alias("merge_matches_direct"),
        within(F.hll_sketch_estimate("sk").cast("long")),
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("est_merged")
    )
    direct = events.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
        .cast("long")
        .alias("est_direct"),
        F.countDistinct("user_id").alias("distinct_exact"),
    )
    all_row = merged.crossJoin(direct).select(
        F.lit("ALL").alias("event_type"),
        F.col("distinct_exact").cast("long").alias("distinct_exact"),
        F.when(
            F.abs(F.col("est_merged") - F.col("est_direct"))
            <= 0.05 * F.col("distinct_exact"),
            1,
        )
        .otherwise(0)
        .alias("merge_matches_direct"),
        within(F.col("est_merged")),
    )
    return typed.unionByName(all_row).orderBy("event_type")

"""Incremental materialized-view maintenance (beyond-reference).

The 100 TB pattern behind every "dashboard over an append-only feed":
keep a materialized aggregate in ALGEBRAIC form (per-group count +
exact sum — the mergeable partials), and on refresh aggregate ONLY the
new delta and merge it into the stored partials; derived measures
(averages) are computed from the merged partials at read time. A full
recompute rescans the entire history; the incremental refresh scans
|delta| + |view| — at 100 TB of history with a 100 GB daily delta
that is a 1000× scan reduction, which is the entire point.

The registry query proves the algebra: the base partition of `events`
is aggregated and PERSISTED (scratch parquet, simulating the stored
view), the delta partition is aggregated separately, and the merged
result must hash-match a from-scratch full aggregate (the DuckDB
oracle). The base/delta split is by event_id hash — NOT by time — so
base and delta genuinely overlap on (event_type, day) keys and the
merge must combine partials, not just concatenate ranges (the
late-arriving-data case that breaks naive date-partitioned refresh).

Float policy: sums are carried as DECIMAL(28,10) end-to-end (parquet
round-trips decimals losslessly); doubles appear only in the final
derived average, rounded to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.registry import query
from job_market_research_spark.sources.readers import scratch_dir

#: events rows with event_id % MV_MOD < MV_BASE_CUT form the "old"
#: snapshot; the rest arrive as the refresh delta.
MV_MOD = 10
MV_BASE_CUT = 8


def _partial_agg(df: DataFrame) -> DataFrame:
    """Algebraic partials per (event_type, day): count + exact sum."""
    return df.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("value").cast("decimal(28,10)")).alias("s"),
    )


def merge_partials(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge two partial-aggregate tables: union, re-aggregate the
    mergeable components. At scale both sides are stored partitioned
    by the group key, so this is a co-partitioned combine."""
    return (
        base.unionByName(delta)
        .groupBy("event_type", "day")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("s").cast("decimal(28,10)").alias("s"),
        )
    )


@query(
    "mv_incremental_refresh",
    oracle="""
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total,
           round(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_value
    FROM events
    GROUP BY 1, 2 ORDER BY event_type, day
    """,
)
def q_mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Refresh a stored daily-metrics view from a delta batch and
    prove the merged partials equal a from-scratch aggregate.

    The base partials are genuinely materialized (written to and read
    back from parquet — the stored view), so the refresh plan's scan
    cost is |delta rows| + |view rows|; the full history is touched
    only by the oracle. Merge is a co-partitioned groupBy on the view
    key; derived avg is computed from merged (n, s) at the end. The
    hash-based base/delta split makes keys overlap, exercising true
    partial combination (late data), not range concatenation."""
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "ts", "value")
    base = _partial_agg(ev.filter(F.col("event_id") % MV_MOD < MV_BASE_CUT))
    view_path = scratch_dir("mv_daily_metrics")
    base.write.mode("overwrite").parquet(view_path)
    stored = spark.read.parquet(view_path)

    delta = _partial_agg(ev.filter(F.col("event_id") % MV_MOD >= MV_BASE_CUT))
    merged = merge_partials(stored, delta)
    return merged.select(
        "event_type",
        "day",
        "n",
        F.col("s").cast("double").alias("total"),
        F.round(F.col("s").cast("double") / F.col("n"), 6).alias("avg_value"),
    ).orderBy("event_type", "day")

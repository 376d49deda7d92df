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


#: Join-view split: orders (fact) and customer (dim) each hold back a
#: slice as the "arriving" delta. Both sides change, so the refresh
#: must produce all three delta terms.
MVJ_FACT_CUT = 8  # o_orderkey % 10 < 8 -> base snapshot
MVJ_DIM_CUT = 18  # c_custkey % 20 < 18 -> base snapshot


@query(
    "mv_join_delta",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1 ORDER BY segment
    """,
)
def q_mv_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a materialized JOIN view (classic
    IVM algebra): with V = A ⋈ B stored, and append deltas ΔA (new
    orders) and ΔB (new customers), the refreshed view is
    V ∪ (ΔA ⋈ B₀) ∪ (A₀ ⋈ ΔB) ∪ (ΔA ⋈ ΔB) — three delta-sized joins
    instead of re-joining all of history. The companion to
    mv_incremental_refresh (aggregates): joins need the three-term
    product rule, not a partial merge, and forgetting the ΔA ⋈ ΔB
    term silently drops orders whose customer arrived in the same
    batch (this split forces such rows to exist: both cuts hold back
    overlapping slices).

    The base join V₀ = A₀ ⋈ B₀ is PERSISTED to scratch parquet
    (simulating the stored view) and read back; the three delta terms
    are computed live; the union must hash-match a from-scratch full
    join (the oracle). Output is the per-segment roll-up of the
    refreshed view with the exact-DECIMAL revenue sum (scale 4 — the
    money-double policy: rounding at 1e-10 sits inside double binary
    noise where engines' conversion rounding can disagree).

    Scale: every delta term is |Δ|-bounded on at least one side — the
    dim deltas BROADCAST (a day's new customers), and ΔA ⋈ B₀ is the
    one shuffle-sized term, pruned by the same custkey partitioning
    the stored view uses. Refresh scans |V| + |Δ| instead of |A|+|B|
    history — the same 1000× argument as the aggregate view."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    a0 = orders.filter(F.col("o_orderkey") % 10 < MVJ_FACT_CUT)
    da = orders.filter(F.col("o_orderkey") % 10 >= MVJ_FACT_CUT)
    b0 = cust.filter(F.col("c_custkey") % 20 < MVJ_DIM_CUT)
    db = cust.filter(F.col("c_custkey") % 20 >= MVJ_DIM_CUT)

    out = scratch_dir("mv_join_delta")
    a0.join(b0, a0.o_custkey == b0.c_custkey).write.mode("overwrite").parquet(
        out
    )
    v0 = spark.read.parquet(out)

    d1 = da.join(b0, da.o_custkey == b0.c_custkey)
    d2 = a0.join(F.broadcast(db), a0.o_custkey == db.c_custkey)
    d3 = da.join(F.broadcast(db), da.o_custkey == db.c_custkey)
    refreshed = v0.unionByName(d1).unionByName(d2).unionByName(d3)
    return (
        refreshed.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("segment")
    )

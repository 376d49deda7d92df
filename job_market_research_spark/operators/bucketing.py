"""Bucketed (co-located) joins — the pre-shuffled lake layout.

At 100 TB the lineitem ⋈ orders join's shuffle IS the query cost. The
standard fix is to pay that shuffle once at write time: persist both
tables bucketed by the join key (`bucketBy` + `sortBy` via
`saveAsTable`), after which every join on that key is shuffle-free —
each task zips bucket i with bucket i, and with sorted buckets the
merge needs no sort either.

The registry query proves both halves: (1) the joined result over the
bucketed tables hash-matches the plain-SQL oracle, and (2) the physical
plan contains NO shuffle exchange on either join input (asserted at
plan level, not eyeballed).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.registry import query
from job_market_research_spark.sources.readers import scratch_dir

N_BUCKETS = 8


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    path: str,
    n_buckets: int = N_BUCKETS,
) -> None:
    """Persist a frame bucketed+sorted on the join key. Hive-compatible
    layout: n_buckets files per partition, rows routed by
    hash(bucket_col) — the write-once shuffle that every later join
    reuses."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


def assert_no_shuffle_join(joined: DataFrame) -> None:
    """Fail if the join-only plan shuffles anything (bucketing
    defeated). A co-located bucket join's physical plan contains no
    Exchange node at all — bucket files feed the (sort-)merge
    directly."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    if "Exchange hashpartitioning" in plan:
        raise AssertionError(f"bucketed join still shuffles:\n{plan}")


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT o_orderpriority AS priority, COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1 ORDER BY priority
    """,
)
def q_join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders with both sides bucketed by orderkey into the
    same bucket count: the join runs bucket-to-bucket with zero shuffle
    of either input (verified against the executed plan). This is the
    layout a 100 TB deployment keeps its fact tables in; the only
    remaining exchange is the tiny post-aggregation one."""
    root = scratch_dir("bucketed_join")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    write_bucketed(li, "b_lineitem", "l_orderkey", os.path.join(root, "lineitem"))
    write_bucketed(orders, "b_orders", "o_orderkey", os.path.join(root, "orders"))

    li_b = spark.table("b_lineitem")
    o_b = spark.table("b_orders")
    # merge hint pins the sort-merge strategy (at real scale neither
    # side broadcasts anyway); with matching bucket counts the merge
    # reads bucket i against bucket i — no exchange, no sort.
    joined = li_b.hint("merge").join(o_b, li_b.l_orderkey == o_b.o_orderkey)
    assert_no_shuffle_join(joined)
    out = (
        joined.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_qty"),
        )
        .orderBy("priority")
    )
    return out

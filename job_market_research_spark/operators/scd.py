"""Slowly-changing-dimension (SCD type 2) merge — warehouse parity op.

The reference's star loader overwrites dimension rows in place
(spark_pipeline/insert_to_postgres.py:47-64: SELECT-probe then INSERT,
no history). A production warehouse keeps dimension HISTORY: every
attribute change closes the current version row and opens a new one
with validity interval columns. This module expresses that merge as a
pure relational plan: union current rows with the change batch, then a
per-key window derives each version's [valid_from, valid_to) interval
and the is_current flag.

Scale shape: the window partitions BY THE DIMENSION KEY, so state per
partition is the handful of versions of one entity — no global sort,
no skew (version counts are bounded by update frequency, not data
volume). One shuffle on the key; at 100 TB dimension scale this is the
same cost as the dedup-by-key operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.registry import query


def scd2_merge(
    current: DataFrame, changes: DataFrame, key: str, order_col: str
) -> DataFrame:
    """Type-2 merge: all version rows per key, each with its validity
    interval. `current` and `changes` must share the schema
    (key, attributes..., order_col); later order_col wins as the open
    version."""
    hist = current.unionByName(changes)
    w = Window.partitionBy(key).orderBy(order_col)
    valid_to = F.lead(order_col).over(w)
    return hist.select(
        "*",
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


@query(
    "merge_scd2",
    oracle="""
    WITH base AS (
      SELECT c_custkey, c_mktsegment AS segment,
             DATE '1992-01-01' AS valid_from
      FROM customer
    ),
    upd AS (
      SELECT c_custkey, 'PROMO' AS segment, DATE '1995-01-01' AS valid_from
      FROM customer WHERE c_custkey % 10 = 0
    ),
    hist AS (SELECT * FROM base UNION ALL SELECT * FROM upd)
    SELECT c_custkey, segment, valid_from,
           LEAD(valid_from) OVER w AS valid_to,
           LEAD(valid_from) OVER w IS NULL AS is_current
    FROM hist
    WINDOW w AS (PARTITION BY c_custkey ORDER BY valid_from)
    ORDER BY c_custkey, valid_from
    """,
)
def q_merge_scd2(spark, sf_dir: str) -> DataFrame:
    """SCD2 dimension merge on the customer dim: a deterministic change
    batch (every 10th customer moves to segment 'PROMO' effective
    1995-01-01) merges into the base rows (effective 1992-01-01);
    output is the full version history with validity intervals."""
    cust = load(spark, sf_dir, "customer")
    base = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.to_date(F.lit("1992-01-01")).alias("valid_from"),
    )
    upd = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.lit("PROMO").alias("segment"),
        F.to_date(F.lit("1995-01-01")).alias("valid_from"),
    )
    return scd2_merge(base, upd, "c_custkey", "valid_from")

"""Set operations and batch-merge semantics (SURVEY §2.7, §2.5 counters).

Union-all is the reference's pervasive merge primitive (multi-file
merge Websites/__init__.py:197, multi-bucket accumulation
database/__init__.py:160-163). `unionByName(allowMissingColumns=True)`
covers its union-of-ragged-schemas behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.registry import query


def append_merge(existing: DataFrame, new: DataFrame, key: str) -> DataFrame:
    """Merge a new batch into existing data: union then keep one row
    per key, existing rows win (reference: Websites/__init__.py:168-207
    `merged_data = existing_data + data` followed by URL dedup)."""
    fresh = new.join(existing.select(key).distinct(), on=key, how="left_anti")
    return existing.unionByName(fresh, allowMissingColumns=True)


@query(
    "set_union_all",
    oracle="""
    SELECT k, COUNT(*) AS n FROM (
      SELECT c_custkey AS k FROM customer WHERE c_custkey % 2 = 0
      UNION ALL
      SELECT c_custkey AS k FROM customer WHERE c_custkey % 3 = 0
    ) GROUP BY 1 ORDER BY 1
    """,
)
def q_set_union_all(spark, sf_dir: str) -> DataFrame:
    """Union-all of overlapping slices (duplicates preserved)."""
    customer = load(spark, sf_dir, "customer")
    a = customer.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("k")
    )
    b = customer.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("k")
    )
    return a.unionByName(b).groupBy("k").agg(F.count("*").alias("n")).orderBy("k")


@query(
    "source_append_merge",
    oracle="""
    WITH existing AS (
      SELECT o_orderkey, o_custkey FROM orders
      WHERE o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
    ),
    new_batch AS (
      SELECT o_orderkey, o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
    )
    SELECT o_orderkey, o_custkey FROM existing
    UNION ALL
    SELECT n.o_orderkey, n.o_custkey FROM new_batch n
    WHERE NOT EXISTS (SELECT 1 FROM existing e
                      WHERE e.o_orderkey = n.o_orderkey)
    ORDER BY o_orderkey
    """,
)
def q_source_append_merge(spark, sf_dir: str) -> DataFrame:
    """Append-union of overlapping batches with existing-wins dedup on
    the natural key — the scraper's file merge re-expressed."""
    orders = load(spark, sf_dir, "orders")
    cut_lo = F.lit("1999-01-01 00:00:00").cast("timestamp")
    cut_hi = F.lit("2000-01-01 00:00:00").cast("timestamp")
    existing = orders.filter(F.col("o_orderdate") < cut_hi).select(
        "o_orderkey", "o_custkey"
    )
    new = orders.filter(F.col("o_orderdate") >= cut_lo).select(
        "o_orderkey", "o_custkey"
    )
    return append_merge(existing, new, "o_orderkey").orderBy("o_orderkey")


@query(
    "agg_total_offers",
    oracle="""
    SELECT CAST(SUM(n) AS BIGINT) AS total_offers FROM (
      SELECT COUNT(*) AS n FROM orders
      UNION ALL SELECT COUNT(*) FROM lineitem
      UNION ALL SELECT COUNT(*) FROM events
    )
    """,
)
def q_agg_total_offers(spark, sf_dir: str) -> DataFrame:
    """Sum of per-source record counts (reference: Traitement/main.py:
    40-47 parses each scraper's stdout count and totals them)."""
    counts = None
    for t in ("orders", "lineitem", "events"):
        c = load(spark, sf_dir, t).agg(F.count("*").alias("n"))
        counts = c if counts is None else counts.unionByName(c)
    return counts.agg(F.sum("n").alias("total_offers"))


@query(
    "agg_insert_counters",
    oracle="""
    SELECT 'customer' AS tbl, COUNT(*) AS n_rows FROM customer
    UNION ALL SELECT 'orders', COUNT(*) FROM orders
    UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
    UNION ALL SELECT 'part', COUNT(*) FROM part
    UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
    ORDER BY tbl
    """,
)
def q_agg_insert_counters(spark, sf_dir: str) -> DataFrame:
    """Per-table load counters (reference: insert_to_postgres.py:27-40,
    262-264 accumulates inserted-row counts per star table)."""
    out = None
    for t in ("customer", "orders", "lineitem", "part", "supplier"):
        c = load(spark, sf_dir, t).agg(F.count("*").alias("n_rows")).select(
            F.lit(t).alias("tbl"), "n_rows"
        )
        out = c if out is None else out.unionByName(c)
    return out.orderBy("tbl")

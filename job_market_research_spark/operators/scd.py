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


@query(
    "merge_cdc_feed",
    oracle="""
    WITH feed AS (
      SELECT o_orderkey AS k,
             o_orderstatus AS status,
             o_totalprice AS price,
             (o_orderkey * 13 + o_custkey) % 1000 AS seq,
             CASE WHEN (o_orderkey * 13 + o_custkey) % 10 = 0 THEN 'D'
                  WHEN o_orderkey % 2 = 0 THEN 'U' ELSE 'I' END AS op
      FROM orders
      UNION ALL
      SELECT o_orderkey AS k, 'X' AS status, o_totalprice * 2 AS price,
             1000 + (o_orderkey % 7) AS seq,
             CASE WHEN o_orderkey % 5 = 0 THEN 'D' ELSE 'U' END AS op
      FROM orders WHERE o_orderkey % 3 = 0
    ),
    latest AS (
      SELECT k, status, price, op,
             ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
      FROM feed
    )
    SELECT k, status, price
    FROM latest WHERE rn = 1 AND op <> 'D'
    ORDER BY k
    """,
)
def q_merge_cdc_feed(spark, sf_dir: str) -> DataFrame:
    """Change-data-capture apply: collapse an insert/update/delete
    change feed to the final table state with last-writer-wins
    semantics — the MERGE every incremental lakehouse ingestion runs.
    The feed is synthesized deterministically from `orders` (a base
    wave plus a later wave of updates/deletes on every 3rd key; `seq`
    is the change ordinal). Apply = one per-key window taking the
    highest-seq change, then dropping keys whose final op is DELETE.

    Scale shape: one shuffle on the merge key. A real 100 TB apply
    partitions the same way; when the base is stored bucketed by key,
    the window degenerates to a per-bucket merge with no base
    re-shuffle — and deletes never resurrect because the window sees
    the tombstone as the max-seq row."""
    o = load(spark, sf_dir, "orders")
    seq1 = (F.col("o_orderkey") * 13 + F.col("o_custkey")) % 1000
    wave1 = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
        seq1.alias("seq"),
        F.when(seq1 % 10 == 0, "D")
        .when(F.col("o_orderkey") % 2 == 0, "U")
        .otherwise("I")
        .alias("op"),
    )
    wave2 = (
        o.filter(F.col("o_orderkey") % 3 == 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.lit("X").alias("status"),
            (F.col("o_totalprice") * 2).alias("price"),
            (F.lit(1000) + F.col("o_orderkey") % 7).alias("seq"),
            F.when(F.col("o_orderkey") % 5 == 0, "D")
            .otherwise("U")
            .alias("op"),
        )
    )
    feed = wave1.unionByName(wave2)
    w = Window.partitionBy("k").orderBy(F.desc("seq"))
    return (
        feed.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("k", "status", "price")
        .orderBy("k")
    )


@query(
    "join_scd2_pointintime",
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
    hist AS (SELECT * FROM base UNION ALL SELECT * FROM upd),
    dim AS (
      SELECT c_custkey, segment, valid_from,
             COALESCE(LEAD(valid_from) OVER (
               PARTITION BY c_custkey ORDER BY valid_from),
               DATE '9999-12-31') AS valid_to
      FROM hist
    )
    SELECT d.segment AS segment_at_order_time,
           CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    JOIN dim d ON d.c_custkey = o.o_custkey
              AND o.o_orderdate >= d.valid_from
              AND o.o_orderdate < d.valid_to
    GROUP BY 1, 2 ORDER BY segment_at_order_time, order_year
    """,
)
def q_join_scd2_pointintime(spark, sf_dir: str) -> DataFrame:
    """Point-in-time (time-travel) join: each order is attributed to
    the customer segment that was CURRENT on its order date — the
    canonical consumer of the SCD2 history `merge_scd2` builds, and
    the query that silently lies if a warehouse overwrites dimensions
    in place (every pre-1995 order of a PROMO customer would be
    misattributed to PROMO).

    Plan shape: the versioned dim joins on the EQUALITY key
    (c_custkey) with the interval predicate applied as a filter
    inside the same hash join — NOT a non-equi range join, because
    the equality key alone co-partitions both sides; version fan-out
    per key is bounded by update frequency (≤2 here). One shuffle
    pair on the key; the yearly rollup collapses to a bounded
    (segment × year) space."""
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
    dim = scd2_merge(base, upd, "c_custkey", "valid_from").select(
        "c_custkey",
        "segment",
        "valid_from",
        F.coalesce(
            F.col("valid_to"), F.to_date(F.lit("9999-12-31"))
        ).alias("valid_to"),
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("odate")
    )
    joined = orders.join(
        dim,
        (orders.o_custkey == dim.c_custkey)
        & (F.col("odate") >= F.col("valid_from"))
        & (F.col("odate") < F.col("valid_to")),
    )
    return (
        joined.groupBy(
            F.col("segment").alias("segment_at_order_time"),
            F.year("odate").cast("long").alias("order_year"),
        )
        .agg(F.count("*").cast("long").alias("n_orders"))
        .orderBy("segment_at_order_time", "order_year")
    )

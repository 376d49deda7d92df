"""Batch sessionization + lake-maintenance compaction (beyond-reference).

`agg_sessionize_batch` is the batch twin of streaming/sessions.py's
`stream_sessionize` (reference semantics: group user activity into
30-min-gap sessions): one shuffle on user_id, an in-partition sort, two
window functions, one aggregate. That plan shape is THE scalable batch
sessionizer — no per-user driver loops, no self-joins; skewed users are
single-partition-bounded and AQE splits oversized partitions.

`maintenance_compact_small_files` is the small-file compaction pass
every large lake pipeline runs: many tiny files → few target-sized
files. Sizing uses file metadata only (a driver-side listing of
lengths, never data); the rewrite is one `repartition(n)` shuffle whose
output count is ceil(bytes / target). At 100 TB this runs per
partition-directory with a files-per-job cap.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, Window, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.registry import query
from job_market_research_spark.sources.readers import scratch_dir

#: Session gap: a new session starts after >30 min of inactivity
#: (matches streaming/sessions.py's session_window gap).
SESSION_GAP_US = 30 * 60 * 1_000_000


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    gap_us: int = SESSION_GAP_US,
) -> DataFrame:
    """Assign a per-user session index via lag + running sum.

    Exact-integer microsecond arithmetic end to end (unix_micros), so
    the SQL oracle replays it bit-for-bit; the tiebreak column makes
    the in-partition sort total, hence deterministic."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag(us).over(w)
    new_session = F.when(
        prev.isNull() | ((us - prev) > gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn("_us", us).withColumn(
        "session_idx", F.sum(new_session).over(w)
    )


@query(
    "agg_sessionize_batch",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, us,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id)
               AS session_idx
      FROM marked
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           COUNT(*) AS n_events,
           CAST(MIN(us) AS BIGINT) AS start_us,
           CAST(MAX(us) AS BIGINT) AS end_us,
           CAST(MAX(us) - MIN(us) AS BIGINT) AS duration_us
    FROM sess GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_agg_sessionize_batch(spark, sf_dir: str) -> DataFrame:
    """Gap-based batch sessionization (30-min inactivity boundary):
    lag marks session starts, a running sum numbers them, one aggregate
    emits per-session stats. Single user_id shuffle; microsecond-exact
    on both engines."""
    events = load(spark, sf_dir, "events")
    return (
        sessionize(events)
        .groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min("_us").alias("start_us"),
            F.max("_us").alias("end_us"),
            (F.max("_us") - F.min("_us")).alias("duration_us"),
        )
        .orderBy("user_id", "session_idx")
    )


#: Compaction target: output files aim at this many bytes each.
COMPACT_TARGET_BYTES = 4 * 1024 * 1024


def compact_small_files(
    spark, in_dir: str, out_dir: str, target_bytes: int = COMPACT_TARGET_BYTES
) -> int:
    """Compact a parquet directory into ceil(total_bytes/target) files.

    Sizing reads FILE METADATA only (listing lengths); the data moves
    through one repartition shuffle. Returns the output file count.
    On a real lake this runs per partition directory (so compaction
    parallelism = number of partitions) and uses the FileSystem API
    rather than os.listdir."""
    total = sum(
        os.path.getsize(os.path.join(in_dir, f))
        for f in os.listdir(in_dir)
        if f.endswith(".parquet")
    )
    n_out = max(1, math.ceil(total / target_bytes))
    spark.read.parquet(in_dir).repartition(n_out).write.mode("overwrite").parquet(
        out_dir
    )
    return n_out


@query(
    "maintenance_compact_small_files",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
           COUNT(DISTINCT o_orderkey) AS n_keys
    FROM orders
    """,
)
def q_maintenance_compact_small_files(spark, sf_dir: str) -> DataFrame:
    """Small-file compaction round-trip: fragment orders into 64 tiny
    files (the pathological state left by streaming/incremental
    ingests), compact to size-targeted files, and prove the data
    survived intact. The checked invariant is content equality; the
    test suite additionally pins the file-count drop."""
    frag = scratch_dir("compact_fragmented")
    out = scratch_dir("compact_output")
    load(spark, sf_dir, "orders").select("o_orderkey").repartition(64).write.mode(
        "overwrite"
    ).parquet(frag)
    compact_small_files(spark, frag, out)
    back = spark.read.parquet(out)
    return back.agg(
        F.count("*").alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
        F.countDistinct("o_orderkey").alias("n_keys"),
    )


#: Z-order parameters: per-dimension bin bits and target file count.
ZORDER_BITS = 10
ZORDER_FILES = 64


def morton_interleave(xbin, ybin, bits: int = ZORDER_BITS):
    """Morton (Z-order) code: interleave the low `bits` bits of two
    non-negative bin columns — bit i of x lands at 2i, of y at 2i+1.
    Pure shift/mask arithmetic, exactly replayable in SQL."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftrightunsigned(xbin, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(
            F.shiftrightunsigned(ybin, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return z


def _morton_sql(bits: int = ZORDER_BITS) -> str:
    return " + ".join(
        f"(((xbin >> {i}) & 1) << {2 * i}) + (((ybin >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    )


@query(
    "maintenance_zorder_cluster",
    oracle=f"""
    WITH bounds AS (
      SELECT MAX(l_partkey) + 1 AS mp, MAX(l_suppkey) + 1 AS ms FROM lineitem
    ),
    binned AS (
      SELECT l_partkey, l_suppkey,
             (l_partkey * {2**ZORDER_BITS}) // mp AS xbin,
             (l_suppkey * {2**ZORDER_BITS}) // ms AS ybin
      FROM lineitem, bounds
    ),
    z AS (
      SELECT l_partkey, l_suppkey,
             CAST({_morton_sql()} AS BIGINT) AS zval
      FROM binned
    )
    SELECT CAST(zval >> {2 * ZORDER_BITS - 6} AS BIGINT) AS file_id,
           COUNT(*) AS n_rows,
           CAST(MIN(l_partkey) AS BIGINT) AS min_part,
           CAST(MAX(l_partkey) AS BIGINT) AS max_part,
           CAST(MIN(l_suppkey) AS BIGINT) AS min_supp,
           CAST(MAX(l_suppkey) AS BIGINT) AS max_supp
    FROM z GROUP BY 1 ORDER BY 1
    """,
)
def q_maintenance_zorder_cluster(spark, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering assignment — the lakehouse layout
    pass that makes multi-column data skipping work: each of
    {ZORDER_FILES} target files covers a bounded RECTANGLE of
    (partkey, suppkey) space instead of a stripe of one column, so
    min/max file stats prune scans filtered on EITHER key. Keys are
    range-binned to {ZORDER_BITS} bits on exact integer arithmetic
    (bounds from a 1-row broadcast agg — table stats in a real lake),
    interleaved into the Morton code, and the top 6 bits pick the
    file. Output: per-file row counts + per-dimension min/max — the
    exact stats a format's footer would carry; both engines must
    agree on every file boundary. The physical rewrite is
    `repartitionByRange(zval)` + write, same shuffle shape as
    compaction."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bounds = li.agg(
        (F.max("l_partkey") + 1).alias("mp"), (F.max("l_suppkey") + 1).alias("ms")
    )
    binned = li.crossJoin(F.broadcast(bounds)).select(
        "l_partkey",
        "l_suppkey",
        F.expr(f"(l_partkey * {2**ZORDER_BITS}) div mp").alias("xbin"),
        F.expr(f"(l_suppkey * {2**ZORDER_BITS}) div ms").alias("ybin"),
    )
    z = binned.withColumn(
        "zval", morton_interleave(F.col("xbin"), F.col("ybin"))
    )
    return (
        z.groupBy(
            F.shiftrightunsigned("zval", 2 * ZORDER_BITS - 6)
            .cast("long")
            .alias("file_id")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_partkey").alias("min_part"),
            F.max("l_partkey").alias("max_part"),
            F.min("l_suppkey").alias("min_supp"),
            F.max("l_suppkey").alias("max_supp"),
        )
        .orderBy("file_id")
    )

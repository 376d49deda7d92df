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

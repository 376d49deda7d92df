"""Testdata table loading helpers.

The driver's synthetic tables (TESTDATA.md) are the substrate every
registry query runs on. Loading is plain columnar parquet scans —
Catalyst prunes columns and pushes filters into the scan, so callers
just `load()` and express the plan declaratively.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one synthetic table.

    `events.ts` has shipped as two different parquet types across
    testdata generations, so the shim dispatches on the SCANNED type:

    - TIMESTAMP(NANOS): with `spark.sql.legacy.parquet.nanosAsLong` it
      scans as long nanoseconds and is converted via exact integer
      division (`div` — no double round-trip, which would lose
      precision above 2^53 ns). Truncation-toward-zero equals DuckDB's
      ns→µs truncation for positive epochs, so oracle values match.
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): scans as TIMESTAMP_NTZ
      (requires `spark.sql.parquet.inferTimestampNTZ.enabled`, set
      defensively below — without it the scan yields session-local
      TIMESTAMP and values become timezone-dependent). NTZ is then cast
      to TIMESTAMP under a UTC session timezone, which is value-
      preserving vs the naive/DuckDB oracle AND satisfies event-time
      consumers: `withWatermark` / `unix_micros` reject TIMESTAMP_NTZ
      (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE — the round-3 streaming
      failure mode).

    The LongType branch assumes the long IS nanoseconds (the only way a
    long `ts` arises here is the nanosAsLong scan of TIMESTAMP(NANOS)).
    A generation storing plain INT64 microseconds with no logical type
    would be 1000x off; epoch-ns magnitudes are ~1e18 vs ~1e15 for µs,
    so the branch sanity-checks before dividing.
    """
    if name == "events":
        # The driver runs queries in its OWN SparkSession which does not
        # set these confs; they are runtime-settable, so set them
        # defensively here rather than relying on session.get_spark.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampType

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # Epoch-ns ≈ 1.7e18 for 2020s dates; epoch-µs ≈ 1.7e15. If
            # the values are µs-magnitude, the nanosAsLong assumption is
            # wrong — use them as µs directly instead of dividing.
            probe = df.selectExpr("max(abs(ts)) AS m").first()["m"] or 0
            micros = F.expr("ts div 1000") if probe > 10**17 else F.col("ts")
            df = df.withColumn("ts", F.timestamp_micros(micros))
        elif not isinstance(ts_type, TimestampType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> None:
    """Register tables as temp views for `spark.sql` queries.

    Registers only the requested tables (default: all), and tolerates a
    per-table load failure so a query that never touches `events` cannot
    die on an `events` scan quirk. A swallowed failure is printed —
    otherwise the query that DOES touch the table dies later with an
    opaque TABLE_OR_VIEW_NOT_FOUND far from the root cause.
    """
    import sys

    for name in tables:
        try:
            load(spark, sf_dir, name).createOrReplaceTempView(name)
        except Exception as exc:
            if name in ("region", "nation"):  # core dims must exist
                raise
            print(
                f"register_views: skipped view '{name}' "
                f"({type(exc).__name__}: {exc})",
                file=sys.stderr,
            )

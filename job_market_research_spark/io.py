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
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): scans directly as a
      (naive) timestamp — pass through unchanged. Naive semantics match
      DuckDB's TIMESTAMP exactly and are independent of the driver
      session's timezone.
    """
    if name == "events":
        # The driver runs queries in its OWN SparkSession which does not
        # set this conf; it is runtime-settable, so set it defensively
        # here rather than relying on session.get_spark having run.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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

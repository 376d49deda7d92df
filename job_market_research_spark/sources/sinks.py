"""Sink operators (SURVEY §2.1 sinks).

The reference's sinks: single-file JSON via driver collect
(transform_job.py:252-269 — replaced here by `coalesce(1)` partitioned
write, no driver materialization), overwrite-mode JSON
(transform_job.py:272-278), uniquely-named object-store uploads
(transform_job.py:241-249), row-by-row Postgres star load
(insert_to_postgres.py:145-264 — replaced by bulk `df.write.jdbc`),
and per-date Excel sheets (backup.py:98-107 — semantically a
partitioned write).

Every registry query is a write→read-back round-trip checked against
the parquet source of truth, so the sink path itself is under the
oracle.
"""

from __future__ import annotations

import os
import uuid
from datetime import date

from pyspark.sql import DataFrame, functions as F, types as T

from job_market_research_spark.io import load
from job_market_research_spark.registry import query
from job_market_research_spark.sources.readers import read_json_with_schema, scratch_dir


def write_json_single(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Single-file JSON output without collect(): `coalesce(1)` folds
    the final stage to one task; upstream stages keep full parallelism
    (unlike the reference's toJSON().collect() which serializes the
    whole result through the driver)."""
    df.coalesce(1).write.mode(mode).json(path)


def run_output_path(base: str, prefix: str = "processed_jobs") -> str:
    """Uniquely-named per-run output location (reference:
    transform_job.py:241-249 `processed_jobs_<date>_<uuid8>.json`)."""
    return os.path.join(base, f"{prefix}_{date.today():%Y%m%d}_{uuid.uuid4().hex[:8]}")


#: Embedded Derby driver (ships in Spark's own jars/ — always on the
#: classpath), used to exercise the real JDBC code path server-less.
DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_memory_url(db: str) -> str:
    """In-memory Derby JDBC URL. Same-JVM only — right for local[N]
    tests; production swaps in a server URL (postgresql://...) and the
    exact same write/read calls apply."""
    return f"jdbc:derby:memory:{db};create=true"


def write_jdbc_star(df: DataFrame, url: str, table: str, mode: str = "append", **props) -> None:
    """Bulk JDBC write for star-schema persistence (reference ships
    the Postgres JDBC jar but loads row-by-row over pg8000;
    insert_to_postgres.py:145-264). One executor-parallel batch insert
    per partition — at scale, `df.repartition(n)` upstream controls
    insert concurrency against the database. Raises cleanly when the
    driver jar or server is missing."""
    try:
        df.write.mode(mode).format("jdbc").options(url=url, dbtable=table, **props).save()
    except Exception as exc:
        raise RuntimeError(
            "JDBC sink unavailable (driver jar or server missing); "
            "use write.parquet staging + external bulk load instead"
        ) from exc


def read_jdbc_partitioned(
    spark,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 4,
    lower: int = 0,
    upper: int = 1_000_000,
    **props,
) -> DataFrame:
    """Parallel JDBC read: with a numeric partition column the scan
    splits into `num_partitions` range-strided queries, one per task —
    the only way a JDBC source scales past one connection. Bounds only
    shape the stride; rows outside them are still read (Spark clamps
    the first/last stride to unbounded)."""
    reader = spark.read.format("jdbc").options(url=url, dbtable=table, **props)
    if partition_column is not None:
        reader = reader.options(
            partitionColumn=partition_column,
            numPartitions=str(num_partitions),
            lowerBound=str(lower),
            upperBound=str(upper),
        )
    return reader.load()


ORDERS_MINI_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)


@query(
    "sink_json_single",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
    WHERE o_orderkey % 10 = 0 ORDER BY o_orderkey
    """,
)
def q_sink_json_single(spark, sf_dir: str) -> DataFrame:
    """Single-file JSON write (no collect) → schema'd read-back."""
    out = scratch_dir("sink_json_single")
    df = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .select("o_orderkey", "o_custkey", "o_orderpriority")
    )
    write_json_single(df, out)
    return read_json_with_schema(spark, out + "/*.json", ORDERS_MINI_SCHEMA).orderBy(
        "o_orderkey"
    )


@query(
    "sink_json_overwrite",
    oracle="""
    SELECT COUNT(*) AS n_rows FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q_sink_json_overwrite(spark, sf_dir: str) -> DataFrame:
    """Overwrite-mode idempotence: write twice, read once — the second
    overwrite fully replaces the first (reference: transform_job.py:
    272-278)."""
    out = scratch_dir("sink_json_overwrite")
    df = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey")
    )
    write_json_single(df, out, mode="overwrite")
    write_json_single(df, out, mode="overwrite")
    schema = T.StructType([T.StructField("o_orderkey", T.LongType())])
    back = read_json_with_schema(spark, out + "/*.json", schema)
    return back.agg(F.count("*").alias("n_rows"))


@query(
    "sink_object_store",
    oracle="""
    SELECT COUNT(*) AS n_rows, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
    FROM orders WHERE o_orderkey % 7 = 0
    """,
)
def q_sink_object_store(spark, sf_dir: str) -> DataFrame:
    """Uniquely-named per-run upload: each invocation writes to a fresh
    `<prefix>_<date>_<uuid8>` path (the reference's bucket hand-off
    naming), then the result is read back from exactly that path."""
    base = scratch_dir("sink_object_store", fresh=True)
    run_path = run_output_path(base)
    df = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 7 == 0)
        .select("o_orderkey")
    )
    df.write.mode("error").json(run_path)  # fresh path must not exist
    schema = T.StructType([T.StructField("o_orderkey", T.LongType())])
    back = read_json_with_schema(spark, run_path + "/*.json", schema)
    return back.agg(
        F.count("*").alias("n_rows"),
        F.sum("o_orderkey").alias("key_sum"),
    )


@query(
    "sink_excel_by_date",
    oracle="""
    SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1 ORDER BY 1
    """,
)
def q_sink_excel_by_date(spark, sf_dir: str) -> DataFrame:
    """One output partition per group (reference: backup.py:98-107
    writes one Excel sheet per collect_date — semantically a
    `partitionBy` write). Round-trip through hive-partitioned parquet."""
    out = scratch_dir("sink_excel_by_date")
    (
        load(spark, sf_dir, "events")
        .select("event_id", "event_type")
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    return back.groupBy("event_type").agg(F.count("*").alias("n")).orderBy("event_type")


@query(
    "sink_jdbc_star",
    oracle="""
    WITH dim AS (
      SELECT ROW_NUMBER() OVER (ORDER BY o_orderpriority) AS id_priority,
             o_orderpriority AS priority
      FROM (SELECT DISTINCT o_orderpriority FROM orders)
    )
    SELECT d.id_priority, d.priority, COUNT(*) AS n_facts
    FROM orders o JOIN dim d ON o.o_orderpriority = d.priority
    GROUP BY 1, 2 ORDER BY 1
    """,
)
def q_sink_jdbc_star(spark, sf_dir: str) -> DataFrame:
    """Star-schema persistence through the REAL JDBC code path: build
    dim + keyed fact, bulk-insert both via `df.write.format('jdbc')`
    into embedded Derby (in Spark's own jars, so the format path —
    dialect, DDL generation, batched executor inserts — is exercised
    end-to-end, server-less), then answer the query from a parallel
    range-partitioned JDBC read-back only. Production = same calls
    with a Postgres URL (reference: insert_to_postgres.py:145-264,
    which loops rows in the driver instead)."""
    from job_market_research_spark.operators.joins import build_dimension

    url = derby_memory_url("sink_jdbc_star")
    orders = load(spark, sf_dir, "orders")
    dim = build_dimension(orders, "o_orderpriority", "id_priority", "priority")
    fact = orders.join(
        F.broadcast(dim), orders.o_orderpriority == dim.priority
    ).select("o_orderkey", "id_priority")
    write_jdbc_star(dim, url, "dim_priority", mode="overwrite", driver=DERBY_DRIVER)
    write_jdbc_star(fact, url, "fact_orders", mode="overwrite", driver=DERBY_DRIVER)

    dim_b = read_jdbc_partitioned(spark, url, "dim_priority", driver=DERBY_DRIVER)
    fact_b = read_jdbc_partitioned(
        spark,
        url,
        "fact_orders",
        partition_column="id_priority",
        num_partitions=4,
        lower=1,
        upper=8,
        driver=DERBY_DRIVER,
    )
    return (
        fact_b.join(F.broadcast(dim_b), "id_priority")
        .groupBy("id_priority", "priority")
        .agg(F.count("*").alias("n_facts"))
        .orderBy("id_priority")
    )


@query(
    "agg_group_export",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS export_month,
           COUNT(*) AS n
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def q_agg_group_export(spark, sf_dir: str) -> DataFrame:
    """Per-group export (reference: backup.py:101-107 pandas
    groupby(date) → one Excel sheet per date). Spark-first: one
    partitioned write — each month lands in its own directory, the
    write itself is the group-by, and the read-back proves every group
    arrived intact. At 100 TB this is the standard date-partitioned
    lake layout; no driver-side group loop."""
    out = scratch_dir("agg_group_export")
    (
        load(spark, sf_dir, "orders")
        .withColumn(
            "export_month", F.date_trunc("month", "o_orderdate").cast("date")
        )
        .select("o_orderkey", "export_month")
        .write.mode("overwrite")
        .partitionBy("export_month")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    return (
        back.groupBy("export_month")
        .agg(F.count("*").alias("n"))
        .orderBy("export_month")
    )


def to_mongo_documents(df: DataFrame, id_col: str) -> DataFrame:
    """Rows → MongoDB-style JSON documents with an `_id` field
    (reference: mongodb_connect.py:8-30 insert_many of scraped dicts).
    The real connector is `df.write.format('mongodb')` with the Spark
    connector on the classpath; the document construction — the part
    with query semantics — is this native to_json projection."""
    cols = [F.col(id_col).alias("_id")] + [
        F.col(c) for c in df.columns if c != id_col
    ]
    return df.select(F.to_json(F.struct(*cols)).alias("doc"))


@query(
    "sink_mongo",
    oracle="""
    SELECT o_orderkey AS _id, o_custkey AS custkey,
           o_orderpriority AS priority
    FROM orders WHERE o_orderkey % 13 = 0 ORDER BY _id
    """,
)
def q_sink_mongo(spark, sf_dir: str) -> DataFrame:
    """Mongo-sink semantics without a server: build `_id`-keyed JSON
    documents, stage them (insert_many ≙ partitioned append), then
    parse them back and prove the document payload is lossless."""
    out = scratch_dir("sink_mongo")
    docs = to_mongo_documents(
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 13 == 0)
        .select(
            "o_orderkey",
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderpriority").alias("priority"),
        ),
        id_col="o_orderkey",
    )
    docs.write.mode("overwrite").text(out)
    schema = T.StructType(
        [
            T.StructField("_id", T.LongType()),
            T.StructField("custkey", T.LongType()),
            T.StructField("priority", T.StringType()),
        ]
    )
    back = spark.read.text(out)
    return (
        back.select(F.from_json("value", schema).alias("d"))
        .select("d.*")
        .orderBy("_id")
    )


@query(
    "sink_dynamic_partition_overwrite",
    oracle="""
    WITH batch1 AS (
      SELECT o_orderkey, o_totalprice,
             CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS month
      FROM orders WHERE o_orderkey % 4 IN (0, 1)
    ),
    batch2 AS (
      -- the re-ingest: months >= '1995-07' arrive corrected (price
      -- doubled) and REPLACE those partitions; earlier months keep
      -- batch-1 contents untouched
      SELECT o_orderkey, o_totalprice * 2 AS o_totalprice,
             CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS month
      FROM orders
      WHERE o_orderkey % 4 IN (0, 2)
        AND strftime(o_orderdate, '%Y-%m') >= '1995-07'
    ),
    final AS (
      SELECT * FROM batch1
      WHERE month NOT IN (SELECT DISTINCT month FROM batch2)
      UNION ALL SELECT * FROM batch2
    )
    SELECT month, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE)
             AS total
    FROM final GROUP BY month ORDER BY month
    """,
)
def q_sink_dynamic_partition_overwrite(spark, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — the lakehouse re-ingest contract:
    batch 1 writes a month-partitioned table; batch 2 (a corrected
    backfill covering only months ≥ 1995-07, different row subset,
    doubled prices) is written with mode=overwrite under
    `partitionOverwriteMode=dynamic`, which replaces ONLY the
    partitions batch 2 touches and leaves earlier months' files
    untouched. The oracle replays the semantics relationally
    (batch-1 rows survive exactly where batch 2 has no partition).
    With STATIC overwrite — the default — batch 2 would wipe the
    whole table; at 100 TB this setting is the difference between
    rewriting a day and rewriting a decade, and getting it wrong is
    silent data loss either way.

    The per-write option (`.option("partitionOverwriteMode",
    "dynamic")`) is used rather than the session conf, so the
    behavior is pinned to this sink and cannot leak."""
    out = scratch_dir("sink_dynamic_partition_overwrite")
    src = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    )
    (
        src.filter(F.col("o_orderkey") % 4 < 2)
        .write.mode("overwrite")
        .partitionBy("month")
        .parquet(out)
    )
    (
        src.filter(
            (F.col("o_orderkey") % 4).isin(0, 2)
            & (F.col("month") >= "1995-07")
        )
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("month")
        .parquet(out)
    )
    return (
        spark.read.parquet(out)
        .groupBy("month")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(28,4)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("month")
    )

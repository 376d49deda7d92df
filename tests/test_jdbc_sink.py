"""Real-JDBC round-trip smoke (embedded Derby, ships in Spark jars).

Pins the actual format('jdbc') code path — dialect DDL, batched
executor inserts, range-partitioned parallel read — that the parquet
oracle can't distinguish from staging.
"""

from __future__ import annotations

from job_market_research_spark.sources.sinks import (
    DERBY_DRIVER,
    derby_memory_url,
    read_jdbc_partitioned,
    write_jdbc_star,
)


def test_jdbc_roundtrip_and_parallel_read(spark):
    url = derby_memory_url("test_roundtrip")
    df = spark.range(100).selectExpr("id", "id % 7 AS grp", "CAST(id AS STRING) AS s")
    write_jdbc_star(df, url, "t_round", mode="overwrite", driver=DERBY_DRIVER)
    # overwrite is idempotent (drop + recreate), like the reference's
    # full-reload semantics
    write_jdbc_star(df, url, "t_round", mode="overwrite", driver=DERBY_DRIVER)

    back = read_jdbc_partitioned(
        spark,
        url,
        "t_round",
        partition_column="id",
        num_partitions=4,
        lower=0,
        upper=100,
        driver=DERBY_DRIVER,
    )
    # the scan really splits into one range-stride query per task
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100
    got = sorted((r.id, r.grp, r.s) for r in back.collect())
    want = [(i, i % 7, str(i)) for i in range(100)]
    assert got == want


def test_jdbc_append_accumulates(spark):
    url = derby_memory_url("test_append")
    df = spark.range(10).selectExpr("id")
    write_jdbc_star(df, url, "t_app", mode="overwrite", driver=DERBY_DRIVER)
    write_jdbc_star(df, url, "t_app", mode="append", driver=DERBY_DRIVER)
    back = read_jdbc_partitioned(spark, url, "t_app", driver=DERBY_DRIVER)
    assert back.count() == 20

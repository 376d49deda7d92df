"""Pin predicate pushdown and column pruning in the physical plan —
the two properties that make a 100 TB scan read megabytes instead of
the whole table. SCALE.md cites these as verified; this is the proof."""

from __future__ import annotations

from pyspark.sql import functions as F

from job_market_research_spark.io import load
from job_market_research_spark.sources.readers import q_scan_orc_roundtrip


def _formatted_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_parquet_filter_pushed_and_columns_pruned(spark, sf_dir):
    df = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000)
        .select("o_orderkey", "o_totalprice")
    )
    plan = _formatted_plan(df)
    assert "PushedFilters" in plan and "o_totalprice" in plan.split(
        "PushedFilters"
    )[1].split("\n")[0], plan
    # ReadSchema must carry ONLY the projected columns.
    read_schema = plan.split("ReadSchema")[1].split("\n")[0]
    assert "o_orderkey" in read_schema and "o_totalprice" in read_schema
    assert "o_comment" not in read_schema, read_schema


def test_orc_scan_pushes_predicate(spark, sf_dir):
    plan = _formatted_plan(q_scan_orc_roundtrip(spark, sf_dir))
    scan = plan[plan.index("Scan orc") :]
    assert "PushedFilters" in scan, plan
    assert "o_totalprice" in scan.split("PushedFilters")[1].split("\n")[0]


def test_partition_values_prune_files(spark, sf_dir):
    """A filter on a hive-partition column must appear as a
    PartitionFilter (file-level pruning), not a data filter."""
    import os

    from job_market_research_spark.sources.readers import scratch_dir

    out = scratch_dir("pushdown_partitioned")
    (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .write.mode("overwrite")
        .partitionBy("o_orderpriority")
        .parquet(out)
    )
    df = spark.read.parquet(out).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    plan = _formatted_plan(df)
    pf = plan.split("PartitionFilters")[1].split("\n")[0]
    assert "o_orderpriority" in pf, plan
    # The pruned read returns exactly the partition's rows.
    expected = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .count()
    )
    assert df.count() == expected > 0


def test_filtered_ann_label_predicate_reaches_scan(spark, sf_dir):
    """ann_filtered_topk's metadata predicate must be a PUSHED scan
    filter (pre-filtering), not a post-scan Filter only."""
    from job_market_research_spark.ml.similarity import q_ann_filtered_topk

    plan = (
        q_ann_filtered_topk(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan
    pushed = [
        seg.split("\n")[0]
        for seg in plan.split("PushedFilters")[1:]
    ]
    assert any("label" in p for p in pushed), pushed


def test_bloom_staged_file_carries_filter_and_probe_pushes_down(spark, sf_dir):
    """scan_parquet_bloom's staged file must actually CONTAIN bloom
    filters (compare bytes against an identical write without the
    option — the bloom bitsets add size) and the IN probe must reach
    the scan as a pushed filter."""
    import os

    from job_market_research_spark.sources.readers import (
        q_scan_parquet_bloom,
        scratch_dir,
    )

    df = q_scan_parquet_bloom(spark, sf_dir)
    plan = _formatted_plan(df)
    pushed = plan.split("PushedFilters")[1].split("\n")[0]
    assert "o_custkey" in pushed, plan

    def _bytes(d):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    with_bloom = scratch_dir("scan_parquet_bloom", fresh=False)
    base = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).sort("o_custkey")
    plain = scratch_dir("bloom_control")
    base.write.mode("overwrite").parquet(plain)
    assert _bytes(with_bloom) > _bytes(plain) + 10_000, (
        _bytes(with_bloom),
        _bytes(plain),
    )


def test_nested_struct_leaves_pruned_from_scan(spark, sf_dir):
    """scan_struct_pruning's claim: only the referenced struct leaves
    (meta.priority, meta.total) survive in ReadSchema — the unused
    meta.status leaf must NOT ship through the scan."""
    from job_market_research_spark.sources.readers import (
        q_scan_struct_pruning,
    )

    plan = _formatted_plan(q_scan_struct_pruning(spark, sf_dir))
    read_schema = plan.split("ReadSchema")[1].split("\n")[0]
    assert "priority" in read_schema and "total" in read_schema, read_schema
    assert "status" not in read_schema, read_schema

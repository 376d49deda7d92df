"""Batch sessionization boundaries + compaction file-count invariants."""

from __future__ import annotations

import os

from job_market_research_spark.operators.sessionize import (
    COMPACT_TARGET_BYTES,
    compact_small_files,
    sessionize,
)


def test_sessionize_gap_boundary(spark):
    us = 1_000_000
    rows = [
        # user 1: two events 30min apart exactly -> SAME session (gap > only)
        (1, 1, 30 * 60 * us * 0),
        (2, 1, 30 * 60 * us * 1),
        # then 30min + 1us -> new session
        (3, 1, 60 * 60 * us + 1),
        # user 2: single event
        (4, 2, 5 * us),
    ]
    df = spark.createDataFrame(
        [(e, u, t) for e, u, t in rows], "event_id long, user_id long, t long"
    ).selectExpr("event_id", "user_id", "timestamp_micros(t) AS ts")
    out = {
        (r.user_id, r.event_id): r.session_idx
        for r in sessionize(df).collect()
    }
    assert out[(1, 1)] == 1 and out[(1, 2)] == 1  # exactly 30min: same session
    assert out[(1, 3)] == 2  # 30min + 1us: new session
    assert out[(2, 4)] == 1


def test_compaction_reduces_file_count(spark, tmp_path):
    frag = str(tmp_path / "frag")
    out = str(tmp_path / "out")
    spark.range(50_000).repartition(40).write.parquet(frag)
    n_frag = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    assert n_frag == 40
    n_out = compact_small_files(spark, frag, out, target_bytes=COMPACT_TARGET_BYTES)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == n_out
    assert n_out < n_frag  # 50k longs << 4MiB/file target
    back = spark.read.parquet(out)
    assert back.count() == 50_000
    assert back.selectExpr("sum(id) s").collect()[0].s == 49_999 * 50_000 // 2


def test_morton_interleave_known_values(spark):
    from job_market_research_spark.operators.sessionize import morton_interleave
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5)], "x long, y long"
    )
    out = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", morton_interleave(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    # bit i of x → position 2i; bit i of y → position 2i+1
    assert out[(0, 0)] == 0
    assert out[(1, 0)] == 1
    assert out[(0, 1)] == 2
    # x=3 (011), y=5 (101) → interleaved y2x2 y1x1 y0x0 = 1 0 0 1 1 1 = 39
    assert out[(3, 5)] == 0b100111


def test_zorder_files_cover_bounded_rectangles(spark, sf_dir):
    from job_market_research_spark.registry import load_all

    out = load_all()["maintenance_zorder_cluster"].fn(spark, sf_dir).collect()
    assert len(out) > 8  # data actually spreads over many z-files
    part_range = max(r.max_part for r in out) - min(r.min_part for r in out)
    supp_range = max(r.max_supp for r in out) - min(r.min_supp for r in out)
    # Z-order promise: a single file never spans more than half of
    # BOTH dimensions (a linear sort would span 100% of the second).
    for r in out:
        assert (
            r.max_part - r.min_part <= part_range / 2 + 1
            or r.max_supp - r.min_supp <= supp_range / 2 + 1
        ), (r.file_id, r)

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

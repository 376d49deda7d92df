"""Pins for manifest file-skipping (operators/manifest.py),
dimension-truncation recall (ml/similarity.py) and the degree
power-law profiler (plans/robust_stats.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from job_market_research_spark.io import load
from job_market_research_spark.ml.similarity import (
    TOP_K,
    q_ann_dim_truncation_recall,
)
from job_market_research_spark.operators.manifest import (
    MANIFEST_FILES,
    q_maintenance_manifest_prune,
    stage_range_clustered,
)
from job_market_research_spark.plans.robust_stats import (
    q_profile_degree_powerlaw,
)


def test_manifest_actually_skips_files(spark, sf_dir):
    """The point of the manifest: the half-year window must touch
    fewer files than exist (range clustering makes ranges disjoint),
    while still covering every row in the manifest."""
    _, manifest = stage_range_clustered(spark, sf_dir)
    assert len(manifest) == MANIFEST_FILES
    n_rows = sum(m["n_rows"] for m in manifest)
    assert n_rows == load(spark, sf_dir, "orders").count()
    import datetime

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1996, 7, 1)
    selected = [m for m in manifest if m["lo"] < hi and m["hi"] >= lo]
    assert 0 < len(selected) < MANIFEST_FILES, (
        f"window touches {len(selected)}/{MANIFEST_FILES} files — "
        "no skipping happened"
    )
    # And the pruned query still runs and aggregates.
    assert q_maintenance_manifest_prune(spark, sf_dir).count() > 0


def test_truncation_recall_bounds(spark, sf_dir):
    rows = q_ann_dim_truncation_recall(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_overlap"] <= TOP_K
        assert abs(r["recall_r6"] - r["n_overlap"] / TOP_K) < 1e-9
    # A 16-of-64-dim prefix is far from random: expect SOME overlap
    # somewhere (random overlap of two 10-sets in 500 is ~0.2).
    assert sum(r["n_overlap"] for r in rows) > 0


def test_degree_powerlaw_matches_python_replay(spark, sf_dir):
    hist = {
        r["d"]: r["nd"]
        for r in load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("d"))
        .groupBy("d")
        .agg(F.count("*").alias("nd"))
        .collect()
    }
    pts = [
        (round(math.log(d), 6), round(math.log(nd), 6))
        for d, nd in hist.items()
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    row = q_profile_degree_powerlaw(spark, sf_dir).collect()[0]
    assert row["n_points"] == n
    assert abs(row["slope_r6"] - slope) < 1e-4
    assert abs(row["intercept_r6"] - intercept) < 1e-4


def test_compaction_plan_groups_near_target(spark, sf_dir):
    from job_market_research_spark.operators.manifest import (
        COMPACT_TARGET_ROWS,
        q_maintenance_compaction_plan,
    )

    rows = q_maintenance_compaction_plan(spark, sf_dir).collect()
    assert rows
    # Every group except possibly the last lands within one file's
    # rows of the target (water-filling guarantee).
    max_file = max(r["total_rows"] for r in rows)
    for r in rows[:-1]:
        assert r["total_rows"] >= COMPACT_TARGET_ROWS - max_file
    from job_market_research_spark.io import load

    assert sum(r["total_rows"] for r in rows) == load(
        spark, sf_dir, "orders"
    ).count()


def test_json_key_profile_shows_planted_drift(spark, sf_dir):
    from job_market_research_spark.functions.quality_filters import (
        q_profile_json_keys,
    )

    rows = q_profile_json_keys(spark, sf_dir).collect()
    keys = {r["key"] for r in rows}
    # Planted drift keys all surface; the nested object contributes
    # its TOP-LEVEL key only.
    assert {"k", "src", "device", "v", "meta", "ref"} <= keys


def test_time_travel_reads_only_snapshot_files(spark, sf_dir):
    """The as-of plan must touch only commits ≤ TT_AS_OF, and a later
    snapshot must strictly grow the result."""
    from job_market_research_spark.operators.manifest import (
        TT_AS_OF,
        TT_COMMITS,
        q_scan_manifest_time_travel,
        stage_commit_log,
    )

    log = stage_commit_log(spark, sf_dir)
    assert len(log) == TT_COMMITS
    rows = q_scan_manifest_time_travel(spark, sf_dir).collect()
    assert rows and all(r.snapshot_id == TT_AS_OF for r in rows)
    n_asof = sum(r.n_orders for r in rows)
    # exactly the commit-log row counts of the surviving snapshots
    assert n_asof == sum(n for c, _, n in log if c <= TT_AS_OF)
    # the full table (all commits) is strictly bigger
    assert n_asof < sum(n for _, _, n in log)

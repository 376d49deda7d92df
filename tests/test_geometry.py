"""Object-level checks for ml/geometry.py: parity proves Spark ==
DuckDB; these prove the integer-exact algorithms == the math.
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import functions as F

from job_market_research_spark.io import load
from job_market_research_spark.ml.geometry import (
    DIM,
    FPS_K,
    K_NN,
    N_QUERY,
    PCA_ITERS,
    QUANT,
    fps_select,
    power_iteration_plan,
    as_int_vec,
    q_ml_knn_classify,
    q_sample_fps_diversity,
)


def _int_matrix(spark, sf_dir):
    rows = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", as_int_vec("embedding").alias("xi"))
        .orderBy("vec_id")
        .collect()
    )
    return np.array([r["xi"] for r in rows], dtype=np.float64)


def test_pca_matches_numpy_replica(spark, sf_dir):
    """The distributed power iteration must reproduce a float64 numpy
    replica of the same integer algorithm exactly (every intermediate
    is either an exact integer or a deterministic double)."""
    X = _int_matrix(spark, sf_dir)
    # Exact replica with Python ints (decimal-grade, no float error):
    Xi = X.astype(object).astype(int)
    v = [10**9] * DIM
    for _ in range(PCA_ITERS):
        dots = [sum(int(Xi[r, i]) * v[i] for i in range(DIM)) for r in range(len(Xi))]
        w = [
            sum(int(Xi[r, j]) * dots[r] for r in range(len(Xi)))
            for j in range(DIM)
        ]
        wd = [float(x) for x in w]
        m = max(abs(x) for x in wd)
        v = [math.floor((wd[j] / m) * 1.0e9) for j in range(DIM)]
    s2 = float(sum(c * c for c in v))
    expected = [round(v[j] / math.sqrt(s2), 6) for j in range(DIM)]

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_int_vec("embedding").alias("xi")
    )
    got = {
        r["dim_idx"]: r["pc1_r6"] for r in power_iteration_plan(emb).collect()
    }
    for j in range(DIM):
        assert got[j] == expected[j], (j, got[j], expected[j])


def test_pca_recovers_planted_direction(spark):
    """On data with one dominant direction the iteration must find it:
    rows = ±(strong e0) + small noise on other dims."""
    rng = np.random.default_rng(7)
    n = 60
    base = np.zeros((n, DIM))
    base[:, 0] = np.where(rng.random(n) < 0.5, 1.0, -1.0) * 10.0
    base += rng.normal(0, 0.05, size=(n, DIM))
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    emb = df.select("vec_id", as_int_vec("embedding").alias("xi"))
    got = {r["dim_idx"]: r["pc1_r6"] for r in power_iteration_plan(emb).collect()}
    assert abs(got[0]) > 0.99
    for j in range(1, DIM):
        assert abs(got[j]) < 0.1


def test_fps_distances_nonincreasing_and_distinct(spark, sf_dir):
    """Greedy k-center invariants: the winning distance is
    nonincreasing over rounds, and no point is picked twice."""
    out = q_sample_fps_diversity(spark, sf_dir).collect()
    assert len(out) == FPS_K
    ids = [r["vec_id"] for r in out]
    assert len(set(ids)) == FPS_K
    dists = [r["sel_dist_r6"] for r in out]
    assert dists[0] is None
    for a, b in zip(dists[1:], dists[2:]):
        assert b <= a + 1e-9


def test_fps_seed_is_min_vec_id(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_int_vec("embedding").alias("xi")
    )
    picked = fps_select(emb, k=3)
    min_id = load(spark, sf_dir, "embeddings").agg(F.min("vec_id")).first()[0]
    assert picked[0] == (0, min_id, None)


def test_knn_votes_bounded_and_labels_valid(spark, sf_dir):
    out = q_ml_knn_classify(spark, sf_dir).collect()
    assert len(out) == N_QUERY
    labels = {
        r["label"]
        for r in load(spark, sf_dir, "embeddings").select("label").distinct().collect()
    }
    for r in out:
        assert 1 <= r["votes"] <= K_NN
        assert r["predicted_label"] in labels

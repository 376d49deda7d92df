"""Contract pins for the mergeable-distinct structures
(operators/sketches.py) and the bucketed concurrency sweep
(operators/intervals.py). Oracle parity (bitmap, sweep) runs in the
registry sweep; these pin the MERGE contracts the oracle can't see
(HLL binaries) and the exactness flags."""

from __future__ import annotations

from job_market_research_spark.operators.intervals import (
    q_window_concurrency_sweep,
)
from job_market_research_spark.operators.sketches import (
    q_agg_bitmap_distinct_users,
    q_agg_hll_partitioned_merge,
)


def test_bitmap_distinct_is_exact_everywhere(spark, sf_dir):
    rows = q_agg_bitmap_distinct_users(spark, sf_dir).collect()
    types = {r["event_type"] for r in rows}
    assert "ALL" in types and len(types) > 1
    for r in rows:
        assert r["bitmap_is_exact"] == 1, r
        assert r["distinct_bitmap"] == r["distinct_exact"], r
        # popcount can never exceed 32 bits per chunk
        assert r["distinct_bitmap"] <= 32 * r["n_chunks"], r


def test_hll_merge_equals_direct_and_error_bounded(spark, sf_dir):
    rows = q_agg_hll_partitioned_merge(spark, sf_dir).collect()
    all_row = next(r for r in rows if r["event_type"] == "ALL")
    # Mergeability: union of per-type sketches agrees with the
    # one-pass sketch to within the advertised bound.
    assert all_row["merge_matches_direct"] == 1
    for r in rows:
        # HLL at default lgK=12 is ~1.6% RSE; 5% is a generous pin —
        # the query self-certifies it (the oracle replays literal TRUE).
        assert r["est_within_5pct"] is True, r


def test_hll_merge_contract_in_estimation_mode(spark):
    """The sf0.001/sf0.01 events tables keep the HLL in exact coupon
    mode, where union-of-partials and direct match bit-for-bit and
    would mask a too-strong contract. At sf0.1 (1500 distinct users,
    estimation mode) the direct sketch answers via HIP while the union
    result must use the composite estimator, so the estimates
    legitimately differ — the round-6 sweep caught `est_merged ==
    est_direct` failing exactly there. Pin the BOUNDED contract at
    estimation-mode cardinality so the small-sf gate can never mask it
    again."""
    import os

    sf01 = "/root/testdata/sf0.1"
    if not os.path.exists(os.path.join(sf01, "events.parquet")):
        import pytest

        pytest.skip("sf0.1 testdata not present")
    rows = q_agg_hll_partitioned_merge(spark, sf01).collect()
    all_row = next(r for r in rows if r["event_type"] == "ALL")
    assert all_row["distinct_exact"] >= 1000  # really estimation mode
    assert all_row["merge_matches_direct"] == 1
    for r in rows:
        assert r["est_within_5pct"] is True, r


def test_concurrency_sweep_invariants(spark, sf_dir):
    rows = q_window_concurrency_sweep(spark, sf_dir).collect()
    assert rows
    # Every session contributes exactly one start and one end.
    assert sum(r["n_boundaries"] for r in rows) % 2 == 0
    for r in rows:
        assert r["peak_concurrency"] >= 1, r

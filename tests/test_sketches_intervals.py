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
    # Mergeability: union of per-type sketches == one-pass sketch.
    assert all_row["merge_matches_direct"] == 1
    for r in rows:
        # HLL at default lgK=12 is ~1.6% RSE; 5% is a generous pin —
        # the query self-certifies it (the oracle replays literal TRUE).
        assert r["est_within_5pct"] is True, r


def test_concurrency_sweep_invariants(spark, sf_dir):
    rows = q_window_concurrency_sweep(spark, sf_dir).collect()
    assert rows
    # Every session contributes exactly one start and one end.
    assert sum(r["n_boundaries"] for r in rows) % 2 == 0
    for r in rows:
        assert r["peak_concurrency"] >= 1, r

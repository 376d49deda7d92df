"""Every registered query must hash-match its DuckDB oracle twin.

This mirrors the driver's t2 correctness gate (BASELINE.md) at the
smoke scale factor so it stays fast enough to run on every change.
"""

from __future__ import annotations

import pytest

from job_market_research_spark.registry import load_all

from .oracle_utils import assert_parity

SPECS = load_all()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    assert_parity(df, duck, spec.oracle, name=name)


def test_every_registration_has_an_oracle():
    """Registry invariant: the driver ERRS (not rows-only-falls-back)
    on `oracle=None` — round 5 proved it with `agg_sketch_prod:
    "no_oracle"`. Engine-specific outputs (sketch estimates) must use
    a CONTRACT oracle instead: emit exact counts + within-bound
    booleans and replay exact + literal TRUE in SQL (see
    agg_sketch_bounds / agg_sketch_prod / agg_hll_partitioned_merge).
    This makes an oracle-less registration a hard pytest failure so
    the `no_oracle` err class can never recur."""
    assert ROWS_ONLY_NAMES == [], (
        f"oracle-less registrations (driver would err): {ROWS_ONLY_NAMES}"
    )

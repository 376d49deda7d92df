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


def test_rows_only_queries_run_and_stay_rare(spark, sf_dir):
    """Oracle-less queries get a weaker driver check (rows only), so
    each must at least execute — and they must stay the exception:
    today EVERY query has an oracle twin, and this asserts coverage
    can't silently erode (was a perpetually-skipped empty parametrize
    when the rows-only set is empty)."""
    for name in ROWS_ONLY_NAMES:
        df = SPECS[name].fn(spark, sf_dir)
        assert df.count() >= 0, name
        assert len(df.schema.fields) > 0, name
    assert len(ROWS_ONLY_NAMES) <= max(2, len(SPECS) // 20), (
        f"oracle coverage eroding: {ROWS_ONLY_NAMES}"
    )

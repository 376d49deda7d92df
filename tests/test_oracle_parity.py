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
    assert_parity(df, duck, spec.oracle, name=name, sf_dir=sf_dir)


def test_empty_ok_allowlist_shape():
    """EMPTY_OK policy (r14 verdict item 1 + ADVICE): every entry is
    (registered name, real scale) → callable non-vacuity probe, and NO
    entry may allowlist sf0.01 — the driver's gate scale must never
    admit an empty-vs-empty comparison."""
    import os

    from .oracle_utils import EMPTY_OK

    for (name, scale), probe in EMPTY_OK.items():
        assert name in SPECS, f"EMPTY_OK names unknown query {name!r}"
        assert os.path.isdir(f"/root/testdata/{scale}"), (
            f"EMPTY_OK scale {scale!r} is not a testdata directory"
        )
        assert scale != "sf0.01", (
            f"EMPTY_OK must never allowlist the driver gate scale: {name}"
        )
        assert callable(probe), (
            f"EMPTY_OK[{name}, {scale}] lacks a non-empty-intermediate probe"
        )


def test_empty_ok_probes_execute(spark, duck, sf_dir):
    """Every EMPTY_OK probe must RUN green at the smoke scale, not just
    exist: the gram-pair probes normally execute only inside the sf0.1
    gate (their queries are non-empty at sf0.001, so the allowlist
    path never fires in this suite) — without this test a bit-rotted
    probe would first fail in the standing sf0.1 gate, after the fact.
    Probes are scale-generic by construction (they prove parity of a
    non-empty intermediate, and all their intermediates are non-empty
    at every scale), so running them here is well-defined."""
    from .oracle_utils import EMPTY_OK

    ran = set()
    for (name, _scale), probe in EMPTY_OK.items():
        if probe in ran:
            continue
        ran.add(probe)
        probe(spark, duck, sf_dir)


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

"""Partition-stability pins for the float-sensitive queries.

The r9 driver-RED incident was an ORDER-dependent double sum whose
value moved with physical partitioning. Full-registry sweeps at
local[8]/sp8, local[32]/sp32 and 64 KiB input splits are run per
session (SCALE.md round-10 notes); this test pins the property in CI
for the queries with the least rounding slack — day-series DECIMAL
sums, the ln-moment reducers, and the stratified allocation — by
re-running each under an adversarial physical layout (tiny input
splits, prime shuffle-partition count) and asserting results are
IDENTICAL to the default layout, value for value.
"""

from __future__ import annotations

import pytest

from job_market_research_spark.registry import load_all
from tests.oracle_utils import normalize, spark_result

SPECS = load_all()

#: Queries whose outputs carry exact decimals or tight r6 rounding
#: derived from corpus-wide reduces — the class where partial-agg
#: order dependence would surface first.
SENSITIVE = [
    "window_holt_linear",
    "window_max_drawdown",
    "window_variance_ratio",
    "window_hurst_exponent",
    "window_kpss_test",
    "ml_chow_test",
    "stat_runs_test",
    "sample_neyman_allocation",
    "text_zipf_fit",
    "text_vocab_jsd",
    "agg_autocorr_lags",
]

_LAYOUT = {
    "spark.sql.shuffle.partitions": "7",  # prime, != any default
    "spark.sql.files.maxPartitionBytes": "65536",  # 64 KiB splits
    "spark.sql.files.openCostInBytes": "0",
}


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_invariant_under_adversarial_layout(spark, sf_dir, name):
    base = normalize(*spark_result(SPECS[name].fn(spark, sf_dir)))
    saved = {k: spark.conf.get(k, None) for k in _LAYOUT}
    try:
        for k, v in _LAYOUT.items():
            spark.conf.set(k, v)
        alt = normalize(*spark_result(SPECS[name].fn(spark, sf_dir)))
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert base == alt, (
        f"{name}: result moved with physical layout — an order-dependent "
        f"reduce survives somewhere (see registry.py float policy)"
    )

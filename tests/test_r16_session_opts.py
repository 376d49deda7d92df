"""Focused checks for the r16 session-2 optimizations.

1. ``salted_join`` must keep its build side on the SHUFFLE path: the
   whole point of salting is to spread one hot key over SALT reducers,
   which requires a shuffle by (key, salt). Catalyst left alone
   broadcasts the 16×-exploded build side whenever it estimates under
   autoBroadcastJoinThreshold — a buckets×|build| broadcast relation,
   measured 2.2–10.6 s vs 1.1–1.6 s shuffled at sf0.1 (r16 A/B min
   0.50×) and exactly the shape salting exists to avoid at 100 TB.

2. ``ml_ols_multivariate``'s moment sums moved from wide-decimal
   product accumulators to scaled-long hi/lo sums (the exact.py r16
   change-2 path, extended to PRODUCTS of scale-2 operands). The
   rewrite is only legal because each product of two scale-2 exact
   values is an exact scale-4 long; pin the bit-identity of the
   scaled-long formulation against the decimal(18,6)-product
   formulation it replaced, on data hitting the edges (zero discount,
   max 2dp money, values straddling the 2^20 hi/lo split).
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import Row, functions as F

from job_market_research_spark.exact import _hilo_sum_as_decimal


def test_salted_join_build_side_stays_shuffled(spark, sf_dir):
    from job_market_research_spark.operators.skew import q_join_salted_skew

    plan = (
        q_join_salted_skew(spark, sf_dir)
        ._jdf.queryExecution()
        .sparkPlan()
        .toString()
    )
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan


def _bits(x):
    return None if x is None else struct.pack("<d", x)


@pytest.fixture(scope="module")
def moment_df(spark):
    # integer-valued qty, 2dp discount/price; price chosen so that
    # price2*price2 straddles the 2^20 split and sums cross it.
    rows = [
        Row(g="a", q=1.0, d=0.00, p=0.01),
        Row(g="a", q=50.0, d=0.10, p=104857.59),
        Row(g="a", q=23.0, d=0.04, p=10.48),
        Row(g="a", q=7.0, d=0.02, p=10.49),
        Row(g="b", q=49.0, d=0.09, p=99999.99),
        Row(g="b", q=2.0, d=0.01, p=0.02),
        Row(g="b", q=31.0, d=0.05, p=55000.55),
    ]
    return spark.createDataFrame(rows)


def test_ols_moment_scaled_long_bit_identity(moment_df):
    dec = lambda c: F.col(c).cast("decimal(18,6)")  # noqa: E731
    ref = (
        moment_df.groupBy("g")
        .agg(
            F.sum(dec("q")).cast("double").alias("sx1"),
            F.sum(dec("d")).cast("double").alias("sx2"),
            F.sum(dec("p")).cast("double").alias("sy"),
            F.sum(dec("q") * dec("q")).cast("double").alias("s11"),
            F.sum(dec("q") * dec("d")).cast("double").alias("s12"),
            F.sum(dec("d") * dec("d")).cast("double").alias("s22"),
            F.sum(dec("q") * dec("p")).cast("double").alias("s1y"),
            F.sum(dec("d") * dec("p")).cast("double").alias("s2y"),
            F.sum(dec("p") * dec("p")).cast("double").alias("syy"),
        )
        .orderBy("g")
        .collect()
    )
    q2 = F.round(F.col("q") * 100).cast("long")
    d2 = F.round(F.col("d") * 100).cast("long")
    p2 = F.round(F.col("p") * 100).cast("long")

    def s2(v, alias):
        return (_hilo_sum_as_decimal(v) / F.lit(100)).cast("double").alias(alias)

    def s4(v, alias):
        return (
            (_hilo_sum_as_decimal(v) / F.lit(10_000)).cast("double").alias(alias)
        )

    new = (
        moment_df.groupBy("g")
        .agg(
            s2(q2, "sx1"),
            s2(d2, "sx2"),
            s2(p2, "sy"),
            s4(q2 * q2, "s11"),
            s4(q2 * d2, "s12"),
            s4(d2 * d2, "s22"),
            s4(q2 * p2, "s1y"),
            s4(d2 * p2, "s2y"),
            s4(p2 * p2, "syy"),
        )
        .orderBy("g")
        .collect()
    )
    assert len(ref) == len(new)
    for ra, rb in zip(ref, new):
        da, db = ra.asDict(), rb.asDict()
        for k in da:
            if k == "g":
                assert da[k] == db[k]
            else:
                assert _bits(da[k]) == _bits(db[k]), (k, da[k], db[k])

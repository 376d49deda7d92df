"""Machine check of the registry float-exactness policy.

registry.py's hash-matching policy says: aggregates over DOUBLE columns
must be computed in DECIMAL (order-independent) and cast back — never
``F.sum(double).cast(decimal)``, which sums in order-dependent binary
DOUBLE first and launders the nondeterminism into an exact-looking
DECIMAL. That silent violation produced round 9's only two driver-RED
rows (window_holt_linear / window_max_drawdown: ten sites in
plans/timeseries.py summed o_totalprice in DOUBLE before the
decimal(18,2) cast, so a partial-aggregation reorder could flip a cent
in the hashed output).

This test walks the ANALYZED logical plan of every registered query and
fails on any Cast-to-Decimal whose input is a Sum over a DoubleType
child — directly (``cast(sum(x) as decimal)``) or through the alias
indirection Catalyst introduces for window sums (``Window [sum(x) ...
AS _w0]; Project [cast(_w0 as decimal)]``). A sum whose child is
already DECIMAL (the policy-compliant shape) never matches; a DOUBLE
sum that stays DOUBLE and gets rounded is the `_r6` convention and is
likewise out of scope here.
"""

from __future__ import annotations

import pytest

from job_market_research_spark.registry import load_all

SPECS = load_all()


def _walk_plan(node):
    yield node
    for i in range(node.children().size()):
        yield from _walk_plan(node.children().apply(i))


def _walk_expr(e):
    yield e
    for i in range(e.children().size()):
        yield from _walk_expr(e.children().apply(i))


def _is_double_sum(e) -> bool:
    """True if `e` is Sum/WindowExpression/AggregateExpression chain
    bottoming out in Sum(<DoubleType child>) with nothing else (no
    round, no cast) in between."""
    while e.getClass().getSimpleName() in (
        "WindowExpression",
        "AggregateExpression",
    ):
        e = e.children().apply(0)
    if e.getClass().getSimpleName() != "Sum":
        return False
    return str(e.children().apply(0).dataType()) == "DoubleType"


def risky_double_sum_casts(df) -> list[str]:
    """Every Cast-to-Decimal over an order-dependent DOUBLE sum in the
    analyzed plan, as strings (empty = policy-clean)."""
    plan = df._jdf.queryExecution().analyzed()
    nodes = list(_walk_plan(plan))

    # Pass 1: exprIds of aliases whose payload IS a bare double-sum
    # (Catalyst hoists window sums into a Window node and the cast
    # lands in a downstream Project over the alias's attribute).
    tainted: set[int] = set()
    for node in nodes:
        exprs = node.expressions()
        for i in range(exprs.size()):
            for e in _walk_expr(exprs.apply(i)):
                if e.getClass().getSimpleName() == "Alias" and _is_double_sum(
                    e.child()
                ):
                    tainted.add(e.exprId().id())

    # Pass 2: decimal casts over a direct double-sum or a tainted attr.
    flags: list[str] = []
    for node in nodes:
        exprs = node.expressions()
        for i in range(exprs.size()):
            for e in _walk_expr(exprs.apply(i)):
                if e.getClass().getSimpleName() != "Cast":
                    continue
                if "Decimal" not in str(e.dataType()):
                    continue
                child = e.children().apply(0)
                kind = child.getClass().getSimpleName()
                if _is_double_sum(child) or (
                    kind == "AttributeReference"
                    and child.exprId().id() in tainted
                ):
                    flags.append(str(e))
    return flags


def test_detector_catches_the_round9_pattern(spark):
    """Self-test: the exact shapes that caused the r9 driver-RED rows
    (and their window variant) must flag; the policy-compliant
    sum-in-decimal shape must not."""
    from pyspark.sql import Window, functions as F

    base = spark.range(10).select("id", (F.col("id") * 1.5).alias("x"))
    bad_agg = base.groupBy((F.col("id") % 2).alias("g")).agg(
        F.sum("x").cast("decimal(18,2)").alias("v")
    )
    assert risky_double_sum_casts(bad_agg), "agg pattern not detected"

    w = Window.partitionBy(F.col("id") % 2).orderBy("id")
    bad_win = base.select(F.sum("x").over(w).cast("decimal(18,2)").alias("c"))
    assert risky_double_sum_casts(bad_win), "window pattern not detected"

    good = base.groupBy((F.col("id") % 2).alias("g")).agg(
        F.sum(F.col("x").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("v")
    )
    assert not risky_double_sum_casts(good), "false positive on decimal sum"


@pytest.mark.parametrize("name", sorted(SPECS))
def test_no_double_sum_laundered_into_decimal(spark, sf_dir, name):
    flags = risky_double_sum_casts(SPECS[name].fn(spark, sf_dir))
    assert not flags, (
        f"{name}: DOUBLE sum cast to DECIMAL — order-dependent partial "
        f"aggregation can flip the hashed output (the r9 holt/drawdown "
        f"bug). Cast BEFORE the sum: F.sum(col.cast('decimal(p,s)')). "
        f"Sites: {flags}"
    )

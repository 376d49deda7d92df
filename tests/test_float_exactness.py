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


#: Arithmetic wrappers a laundering chain may pass through: these can
#: carry a 1-ulp sum divergence straight into an exact-typed sink
#: (Round does NOT sanitize — round(sum·100) flips when the divergence
#: straddles a .5 boundary, the shape two of the r9-fixed sites had).
_CHAIN = {
    "Alias",
    "Multiply",
    "Divide",
    "Add",
    "Subtract",
    "UnaryMinus",
    "Abs",
    "Round",
    "BRound",
    "Cast",
}

#: Exact-typed cast targets: landing an order-dependent DOUBLE sum in
#: any of these claims a determinism the sum does not have.
_EXACT_TARGETS = ("LongType", "IntegerType", "ShortType", "ByteType")


def _reaches_double_sum(e, tainted: set[int]) -> bool:
    """Does this expression's arithmetic chain bottom out in a bare
    DOUBLE sum (directly or via a tainted attribute)?"""
    if _is_double_sum(e):
        return True
    cn = e.getClass().getSimpleName()
    if cn == "AttributeReference":
        return e.exprId().id() in tainted
    if cn in _CHAIN:
        return any(
            _reaches_double_sum(e.children().apply(i), tainted)
            for i in range(e.children().size())
        )
    return False


def risky_double_sum_casts(df) -> list[str]:
    """Every exact-typed cast (DECIMAL or integral) whose arithmetic
    chain bottoms out in an order-dependent DOUBLE sum, from the
    analyzed plan (empty = policy-clean). Chains may pass through
    round/×/÷/alias and Catalyst's window-alias indirection."""
    plan = df._jdf.queryExecution().analyzed()
    nodes = list(_walk_plan(plan))

    # Pass 1 (to fixpoint): exprIds of aliases whose payload chains to
    # a bare double-sum — Catalyst hoists window sums into a Window
    # node and aggregate results travel to downstream Projects as
    # attributes, sometimes through more than one Alias hop.
    tainted: set[int] = set()
    while True:
        grew = False
        for node in nodes:
            exprs = node.expressions()
            for i in range(exprs.size()):
                for e in _walk_expr(exprs.apply(i)):
                    if (
                        e.getClass().getSimpleName() == "Alias"
                        and e.exprId().id() not in tainted
                        and _reaches_double_sum(e.child(), tainted)
                    ):
                        tainted.add(e.exprId().id())
                        grew = True
        if not grew:
            break

    # Pass 2: exact-typed casts whose input chains to a double-sum.
    flags: list[str] = []
    for node in nodes:
        exprs = node.expressions()
        for i in range(exprs.size()):
            for e in _walk_expr(exprs.apply(i)):
                if e.getClass().getSimpleName() != "Cast":
                    continue
                dt = str(e.dataType())
                if "Decimal" not in dt and dt not in _EXACT_TARGETS:
                    continue
                if _reaches_double_sum(e.children().apply(0), tainted):
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

    # round(sum(double)·100) cast to LONG — the chow/kpss laundering
    # shape: Round does not sanitize a 1-ulp divergence at a .5
    # boundary, so the integral cast must flag too
    bad_long = base.groupBy((F.col("id") % 2).alias("g")).agg(
        F.round(F.sum("x") * 100).cast("long").alias("y")
    )
    assert risky_double_sum_casts(bad_long), "round->long pattern not detected"

    good = base.groupBy((F.col("id") % 2).alias("g")).agg(
        F.sum(F.col("x").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("v")
    )
    assert not risky_double_sum_casts(good), "false positive on decimal sum"
    good_long = base.groupBy((F.col("id") % 2).alias("g")).agg(
        (F.sum(F.col("x").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("y")
    )
    assert not risky_double_sum_casts(good_long), (
        "false positive on decimal-sum -> long"
    )


@pytest.mark.parametrize("name", sorted(SPECS))
def test_no_double_sum_laundered_into_decimal(spark, sf_dir, name):
    flags = risky_double_sum_casts(SPECS[name].fn(spark, sf_dir))
    assert not flags, (
        f"{name}: DOUBLE sum cast to DECIMAL — order-dependent partial "
        f"aggregation can flip the hashed output (the r9 holt/drawdown "
        f"bug). Cast BEFORE the sum: F.sum(col.cast('decimal(p,s)')). "
        f"Sites: {flags}"
    )

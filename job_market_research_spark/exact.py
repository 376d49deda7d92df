"""Cross-engine exactness helpers.

Double-precision aggregation is order-dependent; Spark's partial
(map-side) aggregation and DuckDB's sequential sum would differ in the
low bits and break the driver's value-hash compare. Computing in
DECIMAL makes the aggregate exact and therefore order-independent; the
final cast back to DOUBLE is deterministic on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

DEC = "decimal(18,4)"


def dec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def exact_sum(col: str | Column, alias: str) -> Column:
    """SUM computed exactly in decimal, emitted as DOUBLE.

    Oracle twin: ``CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)``.
    """
    return F.sum(dec(col)).cast("double").alias(alias)


def exact_avg(col: str | Column, alias: str) -> Column:
    """AVG as exact-decimal sum / count, both sides in DOUBLE.

    Oracle twin: ``CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c)).cast("double") / F.count(c)).alias(alias)


def revenue_expr() -> Column:
    """l_extendedprice * (1 - l_discount) in exact decimal (TPC-H style)."""
    return dec("l_extendedprice") * (F.lit(1).cast(DEC) - dec("l_discount"))


ORACLE_SUM = "CAST(SUM(CAST({col} AS DECIMAL(18,4))) AS DOUBLE)"
ORACLE_AVG = "CAST(SUM(CAST({col} AS DECIMAL(18,4))) AS DOUBLE) / COUNT({col})"
#: The product sum carries scale 8; REDUCE to scale 4 before the double
#: cast. Money data is 2dp × 2dp → products have exactly ≤4 decimals, so
#: the scale cut is exact — and a scale-4 integer magnitude stays below
#: 2^53 far longer, where DuckDB's two-step decimal→double conversion
#: (int128→double, then /10^scale) stops being correctly rounded vs
#: Spark's BigDecimal.doubleValue (observed: 1-ulp divergence at sf0.1
#: on a ~5e9 revenue sum at scale 8; exact at scale 4).
ORACLE_REVENUE = (
    "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))"
    " * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))"
    " AS DECIMAL(38,4)) AS DOUBLE)"
)


def revenue_sum(alias: str) -> Column:
    """SUM of the exact-decimal revenue, scale-reduced to 4 (exact for
    2dp money) before the double cast — keeps the decimal→double
    conversion correctly rounded on BOTH engines at any magnitude."""
    return (
        F.sum(revenue_expr()).cast("decimal(38,4)").cast("double").alias(alias)
    )

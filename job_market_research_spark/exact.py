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
ORACLE_REVENUE = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))"
    " * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)"
)

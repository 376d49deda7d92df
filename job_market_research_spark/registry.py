"""Query registry: every SURVEY §2 operator as (Spark query, DuckDB oracle).

Each operator from the survey inventory is registered under its §2 ID as
a callable ``(spark, sf_dir) -> DataFrame`` together with an ANSI-SQL
oracle string DuckDB runs on the same parquet tables. The driver
(`__spark_entry__.py`) compares row counts, schemas and
order-insensitive value hashes — so both sides must agree on column
NAMES and exact VALUES.

Float-exactness policy (critical for hash matching):
- Aggregates over doubles are computed in DECIMAL (exact) and cast back
  to DOUBLE at the end: ``CAST(SUM(CAST(x AS DECIMAL(18,4))) AS
  DOUBLE)``. Decimal sums are order-independent, so Spark's partial
  aggregation and DuckDB's single-threaded sum produce bit-identical
  results.
- Averages are expressed as exact-decimal sum divided by count, both in
  DOUBLE, on both sides.
- Genuinely-float math (cosine similarity) is rounded to 6 decimals on
  both sides; with <=64-element vectors the cross-engine summation
  error (~1e-13) cannot straddle a rounding boundary in practice.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    """Register an operator query with its oracle-SQL twin."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query-defining module, then return the registry."""
    # Imports are for the registration side effects.
    from job_market_research_spark.plans import analytics, windows_analytic  # noqa: F401
    from job_market_research_spark.operators import (  # noqa: F401
        bucketing,
        cleaning,
        dedup,
        joins,
        nested,
        setops,
        skew,
        temporal_joins,
    )
    from job_market_research_spark.functions import dates, enrich, scalars, text  # noqa: F401
    from job_market_research_spark.sources import readers, sinks  # noqa: F401
    from job_market_research_spark.ml import neardup, sampling, similarity  # noqa: F401
    from job_market_research_spark.multimodal import binary_ops  # noqa: F401
    from job_market_research_spark.streaming import sessions, windows  # noqa: F401

    return REGISTRY


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_map() -> dict[str, str]:
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None}

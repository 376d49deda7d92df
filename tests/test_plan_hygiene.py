"""Physical-plan hygiene over the ENTIRE registry.

The scale claims in README/SURVEY §4 are assertions about plans, not
prose — so test them as plans. For every registered query at the smoke
scale factor:

- no `CartesianProduct` (a shuffle-cartesian anywhere is a scale bug;
  the deliberate 1-row query-vector cross joins plan as
  BroadcastNestedLoopJoin, which stays legal)
- no `BatchEvalPython` (row-at-a-time Python UDFs are banned — the
  engine's Python boundary is Arrow-batched only: MapInPandas /
  FlatMapGroupsInPandas / ArrowEvalPython)
"""

from __future__ import annotations

import pytest

from job_market_research_spark.registry import load_all

SPECS = load_all()


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_no_cartesian_no_row_udf(spark, sf_dir, name):
    df = SPECS[name].fn(spark, sf_dir)
    plan = _physical_plan(df)
    assert "CartesianProduct" not in plan, f"{name}: shuffle-cartesian in plan"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF in plan"

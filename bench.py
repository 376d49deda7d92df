#!/usr/bin/env python
"""Headline-query benchmark.

Runs the flagship analytical queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized through the `noop` sink (forces the
whole plan, no driver collect). Headline queries run REPS times (2)
and report the per-query MIN: at sf0.1 the plans are all-broadcast
single-stage and wall clock is dominated by planning + codegen +
machine-load noise (observed spread on identical plans: 7.3-8.7 s),
so the min isolates steady-state plan cost from ambient noise. Set
BENCH_ALL=1 to time every registered query once instead.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from job_market_research_spark.registry import load_all
from job_market_research_spark.session import get_spark

HEADLINE = [
    "join_star_wide",
    "join_sector_count",
    "agg_count_2keys",
    "agg_monthly_growth",
    "topk_hard_skills",
    "topk_companies",
    "agg_count_distinct",
    "join_skill_profile",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    specs = load_all()
    names = (
        sorted(specs)
        if os.environ.get("BENCH_ALL")
        else [n for n in HEADLINE if n in specs]
    )

    spark = get_spark(app_name="jmrs-bench")
    # JVM + first-plan warmup so timings measure the queries, not startup.
    specs[names[0]].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    reps = 1 if os.environ.get("BENCH_ALL") else int(os.environ.get("BENCH_REPS", "2"))
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

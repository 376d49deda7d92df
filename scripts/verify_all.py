#!/usr/bin/env python
"""Driver-style verification: every registered query vs its DuckDB
oracle at a given scale factor (default sf0.01, the driver's t2 gate),
plus the __spark_entry__ smoke check.

Usage:
    python scripts/verify_all.py [sf_dir] [--only name1,name2]

Exit code 0 = everything green. Mirrors tests/oracle_utils.assert_parity
(the same row/schema/type-kind/value-hash invariants the driver checks).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from job_market_research_spark.io import TABLES
    from job_market_research_spark.session import get_spark
    from tests.oracle_utils import assert_parity

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = args[0] if args else "/root/testdata/sf0.01"
    only: set[str] | None = None
    for a in sys.argv[1:]:
        if a.startswith("--only"):
            only = set(a.split("=", 1)[1].split(","))

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    if only is None:
        df = entry_mod.entry(spark)
        assert len(df.collect()) > 0, "entry() smoke check returned no rows"

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    names = sorted(only if only is not None else queries)
    t0, failed = time.time(), []
    for name in names:
        try:
            if name in oracles:
                assert_parity(
                    queries[name](spark, sf), con, oracles[name], name=name, sf_dir=sf
                )
            else:
                assert queries[name](spark, sf).count() >= 0
        except Exception as exc:  # keep going: report ALL failures
            failed.append(name)
            print(f"FAIL {name}: {exc}", file=sys.stderr)
    n_oracle = sum(1 for n in names if n in oracles)
    print(
        f"{'FAIL' if failed else 'VERIFY OK'}: {n_oracle} oracle + "
        f"{len(names) - n_oracle} rows-only at {sf} in {time.time() - t0:.0f}s"
        + (f"; failed: {failed}" if failed else "")
    )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Registry-wide DRIVER-HASH SIMULATION: the pandas canonicalization
path the driver's value hash actually takes (Spark `toPandas()` vs
DuckDB `.df()`, column-name-sorted, row-sorted, CSV-rendered, sha256),
as opposed to scripts/verify_all.py's row-object compare.

This is the layer where the r9-r10 incident lived: two queries whose
VALUES matched on every row-object compare hashed differently because
their DECIMAL output rendered as `Decimal` objects via Spark and
float64 via DuckDB. Run this after adding any query with a new output
type; tests/test_plan_hygiene.py's emission-type allowlist is the
static guard, this is the dynamic one.

Usage: python scripts/driver_hash_sim.py [sf_dir] [--only=name1,name2]
The full sweep is ~5 min; --only makes the pre-commit changed-set
check seconds (r11 verdict item 6 — run it on every new or
emission-changed query before committing).
Exit 0 = every (selected) oracle-carrying query's pandas hash matches.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _hash_frame(p) -> str:
    p = p[sorted(p.columns)].copy()
    if len(p):
        p = p.sort_values(list(p.columns)).reset_index(drop=True)
    return hashlib.sha256(p.to_csv(index=False).encode()).hexdigest()


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from job_market_research_spark.io import TABLES
    from job_market_research_spark.session import get_spark

    args = sys.argv[1:]
    only: set[str] | None = None
    for a in list(args):
        if a.startswith("--only="):
            only = {n for n in a[len("--only="):].split(",") if n}
            args.remove(a)
    sf = args[0] if args else "/root/testdata/sf0.01"
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    t0, mismatched, errored = time.time(), [], []
    for name in sorted(queries):
        if name not in oracles or (only is not None and name not in only):
            continue
        try:
            sp = queries[name](spark, sf).toPandas()
            dk = con.sql(oracles[name]).df()
            if _hash_frame(sp) != _hash_frame(dk):
                mismatched.append(name)
                print(f"MISMATCH {name}", file=sys.stderr)
        except Exception as exc:
            errored.append(name)
            print(f"ERROR {name}: {exc}", file=sys.stderr)
    n = sum(
        1
        for q in queries
        if q in oracles and (only is None or q in only)
    )
    scope = "" if only is None else f" (changed-set of {len(only)})"
    print(
        f"DRIVER-SIM: {n - len(mismatched) - len(errored)}/{n} pandas-hash "
        f"match at {sf} in {int(time.time() - t0)}s{scope}; "
        f"mismatched={mismatched} errored={errored}"
    )
    return 1 if (mismatched or errored) else 0


if __name__ == "__main__":
    raise SystemExit(main())

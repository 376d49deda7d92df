#!/usr/bin/env python
"""Runtime audit: which registered queries EXECUTE a partitionBy-less
window, per Spark's own `WindowExec: No Partition Defined` warning.

tests/test_plan_hygiene.py checks the RETURNED DataFrame's plan text,
which cannot see plans a query executes eagerly inside its body (e.g.
sink_jdbc_star's dimension build runs before the JDBC write). This
script runs every registered query at the smoke scale factor, watches
its own stderr for the JVM warning, and diffs the hits against the
test's ALLOWED_GLOBAL_WINDOW allowlist — both directions: un-allowlisted
hits (prove the bound and allowlist, or rewrite) AND allowlisted names
that never warn (stale allowlist entries).

Round-9 baseline: 41 runtime hits, all allowlisted with stated bounds,
zero stale entries.

Usage: python scripts/audit_global_windows.py [sf_dir]
Exit status 1 if either diff is non-empty.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    # Re-exec with stderr tee'd to a file we can tail per query.
    errpath = "/tmp/audit_global_windows.stderr"
    if os.environ.get("_AUDIT_CHILD") != "1":
        os.environ["_AUDIT_CHILD"] = "1"
        with open(errpath, "wb") as f:
            os.dup2(f.fileno(), 2)
        os.execv(sys.executable, [sys.executable, os.path.abspath(__file__), sf])

    from job_market_research_spark.registry import load_all
    from job_market_research_spark.session import get_spark

    specs = load_all()
    spark = get_spark(app_name="audit-global-windows")
    err = open(errpath, "rb")
    hits, errs = [], []
    for name in specs:
        pos = err.seek(0, 2)
        try:
            specs[name].fn(spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # noqa: BLE001 - audit must keep going
            errs.append((name, str(e)[:80]))
            continue
        err.seek(pos)
        if b"No Partition Defined" in err.read():
            hits.append(name)

    src = open(
        os.path.join(os.path.dirname(__file__), "..", "tests", "test_plan_hygiene.py")
    ).read()
    allowed = set(re.findall(r'^    "([a-z0-9_]+)":', src, re.M))
    unlisted = sorted(set(hits) - allowed)
    stale = sorted(allowed - set(hits))
    print(f"queries: {len(specs)}  runtime hits: {len(hits)}  errors: {len(errs)}")
    if errs:
        print("errors:", errs)
    print("hits NOT in allowlist:", unlisted or "none")
    print("allowlisted but never hit:", stale or "none")
    return 1 if (unlisted or stale or errs) else 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Regenerate OPERATORS.md from the live query registry.

Run from the repo root: python scripts/gen_operators_md.py
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from job_market_research_spark.registry import load_all  # noqa: E402


def main() -> None:
    specs = load_all()
    by_module: dict[str, list] = defaultdict(list)
    for name, spec in sorted(specs.items()):
        module = spec.fn.__module__.replace("job_market_research_spark.", "")
        first_line = (spec.doc or "").strip().splitlines()
        summary = first_line[0].rstrip() if first_line else ""
        by_module[module].append((name, summary, spec.oracle is not None))

    lines = [
        "# Operator inventory (generated)",
        "",
        f"{len(specs)} registered queries — every SURVEY.md §2 operator plus the",
        "beyond-reference training-data-pipeline operators. `oracle` = the",
        "driver hash-matches the query against an independent DuckDB SQL twin;",
        "`rows-only` = no exact SQL twin exists (approximate sketches).",
        "",
        "Regenerate with `python scripts/gen_operators_md.py`.",
        "",
    ]
    for module in sorted(by_module):
        lines.append(f"## `{module}`")
        lines.append("")
        lines.append("| query | check | what it does |")
        lines.append("|---|---|---|")
        for name, summary, has_oracle in by_module[module]:
            check = "oracle" if has_oracle else "rows-only"
            lines.append(f"| `{name}` | {check} | {summary} |")
        lines.append("")

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "OPERATORS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}: {len(specs)} queries, {sum(1 for s in specs.values() if s.oracle)} with oracle")


if __name__ == "__main__":
    main()

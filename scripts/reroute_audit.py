#!/usr/bin/env python
"""Cache-substitution audit: which registered queries' physical plans
change when every per-app staged frame already exists?

Spark's CacheManager replaces any logical subtree canonically equal to
a cached plan with an InMemoryRelation read — including subtrees of
OTHER queries that never asked for staging (the hazard ADVICE r12
flagged for the round-12 staged frames). PLANS.md is generated in
registry order inside one app, so a query built BEFORE a sibling's
staging call shows its fused plan there; in a different execution
order it could silently reroute.

This audit makes the reroute set explicit: construct every staged
frame first (by building the owner queries), then build all 465 plans
and diff each plan's staged-read count against the committed PLANS.md.

r13 result (recorded in SCALE.md "cache-substitution boundary"):
exactly 3 queries change —

  dedup_bridge_conflict   0 -> 1  (rides the dedup bridge-pairs cache)
  ml_eval_retrieval_ndcg  0 -> 2  (rides the ANN normalized-embedding
                                   cache, staged r12 commit d4d09f5)
  ann_index_build         2 -> 1  (its partitioned index read collapses
                                   onto the shared normalized table)

A/B at sf0.1 (min-of-3, same app, warm cache): rerouted/fused =
0.82x for dedup_bridge_conflict, 0.87x for ml_eval_retrieval_ndcg —
the substitution is FASTER for both (the cached frames are exactly
their expensive legs), so no distinguishing marker is needed. This is
the opposite boundary from the wedge queries (graph triangle/link
prediction), where the substitution forfeits scan->distinct fusion
and measured 1.4-1.7x SLOWER — those stay pinned fused by
tests/test_plan_hygiene.py. Re-run this audit whenever a new staged
frame is added; a new name appearing here must be adjudicated (A/B at
sf0.1) before the round's gate record.

Run from the repo root: python scripts/reroute_audit.py [sf_dir]
"""

from __future__ import annotations

import importlib.util
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: Queries whose construction registers every staged frame (owners of
#: each staging.app_staged / staged_frame key as of r13).
STAGE_OWNERS = [
    "agg_basket_affinity",
    "ml_naive_bayes_lang",
    "ml_bradley_terry_strength",
    "text_lm_perplexity",
    "window_downsample_lttb",
    "graph_triangle_count",
    "graph_kcore_peel",
    "graph_hits",
    "graph_bfs_hops",
    "graph_label_propagation",
    "dedup_minhash_lsh",
    "ir_bm25f_fielded",
    "text_ccnet_buckets",
    "ann_cosine_topk",
    "dedup_skill_set",
    "dedup_winnowing",  # winnow_fps (r13)
]


def main() -> None:
    spec = importlib.util.spec_from_file_location(
        "plan_census",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "plan_census.py"),
    )
    census = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(census)

    from job_market_research_spark.registry import load_all
    from job_market_research_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="reroute-audit", master="local[4]", shuffle_partitions=4)
    specs = load_all()
    for n in STAGE_OWNERS:
        try:
            specs[n].fn(spark, sf)
        except Exception as exc:
            print(f"OWNER-ERR {n}: {exc!r}"[:140])

    plans: dict[str, int] = {}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for line in open(os.path.join(root, "PLANS.md")):
        m = re.match(r"\| `(\w+)`\\?\*? \| (\d+|—) \| (\d*) \|", line)
        if m:
            plans[m.group(1)] = int(m.group(3) or 0)

    changed = []
    for name in sorted(specs):
        if re.match(r"^(stream_|sink_|source_append)", name):
            continue  # builders run real work; plan shape not at issue
        try:
            s = census.summarize_tree(specs[name].fn(spark, sf))
        except Exception as exc:
            print(f"ERR {name}: {exc!r}"[:120])
            continue
        ref = plans.get(name)
        if ref is not None and s["staged"] != ref:
            changed.append((name, ref, s["staged"]))

    print("=== queries whose staged-read count differs from PLANS.md ===")
    for n, r, c in changed:
        print(f"{n}: plans_md={r} with_all_stages={c}")
    print(f"total changed: {len(changed)}")


if __name__ == "__main__":
    main()

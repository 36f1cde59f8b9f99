"""Generate PLANS.md: one-line physical-plan audit for every registered query.

Run: python tools/plan_inventory.py [sf_dir]

For each query the table records the physical-plan facts the scale review
cares about: how many shuffles, which join strategies, window/generate
nodes, Arrow-batched Python stages (the ONLY Python allowed in plans —
BatchEvalPython is banned by tests/test_plans.py), and whether the scan
pushes filters. Plans are compiled at sf0.001 (plan shape is SF-invariant;
AQE may coalesce at runtime but strategy choices are visible statically).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _distinct(plan: str, *prefixes: str) -> int:
    """Count DISTINCT node lines, not text occurrences: every persisted
    (pinned) relation's plan is REPRINTED under each of its
    InMemoryTableScan consumers, so nested pins multiply raw text counts
    (round-8: the df-capped Jaccard read 121 raw exchange lines for 23
    distinct nodes) while the cached subtree executes ONCE at runtime.
    Distinct lines are a faithful work count because expression ids make
    separate nodes print differently; identical reprints are the cache."""
    seen = set()
    for line in plan.splitlines():
        s = line.strip(" :+-*")
        if any(s.startswith(p) for p in prefixes):
            seen.add(s)
    return len(seen)


def plan_row(name: str, plan: str) -> dict[str, object]:
    return {
        "query": name,
        "exchanges": _distinct(
            plan, "Exchange hashpartitioning", "Exchange rangepartitioning"
        ),
        "bhj": _distinct(plan, "BroadcastHashJoin"),
        "smj": _distinct(plan, "SortMergeJoin"),
        "bnlj": _distinct(plan, "BroadcastNestedLoopJoin"),
        "window": _distinct(plan, "Window ["),
        "generate": _distinct(plan, "Generate ", "Expand "),
        "arrow_py": _distinct(
            plan, "MapInPandas", "FlatMapGroupsInPandas", "ArrowEvalPython"
        ),
        "pushed": "yes" if re.search(r"PushedFilters: \[[^\]]", plan) else "",
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from vectra_player_spark import plans
    from vectra_player_spark.session import get_spark

    spark = get_spark("plan-inventory")
    # PLANS.md documents the LAYOUT-ABSENT default shapes: point layout
    # discovery at an empty scratch root so whatever bucketed layouts sit
    # in the shared /tmp root can't leak into the audit (routed shapes
    # are pinned by test_skew_bucketing/test_layout_incremental instead).
    import tempfile

    spark.conf.set(
        "spark.vectra.bucketed.location",
        tempfile.mkdtemp(prefix="plan_inventory_no_layouts_"),
    )
    rows = []
    for name, spec in sorted(plans.QUERIES.items()):
        try:
            df = spec.spark_fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            rows.append(plan_row(name, plan))
        except Exception as e:  # noqa: BLE001
            rows.append({"query": name, "error": str(e)[:80]})

    cols = ["query", "exchanges", "bhj", "smj", "bnlj", "window", "generate", "arrow_py", "pushed"]
    lines = [
        "# PLANS — physical-plan inventory (auto-generated: tools/plan_inventory.py)",
        "",
        "Columns: shuffle Exchange count; BroadcastHashJoin / SortMergeJoin /",
        "BroadcastNestedLoopJoin counts (BNLJ only ever broadcasts parameter",
        "grids — pinned by tests/test_plans.py); Window and Generate/Expand",
        "nodes; Arrow-batched Python stages (row-at-a-time BatchEvalPython is",
        "banned by test); whether the parquet scan has PushedFilters.",
        "Since round 6 the by-design single-partition windows (duration",
        "histograms, bucket rollups) partition on a constant column",
        "(operators/windows.single_group), so their former",
        "Exchange SinglePartition counts here as one hashpartitioning —",
        "same physical exchange, now visible to this audit.",
        "Since round 8 every column counts DISTINCT node lines, not text",
        "occurrences: a persisted (pinned) relation's subtree is reprinted",
        "under each of its InMemoryTableScan consumers but executes once,",
        "and ReuseExchange reprints likewise run once — raw text counts",
        "overstated nested-pin queries by up to 5x.",
        "",
        "| " + " | ".join(cols) + " |",
        "|" + "---|" * len(cols),
    ]
    for r in rows:
        if "error" in r:
            lines.append(f"| {r['query']} | plan error: {r['error']} |" + " |" * (len(cols) - 2))
        else:
            lines.append("| " + " | ".join(str(r[c]) for c in cols) + " |")
    out = "\n".join(lines) + "\n"
    with open("PLANS.md", "w") as f:
        f.write(out)
    print(f"wrote PLANS.md ({len(rows)} queries)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Plan-reuse audit: per registered query, how many base relations the
optimized plan touches and how many cache (InMemoryRelation) hits it has.

Multi-consumer subtrees whose branches get pruned differently defeat
ReuseExchange (the recurring Catalyst finding — see operators/dedup.py,
operators/rank.py, plans/queries_events.py interval_concurrency_prefix),
and the symptom is the same relation scanned N times in one plan. This
audit surfaced and fixed four offenders in round 4 (data_quality_report
12→1 scan per table, doc_lsh_recall_report's double rep collapse,
doc_fuzzy_prefix_pairs, q2_min_cost_supplier's offers relation). Run it
after adding queries; investigate anything whose relation count is far
above its number of distinct source tables.

Usage: python tools/audit_scans.py [sf_dir] [top_n]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from vectra_player_spark.session import get_spark, release_pins
    import __spark_entry__ as e

    spark = get_spark("audit_scans", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, fn in e.queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().optimizedPlan().toString()
            rows.append(
                (plan.count("Relation ["), plan.count("InMemoryRelation"), name)
            )
        except Exception as ex:  # noqa: BLE001 — report, keep auditing
            print(f"ERR {name}: {str(ex)[:80]}", file=sys.stderr)
        release_pins()
    rows.sort(reverse=True)
    print(f"{'relations':>9s} {'cached':>6s}  query")
    for scans, cached, name in rows[:top_n]:
        print(f"{scans:9d} {cached:6d}  {name}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Value-parity sweep at an arbitrary lake: run every oracle-backed
registered query on Spark AND its DuckDB oracle over the same parquet
tables, and compare cell-for-cell (the tests/oracle_harness comparator —
the same canonicalization the driver uses).

Why this exists: sf0.01 correctness + determinism does not rule out
volume-only defect classes (fixed-point BIGINT overflow, DECIMAL
overflow, precision drift in accumulated window state). Running the
identical comparison at 10×/100× lakes turns the overflow-headroom
arguments into measurements (SCALE.md §"Value parity holds at 100×").

Usage:
    python tools/parity_at_scale.py [sf_dir] [--only name1,name2] [--skip n,...]
                                    [--max-rows N]

Prints one line per query (MATCH / DIFF / ERR / COUNT-ONLY) and a final
JSON summary. Outputs larger than --max-rows (default 2M) are checked by
row count only — cell-level compare materializes both sides in driver
memory, and a 157M-row pair listing is not a sensible pandas frame.

Known oracle-infeasible-at-scale (skip them beyond sf0.01 lakes): the
connected-components canonicalization oracles (doc_simhash_neardup_
canonical and friends) run a RECURSIVE transitive closure over the full
near-dup pair set — fine at oracle scale, unbounded over the 10× lake's
~157M-pair cliques. The Spark side stays O(diameter) equi-join rounds;
only the checking SQL is the bottleneck.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/tmp/scale10"
    only: set[str] | None = None
    skip: set[str] = set()
    max_rows = 2_000_000
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--only":
            only = set(argv[i + 1].split(","))
            i += 2
        elif a == "--skip":
            skip = set(argv[i + 1].split(","))
            i += 2
        elif a == "--max-rows":
            max_rows = int(argv[i + 1])
            i += 2
        else:
            sf_dir = a
            i += 1

    sys.path.insert(0, "/root/repo")
    from tests.oracle_harness import compare, run_oracle
    from vectra_player_spark import plans
    from vectra_player_spark.session import get_spark

    spark = get_spark("vectra_parity")
    # This tool checks CORRECTNESS against the oracle; cost-based routing
    # is a perf dispatch whose approx arm (trailing_hour_uniques_routed's
    # HLL form above the size threshold) intentionally diverges from the
    # exact oracle values. Force the exact arms so every oracle-backed
    # query stays comparable at any lake size — the routing cutover is
    # verified separately (tests + SCALE.md §Round 4).
    spark.conf.set("spark.vectra.routing.maxExactBytes", str(1 << 60))
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, str] = {}
    t0 = time.time()
    for name, spec in plans.QUERIES.items():
        if spec.oracle is None:
            continue
        if only is not None and name not in only:
            continue
        if name in skip:
            continue
        if "regression-pin" in spec.tags and "sf0.01" not in sf_dir:
            # The pin is a frozen VALUES literal of the engine's own
            # sf0.01 output — meaningless against any other lake.
            results[name] = "SKIP-PIN"
            print(f"{'SKIP':6} {name}  (regression pin is sf0.01-only)", flush=True)
            continue
        try:
            sdf = spec.spark_fn(spark, sf_dir)
            n_spark = sdf.count()
            if n_spark > max_rows:
                oracle_n = int(
                    run_oracle(f"SELECT COUNT(*) AS n FROM ({spec.oracle})", sf_dir)["n"][0]
                )
                results[name] = (
                    "COUNT-ONLY" if n_spark == oracle_n
                    else f"DIFF count spark={n_spark} oracle={oracle_n}"
                )
            else:
                problems = compare(sdf, run_oracle(spec.oracle, sf_dir))
                results[name] = "MATCH" if not problems else f"DIFF {problems}"
        except Exception as e:  # noqa: BLE001 — report and continue
            results[name] = f"ERR {type(e).__name__}: {str(e)[:160]}"
        print(f"{results[name].split(' ')[0]:6} {name}"
              + ("" if results[name] == "MATCH" else f"  {results[name]}"),
              flush=True)
    n_match = sum(1 for v in results.values() if v in ("MATCH", "COUNT-ONLY", "SKIP-PIN"))
    print(json.dumps({
        "metric": "parity_at_scale", "sf_dir": sf_dir,
        "checked": len(results), "match": n_match,
        "mismatch": {k: v for k, v in results.items()
                     if v not in ("MATCH", "COUNT-ONLY", "SKIP-PIN")},
        "wall_sec": round(time.time() - t0, 1),
    }))
    return 0 if n_match == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())

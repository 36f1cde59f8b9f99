"""Timed scale sweep: run registered queries at an arbitrary sf_dir
(e.g. /tmp/scale10, /tmp/scale100 built by make_scale10.py) and print
per-query wall seconds, so super-linear blow-ups surface before a real
cluster finds them. Results are materialized through the noop sink —
pure engine time, no collect.

Usage:
    python tools/scale_run.py [sf_dir] [--only name1,name2] [--skip name,...]
                              [--timeout-sec N]

One line per query: "<name> <sec>" (or ERR/TIMEOUT); a final JSON line
mirrors bench.py's shape for easy diffing across scales.
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
    timeout_sec = 600.0
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--only":
            only = set(argv[i + 1].split(","))
            i += 2
        elif a == "--skip":
            skip = set(argv[i + 1].split(","))
            i += 2
        elif a == "--timeout-sec":
            timeout_sec = float(argv[i + 1])
            i += 2
        else:
            sf_dir = a
            i += 1

    sys.path.insert(0, "/root/repo")
    from vectra_player_spark import plans
    from vectra_player_spark.session import get_spark

    spark = get_spark("vectra_scale_run")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    timings: dict[str, float] = {}
    budget_end = time.time() + timeout_sec
    for name, spec in plans.QUERIES.items():
        if only is not None and name not in only:
            continue
        if name in skip:
            continue
        if time.time() > budget_end:
            print(f"{name} SKIPPED (budget exhausted)", flush=True)
            continue
        t0 = time.perf_counter()
        try:
            df = spec.spark_fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 2)
            print(f"{name} {timings[name]}", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            timings[name] = -1.0
            print(f"{name} ERR {type(e).__name__}: {str(e)[:200]}", flush=True)
    total_ok = sum(v for v in timings.values() if v >= 0)
    print(json.dumps({"metric": "scale_run_total", "value": round(total_ok, 2),
                      "unit": "sec", "queries": timings, "sf_dir": sf_dir}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

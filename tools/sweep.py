"""Driver-mirror correctness sweep: run EVERY registered query against its
DuckDB oracle at an arbitrary scale factor, in a fresh "hostile" session
(non-UTC JVM/session defaults, small shuffle partitions) so driver-side
environment differences surface locally before the round's hard check.

Usage:
    python tools/sweep.py [sf_dir] [--only name1,name2] [--cap N]

Prints one status line per query and a JSON summary (same fields the
driver records in CORRECTNESS_r{N}.json) to stdout; exits non-zero when
any oracle-backed query mismatches or errors.
"""

from __future__ import annotations

import json
import sys
import time
import traceback


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    only: set[str] | None = None
    cap: int | None = None
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--only":
            only = set(argv[i + 1].split(","))
            i += 2
        elif a == "--cap":
            cap = int(argv[i + 1])
            i += 2
        else:
            sf_dir = a
            i += 1

    from pyspark.sql import SparkSession

    # Hostile defaults on purpose: the driver does not promise UTC.
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("sweep")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    sys.path.insert(0, "/root/repo")
    from vectra_player_spark import plans
    from tests.oracle_harness import compare, run_oracle

    import __spark_entry__ as entry

    names = list(entry.queries())
    if cap is not None:
        names = names[:cap]
    results: dict[str, dict] = {}
    n_bad = 0
    t_all = time.time()
    for name in names:
        if only and name not in only:
            continue
        spec = plans.QUERIES[name]
        t0 = time.time()
        try:
            sdf = spec.spark_fn(spark, sf_dir)
            # Regression pins are frozen VALUES literals of the engine's
            # own sf0.01 output — only comparable at that lake.
            if spec.oracle is None or (
                "regression-pin" in spec.tags and "sf0.01" not in sf_dir
            ):
                n = sdf.count()
                results[name] = {"rows_only": True, "spark_rows": n, "err": None}
                status = f"rows-only ({n} rows)"
            else:
                oracle_pdf = run_oracle(spec.oracle, sf_dir)
                problems = compare(sdf, oracle_pdf)
                ok = not problems
                n_bad += 0 if ok else 1
                results[name] = {
                    "match": ok,
                    "oracle_rows": len(oracle_pdf),
                    "problems": problems,
                    "err": None,
                }
                status = "OK" if ok else f"MISMATCH: {problems[:1]}"
        except Exception:
            n_bad += 1
            results[name] = {"match": False, "err": traceback.format_exc(limit=3)}
            status = "ERROR (see summary)"
        print(f"{time.time() - t0:7.2f}s  {name:40s} {status}", flush=True)

    summary = {
        "sf_dir": sf_dir,
        "n_run": len(results),
        "n_bad": n_bad,
        "elapsed_sec": round(time.time() - t_all, 1),
    }
    print(json.dumps(summary))
    bad = {k: v for k, v in results.items() if v.get("err") or v.get("match") is False}
    if bad:
        print(json.dumps(bad, indent=2)[:8000])
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

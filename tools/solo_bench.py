"""Solo A/B timer: best-of-N noop-sink timings for named queries in one
warm session (the bench's methodology, isolated per query) plus optional
plan capture. Usage:
    python tools/solo_bench.py SF_DIR name1,name2 [--reps N] [--plans-dir D --suffix before|after]
"""
from __future__ import annotations

import sys
import time


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = argv[0]
    names = argv[1].split(",")
    reps, plans_dir, suffix = 3, None, "plan"
    i = 2
    while i < len(argv):
        if argv[i] == "--reps":
            reps = int(argv[i + 1]); i += 2
        elif argv[i] == "--plans-dir":
            plans_dir = argv[i + 1]; i += 2
        elif argv[i] == "--suffix":
            suffix = argv[i + 1]; i += 2
        else:
            raise SystemExit(f"unknown arg {argv[i]}")

    sys.path.insert(0, "/root/repo")
    from vectra_player_spark import plans
    from vectra_player_spark.session import get_spark

    spark = get_spark("solo_bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr("sum(id*2+1)").collect()
    print(f"cpu_probe {time.perf_counter() - t0:.3f}")

    for name in names:
        spec = plans.QUERIES[name]
        runs = []
        for _ in range(reps):
            df = spec.spark_fn(spark, sf_dir)
            start = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - start)
        print(f"{name} min={min(runs):.3f} runs={[round(r, 3) for r in runs]}", flush=True)
        if plans_dir:
            import os
            os.makedirs(plans_dir, exist_ok=True)
            df = spec.spark_fn(spark, sf_dir)
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

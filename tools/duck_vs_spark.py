"""Single-node throughput head-to-head: Spark local[N] vs DuckDB.

The reference's entire execution engine IS DuckDB (+ pandas driver code),
so "matches-or-beats the reference's single-node throughput" is directly
measurable: for every bench-tagged query with an oracle, time

- DuckDB running the oracle SQL (DuckDB uses all cores by default),
  best-of-3, full materialization via .df()
- Spark running the registered plan on local[N], best-of-3, plan built
  INSIDE the timed region, Arrow toPandas() materialization

Timing symmetry: each side's timer covers plan/SQL construction through
full row materialization in driver memory; per-run setup that is not
query work (DuckDB connect + view registration, the Spark session) stays
OUTSIDE the timed region on both sides. Both sides read the same parquet
files from the page cache and produce the same verified rows
(tools/sweep.py checks equality; this tool only times). Rows-only bench
queries (no oracle) are skipped.

Usage: python tools/duck_vs_spark.py [sf_dir]
Prints one JSON line {"metric": "duck_vs_spark", "queries": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_duck(sql: str, sf_dir: str) -> float:
    import duckdb

    from vectra_player_spark.tables import TABLES

    runs = []
    con = duckdb.connect()
    for name in TABLES:
        p = f"{sf_dir}/{name}.parquet"
        if os.path.isdir(p):  # Spark-written table = directory of parts
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    for _ in range(3):
        t0 = time.perf_counter()
        con.execute(sql).df()
        runs.append(time.perf_counter() - t0)
    con.close()
    return min(runs)


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    only: set[str] | None = None
    skip: set[str] = set()
    i = 0
    while i < len(argv):
        if argv[i] == "--only":
            only = set(argv[i + 1].split(","))
            i += 2
        elif argv[i] == "--skip":
            skip = set(argv[i + 1].split(","))
            i += 2
        else:
            sf_dir = argv[i]
            i += 1

    from vectra_player_spark import plans
    from vectra_player_spark.session import get_spark

    spark = get_spark("duck_vs_spark")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    out: dict[str, dict] = {}
    for name, spec in sorted(plans.QUERIES.items()):
        if "bench" not in spec.tags or spec.oracle is None:
            continue
        if (only is not None and name not in only) or name in skip:
            continue
        s_runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            # toPandas() (Arrow) is the COMPARABLE materialization to
            # DuckDB's .df(): both land a columnar pandas frame. collect()
            # would build per-row Python objects — a heavier sink than the
            # DuckDB side gets charged for, skewing large-output queries.
            spec.spark_fn(spark, sf_dir).toPandas()
            s_runs.append(time.perf_counter() - t0)
        spark_sec = min(s_runs)
        duck_sec = _time_duck(spec.oracle, sf_dir)
        out[name] = {
            "spark_sec": round(spark_sec, 3),
            "duckdb_sec": round(duck_sec, 3),
            "ratio": round(spark_sec / duck_sec, 2) if duck_sec > 0 else None,
        }
        print(
            f"{name:35s} spark {spark_sec:7.3f}s  duckdb {duck_sec:7.3f}s  "
            f"ratio {out[name]['ratio']}",
            file=sys.stderr,
        )
    spark.stop()
    print(json.dumps({"metric": "duck_vs_spark", "sf_dir": sf_dir, "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

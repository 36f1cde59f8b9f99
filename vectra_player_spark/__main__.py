"""Command-line surface: `python -m vectra_player_spark <cmd>`.

The reference is operated through runnable scripts (scripts/*.py,
src/scripts/*.py); this is the equivalent front door for the Spark
engine — list the query surface, run any registered query, or run ad-hoc
SQL over the test-lake tables.

Commands:
  list                              all registered queries (+tags, oracle?)
  run <name> [--sf-dir D] [-n N]    run a registered query, print N rows
  sql "<stmt>" [--sf-dir D] [-n N]  ad-hoc SQL; tables registered as views
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="vectra_player_spark", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    runp = sub.add_parser("run", help="run a registered query")
    runp.add_argument("name")
    runp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    runp.add_argument("-n", "--rows", type=int, default=20)

    sqlp = sub.add_parser("sql", help="ad-hoc SQL over the lake tables")
    sqlp.add_argument("stmt")
    sqlp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    sqlp.add_argument("-n", "--rows", type=int, default=20)

    args = p.parse_args(argv)

    from vectra_player_spark import plans

    if args.cmd == "list":
        for name in plans.queries():
            spec = plans.QUERIES[name]
            oracle = "oracle" if spec.oracle else "rows-only"
            tags = ",".join(spec.tags) or "-"
            print(f"{name:40s} {oracle:9s} {tags}")
        return 0

    from vectra_player_spark.session import get_spark

    spark = get_spark("vectra_cli")
    spark.sparkContext.setLogLevel("ERROR")
    if args.cmd == "run":
        if args.name not in plans.QUERIES:
            print(f"unknown query {args.name!r} — see `list`", file=sys.stderr)
            return 2
        df = plans.QUERIES[args.name].spark_fn(spark, args.sf_dir)
    else:  # sql
        from vectra_player_spark.tables import TABLES, t

        for name in TABLES:
            t(spark, args.sf_dir, name).createOrReplaceTempView(name)
        df = spark.sql(args.stmt)
    df.show(args.rows, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

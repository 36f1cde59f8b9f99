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

Prints one line per query (MATCH / DIFF / ERR / AGG-DIGEST) and a final
JSON summary. Outputs larger than --max-rows (default 2M) skip the
cell-level compare (materializing both sides of a 157M-row pair listing
in driver memory is not sensible) and are instead verified by exact
per-column aggregate fingerprints computed INSIDE each engine
(_digest_compare): row count plus, per column, non-null count, exact
integer/fround-grid sums, extrema, and md5'd string bounds — any changed
cell moves at least one of them, so the old COUNT-ONLY tier is now
value-level at every scale.

Known oracle-infeasible-at-scale (skip them beyond sf0.01 lakes): the
connected-components canonicalization oracles (doc_simhash_neardup_
canonical and friends) run a RECURSIVE transitive closure over the full
near-dup pair set — fine at oracle scale, unbounded over the 10× lake's
~157M-pair cliques. The Spark side stays O(diameter) equi-join rounds;
only the checking SQL is the bottleneck. Same class:
doc_dedup_method_agreement's oracle embeds the all-pairs simhash SQL —
its at-scale verification arm is doc_dedup_method_agreement_sampled
(1/16 md5-coin doc sample → frac² pair volume), MATCH at the full 100×
lake (SCALE.md round-9).
"""

from __future__ import annotations

import json
import sys
import time


def _digest_compare(sdf, oracle_sql: str, sf_dir: str, run_oracle) -> str:
    """Order-invariant per-column aggregate fingerprints for outputs too
    large to materialize (round-7): each engine computes, WITHOUT leaving
    its own execution, COUNT(*) plus per column

    - integers / decimals: non-null count, exact HUGEINT/DECIMAL(38,0)
      sum, min, max
    - doubles: the same over FLOOR(x*1e6+0.5) — the repo's cross-engine
      fround grid as a scaled BIGINT, so no float comparison ever happens
    - strings: non-null count, md5 of min and max, total length
    - booleans: non-null count, true count

    A 157M-row pair listing thus gets value-level verification (any
    changed cell moves a sum, an extremum, or a length total) at the cost
    of one aggregate pass per engine — upgrading the old COUNT-ONLY tier
    without ever building a pandas frame. Unsupported column types are
    skipped by BOTH sides identically and reported.

    Every DuckDB aggregate is shipped back as VARCHAR: pandas .df()
    coerces HUGEINT to float64, which silently loses exactness past 2^53
    — a 4.5e16 sum came back off by 1 and flagged a phantom DIFF on a
    multiset-identical result (found while validating this tier; the
    string round-trip keeps the comparison exact at any magnitude)."""
    import decimal

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    aggs = [F.count(F.lit(1)).alias("a0")]
    parts = ['CAST(COUNT(*) AS VARCHAR) AS "a0"']
    skipped = []
    for i, fld in enumerate(sdf.schema.fields, start=1):
        c = fld.name
        sq, dq = f"`{c}`", f'"{c}"'
        p = f"a{i}"
        dt = fld.dataType
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                           T.DecimalType)):
            aggs += [
                F.count(F.col(c)).alias(f"{p}n"),
                F.sum(F.expr(f"CAST({sq} AS DECIMAL(38,0))")).alias(f"{p}s"),
                F.min(F.col(c)).alias(f"{p}lo"),
                F.max(F.col(c)).alias(f"{p}hi"),
            ]
            parts += [
                f'CAST(COUNT({dq}) AS VARCHAR) AS "{p}n"',
                f'CAST(SUM(CAST({dq} AS HUGEINT)) AS VARCHAR) AS "{p}s"',
                f'CAST(MIN({dq}) AS VARCHAR) AS "{p}lo"',
                f'CAST(MAX({dq}) AS VARCHAR) AS "{p}hi"',
            ]
        elif isinstance(dt, (T.DoubleType, T.FloatType)):
            s_grid = f"CAST(FLOOR({sq} * 1e6 + 0.5) AS DECIMAL(38,0))"
            d_grid = f"CAST(FLOOR({dq} * 1e6 + 0.5) AS HUGEINT)"
            aggs += [
                F.count(F.col(c)).alias(f"{p}n"),
                F.sum(F.expr(s_grid)).alias(f"{p}s"),
                F.min(F.expr(s_grid)).alias(f"{p}lo"),
                F.max(F.expr(s_grid)).alias(f"{p}hi"),
            ]
            parts += [
                f'CAST(COUNT({dq}) AS VARCHAR) AS "{p}n"',
                f'CAST(SUM({d_grid}) AS VARCHAR) AS "{p}s"',
                f'CAST(MIN({d_grid}) AS VARCHAR) AS "{p}lo"',
                f'CAST(MAX({d_grid}) AS VARCHAR) AS "{p}hi"',
            ]
        elif isinstance(dt, T.StringType):
            aggs += [
                F.count(F.col(c)).alias(f"{p}n"),
                F.md5(F.min(F.col(c))).alias(f"{p}lo"),
                F.md5(F.max(F.col(c))).alias(f"{p}hi"),
                F.sum(F.length(F.col(c)).cast("decimal(38,0)")).alias(f"{p}len"),
            ]
            parts += [
                f'CAST(COUNT({dq}) AS VARCHAR) AS "{p}n"',
                f'MD5(MIN({dq})) AS "{p}lo"',
                f'MD5(MAX({dq})) AS "{p}hi"',
                f'CAST(SUM(CAST(LENGTH({dq}) AS HUGEINT)) AS VARCHAR) AS "{p}len"',
            ]
        elif isinstance(dt, T.BooleanType):
            aggs += [
                F.count(F.col(c)).alias(f"{p}n"),
                F.sum(F.col(c).cast("int")).alias(f"{p}t"),
            ]
            parts += [
                f'CAST(COUNT({dq}) AS VARCHAR) AS "{p}n"',
                f'CAST(SUM(CAST({dq} AS INT)) AS VARCHAR) AS "{p}t"',
            ]
        else:
            skipped.append(f"{c}:{dt.simpleString()}")
    s_row = sdf.agg(*aggs).collect()[0].asDict()
    o_df = run_oracle(
        "SELECT " + ", ".join(parts) + f" FROM ({oracle_sql}) _t", sf_dir
    )
    o_row = {k: o_df[k][0] for k in o_df.columns}

    def norm(v):
        if v is None:
            return None
        if isinstance(v, (bool,)):
            return int(v)
        if isinstance(v, (int, decimal.Decimal)):
            return int(v)
        if isinstance(v, float):
            # NaN = DuckDB NULL through pandas; exact ints pass through
            return None if v != v else (int(v) if v == int(v) else v)
        if hasattr(v, "item"):  # numpy scalar
            return norm(v.item())
        if isinstance(v, str):
            # DuckDB aggregates round-trip as VARCHAR (exactness past
            # 2^53); md5 strings stay strings
            try:
                return int(v)
            except ValueError:
                return v
        return v

    diffs = {
        k: (norm(s_row[k]), norm(o_row.get(k)))
        for k in s_row
        if norm(s_row[k]) != norm(o_row.get(k))
    }
    if diffs:
        return f"DIFF digest {dict(list(diffs.items())[:4])}"
    tag = "AGG-DIGEST" + (f" (skipped {','.join(skipped)})" if skipped else "")
    return tag


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
                if n_spark != oracle_n:
                    results[name] = f"DIFF count spark={n_spark} oracle={oracle_n}"
                else:
                    # value-level verification without materialization:
                    # per-column aggregate fingerprints in each engine
                    results[name] = _digest_compare(
                        sdf, spec.oracle, sf_dir, run_oracle
                    )
            else:
                problems = compare(sdf, run_oracle(spec.oracle, sf_dir))
                results[name] = "MATCH" if not problems else f"DIFF {problems}"
        except Exception as e:  # noqa: BLE001 — report and continue
            results[name] = f"ERR {type(e).__name__}: {str(e)[:160]}"
        print(f"{results[name].split(' ')[0]:6} {name}"
              + ("" if results[name] == "MATCH" else f"  {results[name]}"),
              flush=True)
    def _ok(v: str) -> bool:
        return v in ("MATCH", "COUNT-ONLY", "SKIP-PIN") or v.startswith("AGG-DIGEST")

    n_match = sum(1 for v in results.values() if _ok(v))
    print(json.dumps({
        "metric": "parity_at_scale", "sf_dir": sf_dir,
        "checked": len(results), "match": n_match,
        "mismatch": {k: v for k, v in results.items() if not _ok(v)},
        "wall_sec": round(time.time() - t0, 1),
    }))
    return 0 if n_match == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())

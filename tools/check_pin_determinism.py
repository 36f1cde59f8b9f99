"""Empirical determinism gate for VALUES-pin candidates.

A regression pin is only safe if the engine's output is bit-identical
under any topology the driver might run (core count changes partition
counts, shuffle fan-in, and task completion order). This tool runs each
candidate query in FRESH subprocess sessions across several topologies
and diffs the fully-collected, canonically-sorted outputs.

    python tools/check_pin_determinism.py [query ...]

Exit 0 = every candidate identical across all topologies (safe to
freeze); exit 1 prints the first mismatch. Used before round-6 froze the
sketch/ANN/GBT pins; rerun whenever a pinned query's plan changes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CANDIDATES = (
    "daily_uniques_sketch_rollup",
    "token_heavy_hitters_cms",
    "knn_ivf_cosine",
    "knn_ivf_kmeans_recall",
    "knn_pq_adc_recall",
    "knn_ivfpq_adc_recall",
    "gbt_threshold_analysis",
    # round-8: the last rows-only self-calibration reports. HLL register
    # state is order-invariant by construction; percentile_approx's
    # QuantileSummaries merge is the empirical question this gate answers.
    "sketch_accuracy_report",
    "trailing_hour_uniques_hll",
    "event_value_percentiles_approx",
    "doc_semantic_dedup",
    "knn_ivf_nprobe_curve",
    # round-8 session-4: BPE merge learning — integer pair counts with a
    # total-order top-1 per round, deterministic by construction; the gate
    # verifies it empirically across topologies before freezing.
    "doc_bpe_merges",
    "doc_bpe_vocab_stats",
    "doc_bpe_encode",
)
TOPOLOGIES = (("8", "8"), ("32", "32"), ("16", "64"))  # (cores, shuffle parts)

_CHILD = r"""
import json, sys
from pyspark.sql import SparkSession
cores, parts, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
spark = (SparkSession.builder.master(f"local[{cores}]")
         .appName("pin-determinism")
         .config("spark.sql.shuffle.partitions", parts)
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory", "8g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from vectra_player_spark import plans
out = {}
for name in names:
    df = plans.QUERIES[name].spark_fn(spark, "/root/testdata/sf0.01")
    cols = sorted(df.columns)
    rows = sorted(tuple(repr(r[c]) for c in cols) for r in df.collect())
    out[name] = {"cols": cols, "rows": rows}
print("PINCHECK:" + json.dumps(out))
"""


def run(cores: str, parts: str, names: list[str]) -> dict:
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, cores, parts, ",".join(names)],
        capture_output=True, text=True, env=env, cwd=repo, timeout=1800,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("PINCHECK:"):
            return json.loads(line[len("PINCHECK:"):])
    print(proc.stdout[-3000:], file=sys.stderr)
    print(proc.stderr[-3000:], file=sys.stderr)
    raise RuntimeError(f"child local[{cores}]/{parts} produced no result")


def main() -> int:
    names = sys.argv[1:] or list(CANDIDATES)
    results = []
    for cores, parts in TOPOLOGIES:
        print(f"-- local[{cores}], shuffle={parts}", file=sys.stderr)
        results.append(run(cores, parts, names))
    ok = True
    for name in names:
        base = results[0][name]
        for (cores, parts), res in zip(TOPOLOGIES[1:], results[1:]):
            if res[name] != base:
                ok = False
                b, r = set(base["rows"]), set(res[name]["rows"])
                print(f"MISMATCH {name} local[{cores}]/{parts}: "
                      f"{len(b - r)} rows only in base, {len(r - b)} only in variant")
                for row in list(b - r)[:3]:
                    print(f"  base: {row}")
                for row in list(r - b)[:3]:
                    print(f"  var : {row}")
        if ok:
            print(f"OK {name}: identical across {len(TOPOLOGIES)} topologies "
                  f"({len(base['rows'])} rows)")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

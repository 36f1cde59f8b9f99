"""Golden-hash pinning for the rows-only (non-SQL-expressible) queries.

The sequential replay operators (backtest, decision pipeline, stateful
feature extraction, RL observations) are deterministic given the fitted
model, but have no DuckDB oracle. Regressions are caught by hard signal
instead of units: each query's full output is canonicalized (rows sorted
by the episode/order keys, floats rounded to 6, arrays rendered
fixed-decimal) and hashed PER GAME; the per-game md5 map is committed
under tests/goldens/ and re-derived by tests/test_goldens.py.

Per-game hashing (vs one whole-result hash) localizes a regression to the
episode that changed, which is what you want when debugging a 560-LoC
replay.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pandas as pd

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

# pin name -> (game key column, within-game order columns; [] = one
# summary row per game). Since round 5 the registered forms of the trace
# queries are per-game DIGESTS (their driver oracle is a sf0.01 VALUES
# regression pin, plans/_replay_pins.py); the goldens keep pinning the
# FULL per-tick traces via the unregistered builder functions so a
# regression still localizes to the exact game AND survives changes to
# the registered projection.
PINNED = {
    "backtest_replay": ("game_id", []),
    "decision_pipeline_replay": ("game_id", ["tick"]),
    "stateful_feature_extract": ("game_id", ["tick"]),
    "rl_observation_set": ("game_id", ["tick"]),
}


def _builder(name: str):
    from vectra_player_spark import plans
    from vectra_player_spark.plans.queries_backtest import (
        decision_pipeline_trace,
        stateful_feature_trace,
    )

    full_traces = {
        "decision_pipeline_replay": decision_pipeline_trace,
        "stateful_feature_extract": stateful_feature_trace,
    }
    return full_traces.get(name, plans.QUERIES[name].spark_fn)


def _render(v) -> str:
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return ""
    if isinstance(v, (float, np.floating)):
        return f"{round(float(v) + 0.0, 6):.6f}"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_render(x) for x in v) + "]"
    return str(v)


def per_game_hashes(pdf: pd.DataFrame, game_col: str, order_cols: list[str]) -> dict[str, str]:
    out: dict[str, str] = {}
    cols = sorted(c for c in pdf.columns if c != game_col)
    for gid, g in pdf.groupby(game_col, sort=True):
        if order_cols:
            g = g.sort_values(order_cols)
        h = hashlib.md5()
        for row in g[cols].itertuples(index=False):
            h.update("|".join(_render(v) for v in row).encode())
            h.update(b"\n")
        out[str(gid)] = h.hexdigest()
    return out


def compute(spark, name: str, sf_dir: str) -> dict[str, str]:
    game_col, order_cols = PINNED[name]
    pdf = _builder(name)(spark, sf_dir).toPandas()
    return per_game_hashes(pdf, game_col, order_cols)


def golden_path(name: str, sf_tag: str = "sf0.001") -> str:
    return os.path.join(GOLDEN_DIR, f"{name}_{sf_tag}.json")


def regenerate(spark, sf_dir: str = "/root/testdata/sf0.001") -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in PINNED:
        hashes = compute(spark, name, sf_dir)
        with open(golden_path(name), "w") as f:
            json.dump(hashes, f, indent=0, sort_keys=True)
        print(f"{name}: {len(hashes)} games pinned")

"""RL observation-set builder (SURVEY §2.9 M20 — the data-prep half).

The reference's RL env consumes a 15-dim observation per tick (game state,
Bayesian predictors, sidebet state, zone flag; src/rl/envs/
sidebet_v1_env.py:33-200). Training itself is single-node and out of
engine scope (SURVEY's call); what the engine owns is building the
episodes parquet: one row per (episode, tick) with the observation as an
array<double> column — exactly the artifact the env's reset()/step() reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_rl_observations(
    episodes: DataFrame,
    p_rug_by_tick: dict | None = None,
    episode_key: str = "game_id",
    order_key: str = "seq",
    price_col: str = "value",
) -> DataFrame:
    """One observation row per tick: the window-feature block plus the
    broadcast survival predictor, packed into an `obs` array column.

    All columns are built by ONE Window pass (same spec), then packed with
    `F.array` — no UDF; the predictor lookup is a broadcast map via
    `create_map` (tiny)."""
    w = Window.partitionBy(episode_key).orderBy(order_key)
    p = F.col(price_col).cast("double")
    l1, l3 = F.lag(p, 1).over(w), F.lag(p, 3).over(w)
    run_max = F.max(p).over(w.rowsBetween(Window.unboundedPreceding, 0))
    tick = (F.row_number().over(w) - 1).cast("double")

    if p_rug_by_tick:
        mapping = F.create_map(
            *[F.lit(x) for kv in p_rug_by_tick.items() for x in kv]
        )
        p_rug = F.coalesce(mapping[tick.cast("long")], F.lit(0.0))
    else:
        p_rug = F.lit(0.0)

    zero = F.lit(0.0)
    obs = F.array(
        tick,
        F.coalesce(p, zero),
        F.coalesce(p - l1, zero),
        F.coalesce((p - l3) / 3.0, zero),
        F.coalesce(F.stddev(p).over(w.rowsBetween(-4, 0)), zero),
        F.coalesce(F.stddev(p).over(w.rowsBetween(-9, 0)), zero),
        F.coalesce(run_max, zero),
        F.coalesce(p / F.nullif(run_max, zero) - 1, zero),
        F.coalesce((p > l3 * 1.2).cast("double"), zero),
        F.coalesce((p < l3 * 0.8).cast("double"), zero),
        p_rug,
        (tick >= 200).cast("double"),  # optimal-zone flag
        F.coalesce(F.avg(p).over(w.rowsBetween(-10, 0)), zero),
        F.coalesce(p - F.avg(p).over(w.rowsBetween(-10, 0)), zero),
        F.lit(1.0),  # bias term
    )
    return episodes.select(
        F.col(episode_key),
        tick.cast("long").alias("tick"),
        obs.alias("obs"),
    )

"""RL observation-set builder (SURVEY §2.9 M20 — the data-prep half).

The reference's RL env consumes a 15-dim observation per tick (game state,
Bayesian predictors, sidebet state, zone flag; src/rl/envs/
sidebet_v1_env.py:33-200). Training itself is single-node and out of
engine scope (SURVEY's call); what the engine owns is building the
episodes parquet: one row per (episode, tick) with the observation as an
array<double> column — exactly the artifact the env's reset()/step() reads.

Two output shapes over ONE slot definition (`_obs_slots`):

- `build_rl_observations` — the env artifact: `obs array<double>` packed
  with `F.array` (reset()/step() indexes slots positionally).
- `build_rl_observation_table` — the driver/oracle-checkable projection:
  the same 15 slots as named scalar columns (a pandas/SQL harness cannot
  canonically sort an array column), continuous slots on the engine-stable
  1e-6 grid (functions/exact.fround), and the survival predictor joined
  from a (t, p_end) curve DataFrame via broadcast instead of a literal map
  — the scale-correct form when the curve is engine-derived.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vectra_player_spark.functions.exact import fround


def _obs_slots(
    episode_key: str, order_key: str, price_col: str
) -> tuple[Column, list[tuple[str, Column, bool]]]:
    """The 15 observation slots as (name, expr, is_continuous) in env order,
    plus the tick expression. One shared Window spec → one hash exchange on
    the episode key; every frame evaluates within the partition.

    Slot 10 (p_rug, the Bayesian survival predictor) is intentionally
    ABSENT here — each output shape injects its own lookup (literal map vs
    broadcast join)."""
    w = Window.partitionBy(episode_key).orderBy(order_key)
    p = F.col(price_col).cast("double")
    l1, l3 = F.lag(p, 1).over(w), F.lag(p, 3).over(w)
    run_max = F.max(p).over(w.rowsBetween(Window.unboundedPreceding, 0))
    ma11 = F.avg(p).over(w.rowsBetween(-10, 0))
    tick = (F.row_number().over(w) - 1).cast("double")

    zero = F.lit(0.0)
    slots: list[tuple[str, Column, bool]] = [
        ("obs_tick", tick, False),  # integer-valued by construction
        ("obs_price", F.coalesce(p, zero), True),
        ("obs_d1", F.coalesce(p - l1, zero), True),
        ("obs_d3", F.coalesce((p - l3) / 3.0, zero), True),
        ("obs_vol5", F.coalesce(F.stddev(p).over(w.rowsBetween(-4, 0)), zero), True),
        ("obs_vol10", F.coalesce(F.stddev(p).over(w.rowsBetween(-9, 0)), zero), True),
        ("obs_run_max", F.coalesce(run_max, zero), True),
        ("obs_drawdown", F.coalesce(p / F.nullif(run_max, zero) - 1, zero), True),
        ("obs_breakout", F.coalesce((p > l3 * 1.2).cast("double"), zero), False),
        ("obs_breakdown", F.coalesce((p < l3 * 0.8).cast("double"), zero), False),
        # slot 10: p_rug — injected by the caller
        ("obs_zone", (tick >= 200).cast("double"), False),  # optimal-zone flag
        ("obs_ma11", F.coalesce(ma11, zero), True),
        ("obs_ma_dev", F.coalesce(p - ma11, zero), True),
        ("obs_bias", F.lit(1.0), False),
    ]
    return tick, slots


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
    tick, slots = _obs_slots(episode_key, order_key, price_col)

    if p_rug_by_tick:
        mapping = F.create_map(
            *[F.lit(x) for kv in p_rug_by_tick.items() for x in kv]
        )
        p_rug = F.coalesce(mapping[tick.cast("long")], F.lit(0.0))
    else:
        p_rug = F.lit(0.0)

    exprs = [c for _, c, _ in slots]
    obs = F.array(*exprs[:10], p_rug, *exprs[10:])
    return episodes.select(
        F.col(episode_key),
        tick.cast("long").alias("tick"),
        obs.alias("obs"),
    )


def build_rl_observation_table(
    episodes: DataFrame,
    p_rug_curve: DataFrame | None = None,
    episode_key: str = "game_id",
    order_key: str = "seq",
    price_col: str = "value",
) -> DataFrame:
    """The same 15 slots as named scalar columns — the driver/SQL-checkable
    projection of the env artifact.

    `p_rug_curve` is a (t bigint, p_end double) DataFrame (e.g. the M7
    conditional-end-probability output); it is broadcast-left-joined on the
    tick — the curve is bounded by the max episode length, so the join
    never shuffles the fact side. Continuous slots are emitted on the
    1e-6 fround grid (the identical FLOOR(x*1e6+0.5)/1e6 appears in the
    DuckDB oracle); flags/pre-rounded slots pass through exactly."""
    tick, slots = _obs_slots(episode_key, order_key, price_col)
    out = episodes.select(
        F.col(episode_key),
        tick.cast("long").alias("tick"),
        *[
            (fround(expr) if cont else expr).alias(name)
            for name, expr, cont in slots
        ],
    )
    if p_rug_curve is not None:
        curve = p_rug_curve.select(F.col("t").cast("long").alias("t"), "p_end")
        out = (
            out.join(F.broadcast(curve), out["tick"] == curve["t"], "left")
            .withColumn("obs_p_rug", F.coalesce(F.col("p_end"), F.lit(0.0)))
            .drop("t", "p_end")
        )
    else:
        out = out.withColumn("obs_p_rug", F.lit(0.0))
    return out

"""Monte Carlo strategy simulation (SURVEY §2.9 M11/M12).

The reference runs 10k-100k martingale-sequence iterations in a numpy loop
(services/optimization/src/analyzers/monte_carlo.py:76-357) with a pinned
seed. Spark design: `spark.range(n).mapInPandas(simulate)` — embarrassingly
parallel, one task per range slice, NO shuffle until the final tiny
aggregate. Determinism discipline (SURVEY §4): the RNG is keyed on
(seed, iteration_id), not the partition id, so results are identical under
any partitioning — repartition-safe and cluster-size-safe.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SIM_SCHEMA = (
    "iteration long, final_bankroll double, max_drawdown double, "
    "n_wins long, n_bets long, ruined boolean"
)


def simulate_iterations(
    spark: SparkSession,
    n_iterations: int = 2000,
    n_games: int = 200,
    win_prob: float = 0.17,
    payout: float = 5.0,
    base_bet: float = 1.0,
    martingale_cap: float = 4.0,
    starting_bankroll: float = 100.0,
    seed: int = 42,
) -> DataFrame:
    """Per-iteration outcomes of a martingale side-bet sequence."""
    import numpy as np  # imported in the task, keeps closure light

    def sim(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            m = len(ids)
            if m == 0:
                continue
            # per-iteration RNG keyed on (seed, id) — identical draws under
            # any partitioning; rows stacked into an (iterations, games)
            # matrix so the martingale steps vectorize ACROSS iterations
            # (the game loop is sequential by definition; the iteration
            # axis is not).
            draws = np.stack(
                [np.random.default_rng([seed, int(i)]).random(n_games) for i in ids]
            )
            bankroll = np.full(m, starting_bankroll)
            peak = np.full(m, starting_bankroll)
            max_dd = np.zeros(m)
            bet = np.full(m, base_bet)
            wins = np.zeros(m, dtype=np.int64)
            bets = np.zeros(m, dtype=np.int64)
            alive = np.ones(m, dtype=bool)
            for g in range(n_games):
                ruin_now = alive & (bankroll < bet)
                alive &= ~ruin_now
                act = alive
                if not act.any():
                    break
                bets[act] += 1
                win = act & (draws[:, g] < win_prob)
                lose = act & ~win
                bankroll[win] += payout * bet[win]
                bet[win] = base_bet
                wins[win] += 1
                bankroll[lose] -= bet[lose]
                bet[lose] = np.minimum(bet[lose] * 2.0, martingale_cap * base_bet)
                np.maximum(peak, bankroll, out=peak, where=act)
                dd = np.where(peak > 0, (peak - bankroll) / peak, 0.0)
                np.maximum(max_dd, dd, out=max_dd, where=act)
            yield pd.DataFrame(
                {
                    "iteration": ids.astype(np.int64),
                    "final_bankroll": bankroll,
                    "max_drawdown": max_dd,
                    "n_wins": wins,
                    "n_bets": bets,
                    "ruined": ~alive,
                }
            )

    return spark.range(n_iterations).mapInPandas(sim, SIM_SCHEMA)


def summarize_simulation(per_iteration: DataFrame, starting_bankroll: float = 100.0) -> DataFrame:
    """Aggregate metrics block: mean/median/std, P(profit), P(ruin), VaR/CVaR
    (analyzers/monte_carlo.py aggregate section).

    Single pass over the simulation: CVaR95 needs the VaR95 threshold, and a
    naive second aggregate would re-run the whole mapInPandas sim (it did, and
    it doubled the query's wall clock). Instead the one agg also collects the
    final bankrolls into an array on the single stats row, and CVaR is a HOF
    fold over that array. Memory bound: n_iterations doubles on one row —
    identical to what exact ``percentile()`` already buffers per group, so
    this adds no new scale ceiling (at 1e6+ iterations switch both to
    ``percentile_approx`` and a re-aggregation pass).
    """
    fb = F.col("final_bankroll")
    profit = fb - starting_bankroll
    base = per_iteration.agg(
        F.count(F.lit(1)).alias("n_iterations"),
        F.round(F.avg(fb), 6).alias("mean_final"),
        F.round(F.expr("percentile(final_bankroll, 0.5)"), 6).alias("median_final"),
        F.round(F.stddev(fb), 6).alias("std_final"),
        F.round(F.avg((profit > 0).cast("double")), 6).alias("p_profit"),
        F.round(F.avg(F.col("ruined").cast("double")), 6).alias("p_ruin"),
        F.expr("percentile(final_bankroll, 0.05)").alias("_var95"),
        F.round(F.avg("max_drawdown"), 6).alias("mean_max_drawdown"),
        F.round(F.avg("n_wins"), 6).alias("mean_wins"),
        F.collect_list(fb).alias("_fbs"),
    )
    tail_mean = F.expr(
        "aggregate(filter(_fbs, x -> x <= _var95), "
        "named_struct('s', 0D, 'n', 0L), "
        "(a, x) -> named_struct('s', a.s + x, 'n', a.n + 1), "
        "a -> CASE WHEN a.n > 0 THEN a.s / a.n END)"
    )
    return base.select(
        "n_iterations",
        "mean_final",
        "median_final",
        "std_final",
        "p_profit",
        "p_ruin",
        "mean_max_drawdown",
        "mean_wins",
        F.round(tail_mean, 6).alias("cvar95"),
        F.round(F.col("_var95"), 6).alias("var95"),
    )

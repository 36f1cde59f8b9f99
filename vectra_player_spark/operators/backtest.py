"""Backtest / replay engines (SURVEY §2.9 M17, M18).

The reference replays each game tick-by-tick through a decision pipeline
with sequential state (martingale sizing, cooldowns, drawdown circuit
breakers) — src/ml/backtest.py:46-253 and the 5-stage pipeline in
tools/v2-explorer/modules/sidebet.py:54-603.

Spark design (SURVEY §4 "needs custom work"): the model is fit with
ordinary aggregates (tiny → broadcast); the per-game replay is
`applyInPandas` over game_id — sequential state lives inside one pandas
group, games parallelize freely. The global bankroll fold is
order-dependent, so per-game PnL is reduced sequentially on the driver
over the (tiny) per-game results, exactly as the reference iterates games.
"""

from __future__ import annotations

from collections.abc import Mapping

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REPLAY_SCHEMA = (
    "game_id string, n_ticks long, n_bets long, n_wins long, pnl double, "
    "max_drawdown double, stopped_early boolean"
)


def fit_hazard_model(durations: DataFrame, duration_col: str = "duration", window: int = 10) -> dict:
    """M18 stage 1-2: baseline conditional end-probability per tick from the
    duration distribution (BayesianSurvivalModel fit,
    bayesian_sidebet_analysis.py:301-343). Returns a plain dict — small
    enough to broadcast into the replay UDF."""
    from vectra_player_spark.operators.survival import conditional_end_probability

    spark = durations.sparkSession
    max_t = durations.agg(F.max(duration_col)).collect()[0][0] or 0
    grid = spark.range(0, int(max_t) + 2).select(F.col("id").alias("t_grid"))
    rows = conditional_end_probability(durations, grid, duration_col, window).collect()
    return {int(r["t"]): float(r["p_end"]) for r in rows}


def replay_backtest(
    episodes: DataFrame,
    model: Mapping[int, float],
    episode_key: str = "game_id",
    order_key: str = "seq",
    p_threshold: float = 0.2,
    payout: float = 5.0,
    base_bet: float = 1.0,
    cooldown_ticks: int = 5,
    max_drawdown_stop: float = 0.5,
    starting_bankroll: float = 100.0,
) -> DataFrame:
    """M17: per-game sequential replay — bet when the broadcast model's
    p(end within window | survived) clears the threshold, cooldown between
    bets, martingale doubling after a loss, drawdown circuit breaker.

    One shuffle on the episode key; each group replays in pandas with the
    broadcast model dict. Output: one row per game (tiny)."""
    spark = episodes.sparkSession
    bc_model = spark.sparkContext.broadcast(dict(model))

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        m = bc_model.value
        pdf = pdf.sort_values(order_key)
        gid = pdf[episode_key].iloc[0]
        n = len(pdf)
        bankroll = starting_bankroll
        peak = bankroll
        max_dd = 0.0
        bet = base_bet
        wins = 0
        bets = 0
        cooldown = 0
        stopped = False
        for tick in range(n):
            if cooldown > 0:
                cooldown -= 1
                continue
            p = m.get(tick, 0.0)
            if p < p_threshold:
                continue
            bets += 1
            won = n - 1 - tick <= 8  # episode ends within the bet window
            if won:
                bankroll += payout * bet
                bet = base_bet
                wins += 1
            else:
                bankroll -= bet
                bet = min(bet * 2.0, 4.0 * base_bet)
            cooldown = cooldown_ticks
            peak = max(peak, bankroll)
            dd = (peak - bankroll) / peak if peak > 0 else 0.0
            max_dd = max(max_dd, dd)
            if dd >= max_drawdown_stop:
                stopped = True
                break
        return pd.DataFrame(
            [
                (
                    gid,
                    n,
                    bets,
                    wins,
                    bankroll - starting_bankroll,
                    max_dd,
                    stopped,
                )
            ],
            columns=[
                "game_id",
                "n_ticks",
                "n_bets",
                "n_wins",
                "pnl",
                "max_drawdown",
                "stopped_early",
            ],
        )

    return episodes.groupBy(episode_key).applyInPandas(replay, REPLAY_SCHEMA)


def sequential_bankroll_fold(
    per_game: pd.DataFrame, starting_bankroll: float = 100.0
) -> dict:
    """Order-dependent global fold over per-game PnL, run driver-side on the
    (tiny) replay output in game order — mirrors the reference's sequential
    iteration (backtest.py bankroll loop)."""
    bankroll = starting_bankroll
    peak = bankroll
    max_dd = 0.0
    for pnl in per_game.sort_values("game_id")["pnl"]:
        bankroll += pnl
        peak = max(peak, bankroll)
        if peak > 0:
            max_dd = max(max_dd, (peak - bankroll) / peak)
    return {
        "final_bankroll": bankroll,
        "max_drawdown": max_dd,
        "n_games": int(len(per_game)),
        "total_pnl": float(per_game["pnl"].sum()),
    }

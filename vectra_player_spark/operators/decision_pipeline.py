"""5-stage decision-pipeline replay (SURVEY §2.9 M18).

The reference's replay (tools/v2-explorer/modules/sidebet.py:54-603):
  1. per-tick features (M2 subset)
  2. BayesianSurvivalModel p_rug = 1 - S(t+w)/S(t), scaled by feature
     multipliers (rapid rise dampens, high volatility amplifies …)
  3. EWMA regime forecaster (alpha=0.15 over game lengths)
  4. arbitration: veto rules (too-early tick, low p, rapid_rise), p-bucket
     thresholds, (bucket × regime) consensus sizing matrix
  5. RiskManager state machine ACTIVE/REDUCED/PAUSED/RECOVERY driven by
     drawdown bands + loss streaks; Kelly-fraction position sizing

Spark shape (SURVEY §3.3): stages 2-3 fit as tiny aggregates → broadcast;
the replay is `applyInPandas` per game emitting a full per-tick trace row
(the TracedReplayResult analog) — so the decision log itself is a
DataFrame you can aggregate, audit, and regression-test at any scale.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRACE_SCHEMA = (
    "game_id string, tick long, p_rug double, regime string, vetoed boolean, "
    "veto_reason string, bucket string, size_mult double, risk_state string, "
    "bet_placed boolean, bet_size double, won boolean, bankroll double"
)

# (bucket, regime) → size multiplier — the consensus matrix
CONSENSUS = {
    ("LOW", "SHORT"): 0.0,
    ("LOW", "NORMAL"): 0.0,
    ("LOW", "LONG"): 0.0,
    ("MED", "SHORT"): 1.0,
    ("MED", "NORMAL"): 0.5,
    ("MED", "LONG"): 0.25,
    ("HIGH", "SHORT"): 1.5,
    ("HIGH", "NORMAL"): 1.0,
    ("HIGH", "LONG"): 0.5,
}


def fit_survival_curve(durations: DataFrame, duration_col: str = "duration") -> dict:
    """Stage-2 model: S(t) per tick as a broadcastable dict (M5 output)."""
    from vectra_player_spark.operators.survival import km_survival

    rows = km_survival(durations, duration_col).collect()
    return {int(r["t"]): float(r["survival"]) for r in rows}


def _survival_at(s_curve: dict, t: int) -> float:
    if not s_curve:
        return 1.0
    keys = [k for k in s_curve if k <= t]
    return s_curve[max(keys)] if keys else 1.0


def replay_decision_pipeline(
    episodes: DataFrame,
    s_curve: dict,
    mean_duration: float,
    episode_key: str = "game_id",
    order_key: str = "seq",
    price_col: str = "value",
    window: int = 8,
    payout: float = 5.0,
    min_tick: int = 5,
    p_floor: float = 0.16,
    buckets: tuple = (0.20, 0.35, 0.60),
    ewma_alpha: float = 0.15,
    kelly_cap: float = 0.25,
    starting_bankroll: float = 100.0,
) -> DataFrame:
    """Full traced replay. Returns one trace row per tick per game."""
    spark = episodes.sparkSession
    bc = spark.sparkContext.broadcast((dict(s_curve), float(mean_duration)))

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        curve, mean_dur = bc.value
        pdf = pdf.sort_values(order_key)
        gid = pdf[episode_key].iloc[0]
        prices = pdf[price_col].astype(float).tolist()
        n = len(prices)
        # stage 3: EWMA regime off the expected-vs-running game length
        ewma = mean_dur
        bankroll = peak = starting_bankroll
        loss_streak = 0
        risk_state = "ACTIVE"
        out = []
        for tick in range(n):
            # stage 1: cheap feature subset
            rapid_rise = tick >= 3 and prices[tick] > prices[tick - 3] * 1.2
            # stage 2: survival-ratio hazard with feature multipliers
            s_t = _survival_at(curve, tick)
            s_tw = _survival_at(curve, tick + window)
            p_rug = 1.0 - (s_tw / s_t) if s_t > 0 else 1.0
            if rapid_rise:
                p_rug *= 0.7  # the reference's rise dampener
            p_rug = min(1.0, max(0.0, p_rug))
            # stage 3: regime from EWMA of (still-running length vs mean)
            ewma = ewma_alpha * tick + (1 - ewma_alpha) * ewma
            regime = "SHORT" if ewma < 0.8 * mean_dur else (
                "LONG" if ewma > 1.2 * mean_dur else "NORMAL"
            )
            # stage 4: arbitration
            veto_reason = None
            if tick < min_tick:
                veto_reason = "too_early"
            elif p_rug < p_floor:
                veto_reason = "p_below_floor"
            elif rapid_rise:
                veto_reason = "rapid_rise"
            bucket = (
                "LOW" if p_rug < buckets[0] else
                "MED" if p_rug < buckets[1] else "HIGH"
            )
            size_mult = CONSENSUS[(bucket, regime)]
            # stage 5: risk state machine (drawdown bands + loss streaks)
            dd = (peak - bankroll) / peak if peak > 0 else 0.0
            if dd >= 0.25 or loss_streak >= 6:
                risk_state = "PAUSED"
            elif dd >= 0.15 or loss_streak >= 4:
                risk_state = "REDUCED"
            elif risk_state in ("PAUSED", "REDUCED") and dd < 0.05:
                risk_state = "RECOVERY"
            elif risk_state == "RECOVERY" and dd < 0.02:
                risk_state = "ACTIVE"
            state_mult = {"ACTIVE": 1.0, "RECOVERY": 0.5, "REDUCED": 0.5, "PAUSED": 0.0}[
                risk_state
            ]
            kelly = max(0.0, (p_rug * payout - (1 - p_rug)) / payout)
            bet_size = min(kelly, kelly_cap) * size_mult * state_mult * bankroll
            placed = veto_reason is None and bet_size > 0
            won = False
            if placed:
                won = (n - 1 - tick) <= window  # rug lands inside the window
                if won:
                    bankroll += payout * bet_size
                    loss_streak = 0
                else:
                    bankroll -= bet_size
                    loss_streak += 1
                peak = max(peak, bankroll)
            out.append(
                (
                    gid,
                    tick,
                    round(p_rug, 6),
                    regime,
                    veto_reason is not None,
                    veto_reason,
                    bucket,
                    size_mult,
                    risk_state,
                    placed,
                    round(bet_size, 6),
                    won,
                    round(bankroll, 6),
                )
            )
        return pd.DataFrame(
            out,
            columns=[
                "game_id",
                "tick",
                "p_rug",
                "regime",
                "vetoed",
                "veto_reason",
                "bucket",
                "size_mult",
                "risk_state",
                "bet_placed",
                "bet_size",
                "won",
                "bankroll",
            ],
        )

    return episodes.groupBy(episode_key).applyInPandas(run, TRACE_SCHEMA)


def summarize_replay(trace: DataFrame) -> DataFrame:
    """ReplayResult summary block over the trace (per game)."""
    return trace.groupBy("game_id").agg(
        F.count(F.lit(1)).alias("n_ticks"),
        F.sum(F.col("bet_placed").cast("long")).alias("n_bets"),
        F.sum((F.col("bet_placed") & F.col("won")).cast("long")).alias("n_wins"),
        F.sum(F.col("vetoed").cast("long")).alias("n_vetoed"),
        # max_by picks the final-tick bankroll deterministically; last()
        # depends on physical row order and breaks under repartition/AQE.
        F.round(F.max_by("bankroll", "tick") - 100.0, 6).alias("pnl"),
        F.max(F.when(F.col("risk_state") == "PAUSED", 1).otherwise(0)).alias("hit_pause"),
    )

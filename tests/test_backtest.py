"""Deterministic backtest tests (M17/M18): pinned replay on a hand-built
episode set, repartition-invariance, and the sequential bankroll fold."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectra_player_spark.operators.backtest import (
    fit_hazard_model,
    replay_backtest,
    sequential_bankroll_fold,
)


def _episodes(spark):
    rows = []
    for gid, n in (("g1", 30), ("g2", 12), ("g3", 50)):
        for s in range(n):
            rows.append((gid, s, 1.0 + 0.01 * s))
    return spark.createDataFrame(rows, "game_id string, seq long, value double")


def test_replay_deterministic_and_partition_invariant(spark):
    eps = _episodes(spark)
    model = {t: (0.5 if t % 10 == 5 else 0.0) for t in range(60)}
    a = {r.game_id: r for r in replay_backtest(eps, model).collect()}
    b = {
        r.game_id: r
        for r in replay_backtest(eps.repartition(7), model).collect()
    }
    assert set(a) == {"g1", "g2", "g3"}
    for gid in a:
        assert a[gid] == b[gid]
    # g2 (12 ticks): model fires at tick 5; episode ends at tick 11 -> 11-5=6 <= 8 win
    assert a["g2"].n_bets == 1 and a["g2"].n_wins == 1
    assert abs(a["g2"].pnl - 5.0) < 1e-9
    # g3 (50 ticks): bets at 5,15,25,35,45; only tick 45 wins (50-1-45 <= 8)
    assert a["g3"].n_bets == 5 and a["g3"].n_wins == 1
    # losses double the bet: -1 -2 -4 -4, then win at 45 pays 5*4=20 => pnl 9
    assert abs(a["g3"].pnl - 9.0) < 1e-9


def test_fit_hazard_model_broadcastable(spark):
    durations = spark.createDataFrame(
        [(d,) for d in [3, 3, 4, 10, 12, 12, 15]], "duration long"
    )
    model = fit_hazard_model(durations, window=5)
    assert model[0] > 0  # some mass ends within [0,5)
    assert model[15] == 1.0  # everything still alive at 15 ends there
    assert all(0.0 <= v <= 1.0 for v in model.values())


def test_sequential_bankroll_fold(spark):
    eps = _episodes(spark)
    model = {t: (0.5 if t % 10 == 5 else 0.0) for t in range(60)}
    pdf = replay_backtest(eps, model).toPandas()
    summary = sequential_bankroll_fold(pdf)
    assert summary["n_games"] == 3
    assert abs(summary["total_pnl"] - pdf["pnl"].sum()) < 1e-9
    assert summary["final_bankroll"] == 100.0 + summary["total_pnl"]

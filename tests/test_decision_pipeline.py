"""M3 feature extractor, M11 theta-Bayesian, M18 decision pipeline tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectra_player_spark.operators.decision_pipeline import (
    fit_survival_curve,
    replay_decision_pipeline,
    summarize_replay,
)
from vectra_player_spark.operators.feature_extractor import (
    HistoricalStats,
    extract_episode_features,
    theta_bayesian_posterior,
)


def _episodes(spark):
    rows = []
    for gid, n in (("g1", 25), ("g2", 40)):
        for s in range(n):
            price = 1.0 + 0.05 * s if s < n - 1 else 0.02  # death spike at end
            rows.append((gid, s, price))
    return spark.createDataFrame(rows, "game_id string, seq long, value double")


def _durations(spark):
    return spark.createDataFrame([(d % 30 + 5,) for d in range(100)], "duration long")


class TestFeatureExtractor:
    def test_shapes_and_state(self, spark):
        stats = HistoricalStats.fit(_durations(spark))
        feats = extract_episode_features(_episodes(spark), stats)
        pdf = feats.toPandas().set_index(["game_id", "tick"]).sort_index()
        assert len(pdf) == 65
        # percentile is monotone in tick
        g1 = pdf.loc["g1"]
        assert g1["duration_percentile"].is_monotonic_increasing
        # the death spike at the last tick registers as high intensity
        assert g1.iloc[-1]["vol_intensity"] > 2.0
        assert g1.iloc[-1]["death_spike_score"] > g1.iloc[-2]["death_spike_score"]
        # partition invariance
        again = (
            extract_episode_features(_episodes(spark).repartition(5), stats)
            .toPandas()
            .set_index(["game_id", "tick"])
            .sort_index()
        )
        assert (again == pdf).all().all() or again.equals(pdf)

    def test_theta_bayesian(self):
        flat = theta_bayesian_posterior(10, 40, theta=1.0)
        hot = theta_bayesian_posterior(10, 40, theta=3.0)
        assert 0 < flat["mean"] < 1
        # theta amplifies evidence: posterior pulls harder toward the data
        data_rate = 10 / 50
        assert abs(hot["mean"] - data_rate) < abs(flat["mean"] - data_rate)
        assert hot["credible_high"] <= 1.0 and flat["credible_low"] >= 0.0
        assert flat["kelly_fraction"] >= 0.0


class TestDecisionPipeline:
    def test_traced_replay(self, spark):
        curve = fit_survival_curve(_durations(spark))
        trace = replay_decision_pipeline(
            _episodes(spark), curve, mean_duration=19.5
        )
        pdf = trace.toPandas()
        assert len(pdf) == 65
        g1 = pdf[pdf.game_id == "g1"].sort_values("tick")
        # early ticks vetoed
        assert g1.iloc[0].vetoed and g1.iloc[0].veto_reason == "too_early"
        # p_rug within [0,1], buckets consistent with thresholds
        assert ((pdf.p_rug >= 0) & (pdf.p_rug <= 1)).all()
        assert set(pdf.bucket) <= {"LOW", "MED", "HIGH"}
        assert set(pdf.risk_state) <= {"ACTIVE", "REDUCED", "PAUSED", "RECOVERY"}
        # some bets actually placed and bankroll moved
        assert pdf.bet_placed.sum() > 0
        assert (pdf.bankroll != 100.0).any()

    def test_summary(self, spark):
        curve = fit_survival_curve(_durations(spark))
        trace = replay_decision_pipeline(_episodes(spark), curve, mean_duration=19.5)
        summary = {r.game_id: r for r in summarize_replay(trace).collect()}
        assert summary["g1"].n_ticks == 25
        assert summary["g1"].n_bets == summary["g1"].n_wins + (
            summary["g1"].n_bets - summary["g1"].n_wins
        )
        assert summary["g2"].n_vetoed >= 5  # min_tick vetoes at least

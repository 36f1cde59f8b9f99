"""Backtest replay query surface (M17/M18) — rows-only checked (sequential
per-game state is genuinely non-SQL; the driver records the weaker check,
and tests/test_backtest.py pins deterministic outputs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectra_player_spark.operators.backtest import fit_hazard_model, replay_backtest
from vectra_player_spark.plans.registry import register
from vectra_player_spark.tables import t


def _episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.select(
        F.col("user_id").cast("string").alias("game_id"),
        F.col("event_id").alias("seq"),
        "value",
    )


def _durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("duration")
    )


@register("backtest_replay", oracle=None, tags=("ml",), survey_ref="M17")
def backtest_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit the hazard model on per-user-day durations, then replay every
    user's event stream as an episode with the broadcast model."""
    model = fit_hazard_model(_durations(spark, sf_dir))
    return replay_backtest(_episodes(spark, sf_dir), model)


@register("stateful_feature_extract", oracle=None, tags=("ml",), survey_ref="M3")
def stateful_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3: 14-feature stateful per-episode extraction (rows-only — spike
    history / cooldown state is sequential; pinned tests cover values)."""
    from vectra_player_spark.operators.feature_extractor import (
        HistoricalStats,
        extract_episode_features,
    )

    stats = HistoricalStats.fit(_durations(spark, sf_dir))
    return extract_episode_features(_episodes(spark, sf_dir), stats)


@register("decision_pipeline_replay", oracle=None, tags=("ml",), survey_ref="M18")
def decision_pipeline_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M18: traced 5-stage replay (survival model -> regime -> arbitration
    -> risk state machine), one trace row per tick."""
    from vectra_player_spark.operators.decision_pipeline import (
        fit_survival_curve,
        replay_decision_pipeline,
    )

    durations = _durations(spark, sf_dir)
    curve = fit_survival_curve(durations)
    mean_dur = durations.agg(F.avg("duration")).collect()[0][0] or 1.0
    return replay_decision_pipeline(_episodes(spark, sf_dir), curve, mean_dur)


@register("gbt_threshold_analysis", oracle=None, tags=("ml",), survey_ref="M19")
def gbt_threshold_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M19 end-to-end: M4 training set → balanced-weight GBT (the
    reference classifier's class weighting, src/ml/model.py:63-294) →
    EV-threshold table over the deterministic validation split. Rows-only
    for the driver (tree ensembles aren't SQL-expressible); the EV
    identity ev_per_row·n == n_wins·payout − (n_bets − n_wins) is pinned
    by tests/test_ml_models.py."""
    from vectra_player_spark.operators.ml_models import threshold_analysis, train_gbt
    from vectra_player_spark.plans.queries_ml import training_set_builder

    # Materialize the training set ONCE (localCheckpoint cuts lineage):
    # the emptiness guard and every GBT boosting iteration then read the
    # checkpointed blocks instead of re-running the full builder plan —
    # previously the guard alone doubled the most expensive upstream stage.
    training = training_set_builder(spark, sf_dir).localCheckpoint(eager=True)
    if training.isEmpty():  # tree ensembles cannot fit on zero rows
        return spark.createDataFrame(
            [],
            "threshold double, n bigint, n_bets bigint, n_wins bigint,"
            " ev_per_row double, precision double",
        )
    _, scored = train_gbt(
        training,
        ["tick", "value", "vol_5", "momentum_3"],
        balance_classes=True,
    )
    return threshold_analysis(scored)


@register("rl_observation_set", oracle=None, tags=("ml",), survey_ref="M20")
def rl_observation_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M20 data-prep: 15-dim observation array per (episode, tick)."""
    from vectra_player_spark.operators.backtest import fit_hazard_model as _fit
    from vectra_player_spark.operators.rl_dataset import build_rl_observations

    model = _fit(_durations(spark, sf_dir))
    return build_rl_observations(_episodes(spark, sf_dir), model)

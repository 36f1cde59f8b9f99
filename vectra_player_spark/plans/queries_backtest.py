"""Backtest replay query surface (M17/M18) — rows-only checked (sequential
per-game state is genuinely non-SQL; the driver records the weaker check,
and tests/test_backtest.py pins deterministic outputs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectra_player_spark.operators.backtest import fit_hazard_model, replay_backtest
from vectra_player_spark.plans.registry import register
from vectra_player_spark.tables import t


@register("backtest_replay", oracle=None, tags=("ml",), survey_ref="M17,M18,M3")
def backtest_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit the hazard model on per-user-day durations, then replay every
    user's event stream as an episode with the broadcast model."""
    ev = t(spark, sf_dir, "events")
    durations = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("duration")
    )
    model = fit_hazard_model(durations)
    episodes = ev.select(
        F.col("user_id").cast("string").alias("game_id"),
        F.col("event_id").alias("seq"),
        "value",
    )
    return replay_backtest(episodes, model)

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


# The 15 observation slots are pure window expressions plus one broadcast
# survival-predictor join (operators/rl_dataset.py), so unlike the replay
# queries above M20 IS oracle-expressible — the driver row was red in r4
# because the packed array<double> column crashed the harness's pandas
# canonical sort. The registered form therefore emits the slots as named
# scalar columns (the env-artifact array API stays in rl_dataset.py);
# continuous slots use the engine-stable fround grid mirrored below, and
# p_end keeps the ROUND(,6) convention its own green oracle
# (conditional_end_prob, r1) established.
_RL_OBS_ORACLE = """
WITH durations AS (
  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS duration
  FROM events GROUP BY 1, 2
),
hist AS (SELECT duration AS t, COUNT(*) AS events FROM durations GROUP BY 1),
grid AS (
  SELECT UNNEST(range(0, CAST((SELECT MAX(duration) + 2 FROM durations) AS BIGINT)))
         AS t_grid
),
cond AS (
  SELECT g.t_grid AS t,
         ROUND(CASE WHEN SUM(CASE WHEN h.t >= g.t_grid THEN h.events ELSE 0 END) > 0
               THEN SUM(CASE WHEN h.t >= g.t_grid AND h.t < g.t_grid + 10
                             THEN h.events ELSE 0 END)
                    * 1.0 / SUM(CASE WHEN h.t >= g.t_grid THEN h.events ELSE 0 END)
               ELSE 0.0 END, 6) AS p_end
  FROM grid g CROSS JOIN hist h GROUP BY g.t_grid
),
ep AS (
  SELECT CAST(user_id AS VARCHAR) AS game_id, event_id AS seq,
         CAST(value AS DOUBLE) AS p
  FROM events
),
obs AS (
  SELECT game_id,
         ROW_NUMBER() OVER w - 1 AS tick,
         p,
         LAG(p, 1) OVER w AS l1,
         LAG(p, 3) OVER w AS l3,
         STDDEV(p) OVER (PARTITION BY game_id ORDER BY seq
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS vol5,
         STDDEV(p) OVER (PARTITION BY game_id ORDER BY seq
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS vol10,
         MAX(p) OVER (PARTITION BY game_id ORDER BY seq
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max,
         AVG(p) OVER (PARTITION BY game_id ORDER BY seq
               ROWS BETWEEN 10 PRECEDING AND CURRENT ROW) AS ma11
  FROM ep
  WINDOW w AS (PARTITION BY game_id ORDER BY seq)
)
SELECT
  o.game_id,
  CAST(o.tick AS BIGINT) AS tick,
  CAST(o.tick AS DOUBLE) AS obs_tick,
  FLOOR(COALESCE(o.p, 0.0) * 1e6 + 0.5) / 1e6 AS obs_price,
  FLOOR(COALESCE(o.p - o.l1, 0.0) * 1e6 + 0.5) / 1e6 AS obs_d1,
  FLOOR(COALESCE((o.p - o.l3) / 3.0, 0.0) * 1e6 + 0.5) / 1e6 AS obs_d3,
  FLOOR(COALESCE(o.vol5, 0.0) * 1e6 + 0.5) / 1e6 AS obs_vol5,
  FLOOR(COALESCE(o.vol10, 0.0) * 1e6 + 0.5) / 1e6 AS obs_vol10,
  FLOOR(COALESCE(o.run_max, 0.0) * 1e6 + 0.5) / 1e6 AS obs_run_max,
  FLOOR(COALESCE(o.p / NULLIF(o.run_max, 0.0) - 1, 0.0) * 1e6 + 0.5) / 1e6
    AS obs_drawdown,
  COALESCE(CAST(o.p > o.l3 * 1.2 AS DOUBLE), 0.0) AS obs_breakout,
  COALESCE(CAST(o.p < o.l3 * 0.8 AS DOUBLE), 0.0) AS obs_breakdown,
  COALESCE(c.p_end, 0.0) AS obs_p_rug,
  CAST(o.tick >= 200 AS DOUBLE) AS obs_zone,
  FLOOR(COALESCE(o.ma11, 0.0) * 1e6 + 0.5) / 1e6 AS obs_ma11,
  FLOOR(COALESCE(o.p - o.ma11, 0.0) * 1e6 + 0.5) / 1e6 AS obs_ma_dev,
  1.0 AS obs_bias
FROM obs o LEFT JOIN cond c ON o.tick = c.t
"""


@register("rl_observation_set", oracle=_RL_OBS_ORACLE, tags=("ml",), survey_ref="M20")
def rl_observation_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M20 data-prep: the 15-dim observation set per (episode, tick), emitted
    as named scalar columns (driver-safe; oracle-backed). The env-artifact
    array form is `rl_dataset.build_rl_observations` over the same slot
    definitions (reference: src/rl/envs/sidebet_v1_env.py:33-200)."""
    from vectra_player_spark.operators.rl_dataset import build_rl_observation_table
    from vectra_player_spark.operators.survival import conditional_end_probability

    durations = _durations(spark, sf_dir)
    max_t = durations.agg(F.max("duration")).collect()[0][0] or 0
    grid = spark.range(0, int(max_t) + 2).select(F.col("id").alias("t_grid"))
    curve = conditional_end_probability(durations, grid, window=10).select("t", "p_end")
    return build_rl_observation_table(_episodes(spark, sf_dir), curve)

"""Survival-analysis query surface (M5-M9, W12-W14).

Durations analog: the reference's unit is "game duration in ticks"; on the
driver's synthetic tables the same shape is "events per (user_id, day)" —
a per-episode duration distribution derived by the engine itself, so the
derivation is part of the checked query (FIXTURES.md "Mapping onto the
driver's synthetic tables").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectra_player_spark.operators.survival import (
    conditional_end_probability,
    hazard_rate,
    kelly_sizing,
    km_survival,
)
from vectra_player_spark.plans.registry import register
from vectra_player_spark.tables import events_for_windows

_DURATIONS_CTE = """
WITH durations AS (
  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS duration
  FROM events
  GROUP BY 1, 2
)
"""


def _durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hashpartitioning(user_id) satisfies ClusteredDistribution(user_id, day)
    ev = events_for_windows(spark, sf_dir)
    return ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("duration")
    )


_KM_ORACLE = (
    _DURATIONS_CTE
    + """
, hist AS (SELECT duration AS t, COUNT(*) AS events FROM durations GROUP BY 1),
km AS (
  SELECT t, events,
         CAST(SUM(events) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
              AS BIGINT) AS at_risk
  FROM hist
),
km2 AS (
  SELECT t, events, at_risk,
         MAX(CASE WHEN events >= at_risk THEN 1 ELSE 0 END)
             OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead,
         SUM(CASE WHEN events < at_risk THEN LN(1 - events * 1.0 / at_risk) END)
             OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumlog
  FROM km
)
SELECT t, events, at_risk,
       ROUND(CASE WHEN dead = 1 THEN 0.0 ELSE EXP(COALESCE(cumlog, 0.0)) END, 6) AS survival
FROM km2
"""
)


@register("km_survival_curve", oracle=_KM_ORACLE, tags=("survival", "bench"), survey_ref="M5,W12")
def km_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    return km_survival(_durations(spark, sf_dir))


_HAZARD_ORACLE = (
    _DURATIONS_CTE
    + """
, hist AS (SELECT duration AS t, COUNT(*) AS events FROM durations GROUP BY 1),
hz AS (
  SELECT t, events,
         CAST(SUM(events) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
              AS BIGINT) AS at_risk
  FROM hist
),
hz2 AS (SELECT t, events, at_risk, events * 1.0 / at_risk AS hazard FROM hz)
SELECT t, events, at_risk, ROUND(hazard, 6) AS hazard,
       ROUND(SUM(hazard) OVER (ORDER BY t ROWS BETWEEN 5 PRECEDING AND 4 FOLLOWING) / 10.0, 6)
         AS hazard_smoothed
FROM hz2
"""
)


@register("hazard_rate_smoothed", oracle=_HAZARD_ORACLE, tags=("survival",), survey_ref="M6,W13,W14")
def hazard_rate_smoothed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hazard_rate(_durations(spark, sf_dir), bandwidth=10)


_COND_ORACLE = (
    _DURATIONS_CTE
    + """
, hist AS (SELECT duration AS t, COUNT(*) AS events FROM durations GROUP BY 1),
grid AS (SELECT range AS t_grid FROM range(0, 101))
SELECT
  g.t_grid AS t,
  CAST(SUM(CASE WHEN h.t >= g.t_grid AND h.t < g.t_grid + 10 THEN h.events ELSE 0 END)
       AS BIGINT) AS n_end_in_window,
  CAST(SUM(CASE WHEN h.t >= g.t_grid THEN h.events ELSE 0 END) AS BIGINT) AS n_at_risk,
  ROUND(CASE WHEN SUM(CASE WHEN h.t >= g.t_grid THEN h.events ELSE 0 END) > 0
             THEN SUM(CASE WHEN h.t >= g.t_grid AND h.t < g.t_grid + 10 THEN h.events ELSE 0 END)
                  * 1.0 / SUM(CASE WHEN h.t >= g.t_grid THEN h.events ELSE 0 END)
             ELSE 0.0 END, 6) AS p_end
FROM grid g CROSS JOIN hist h
GROUP BY g.t_grid
"""
)


@register("conditional_end_prob", oracle=_COND_ORACLE, tags=("survival",), survey_ref="M7")
def conditional_end_prob(spark: SparkSession, sf_dir: str) -> DataFrame:
    grid = spark.range(0, 101).select(F.col("id").alias("t_grid"))
    return conditional_end_probability(_durations(spark, sf_dir), grid, window=10)


_KELLY_ORACLE = (
    _DURATIONS_CTE
    + """
, hist AS (SELECT duration AS t, COUNT(*) AS events FROM durations GROUP BY 1),
grid AS (SELECT range AS t_grid FROM range(0, 101)),
cond AS (
  SELECT
    g.t_grid AS t,
    CASE WHEN SUM(CASE WHEN h.t >= g.t_grid THEN h.events ELSE 0 END) > 0
         THEN SUM(CASE WHEN h.t >= g.t_grid AND h.t < g.t_grid + 10 THEN h.events ELSE 0 END)
              * 1.0 / SUM(CASE WHEN h.t >= g.t_grid THEN h.events ELSE 0 END)
         ELSE 0.0 END AS p_raw
  FROM grid g CROSS JOIN hist h
  GROUP BY g.t_grid
),
p AS (SELECT t, ROUND(p_raw, 6) AS p_end FROM cond)
SELECT t, p_end,
       ROUND(p_end - 1.0 / 6.0, 6) AS edge,
       ROUND(GREATEST((p_end * 5.0 - (1 - p_end)) / 5.0, 0.0), 6) AS kelly_fraction,
       ROUND(p_end * 6.0 - 1.0, 6) AS ev_per_unit
FROM p
"""
)


@register("kelly_entry_table", oracle=_KELLY_ORACLE, tags=("survival",), survey_ref="M8,M9")
def kelly_entry_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    grid = spark.range(0, 101).select(F.col("id").alias("t_grid"))
    cond = conditional_end_probability(_durations(spark, sf_dir), grid, window=10).select(
        "t", "p_end"
    )
    return kelly_sizing(cond, payout_b=5.0)


# Kelly named-fractions table (analyzers/kelly.py:40-337): the full/half/
# quarter/eighth Kelly variants plus fixed sizings, per entry tick.
_KELLY_FRACTIONS_ORACLE = (
    _DURATIONS_CTE
    + """
, hist AS (SELECT duration AS t, COUNT(*) AS events FROM durations GROUP BY 1),
grid AS (SELECT range AS t_grid FROM range(0, 101)),
cond AS (
  SELECT
    g.t_grid AS t,
    CASE WHEN SUM(CASE WHEN h.t >= g.t_grid THEN h.events ELSE 0 END) > 0
         THEN SUM(CASE WHEN h.t >= g.t_grid AND h.t < g.t_grid + 10 THEN h.events ELSE 0 END)
              * 1.0 / SUM(CASE WHEN h.t >= g.t_grid THEN h.events ELSE 0 END)
         ELSE 0.0 END AS p_raw
  FROM grid g CROSS JOIN hist h
  GROUP BY g.t_grid
),
k AS (
  SELECT t, ROUND(p_raw, 6) AS p_end,
         GREATEST((ROUND(p_raw, 6) * 5.0 - (1 - ROUND(p_raw, 6))) / 5.0, 0.0) AS kf
  FROM cond
)
SELECT t, p_end,
       ROUND(kf, 6) AS kelly_full,
       ROUND(kf * 0.5, 6) AS kelly_half,
       ROUND(kf * 0.25, 6) AS kelly_quarter,
       ROUND(kf * 0.125, 6) AS kelly_eighth,
       CAST(0.01 AS DOUBLE) AS fixed_1pct,
       CAST(0.02 AS DOUBLE) AS fixed_2pct,
       CAST(0.05 AS DOUBLE) AS fixed_5pct,
       CAST(0.1 AS DOUBLE) AS fixed_10pct,
       ROUND(p_end * 6.0 - 1.0, 6) AS ev_per_unit
FROM k
"""
)


@register("kelly_fractions_table", oracle=_KELLY_FRACTIONS_ORACLE, tags=("survival",), survey_ref="M9 (named fractions)")
def kelly_fractions_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    grid = spark.range(0, 101).select(F.col("id").alias("t_grid"))
    cond = conditional_end_probability(_durations(spark, sf_dir), grid, window=10).select(
        "t", "p_end"
    )
    p = F.col("p_end")
    kf = F.greatest((p * 5.0 - (1 - p)) / 5.0, F.lit(0.0))
    return cond.select(
        "t",
        "p_end",
        F.round(kf, 6).alias("kelly_full"),
        F.round(kf * 0.5, 6).alias("kelly_half"),
        F.round(kf * 0.25, 6).alias("kelly_quarter"),
        F.round(kf * 0.125, 6).alias("kelly_eighth"),
        F.lit(0.01).alias("fixed_1pct"),
        F.lit(0.02).alias("fixed_2pct"),
        F.lit(0.05).alias("fixed_5pct"),
        F.lit(0.1).alias("fixed_10pct"),
        F.round(p * 6.0 - 1.0, 6).alias("ev_per_unit"),
    )


_OPT_ORACLE = (
    _DURATIONS_CTE
    + """
, hist AS (SELECT duration AS t, COUNT(*) AS events FROM durations GROUP BY 1),
grid AS (SELECT range AS t_grid FROM range(0, 101)),
cond AS (
  SELECT
    g.t_grid AS t,
    CASE WHEN SUM(CASE WHEN h.t >= g.t_grid THEN h.events ELSE 0 END) > 0
         THEN SUM(CASE WHEN h.t >= g.t_grid AND h.t < g.t_grid + 10 THEN h.events ELSE 0 END)
              * 1.0 / SUM(CASE WHEN h.t >= g.t_grid THEN h.events ELSE 0 END)
         ELSE 0.0 END AS p_raw
  FROM grid g CROSS JOIN hist h
  GROUP BY g.t_grid
),
p AS (SELECT t, ROUND(p_raw, 6) AS p_end FROM cond)
SELECT t AS best_entry_tick, ROUND(p_end - 1.0 / 6.0, 6) AS best_edge
FROM p
ORDER BY (p_end - 1.0 / 6.0) DESC, t ASC
LIMIT 1
"""
)


@register("optimal_entry_window", oracle=_OPT_ORACLE, tags=("survival",), survey_ref="M8,O5")
def optimal_entry_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    grid = spark.range(0, 101).select(F.col("id").alias("t_grid"))
    cond = conditional_end_probability(_durations(spark, sf_dir), grid, window=10)
    return (
        cond.select(
            F.col("t").alias("best_entry_tick"),
            F.round(F.col("p_end") - 1.0 / 6.0, 6).alias("best_edge"),
        )
        .orderBy(F.desc(F.col("best_edge")), F.asc("best_entry_tick"))
        .limit(1)
    )

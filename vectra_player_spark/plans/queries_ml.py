"""ML-pipeline query surface: training-set builder (M4), Bayesian gap
signal (M10), volatility sizing tiers (M14), as-of interpolation (F9),
grouping sets / pivot, and the batch episode fetch (J3).

These are the reference's feature-engineering and decision-support passes
re-expressed declaratively; every one is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vectra_player_spark.operators.asof import asof_join
from vectra_player_spark.plans.registry import register
from vectra_player_spark.tables import events_for_windows, t

# --------------------------------------------------------------------------
# M4: training-set builder — sample every 5th tick, label "episode ends
# within the next 8 ticks" (bayesian_sidebet_analysis.py:222-283 semantics,
# tick == per-user event row number, episode end == last event).
# --------------------------------------------------------------------------

_TRAINING_ORACLE = """
WITH ticks AS (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS tick,
         COUNT(*) OVER (PARTITION BY user_id) AS episode_len,
         ROUND(STDDEV(value) OVER (PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS vol_5,
         ROUND((value - LAG(value, 3) OVER (PARTITION BY user_id ORDER BY event_id)) / 3.0, 6)
           AS momentum_3
  FROM events
)
SELECT user_id, tick, ROUND(value, 6) AS value, vol_5, momentum_3,
       (episode_len - 1 - tick <= 8) AS rug_in_window
FROM ticks
WHERE tick % 5 = 0
"""


@register("training_set_builder", oracle=_TRAINING_ORACLE, tags=("ml",), survey_ref="M4,M2,W5")
def training_set_builder(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_for_windows(spark, sf_dir)  # user_id-keyed: layout-routable
    w = Window.partitionBy("user_id").orderBy("event_id")
    wp = Window.partitionBy("user_id")
    ticks = ev.select(
        "user_id",
        "event_id",
        "value",
        (F.row_number().over(w) - 1).cast("bigint").alias("tick"),
        F.count(F.lit(1)).over(wp).alias("episode_len"),
        F.round(F.stddev("value").over(w.rowsBetween(-4, 0)), 6).alias("vol_5"),
        F.round((F.col("value") - F.lag("value", 3).over(w)) / 3.0, 6).alias("momentum_3"),
    )
    return ticks.where(F.col("tick") % 5 == 0).select(
        "user_id",
        "tick",
        F.round("value", 6).alias("value"),
        "vol_5",
        "momentum_3",
        (F.col("episode_len") - 1 - F.col("tick") <= 8).alias("rug_in_window"),
    )


# --------------------------------------------------------------------------
# M10: Bayesian gap signal — inter-event gaps → likelihood ratios at
# thresholds, posterior by odds-form product over a trailing window
# (analyzers/bayesian.py:38-313; thresholds scaled to the events cadence).
# Running product = exp(sum(ln(lr))) — W12 idiom.
# --------------------------------------------------------------------------

_GAP_ORACLE = """
WITH gaps AS (
  SELECT user_id, event_id,
         date_diff('second', LAG(ts) OVER (PARTITION BY user_id ORDER BY event_id), ts)
           AS gap_s
  FROM events
),
lrs AS (
  SELECT user_id, event_id, gap_s,
         CASE WHEN gap_s >= 7200 THEN 8.0
              WHEN gap_s >= 5400 THEN 3.0
              WHEN gap_s >= 3600 THEN 1.5
              ELSE 1.0 END AS lr
  FROM gaps WHERE gap_s IS NOT NULL
)
SELECT user_id, event_id, CAST(gap_s AS BIGINT) AS gap_s,
       CAST(ROUND(lr, 6) AS DOUBLE) AS lr,
       ROUND(EXP(SUM(LN(lr)) OVER (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)) * (1.0 / 9.0), 6) AS posterior_odds,
       ROUND(1 - 1 / (1 + EXP(SUM(LN(lr)) OVER (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)) * (1.0 / 9.0)), 6) AS p_signal
FROM lrs
"""


@register("bayesian_gap_signal", oracle=_GAP_ORACLE, tags=("ml", "bench"), survey_ref="M10,T4,W12")
def bayesian_gap_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_for_windows(spark, sf_dir)  # user_id-keyed: layout-routable
    w = Window.partitionBy("user_id").orderBy("event_id")
    gaps = ev.select(
        "user_id",
        "event_id",
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).alias("gap_s"),
    ).where(F.col("gap_s").isNotNull())
    lr = (
        F.when(F.col("gap_s") >= 7200, 8.0)
        .when(F.col("gap_s") >= 5400, 3.0)
        .when(F.col("gap_s") >= 3600, 1.5)
        .otherwise(1.0)
    )
    lrs = gaps.withColumn("lr", lr)
    wf = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-9, 0)
    prior_odds = 1.0 / 9.0
    odds = F.exp(F.sum(F.log("lr")).over(wf)) * prior_odds
    return lrs.select(
        "user_id",
        "event_id",
        F.col("gap_s").cast("bigint").alias("gap_s"),
        F.round("lr", 6).alias("lr"),
        F.round(odds, 6).alias("posterior_odds"),
        F.round(1 - 1 / (1 + odds), 6).alias("p_signal"),
    )


# --------------------------------------------------------------------------
# M14: volatility regime tiers — per-user return-std vs cross-user
# percentiles → position-size multipliers (volatility_study.py:251-297).
# --------------------------------------------------------------------------

_TIERS_ORACLE = """
WITH vol AS (
  SELECT user_id, STDDEV(ret) AS return_std
  FROM (
    SELECT user_id,
           value - LAG(value) OVER (PARTITION BY user_id ORDER BY event_id) AS ret
    FROM events
  ) WHERE ret IS NOT NULL
  GROUP BY user_id
),
cuts AS (
  SELECT quantile_cont(return_std, 0.2) AS p20,
         quantile_cont(return_std, 0.4) AS p40,
         quantile_cont(return_std, 0.6) AS p60,
         quantile_cont(return_std, 0.8) AS p80
  FROM vol
)
SELECT v.user_id, ROUND(v.return_std, 6) AS return_std,
       CAST(CASE WHEN v.return_std <= c.p20 THEN 1.5
                 WHEN v.return_std <= c.p40 THEN 1.25
                 WHEN v.return_std <= c.p60 THEN 1.0
                 WHEN v.return_std <= c.p80 THEN 0.75
                 ELSE 0.5 END AS DOUBLE) AS size_multiplier
FROM vol v CROSS JOIN cuts c
"""


@register("volatility_sizing_tiers", oracle=_TIERS_ORACLE, tags=("ml",), survey_ref="M14,A6")
def volatility_sizing_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_for_windows(spark, sf_dir)  # user_id-keyed: layout-routable
    w = Window.partitionBy("user_id").orderBy("event_id")
    vol = (
        ev.select("user_id", (F.col("value") - F.lag("value").over(w)).alias("ret"))
        .where(F.col("ret").isNotNull())
        .groupBy("user_id")
        .agg(F.stddev("ret").alias("return_std"))
    )
    cuts = vol.agg(
        F.expr("percentile(return_std, 0.2)").alias("p20"),
        F.expr("percentile(return_std, 0.4)").alias("p40"),
        F.expr("percentile(return_std, 0.6)").alias("p60"),
        F.expr("percentile(return_std, 0.8)").alias("p80"),
    )
    tier = (
        F.when(F.col("return_std") <= F.col("p20"), 1.5)
        .when(F.col("return_std") <= F.col("p40"), 1.25)
        .when(F.col("return_std") <= F.col("p60"), 1.0)
        .when(F.col("return_std") <= F.col("p80"), 0.75)
        .otherwise(0.5)
    )
    return vol.crossJoin(F.broadcast(cuts)).select(
        "user_id",
        F.round("return_std", 6).alias("return_std"),
        tier.alias("size_multiplier"),
    )


# --------------------------------------------------------------------------
# F9: piecewise-linear interpolation via AS-OF join — interpolate each
# user's daily cumulative value onto a fixed hour grid
# (bayesian_rug_signal.py:218-242 interpolation shape). Oracle uses
# DuckDB's native ASOF JOIN; Spark uses the union-window asof operator.
# --------------------------------------------------------------------------

_ASOF_ORACLE = """
WITH curve AS (
  SELECT user_id, event_id, ROUND(value, 6) AS value
  FROM events
),
grid AS (
  SELECT u.user_id, g.range * 100 AS grid_id
  FROM (SELECT DISTINCT user_id FROM events) u, range(0, 10) g
)
SELECT g.user_id, g.grid_id, c.event_id AS matched_event_id, c.value AS matched_value
FROM grid g
ASOF LEFT JOIN curve c
  ON g.user_id = c.user_id AND g.grid_id >= c.event_id
"""


@register("asof_join_grid", oracle=_ASOF_ORACLE, tags=("ml",), survey_ref="F9 (as-of join)")
def asof_join_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_for_windows(spark, sf_dir)  # user_id-keyed: layout-routable
    curve = ev.select(
        "user_id", "event_id", F.round("value", 6).alias("value")
    )
    users = ev.select("user_id").distinct()
    grid = users.crossJoin(
        F.broadcast(spark.range(0, 10).select((F.col("id") * 100).alias("grid_id")))
    )
    joined = asof_join(
        grid,
        curve.select(
            "user_id",
            F.col("event_id").alias("grid_id"),
            F.col("event_id").alias("matched_event_id"),
            F.col("value").alias("matched_value"),
        ),
        on="grid_id",
        by="user_id",
        right_cols=["matched_event_id", "matched_value"],
    )
    return joined.select("user_id", "grid_id", "matched_event_id", "matched_value")


# --------------------------------------------------------------------------
# M2: the full per-tick feature matrix — tick features (W1-W4) joined with
# momentum features (W7-W10) per (episode, tick), the 16-feature vector of
# extract_features (bayesian_sidebet_analysis.py:112-219) on one pass.
# --------------------------------------------------------------------------

_FEATURE_MATRIX_ORACLE = """
SELECT
  user_id, event_id,
  ROUND(value, 6) AS price,
  ROUND(value - LAG(value) OVER w, 6) AS price_change,
  ROUND(STDDEV(value) OVER (PARTITION BY user_id ORDER BY event_id
        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS volatility_5,
  ROUND(STDDEV(value) OVER (PARTITION BY user_id ORDER BY event_id
        ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6) AS volatility_10,
  ROUND((value - LAG(value, 3) OVER w) / 3.0, 6) AS momentum_3,
  ROUND((value - LAG(value, 5) OVER w) / 5.0, 6) AS momentum_5,
  ROUND(value - 2 * LAG(value, 1) OVER w + LAG(value, 2) OVER w, 6) AS acceleration,
  ROUND(MAX(value) OVER (PARTITION BY user_id ORDER BY event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_max,
  ROUND(value / NULLIF(MAX(value) OVER (PARTITION BY user_id ORDER BY event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) - 1, 6) AS drawdown,
  (value > LAG(value, 3) OVER w * 1.2) AS rapid_rise,
  (value < LAG(value, 3) OVER w * 0.8) AS rapid_fall,
  ROUND((value - AVG(value) OVER (PARTITION BY user_id ORDER BY event_id
        ROWS BETWEEN 10 PRECEDING AND CURRENT ROW))
        / NULLIF(AVG(value) OVER (PARTITION BY user_id ORDER BY event_id
        ROWS BETWEEN 10 PRECEDING AND CURRENT ROW), 0), 6) AS mean_reversion
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
"""


@register("feature_matrix", oracle=_FEATURE_MATRIX_ORACLE, tags=("ml", "bench"), survey_ref="M2,W1-W10")
def feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All window families in ONE pass: every expression shares the same
    (user_id, event_id) window spec, so Catalyst plans a single sort +
    single Window operator — the shape to prefer at 100 TB over chained
    per-feature passes. Self-routes onto the bucketed events layout when
    present (tables.events_for_windows)."""
    ev = events_for_windows(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("event_id")
    p = F.col("value")
    l1, l2, l3, l5 = (F.lag(p, k).over(w) for k in (1, 2, 3, 5))
    run_max = F.max(p).over(w.rowsBetween(Window.unboundedPreceding, 0))
    ma10 = F.avg(p).over(w.rowsBetween(-10, 0))
    return ev.select(
        "user_id",
        "event_id",
        F.round(p, 6).alias("price"),
        F.round(p - l1, 6).alias("price_change"),
        F.round(F.stddev(p).over(w.rowsBetween(-4, 0)), 6).alias("volatility_5"),
        F.round(F.stddev(p).over(w.rowsBetween(-9, 0)), 6).alias("volatility_10"),
        F.round((p - l3) / 3.0, 6).alias("momentum_3"),
        F.round((p - l5) / 5.0, 6).alias("momentum_5"),
        F.round(p - 2 * l1 + l2, 6).alias("acceleration"),
        F.round(run_max, 6).alias("running_max"),
        F.round(p / F.nullif(run_max, F.lit(0.0)) - 1, 6).alias("drawdown"),
        (p > l3 * 1.2).alias("rapid_rise"),
        (p < l3 * 0.8).alias("rapid_fall"),
        F.round((p - ma10) / F.nullif(ma10, F.lit(0.0)), 6).alias("mean_reversion"),
    )


# --------------------------------------------------------------------------
# Grouping sets: ROLLUP + CUBE over lineitem (Spark/DuckDB built-in).
# --------------------------------------------------------------------------

_CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("cube_lineitem", oracle=_CUBE_ORACLE, tags=("relational",), survey_ref="A3 (+cube/rollup)")
def cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------

_ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("rollup_lineitem", oracle=_ROLLUP_ORACLE, tags=("relational",), survey_ref="A3 (+cube/rollup)")
def rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# Pivot: per-user event-type counts as columns (oracle = manual CASE sums,
# the engine-portable formulation).
# --------------------------------------------------------------------------

_PIVOT_ORACLE = """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
FROM events
GROUP BY user_id
"""


@register("pivot_event_counts", oracle=_PIVOT_ORACLE, tags=("events",), survey_ref="A9 (pivot)")
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_for_windows(spark, sf_dir)  # user_id-keyed: layout-routable
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


# --------------------------------------------------------------------------
# J3: IN-list batch episode fetch (duckdb.py:253-264) — all events of an
# explicit episode-id list, episode-ordered.
# --------------------------------------------------------------------------

_INLIST_ORACLE = """
SELECT user_id, event_id, event_type, ROUND(value, 6) AS value
FROM events
WHERE user_id IN (1, 3, 5, 7)
"""


@register("episode_batch_fetch", oracle=_INLIST_ORACLE, tags=("events",), survey_ref="J3,O1")
def episode_batch_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_for_windows(spark, sf_dir)  # user_id-keyed: layout-routable
    return ev.where(F.col("user_id").isin(1, 3, 5, 7)).select(
        "user_id", "event_id", "event_type", F.round("value", 6).alias("value")
    )


# --------------------------------------------------------------------------
# M24: lake summary stats block (session_tracker.py:107-232).
# --------------------------------------------------------------------------

_SUMMARY_ORACLE = """
SELECT COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
       COUNT(DISTINCT event_type) AS n_event_types,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
"""


@register("lake_summary_stats", oracle=_SUMMARY_ORACLE, tags=("events",), survey_ref="M24,A1,A2")
def lake_summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.to_date("ts")).alias("n_days"),
        F.countDistinct("event_type").alias("n_event_types"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
    )


# --------------------------------------------------------------------------
# Explicit GROUPING SETS + GROUPING_ID: the general grouping-set form
# (cube/rollup are its specializations, registered above). The grouping-id
# bitmask disambiguates "NULL because aggregated away" from data NULLs —
# required for downstream consumers of multi-granularity rollup tables.
# One Expand + one aggregate exchange, same cost class as the rollup.
# --------------------------------------------------------------------------

_GSETS_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@register(
    "grouping_sets_lineitem",
    oracle=_GSETS_ORACLE,
    tags=("relational",),
    survey_ref="A3 (+grouping sets, grouping_id)",
)
def grouping_sets_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("gs_lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """)

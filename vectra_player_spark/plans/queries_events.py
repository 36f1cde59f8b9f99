"""Event-stream analytics over the driver's `events` table.

The `events` table plays the reference's event-envelope role (FIXTURES.md
§1 mapping): `user_id` ≈ game_id (episode key), `event_id` ≈ seq (episode
order), `value` ≈ price, `props` ≈ raw_json. Covers SURVEY §2.3 (F1-F8),
§2.6 (W1-W11), §2.8 (D1-D2), §2.9 (M1, M13, M21, M22), §2.11 T11 batch
shape.

Scale notes: every window here partitions by the episode key, so the only
shuffle is one hash exchange on user_id; all frames then evaluate within a
partition. The self-join in `pre_event_window` is an equi-join on user_id
with a range predicate — at 100 TB this stays a co-partitioned join, never
a cartesian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vectra_player_spark.operators.windows import (
    best_row_dedup,
    max_drop_per_episode,
    momentum_features,
    tick_features,
)
from vectra_player_spark.plans.registry import register
from vectra_player_spark.tables import events_for_windows, t

# --------------------------------------------------------------------------
# tick_features — the flagship query (duckdb.py:408-458 re-expressed).
# --------------------------------------------------------------------------

# FLOOR(x*1e6 + 0.5)/1e6, not ROUND: cross-engine-deterministic rounding
# (see functions/exact.fround — ROUND(double) flips at representation
# midpoints; measured 1-in-1e5 rows at the 10× lake).
_TICK_ORACLE = """
WITH t AS (
  SELECT
    user_id,
    event_id,
    CAST(value AS DOUBLE) AS price,
    CAST(value - LAG(value) OVER w AS DOUBLE) AS price_change,
    CAST((value - LAG(value) OVER w) / NULLIF(LAG(value) OVER w, 0) AS DOUBLE) AS pct_change,
    CAST(STDDEV(value) OVER (PARTITION BY user_id ORDER BY event_id
          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE) AS volatility_5,
    CAST(STDDEV(value) OVER (PARTITION BY user_id ORDER BY event_id
          ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS DOUBLE) AS volatility_10,
    CAST(MAX(value) OVER (PARTITION BY user_id ORDER BY event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_max,
    CAST(value / NULLIF(MAX(value) OVER (PARTITION BY user_id ORDER BY event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) - 1 AS DOUBLE) AS drawdown
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
)
SELECT
  user_id,
  event_id,
  FLOOR(price * 1e6 + 0.5) / 1e6 AS price,
  FLOOR(price_change * 1e6 + 0.5) / 1e6 AS price_change,
  FLOOR(pct_change * 1e6 + 0.5) / 1e6 AS pct_change,
  FLOOR(volatility_5 * 1e6 + 0.5) / 1e6 AS volatility_5,
  FLOOR(volatility_10 * 1e6 + 0.5) / 1e6 AS volatility_10,
  FLOOR(running_max * 1e6 + 0.5) / 1e6 AS running_max,
  FLOOR(drawdown * 1e6 + 0.5) / 1e6 AS drawdown
FROM t
"""


@register("tick_features", oracle=_TICK_ORACLE, tags=("events", "bench"), survey_ref="W1-W4,F3,F4,M2")
def tick_features_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    # self-routes onto the window-family bucketed layout when present
    # (tables.events_for_windows) — values layout-independent, same oracle
    ev = events_for_windows(spark, sf_dir)
    return tick_features(ev, episode_key="user_id", order_key="event_id", price_col="value")


_MOMENTUM_ORACLE = """
SELECT
  user_id,
  event_id,
  ROUND((value - LAG(value, 3) OVER w) / 3.0, 6) AS momentum_3,
  ROUND((value - LAG(value, 5) OVER w) / 5.0, 6) AS momentum_5,
  ROUND(value - 2 * LAG(value, 1) OVER w + LAG(value, 2) OVER w, 6) AS acceleration,
  (value > LAG(value, 1) OVER w AND LAG(value, 1) OVER w > LAG(value, 2) OVER w
   AND LAG(value, 2) OVER w > LAG(value, 3) OVER w) AS trend_up_3,
  (value < LAG(value, 1) OVER w AND LAG(value, 1) OVER w < LAG(value, 2) OVER w
   AND LAG(value, 2) OVER w < LAG(value, 3) OVER w) AS trend_down_3,
  (value > LAG(value, 3) OVER w * 1.2) AS rapid_rise,
  (value < LAG(value, 3) OVER w * 0.8) AS rapid_fall,
  ROUND((value - AVG(value) OVER (PARTITION BY user_id ORDER BY event_id
        ROWS BETWEEN 10 PRECEDING AND CURRENT ROW))
        / NULLIF(AVG(value) OVER (PARTITION BY user_id ORDER BY event_id
        ROWS BETWEEN 10 PRECEDING AND CURRENT ROW), 0), 6) AS mean_reversion
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
"""


@register("momentum_features", oracle=_MOMENTUM_ORACLE, tags=("events",), survey_ref="W7,W9,W10")
def momentum_features_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_for_windows(spark, sf_dir)
    return momentum_features(ev, episode_key="user_id", order_key="event_id", price_col="value")


# --------------------------------------------------------------------------
# Dedup idioms (D1 keep-first made deterministic, D2 best-row).
# --------------------------------------------------------------------------

_BEST_ROW_ORACLE = """
SELECT user_id, event_id, event_type, ROUND(value, 6) AS value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn
  FROM events
) WHERE rn = 1
"""


@register("best_row_dedup", oracle=_BEST_ROW_ORACLE, tags=("events",), survey_ref="W5,D2")
def best_row_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return best_row_dedup(ev, "user_id", [F.desc("value"), F.asc("event_id")]).select(
        "user_id", "event_id", "event_type", F.round("value", 6).alias("value")
    )


_FIRST_ROW_ORACLE = """
SELECT user_id, MIN(event_id) AS first_event_id
FROM events
GROUP BY user_id
"""


@register("dedup_keep_first", oracle=_FIRST_ROW_ORACLE, tags=("events",), survey_ref="D1")
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    # drop_duplicates(keep='first') made deterministic: 'first' under the
    # episode ordering = min(event_id) per key (SURVEY §7 hard-part 4).
    ev = events_for_windows(spark, sf_dir)  # user_id-keyed: rides the bucketed layout
    return ev.groupBy("user_id").agg(F.min("event_id").alias("first_event_id"))


# --------------------------------------------------------------------------
# Grouped counters + JSON extraction (A9, F1-F3).
# --------------------------------------------------------------------------

_COUNTS_ORACLE = """
SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
"""


@register("event_type_counts", oracle=_COUNTS_ORACLE, tags=("events",), survey_ref="A1,A2,A9")
def event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("user_id").alias("n_users")
    )


_JSON_ORACLE = """
SELECT
  event_type,
  COUNT(*) AS n,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k
FROM events
GROUP BY event_type
"""


@register("json_props_stats", oracle=_JSON_ORACLE, tags=("events",), survey_ref="F1,F2,F3")
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k), 6).alias("avg_k"),
    )


# --------------------------------------------------------------------------
# Event-time bucketing (T11 batch form, F5/F6) — tumbling 1-hour counts.
# --------------------------------------------------------------------------

_BUCKETS_ORACLE = """
SELECT
  STRFTIME(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
  event_type,
  COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@register("event_rate_buckets", oracle=_BUCKETS_ORACLE, tags=("events",), survey_ref="T11,F5,F6,A9")
def event_rate_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# pre_event_window (M21) — events in the 2h window preceding each error,
# per user: equi-join on user_id + time-range predicate.
# --------------------------------------------------------------------------

_PRE_EVENT_ORACLE = """
SELECT
  e.event_id AS error_event_id,
  COUNT(f.event_id) AS n_preceding,
  COUNT(DISTINCT f.event_type) AS n_types
FROM events e
LEFT JOIN events f
  ON f.user_id = e.user_id
 AND f.ts >= e.ts - INTERVAL 2 HOUR
 AND f.ts < e.ts
WHERE e.event_type = 'error'
GROUP BY e.event_id
"""


@register("pre_event_window", oracle=_PRE_EVENT_ORACLE, tags=("events",), survey_ref="M21,P4")
def pre_event_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_for_windows(spark, sf_dir)  # user_id-keyed: layout-routable
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("event_id").alias("error_event_id"),
        F.col("ts").alias("e_ts"),
    )
    cond = (
        (F.col("user_id") == F.col("e_user"))
        & (F.col("ts") >= F.col("e_ts") - F.expr("INTERVAL 2 HOURS"))
        & (F.col("ts") < F.col("e_ts"))
    )
    return (
        errors.join(ev, cond, "left")
        .groupBy("error_event_id")
        .agg(
            F.count("event_id").alias("n_preceding"),
            F.countDistinct("event_type").alias("n_types"),
        )
    )


# --------------------------------------------------------------------------
# max_drop (M1/M22) — rug-tick inference analog on the value series.
# --------------------------------------------------------------------------

_MAXDROP_ORACLE = """
SELECT user_id, event_id AS rug_tick, ROUND(drop, 6) AS max_drop
FROM (
  SELECT user_id, event_id, drop,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY drop DESC, event_id ASC) AS rn
  FROM (
    SELECT user_id, event_id,
           LAG(value) OVER (PARTITION BY user_id ORDER BY event_id) - value AS drop
    FROM events
  ) WHERE drop IS NOT NULL
) WHERE rn = 1
"""


@register("max_drop_per_user", oracle=_MAXDROP_ORACLE, tags=("events",), survey_ref="M1,M22")
def max_drop_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_for_windows(spark, sf_dir)  # user_id-keyed: layout-routable
    return max_drop_per_episode(ev, episode_key="user_id", order_key="event_id", price_col="value")


# --------------------------------------------------------------------------
# Rolling last-10 stats (W11) — recent-game-lengths window
# (data_processor.py:15-46) over a per-episode summary.
# --------------------------------------------------------------------------

_ROLLING_ORACLE = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS day_value
  FROM events GROUP BY 1, 2
)
SELECT
  user_id,
  STRFTIME(day, '%Y-%m-%d') AS day,
  n_events,
  ROUND(AVG(day_value) OVER (PARTITION BY user_id ORDER BY day
        ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6) AS avg_value_10d,
  ROUND(MIN(day_value) OVER (PARTITION BY user_id ORDER BY day
        ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6) AS min_value_10d,
  ROUND(MAX(day_value) OVER (PARTITION BY user_id ORDER BY day
        ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6) AS max_value_10d
FROM daily
"""


@register("rolling_daily_stats", oracle=_ROLLING_ORACLE, tags=("events",), survey_ref="W11")
def rolling_daily_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_for_windows(spark, sf_dir)  # user_id-keyed: rides the bucketed layout
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("day_value"),
    )
    w = Window.partitionBy("user_id").orderBy("day").rowsBetween(-9, 0)
    return daily.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_events",
        F.round(F.avg("day_value").over(w), 6).alias("avg_value_10d"),
        F.round(F.min("day_value").over(w), 6).alias("min_value_10d"),
        F.round(F.max("day_value").over(w), 6).alias("max_value_10d"),
    )


# --------------------------------------------------------------------------
# Volatility study per user (M13) — std / return-std / spike counts with a
# per-episode median threshold (volatility_study.py:53-137).
# --------------------------------------------------------------------------

_VOL_ORACLE = """
WITH diffs AS (
  SELECT user_id, value,
         value - LAG(value) OVER (PARTITION BY user_id ORDER BY event_id) AS ret
  FROM events
),
med AS (
  SELECT user_id, quantile_cont(ABS(ret), 0.5) AS med_abs_ret
  FROM diffs WHERE ret IS NOT NULL GROUP BY user_id
)
SELECT
  d.user_id,
  ROUND(STDDEV(d.value), 6) AS price_std,
  ROUND(STDDEV(d.ret), 6) AS return_std,
  ROUND(MAX(d.value) - MIN(d.value), 6) AS price_range,
  ROUND(MAX(d.value) / NULLIF(MIN(d.value), 0), 6) AS high_low_ratio,
  CAST(SUM(CASE WHEN ABS(d.ret) > 2 * m.med_abs_ret THEN 1 ELSE 0 END) AS BIGINT) AS spike_count
FROM diffs d
JOIN med m ON d.user_id = m.user_id
GROUP BY d.user_id
"""


@register("volatility_per_user", oracle=_VOL_ORACLE, tags=("events",), survey_ref="M13,A6,F7")
def volatility_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_for_windows(spark, sf_dir)  # user_id-keyed: layout-routable
    w = Window.partitionBy("user_id").orderBy("event_id")
    diffs = ev.select(
        "user_id",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("ret"),
    )
    med = (
        diffs.where(F.col("ret").isNotNull())
        .groupBy("user_id")
        .agg(F.expr("percentile(abs(ret), 0.5)").alias("med_abs_ret"))
    )
    return (
        # med scales with user cardinality — no broadcast hint; both sides
        # are already hash-partitioned on user_id (window + groupBy), so
        # the join reuses that exchange at any scale.
        diffs.join(med, "user_id")
        .groupBy("user_id")
        .agg(
            F.round(F.stddev("value"), 6).alias("price_std"),
            F.round(F.stddev("ret"), 6).alias("return_std"),
            F.round(F.max("value") - F.min("value"), 6).alias("price_range"),
            F.round(F.max("value") / F.nullif(F.min("value"), F.lit(0.0)), 6).alias(
                "high_low_ratio"
            ),
            F.sum(
                F.when(F.abs("ret") > 2 * F.col("med_abs_ret"), 1).otherwise(0)
            ).alias("spike_count"),
        )
    )


# --------------------------------------------------------------------------
# W6: vol-of-vol — std of the rolling 10-tick return std per user
# (volatility_study.py:114-120): a window pass feeding an aggregate.
# --------------------------------------------------------------------------

_VOLVOL_ORACLE = """
WITH rets AS (
  SELECT user_id, event_id,
         value - LAG(value) OVER (PARTITION BY user_id ORDER BY event_id) AS ret
  FROM events
),
rolling AS (
  SELECT user_id,
         STDDEV(ret) OVER (PARTITION BY user_id ORDER BY event_id
                           ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS roll_std
  FROM rets WHERE ret IS NOT NULL
)
SELECT user_id, ROUND(STDDEV(roll_std), 6) AS vol_of_vol
FROM rolling
GROUP BY user_id
"""


@register("vol_of_vol", oracle=_VOLVOL_ORACLE, tags=("events",), survey_ref="W6")
def vol_of_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_for_windows(spark, sf_dir)  # user_id-keyed: rides the bucketed layout
    w = Window.partitionBy("user_id").orderBy("event_id")
    rets = ev.select(
        "user_id",
        "event_id",
        (F.col("value") - F.lag("value").over(w)).alias("ret"),
    ).where(F.col("ret").isNotNull())
    rolling = rets.select(
        "user_id",
        F.stddev("ret").over(w.rowsBetween(-9, 0)).alias("roll_std"),
    )
    return rolling.groupBy("user_id").agg(
        F.round(F.stddev("roll_std"), 6).alias("vol_of_vol")
    )


# --------------------------------------------------------------------------
# V5/J6: novelty detection — event types outside the registered set
# (rag_ingester.py:140-145 KNOWN_EVENTS anti-join).
# --------------------------------------------------------------------------

_NOVEL_ORACLE = """
WITH known AS (SELECT unnest(['click', 'view', 'purchase']) AS event_type)
SELECT e.event_type, COUNT(*) AS n
FROM events e
WHERE NOT EXISTS (SELECT 1 FROM known k WHERE k.event_type = e.event_type)
GROUP BY e.event_type
"""


@register("novel_event_detection", oracle=_NOVEL_ORACLE, tags=("events",), survey_ref="V5,J6,D5")
def novel_event_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    known = spark.createDataFrame(
        [("click",), ("view",), ("purchase",)], "event_type string"
    )
    return (
        ev.join(F.broadcast(known), "event_type", "left_anti")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# T2 batch form: gap-based sessionization — lag(ts) + running sum of
# gap>threshold flags assigns session ids in one window pass (the batch
# dual of streaming session windows; scales with one shuffle on user_id).
# --------------------------------------------------------------------------

_SESSIONIZE_ORACLE = """
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN date_diff('second',
                LAG(ts) OVER (PARTITION BY user_id ORDER BY event_id), ts) >= 3600
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, event_id, value,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
  FROM flagged
)
SELECT user_id, session_no,
       COUNT(*) AS n_events,
       MIN(event_id) AS first_event_id,
       MAX(event_id) AS last_event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
FROM sessions
GROUP BY user_id, session_no
"""


@register("gap_sessionization", oracle=_SESSIONIZE_ORACLE, tags=("events", "bench"), survey_ref="T2 batch,W1")
def gap_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_for_windows(spark, sf_dir)  # user_id-keyed: layout-routable
    w = Window.partitionBy("user_id").orderBy("event_id")
    prev_ts = F.lag("ts").over(w)
    new_session = (
        prev_ts.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)) >= 3600)
    ).cast("int")
    sessions = ev.select(
        "user_id",
        "event_id",
        "value",
        F.sum(new_session)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("session_no"),
    )
    return sessions.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("first_event_id"),
        F.max("event_id").alias("last_event_id"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("session_value"),
    )


# --------------------------------------------------------------------------
# games_with_prices derivation (FIXTURES §3): per-episode ordered price
# array + array-HOF stats — the reference's core derived table
# (training_data/README.md:10-31), built as ONE groupBy with an ordered
# array_agg; peak/final/max-drop come from array functions, no re-explode.
# --------------------------------------------------------------------------

_EPISODE_ARRAYS_ORACLE = """
WITH eps AS (
  SELECT user_id AS game_id,
         LIST(ROUND(value, 6) ORDER BY event_id) AS prices
  FROM events
  GROUP BY user_id
)
SELECT game_id,
       CAST(len(prices) AS BIGINT) AS duration_ticks,
       md5(array_to_string(
         list_transform(prices, p -> CAST(CAST(p AS DECIMAL(18,6)) AS VARCHAR)), ','
       )) AS prices_hash,
       ROUND(list_max(prices), 6) AS peak_price,
       CAST(list_position(prices, list_max(prices)) AS BIGINT) AS peak_tick,
       prices[-1] AS final_price,
       ROUND(list_max(list_transform(generate_series(2, len(prices)),
                                     i -> prices[i - 1] - prices[i])), 6) AS max_drop
FROM eps
"""


@register("episode_price_arrays", oracle=_EPISODE_ARRAYS_ORACLE, tags=("events",), survey_ref="FIXTURES §3,M1,J5")
def episode_price_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_for_windows(spark, sf_dir)  # user_id-keyed: layout-routable
    eps = (
        ev.groupBy(F.col("user_id").alias("game_id"))
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("event_id", F.round("value", 6).alias("v")))
                ),
                lambda x: x["v"],
            ).alias("prices")
        )
    )
    prices = F.col("prices")
    drops = F.expr(
        "CASE WHEN size(prices) < 2 THEN NULL ELSE "
        "array_max(transform(sequence(1, size(prices) - 1), i -> prices[i - 1] - prices[i])) END"
    )
    # The per-episode ordered array itself is the operator's product; the
    # driver's canonicalizer cannot sort list columns, so the correctness
    # surface emits an order-sensitive md5 over the fixed-decimal rendering
    # (NOTES.md risk #2). Identical rendering on the DuckDB side.
    prices_hash = F.md5(
        F.concat_ws(
            ",",
            F.transform(prices, lambda p: p.cast("decimal(18,6)").cast("string")),
        )
    )
    return eps.select(
        "game_id",
        F.size(prices).cast("bigint").alias("duration_ticks"),
        prices_hash.alias("prices_hash"),
        F.round(F.array_max(prices), 6).alias("peak_price"),
        (F.array_position(prices, F.array_max(prices))).cast("bigint").alias("peak_tick"),
        F.element_at(prices, -1).alias("final_price"),
        F.round(drops, 6).alias("max_drop"),
    )


# --------------------------------------------------------------------------
# Descriptive-stats block (A6) — the reference's repeated
# count/mean/std/percentile summary (survival.py:178-196 et al).
# --------------------------------------------------------------------------

_DESC_ORACLE = """
SELECT
  event_type,
  COUNT(*) AS n,
  ROUND(AVG(value), 6) AS mean_value,
  ROUND(STDDEV(value), 6) AS std_value,
  ROUND(MIN(value), 6) AS min_value,
  ROUND(quantile_cont(value, 0.05), 6) AS p5,
  ROUND(quantile_cont(value, 0.25), 6) AS p25,
  ROUND(quantile_cont(value, 0.5), 6) AS p50,
  ROUND(quantile_cont(value, 0.75), 6) AS p75,
  ROUND(quantile_cont(value, 0.95), 6) AS p95,
  ROUND(quantile_cont(value, 0.99), 6) AS p99,
  ROUND(MAX(value), 6) AS max_value
FROM events
GROUP BY event_type
"""


@register("descriptive_stats", oracle=_DESC_ORACLE, tags=("events",), survey_ref="A6,F7")
def descriptive_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("mean_value"),
        F.round(F.stddev("value"), 6).alias("std_value"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.expr("percentile(value, 0.05)"), 6).alias("p5"),
        F.round(F.expr("percentile(value, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.75)"), 6).alias("p75"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        F.round(F.max("value"), 6).alias("max_value"),
    )


# --------------------------------------------------------------------------
# Batch analog of the T1 phase state machine: per-user event-type
# transition matrix. LAG over the (user_id, event_id) sequence yields
# (prev -> curr) transitions; counts and within-prev probabilities give
# the Markov view the streaming machine maintains incrementally. One
# window pass + one groupBy — at 100 TB the window partitions by user
# (high cardinality) and the transition matrix is |types|² rows.
# --------------------------------------------------------------------------

_TRANSITION_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
           AS prev_type
  FROM events
),
c AS (
  SELECT prev_type, event_type AS curr_type, COUNT(*) AS n_transitions
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, curr_type, n_transitions,
       ROUND(n_transitions * 1.0 /
             SUM(n_transitions) OVER (PARTITION BY prev_type), 6) AS p_transition
FROM c
"""


# --------------------------------------------------------------------------
# Ordered funnel (view -> click -> purchase): sequential-pattern matching
# via chained running-min windows — stage N's candidate events qualify only
# after the running first stage-N-1 event. Three window passes over ONE
# hash exchange on user_id (the shared sort order is reused), then a single
# groupBy. The batch analog of the reference's per-episode phase
# progression; no self-joins, no explode — linear at 100 TB.
# --------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, event_id, event_type,
         MIN(CASE WHEN event_type = 'view' THEN event_id END)
           OVER (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_view
  FROM events
),
s2 AS (
  SELECT *,
         CASE WHEN event_type = 'click' AND run_view IS NOT NULL
                   AND event_id > run_view THEN event_id END AS click_cand
  FROM s1
),
s3 AS (
  SELECT *,
         MIN(click_cand) OVER (PARTITION BY user_id ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_click
  FROM s2
),
s4 AS (
  SELECT *,
         CASE WHEN event_type = 'purchase' AND run_click IS NOT NULL
                   AND event_id > run_click THEN event_id END AS purchase_cand
  FROM s3
)
SELECT user_id,
       MIN(CASE WHEN event_type = 'view' THEN event_id END) AS first_view_id,
       MIN(click_cand) AS first_click_id,
       MIN(purchase_cand) AS first_purchase_id,
       CAST(CASE
         WHEN MIN(purchase_cand) IS NOT NULL THEN 3
         WHEN MIN(click_cand) IS NOT NULL THEN 2
         WHEN MIN(CASE WHEN event_type = 'view' THEN event_id END)
              IS NOT NULL THEN 1
         ELSE 0 END AS BIGINT) AS funnel_stage
FROM s4
GROUP BY user_id
"""


@register(
    "funnel_conversion",
    oracle=_FUNNEL_ORACLE,
    tags=("events",),
    survey_ref="sequential funnel (T1-adjacent ordered pattern match)",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_for_windows(spark, sf_dir)  # user_id-keyed: layout-routable
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    view_ev = F.when(F.col("event_type") == "view", F.col("event_id"))
    s1 = ev.select(
        "user_id", "event_id", "event_type", F.min(view_ev).over(w).alias("run_view")
    )
    s2 = s1.withColumn(
        "click_cand",
        F.when(
            (F.col("event_type") == "click")
            & F.col("run_view").isNotNull()
            & (F.col("event_id") > F.col("run_view")),
            F.col("event_id"),
        ),
    )
    s3 = s2.withColumn("run_click", F.min("click_cand").over(w))
    s4 = s3.withColumn(
        "purchase_cand",
        F.when(
            (F.col("event_type") == "purchase")
            & F.col("run_click").isNotNull()
            & (F.col("event_id") > F.col("run_click")),
            F.col("event_id"),
        ),
    )
    first_view = F.min(view_ev)
    first_click = F.min("click_cand")
    first_purchase = F.min("purchase_cand")
    return s4.groupBy("user_id").agg(
        first_view.alias("first_view_id"),
        first_click.alias("first_click_id"),
        first_purchase.alias("first_purchase_id"),
        F.when(first_purchase.isNotNull(), 3)
        .when(first_click.isNotNull(), 2)
        .when(first_view.isNotNull(), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("funnel_stage"),
    )


# --------------------------------------------------------------------------
# Interval range join WITHOUT an equi-key: per-user sessions probed by ALL
# other users' events inside the session's [start, end] time range. Naive
# form is a theta-join (cartesian + range filter — the oracle does exactly
# that; DuckDB plans an IEJoin). The Spark scale path discretizes time into
# fixed-width buckets: each interval explodes into the buckets it covers,
# each probe row maps to its own bucket, and the join becomes an EQUI-join
# on bucket + exact range refilter. Cost is |intervals| x avg buckets
# spanned + |events| — pick the bucket width near the typical interval
# length (sessions here average ~160 s, max ~2.3 h -> 1 h buckets). Each
# event matches a given session at most once (its own bucket), so no
# dedup pass is needed.
# --------------------------------------------------------------------------

_RANGE_JOIN_ORACLE = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN date_diff('second',
                LAG(ts) OVER (PARTITION BY user_id ORDER BY event_id), ts) >= 3600
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_no,
         ts
  FROM flagged
),
iv AS (
  SELECT user_id, session_no,
         MIN(epoch_us(ts)) AS start_us, MAX(epoch_us(ts)) AS end_us
  FROM sess GROUP BY user_id, session_no
)
SELECT iv.user_id, iv.session_no, COUNT(*) AS n_concurrent
FROM iv
JOIN (SELECT user_id AS e_user, epoch_us(ts) AS eus FROM events) e
  ON e.eus BETWEEN iv.start_us AND iv.end_us AND e.e_user <> iv.user_id
GROUP BY iv.user_id, iv.session_no
"""

_RANGE_BUCKET_US = 3_600_000_000  # 1 h in microseconds


@register(
    "interval_range_join",
    oracle=_RANGE_JOIN_ORACLE,
    tags=("events", "exact-baseline"),  # at scale use interval_range_join_routed
    survey_ref="range/interval join (bucketed equi-join scale path)",
)
def interval_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_for_windows(spark, sf_dir)  # user_id-keyed: rides the bucketed layout
    w = Window.partitionBy("user_id").orderBy("event_id")
    prev_ts = F.lag("ts").over(w)
    new_session = (
        prev_ts.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)) >= 3600)
    ).cast("int")
    sess = ev.select(
        "user_id",
        F.sum(new_session)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("session_no"),
        F.unix_micros("ts").alias("eus"),
    )
    iv = sess.groupBy("user_id", "session_no").agg(
        F.min("eus").alias("start_us"), F.max("eus").alias("end_us")
    )
    bkt = _RANGE_BUCKET_US
    iv_b = iv.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                (F.col("start_us") / bkt).cast("bigint"),
                (F.col("end_us") / bkt).cast("bigint"),
            )
        ),
    )
    probe = ev.select(
        F.col("user_id").alias("e_user"),
        F.unix_micros("ts").alias("e_us"),
        (F.unix_micros("ts") / bkt).cast("bigint").alias("bucket"),
    )
    return (
        iv_b.join(probe, "bucket")
        .where(
            F.col("e_us").between(F.col("start_us"), F.col("end_us"))
            & (F.col("e_user") != F.col("user_id"))
        )
        .groupBy("user_id", "session_no")
        .agg(F.count(F.lit(1)).alias("n_concurrent"))
    )


@register(
    "interval_concurrency_prefix",
    oracle=_RANGE_JOIN_ORACLE,
    tags=("events",),
    survey_ref="range/interval join scale path #2: distributed prefix-sum",
)
def interval_concurrency_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same answer as interval_range_join WITHOUT enumerating matched
    pairs: n_concurrent = #events in [start,end] − #own events in
    [start,end], each via an order-statistics prefix count — so the cost
    is O(n) + sort shuffles instead of output-pair enumeration. At 100×
    the bucketed equi-join spends 90 s enumerating ~10⁴× more matched
    pairs; this form only ever touches each event twice (one global
    two-level prefix, one per-user prefix).

    Mechanics: every event is a point (kind 1); every session contributes
    a start boundary (kind 0) and an end boundary (kind 2). Sorting by
    (ts, kind) makes a running event-count read at a start boundary count
    events STRICTLY before it and at an end boundary count events ≤ it —
    exactly BETWEEN semantics. The global running count uses a two-level
    prefix (per-time-bucket running sums + a cumulative over the tiny
    bucket-count relation) so no window ever sees a single global
    partition; the per-user count is an ordinary per-user window."""
    ev = events_for_windows(spark, sf_dir)  # user_id-keyed: rides the bucketed layout
    w = Window.partitionBy("user_id").orderBy("event_id")
    prev_ts = F.lag("ts").over(w)
    new_session = (
        prev_ts.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)) >= 3600)
    ).cast("int")
    sess = ev.select(
        "user_id",
        F.sum(new_session)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("session_no"),
        F.unix_micros("ts").alias("eus"),
    )
    iv = sess.groupBy("user_id", "session_no").agg(
        F.min("eus").alias("start_us"), F.max("eus").alias("end_us")
    )
    # TWO consumers read iv (start/end boundary branches) and THREE read
    # the points union (in-bucket window, per-user window, bucket totals);
    # per-branch pruning defeats ReuseExchange (the minhash_lsh_pairs
    # finding), so unpinned the sessionization windows recompute per
    # branch — measured 6 scans of events, 0 reused exchanges. Pin the
    # small |sessions| relation; the union pins below.
    from vectra_player_spark.session import pin

    iv = pin(iv)
    points = (
        ev.select(
            F.unix_micros("ts").alias("ts_us"),
            F.lit(1).alias("kind"),
            "user_id",
            F.lit(None).cast("bigint").alias("session_no"),
        )
        .unionByName(
            iv.select(
                F.col("start_us").alias("ts_us"), F.lit(0).alias("kind"),
                "user_id", "session_no",
            )
        )
        .unionByName(
            iv.select(
                F.col("end_us").alias("ts_us"), F.lit(2).alias("kind"),
                "user_id", "session_no",
            )
        )
    )
    bkt = _RANGE_BUCKET_US
    is_event = F.when(F.col("kind") == 1, 1).otherwise(0)
    pts = pin(points.withColumn("bucket", (F.col("ts_us") / bkt).cast("bigint")))
    in_bucket = Window.partitionBy("bucket").orderBy("ts_us", "kind").rowsBetween(
        Window.unboundedPreceding, 0
    )
    per_user = Window.partitionBy("user_id").orderBy("ts_us", "kind").rowsBetween(
        Window.unboundedPreceding, 0
    )
    counted = pts.select(
        "ts_us", "kind", "user_id", "session_no", "bucket",
        F.sum(is_event).over(in_bucket).cast("bigint").alias("g_local"),
        F.sum(is_event).over(per_user).cast("bigint").alias("u_count"),
    )
    # Cumulative events per bucket over the (tiny) bucket relation: the
    # single-partition window runs over |buckets| rows, never over events
    # (single_group keeps WindowExec's no-partition warning meaningful).
    from vectra_player_spark.operators.windows import single_group

    bucket_tot = pts.groupBy("bucket").agg(
        F.sum(is_event).cast("bigint").alias("n_ev")
    )
    prior = (
        F.sum("n_ev")
        .over(
            Window.partitionBy(single_group("bucket"))
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
    )
    bucket_prior = bucket_tot.select(
        "bucket", F.coalesce(prior, F.lit(0)).cast("bigint").alias("g_prior")
    )
    bounds = (
        counted.where(F.col("kind") != 1)
        .join(bucket_prior, "bucket")
        .select(
            "user_id", "session_no", "kind",
            (F.col("g_prior") + F.col("g_local")).alias("g_count"),
            "u_count",
        )
    )
    agg = bounds.groupBy("user_id", "session_no").agg(
        F.max(F.when(F.col("kind") == 0, F.col("g_count"))).alias("g_start"),
        F.max(F.when(F.col("kind") == 2, F.col("g_count"))).alias("g_end"),
        F.max(F.when(F.col("kind") == 0, F.col("u_count"))).alias("u_start"),
        F.max(F.when(F.col("kind") == 2, F.col("u_count"))).alias("u_end"),
    )
    n_conc = (
        (F.col("g_end") - F.col("g_start")) - (F.col("u_end") - F.col("u_start"))
    ).cast("bigint")
    return (
        agg.select("user_id", "session_no", n_conc.alias("n_concurrent"))
        # the pair-join form is INNER: zero-concurrency sessions don't appear
        .where(F.col("n_concurrent") > 0)
    )


@register(
    "interval_range_join_routed",
    oracle=_RANGE_JOIN_ORACLE,
    tags=("events", "routed"),
    survey_ref="range/interval join, cost-routed (default entry point)",
)
def interval_range_join_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DEFAULT entry point for interval concurrency: cost-routes
    between the two exact forms so a caller cannot pick the pair-enumerating
    join on a lake-sized input by accident (the round-3 'weak operator'
    finding — 87 s at the 100x lake, vs 24 s for the prefix form).

    Both arms are EXACT (same oracle): below the routing threshold the
    bucketed equi-join wins (fewer shuffles, and sf-scale pair volume is
    trivial); above it the O(n) order-statistics prefix-sum form is the
    only shape whose cost does not track matched-pair volume. Catalyst's
    own size estimate for the events scan gates the choice — no job runs
    to decide.
    """
    from vectra_player_spark.operators.routing import route

    return route(
        t(spark, sf_dir, "events"),
        lambda: interval_range_join(spark, sf_dir),
        lambda: interval_concurrency_prefix(spark, sf_dir),
    )


# --------------------------------------------------------------------------
# EWMA (RiskMetrics lambda=0.94) over a bounded 20-tap window. The
# recursive EWMA is not window-expressible, but the N-tap truncation is an
# exact finite convolution: both engines evaluate the SAME left-to-right
# chain of lag(value, j) * lambda^j terms (identical float literals via
# repr, identical addition order), so the doubles agree bit-for-bit before
# rounding. One window pass, one shuffle on user_id; 20 LAGs share a
# single sort — linear at 100 TB.
# --------------------------------------------------------------------------

_EWMA_LAMBDA = 0.94
_EWMA_TAPS = 20


def _ewma_oracle() -> str:
    num_terms = []
    den_terms = []
    for j in range(_EWMA_TAPS):
        # E-notation parses as DOUBLE in both engines (a plain decimal
        # literal would be DECIMAL in DuckDB and overflow when summed).
        wt = f"{_EWMA_LAMBDA**j:.17e}"
        x = "value" if j == 0 else f"LAG(value, {j}) OVER w"
        num_terms.append(f"COALESCE({x} * {wt}, 0.0)")
        den_terms.append(f"CASE WHEN {x} IS NOT NULL THEN {wt} ELSE 0.0 END")
    num = " + ".join(num_terms)
    den = " + ".join(den_terms)
    return f"""
SELECT user_id, event_id,
       ROUND(({num}) / ({den}), 6) AS ewma_20
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
"""


@register(
    "ewma_features",
    oracle=_ewma_oracle(),
    tags=("events",),
    survey_ref="W-family: exponentially weighted moving average",
)
def ewma_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_for_windows(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("event_id")
    num = None
    den = None
    for j in range(_EWMA_TAPS):
        wt = _EWMA_LAMBDA**j
        x = F.col("value") if j == 0 else F.lag("value", j).over(w)
        tn = F.coalesce(x * F.lit(wt), F.lit(0.0))
        td = F.when(x.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
        num = tn if num is None else num + tn
        den = td if den is None else den + td
    # NULLIF guard: a row whose 20-tap window is entirely NULL has den=0;
    # ANSI mode (Spark 4 default) turns that 0/0 into a job-killing error
    # instead of a NULL feature. Driver data is non-null (den >= 1), so
    # oracle parity is unaffected.
    return ev.select(
        "user_id", "event_id",
        F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("ewma_20"),
    )


# --------------------------------------------------------------------------
# Per-user OLS trend (in-database regression): slope/intercept/r2 of value
# over the tick index, from EXACT sums — x is the window row_number, y is
# cast to DECIMAL(18,6), so Sx/Sxx/Sy/Sxy/Syy are exact in both engines;
# each sum is cast to DOUBLE once and combined in one fixed expression, so
# the doubles agree bit-for-bit (no engine-dependent float accumulation
# like the built-in regr_slope). One window pass + one groupBy on user_id.
# --------------------------------------------------------------------------

_TREND_ORACLE = """
WITH xy AS (
  SELECT user_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS x,
         CAST(value AS DECIMAL(18,6)) AS y
  FROM events
),
s AS (
  SELECT user_id,
         COUNT(*) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * y) AS DOUBLE) AS sxy,
         CAST(SUM(y * y) AS DOUBLE) AS syy
  FROM xy GROUP BY user_id
)
SELECT user_id, n AS n_ticks,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
         AS intercept,
       ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM s
"""


@register(
    "user_trend_regression",
    oracle=_TREND_ORACLE,
    tags=("events",),
    survey_ref="in-database OLS per group (M-family extension)",
)
def user_trend_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    xy = ev.select(
        "user_id",
        F.row_number().over(w).alias("x"),
        F.col("value").cast("decimal(18,6)").alias("y"),
    )
    s = xy.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n, sx, sxx, sy, sxy, syy = (F.col(c) for c in ("n", "sx", "sxx", "sy", "sxy", "syy"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "user_id",
        n.alias("n_ticks"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            (n * sxy - sx * sy) * (n * sxy - sx * sy)
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


# --------------------------------------------------------------------------
# NTILE bucketing over pre-aggregated user totals: quartile assignment for
# stratification. The oracle states it as NTILE(4) OVER a global ORDER BY;
# the Spark side computes the identical assignment with operators.rank.
# exact_ntile — range-bucketed two-pass rank (partitioned windows only)
# plus NTILE's ceil/floor arithmetic — because |users| grows with the lake
# and a partition-less Window would funnel the reduced relation through
# one task. Deterministic via the (total DESC, user_id) tiebreak.
# --------------------------------------------------------------------------

_NTILE_ORACLE = """
WITH totals AS (
  SELECT user_id,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
         COUNT(*) AS n_events
  FROM events GROUP BY user_id
)
SELECT user_id, ROUND(total_value, 6) AS total_value, n_events,
       CAST(NTILE(4) OVER (ORDER BY total_value DESC, user_id) AS BIGINT)
         AS value_quartile
FROM totals
"""


@register(
    "ntile_user_quartiles",
    oracle=_NTILE_ORACLE,
    tags=("events",),
    survey_ref="W-family: ntile bucketing over reduced totals",
)
def ntile_user_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile stratification without a single-partition sort: the exact
    NTILE assignment comes from a distributed two-pass rank (see
    operators/rank.py); totals accumulate in exact decimal so the ORDER BY
    key is engine-identical before the (total DESC, user_id) tiebreak."""
    from vectra_player_spark.operators.rank import exact_ntile

    ev = t(spark, sf_dir, "events")
    totals = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    tiled = exact_ntile(
        totals, "total_value", "user_id", 4, out_col="value_quartile"
    )
    return tiled.select(
        "user_id",
        F.round("total_value", 6).alias("total_value"),
        "n_events",
        F.col("value_quartile").cast("bigint").alias("value_quartile"),
    )


# --------------------------------------------------------------------------
# Robust outlier detection via MAD (median absolute deviation): the
# training-pipeline cleaning rule that survives heavy tails where
# mean/stddev z-scores break. Two percentile passes (median, then median
# of absolute deviations) + equi-joins on user_id — every stage keyed on
# the group, no expansion. 4.4478 = 3 x 1.4826 (the normal-consistency
# constant), written in E-notation so both engines parse a DOUBLE.
# --------------------------------------------------------------------------

_MAD_ORACLE = """
WITH med AS (
  SELECT user_id, quantile_cont(value, 0.5) AS med FROM events GROUP BY user_id
),
dev AS (
  SELECT e.user_id, ABS(e.value - m.med) AS adev, m.med
  FROM events e JOIN med m USING (user_id)
),
mad AS (
  SELECT user_id, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY user_id
)
SELECT d.user_id,
       ROUND(MIN(d.med), 6) AS median_value,
       ROUND(MIN(m.mad), 6) AS mad,
       CAST(SUM(CASE WHEN d.adev > 4.4478e0 * m.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       COUNT(*) AS n_events
FROM dev d JOIN mad m USING (user_id)
GROUP BY d.user_id
"""


@register(
    "event_outlier_mad",
    oracle=_MAD_ORACLE,
    tags=("events",),
    survey_ref="P7 extension: robust MAD outlier cleaning",
)
def event_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    med = ev.groupBy("user_id").agg(F.expr("percentile(value, 0.5)").alias("med"))
    dev = ev.join(med, "user_id").select(
        "user_id", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("user_id").agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    return (
        dev.join(mad, "user_id")
        .groupBy("user_id")
        .agg(
            F.round(F.min("med"), 6).alias("median_value"),
            F.round(F.min("mad"), 6).alias("mad"),
            F.sum(F.when(F.col("adev") > F.lit(4.4478) * F.col("mad"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# --------------------------------------------------------------------------
# Cohort retention: users grouped by first-activity day; retention = count
# of distinct active users per (cohort_day, day_offset). The classic
# product-analytics rollup. One distinct on (user, day), one groupBy for
# cohort assignment, one equi-join back on user_id, one final groupBy —
# every stage keyed on user or (cohort, offset), no expansion anywhere.
# --------------------------------------------------------------------------

_COHORT_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
cohorts AS (
  SELECT user_id, MIN(day) AS cohort_day FROM ud GROUP BY user_id
)
SELECT STRFTIME(c.cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(date_diff('day', c.cohort_day, u.day) AS BIGINT) AS day_offset,
       COUNT(*) AS n_active_users
FROM ud u JOIN cohorts c USING (user_id)
GROUP BY 1, 2
"""


@register(
    "cohort_retention",
    oracle=_COHORT_ORACLE,
    tags=("events",),
    survey_ref="cohort/retention rollup (A-family extension)",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    cohorts = ud.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    # (user, day) is distinct, and day_offset is a function of day within a
    # user — so COUNT(*) per (cohort, offset) IS the distinct-user count.
    return (
        ud.join(cohorts, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort_day").cast("bigint").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


@register(
    "event_transition_matrix",
    oracle=_TRANSITION_ORACLE,
    tags=("events",),
    survey_ref="T1 batch analog (state transitions)",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", F.col("event_type").alias("curr_type")).agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wp = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "curr_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(wp).cast("double"), 6
        ).alias("p_transition"),
    )


# --------------------------------------------------------------------------
# props_variant_stats — the F1/F2 JSON family on Spark 4's VARIANT type:
# parse_json once into the binary variant encoding, then typed
# variant_get extractions. Against a 100 TB lake the variant column is the
# semi-structured scale path (parse once at ingest, store shredded binary,
# typed gets without re-tokenizing JSON text per expression); semantics
# are pinned equal to the text-path json_props_stats via the same DuckDB
# oracle family.
# --------------------------------------------------------------------------

_VARIANT_ORACLE = """
SELECT
  event_type,
  COUNT(*) AS n,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
  CAST(COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
    AS n_distinct_k
FROM events
GROUP BY event_type
"""


@register(
    "props_variant_stats",
    oracle=_VARIANT_ORACLE,
    tags=("events",),
    survey_ref="F1,F2 on the VARIANT binary encoding (Spark 4 semi-structured scale path)",
)
def props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.count_distinct(F.col("k")).alias("n_distinct_k"),
    )

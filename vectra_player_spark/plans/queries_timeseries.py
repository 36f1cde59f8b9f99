"""Time-series resampling and ranking queries over the event stream.

- ohlc_bars: the classic tick→bar downsample (open/high/low/close/volume
  per user per minute). Reference motivation: the recorder's per-game
  price series consumers resample ticks into fixed windows before charting
  and feature extraction (src/analysis/descriptive.py rolling blocks);
  OHLC is the canonical resample a price-lake user expects.
- user_value_ranks: the full SQL ranking family (RANK / DENSE_RANK /
  PERCENT_RANK / CUME_DIST) over per-user totals within an event type —
  the leaderboard shape (reference: v2-explorer leaderboard views). Totals
  are accumulated in exact DECIMAL so the rank ORDER BY key is identical
  on both engines regardless of float summation order.

Scale notes: ohlc_bars is ONE hash aggregate keyed on (user_id, minute) —
high-cardinality, no skew concentration, map-side partials apply; at
100 TB it is scan-bound. user_value_ranks reduces events to |users|×
|event types| rows with one groupBy BEFORE the window, so the global
rank sort runs over the reduced relation only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vectra_player_spark.plans.registry import register
from vectra_player_spark.tables import events_for_windows, t

_OHLC_ORACLE = """
SELECT user_id,
       strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS minute,
       CAST(COUNT(*) AS BIGINT) AS n_ticks,
       ROUND(arg_min(value, event_id), 6) + 0.0 AS open,
       ROUND(MAX(value), 6) + 0.0 AS high,
       ROUND(MIN(value), 6) + 0.0 AS low,
       ROUND(arg_max(value, event_id), 6) + 0.0 AS close,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS volume
FROM events
GROUP BY user_id, date_trunc('minute', ts)
"""


@register(
    "ohlc_bars",
    oracle=_OHLC_ORACLE,
    tags=("events", "timeseries"),
    survey_ref="W11/A9 time-bucket resample; tick→bar downsampling (descriptive.py consumers)",
)
def ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One hash aggregate: min_by/max_by give first/last tick by event_id
    (unique, so the bar edges are deterministic); volume sums in exact
    decimal then casts, so partial-agg merge order can't move the hash."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.date_trunc("minute", "ts").alias("m"))
        .agg(
            F.count(F.lit(1)).alias("n_ticks"),
            (F.round(F.min_by("value", "event_id"), 6) + 0.0).alias("open"),
            (F.round(F.max("value"), 6) + 0.0).alias("high"),
            (F.round(F.min("value"), 6) + 0.0).alias("low"),
            (F.round(F.max_by("value", "event_id"), 6) + 0.0).alias("close"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("volume"),
        )
        .select(
            "user_id",
            F.date_format("m", "yyyy-MM-dd HH:mm:ss").alias("minute"),
            "n_ticks",
            "open",
            "high",
            "low",
            "close",
            "volume",
        )
    )


_RANKS_ORACLE = """
WITH totals AS (
  SELECT event_type, user_id, SUM(CAST(value AS DECIMAL(18,6))) AS tv
  FROM events GROUP BY event_type, user_id
)
SELECT event_type, user_id,
       CAST(tv AS DOUBLE) AS total_value,
       CAST(RANK() OVER w AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS dense_rnk,
       ROUND(PERCENT_RANK() OVER w, 6) + 0.0 AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) + 0.0 AS cume
FROM totals
WINDOW w AS (PARTITION BY event_type ORDER BY tv DESC)
"""


@register(
    "user_value_ranks",
    oracle=_RANKS_ORACLE,
    tags=("events", "timeseries"),
    survey_ref="W5/O-family ranking breadth: RANK/DENSE_RANK/PERCENT_RANK/CUME_DIST leaderboard",
)
def user_value_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank functions are tie-stable, so ordering by the exact-decimal
    total alone (no row tiebreak) is deterministic on both engines."""
    ev = t(spark, sf_dir, "events")
    totals = ev.groupBy("event_type", "user_id").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("tv")
    )
    w = Window.partitionBy("event_type").orderBy(F.col("tv").desc())
    return totals.select(
        "event_type",
        "user_id",
        F.col("tv").cast("double").alias("total_value"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("dense_rnk"),
        (F.round(F.percent_rank().over(w), 6) + 0.0).alias("pct_rank"),
        (F.round(F.cume_dist().over(w), 6) + 0.0).alias("cume"),
    )


# --------------------------------------------------------------------------
# trailing_hour_stats — RANGE-frame window: per event, count / exact-sum /
# max of the SAME USER's events in the trailing hour (inclusive). This is
# the one window frame type the rest of the surface doesn't exercise:
# value-based RANGE BETWEEN over event-time seconds, where frame peers are
# determined by the ORDER BY value (ties included wholesale — so results
# are deterministic even with duplicate timestamps, unlike a ROWS frame).
# Scale: one hash exchange on user_id + one sort per partition — identical
# cost profile to the LAG/LEAD family; at 100 TB the range frame runs in
# the same single Window operator (running accumulation, no re-scan).
# --------------------------------------------------------------------------

_TRAIL_ORACLE = """
SELECT user_id, event_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_trailing,
       ROUND(MAX(value) OVER w, 6) + 0.0 AS max_trailing
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
"""


@register(
    "trailing_hour_stats",
    oracle=_TRAIL_ORACLE,
    tags=("events", "timeseries"),
    survey_ref="W-family RANGE-frame breadth: event-time trailing-window aggregates",
)
def trailing_hour_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    # µs-exact integer frame on BOTH engines: DuckDB's epoch() is a
    # fractional DOUBLE while Spark's unix_timestamp truncates to seconds —
    # mixing them makes frame membership data-dependent at the boundary.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_599_999_999, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_trailing"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias("sum_trailing"),
        (F.round(F.max("value").over(w), 6) + 0.0).alias("max_trailing"),
    )


# --------------------------------------------------------------------------
# native_session_windows — Spark's BUILT-IN session_window operator in
# batch mode: per-user sessions that extend while consecutive events are
# within a 1-hour gap (merge when diff <= gap — boundary semantics probed
# and pinned: an event exactly gap after its predecessor JOINS the
# session; end = last event ts + gap). This is T2's native form — the
# same groupBy spec runs under Structured Streaming with a watermark —
# while gap_sessionization remains the manual lag+cumsum analog. The
# oracle reproduces the merge rule in µs-exact integer arithmetic.
# Scale: one hash exchange on user_id + one sort — the session merge is
# a linear scan per partition (SessionWindowStateStore in streaming).
# --------------------------------------------------------------------------

_NATIVE_SESS_ORACLE = """
WITH o AS (
  SELECT user_id, epoch_us(ts) AS us, value FROM events
),
flagged AS (
  SELECT user_id, us, value,
         CASE WHEN LAG(us) OVER w IS NULL
              OR us - LAG(us) OVER w > 3600000000 THEN 1 ELSE 0 END AS new_s
  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY us)
),
sess AS (
  SELECT user_id, us, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
       strftime(make_timestamp(MIN(us)), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(make_timestamp(MAX(us) + 3600000000), '%Y-%m-%d %H:%M:%S') AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM sess GROUP BY user_id, sid
"""


@register(
    "native_session_windows",
    oracle=_NATIVE_SESS_ORACLE,
    tags=("events", "timeseries", "streaming-analog"),
    survey_ref="T2 sessionization via the native session_window operator (streaming-identical spec)",
)
def native_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "1 hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


# --------------------------------------------------------------------------
# scd2_user_type_history — slowly-changing-dimension type-2 derivation from
# an append-only event feed: collapse each user's consecutive run of the
# same event_type into a version row with [valid_from, valid_to) validity
# and an is_current flag. This is the CDC→dimension-history op every
# lakehouse pipeline runs (MERGE-style SCD2); the reference's SQLite
# storage keeps only current rows (services/rugs-feed/src/storage.py
# upsert), so the history derivation is the lake-side generalization.
#
# Plan shape: the change-flag LAG and the running-sum version id share ONE
# (user_id → ts, event_id) sort — a single shuffle, two window frames over
# the same Exchange. The version-level LEAD runs over the already-collapsed
# relation (|versions| ≪ |events|). At 100 TB: one shuffle of the event
# feed keyed by user — the minimum any order-dependent derivation needs —
# then strictly reduced data.
# --------------------------------------------------------------------------

_SCD2_ORACLE = """
WITH flagged AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), runs AS (
  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS version_id
  FROM flagged
), versions AS (
  SELECT user_id, CAST(version_id AS BIGINT) AS version_id, event_type,
         MIN(epoch_us(ts)) AS valid_from_us, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM runs GROUP BY user_id, version_id, event_type
)
SELECT user_id, version_id, event_type, valid_from_us,
       LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY version_id) AS valid_to_us,
       CASE WHEN LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY version_id) IS NULL
            THEN TRUE ELSE FALSE END AS is_current,
       n_events
FROM versions
"""


@register(
    "scd2_user_type_history",
    oracle=_SCD2_ORACLE,
    tags=("events", "timeseries", "cdc"),
    survey_ref="W5,A12 extension: SCD2 temporal versioning (gaps-and-islands)",
)
def scd2_user_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vectra_player_spark.operators.windows import scd2_history

    return scd2_history(
        t(spark, sf_dir, "events"),
        key_col="user_id",
        attr_col="event_type",
        ts_col="ts",
        id_col="event_id",
    )


# --------------------------------------------------------------------------
# gapfill_daily_locf — dense-grid resample with forward fill: per user,
# generate every day between their first and last 'error' observation and
# carry the last observed daily value forward across the gaps (LOCF), with
# an is_gapfilled marker. The missing-bucket interpolation every monitoring
# and feature pipeline needs before window math (the as-of grid family's
# F9 sibling, here as pure sequence+explode+window — no join-to-grid UDF).
#
# Scale shape: the grid is |user| × span_days rows generated by explode
# (map-side, no shuffle); ONE user-keyed shuffle serves the left join and
# the LOCF window. Span is bounded per key, so grid size is output-bound —
# at 100 TB the same plan gap-fills per (key, month) partition.
# --------------------------------------------------------------------------

_GAPFILL_ORACLE = """
WITH obs AS (
  SELECT user_id, date_trunc('day', ts) AS day, ROUND(MAX(value), 6) + 0.0 AS day_value
  FROM events WHERE event_type = 'error'
  GROUP BY user_id, date_trunc('day', ts)
), bounds AS (
  SELECT user_id, MIN(day) AS mn, MAX(day) AS mx FROM obs GROUP BY user_id
), grid AS (
  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day FROM bounds
)
SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day,
       last_value(o.day_value IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
       (o.day_value IS NULL) AS is_gapfilled
FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.day = g.day
"""


@register(
    "gapfill_daily_locf",
    oracle=_GAPFILL_ORACLE,
    tags=("events", "timeseries"),
    survey_ref="F9 sibling: dense-grid resample + LOCF forward fill",
)
def gapfill_daily_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    obs = (
        ev.where(F.col("event_type") == "error")
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg((F.round(F.max("value"), 6) + 0.0).alias("day_value"))
    )
    grid = (
        obs.groupBy("user_id")
        .agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
        .select(
            "user_id",
            F.explode(F.expr("sequence(mn, mx, interval 1 day)")).alias("day"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.last("day_value", ignorenulls=True).over(w).alias("value"),
            F.col("day_value").isNull().alias("is_gapfilled"),
        )
    )


# --------------------------------------------------------------------------
# nth_tick_anchors — the frame-navigation window family (NTH_VALUE +
# FIRST/LAST_VALUE IGNORE NULLS): per event, the episode's 2nd observed
# value so far, the first non-null value, and the most recent non-null
# value (the LOCF anchor). These are the W-family frame functions no other
# registered query exercises; a deterministic NULL injection (event_id %
# 7) makes the IGNORE NULLS semantics observable on a null-free source.
# Scale: one hash exchange on user_id, one sort, one Window operator —
# all four functions share the same running frame.
# --------------------------------------------------------------------------

_NTH_ORACLE = """
SELECT user_id, event_id,
       ROUND(nth_value(v, 2) OVER w, 6) + 0.0 AS second_value,
       ROUND(first_value(v IGNORE NULLS) OVER w, 6) + 0.0 AS first_nonnull,
       ROUND(last_value(v IGNORE NULLS) OVER w, 6) + 0.0 AS locf_value
FROM (
  SELECT user_id, event_id,
         CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
  FROM events
)
WINDOW w AS (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@register(
    "nth_tick_anchors",
    oracle=_NTH_ORACLE,
    tags=("events", "timeseries"),
    survey_ref="W-family frame navigation: NTH_VALUE, FIRST/LAST_VALUE IGNORE NULLS",
)
def nth_tick_anchors(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_for_windows(spark, sf_dir)
    v = F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    src = ev.select("user_id", "event_id", v.alias("v"))
    return src.select(
        "user_id",
        "event_id",
        (F.round(F.nth_value("v", 2).over(w), 6) + 0.0).alias("second_value"),
        (F.round(F.first("v", ignorenulls=True).over(w), 6) + 0.0).alias(
            "first_nonnull"
        ),
        (F.round(F.last("v", ignorenulls=True).over(w), 6) + 0.0).alias(
            "locf_value"
        ),
    )


# --------------------------------------------------------------------------
# trailing_hour_uniques — sliding DISTINCT cardinality: per event, how many
# distinct users acted in the same type's trailing hour. Spark disallows
# DISTINCT aggregates in windows; the engine expresses it as
# size(collect_set(...)) over the same RANGE frame — semantically identical
# (set state bounded by per-window cardinality), checked against DuckDB's
# native COUNT(DISTINCT ...) OVER. Scale note: any sliding-cardinality op
# is ordered state per partition key; event_type keys the parallelism here,
# and at lake scale the same frame runs per (key, day-chunk) with a 1-frame
# overlap — the exact structure streaming dropDuplicates+window uses.
# --------------------------------------------------------------------------

_TRAILING_UNIQ_ORACLE = """
SELECT event_type, event_id,
  CAST(COUNT(DISTINCT user_id) OVER (PARTITION BY event_type ORDER BY epoch_us(ts)
    RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW) AS BIGINT) AS uniq_users
FROM events
"""


@register(
    "trailing_hour_uniques",
    oracle=_TRAILING_UNIQ_ORACLE,
    tags=("events", "timeseries", "exact-baseline"),  # at scale use _routed
    survey_ref="W-family extension: sliding distinct cardinality (RANGE frame)",
)
def trailing_hour_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    # µs-exact frame (see trailing_hour_stats note on epoch vs truncation)
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_599_999_999, Window.currentRow)
    )
    return ev.select(
        "event_type",
        "event_id",
        F.size(F.collect_set("user_id").over(w)).cast("bigint").alias("uniq_users"),
    )


# --------------------------------------------------------------------------
# trailing_hour_uniques_hll — the sketch path for sliding DISTINCT at lake
# scale, self-validating. The exact form above carries a full user set per
# frame (state ∝ window cardinality; SCALE.md measured its cost growing
# with timeline density — 27× time for 10× rows on the 100× lake, the
# floor for materialized exact sliding distinct). HLL++ replaces the set
# with fixed ~kB registers, so per-frame state is O(1) regardless of how
# dense the hour is — the 100 TB form. approx_count_distinct is
# deterministic (hash-based, no RNG), but its values are engine-specific,
# so the registered query emits the error REPORT against the exact window
# (sketch_accuracy_report precedent): the claim under test is "the sketch
# tracks the exact count within its rsd", not the raw sketch values.
# --------------------------------------------------------------------------


@register(
    "trailing_hour_uniques_hll",
    oracle=None,
    tags=("events", "timeseries", "sketch"),
    survey_ref="W-family extension: sliding distinct via HLL sketch (scale path)",
)
def trailing_hour_uniques_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_599_999_999, Window.currentRow)
    )
    per_row = ev.select(
        F.size(F.collect_set("user_id").over(w)).cast("double").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.05).over(w).cast("double").alias("approx"),
    ).select(
        "exact",
        # nullif: a frame whose user_ids are all NULL has exact=0 (ANSI
        # would escalate 0/0); such rows drop out of the error averages.
        (
            F.abs(F.col("approx") - F.col("exact"))
            / F.nullif(F.col("exact"), F.lit(0.0))
        ).alias("rel_err"),
    )
    return per_row.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.avg("rel_err"), 6).alias("mean_rel_err"),
        F.round(F.max("rel_err"), 6).alias("max_rel_err"),
        F.round(F.avg((F.col("rel_err") <= 0.05).cast("double")), 6).alias("frac_within_rsd"),
    )


# oracle=None ON PURPOSE (round-5 ADVICE): the two arms DIVERGE in values
# (exact set counts vs HLL estimates), and route() picks by scan size — an
# exact-values oracle would silently red on any lake whose events scan
# exceeds spark.vectra.routing.maxExactBytes. Value coverage is unchanged:
# the exact arm IS `trailing_hour_uniques` (same oracle, registered above),
# the approx arm's accuracy contract is `trailing_hour_uniques_hll`'s
# self-report; this entry witnesses the dispatch itself (rows-only is
# arm-invariant — both arms emit one row per event). The routed entry whose
# arms share ONE oracle (interval_range_join_routed) stays hash-checked.
@register(
    "trailing_hour_uniques_routed",
    oracle=None,
    tags=("events", "timeseries", "routed"),
    survey_ref="sliding distinct cardinality, cost-routed (default entry point)",
)
def trailing_hour_uniques_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DEFAULT entry point for sliding distinct cardinality: below the
    routing threshold, the exact collect_set form (oracle-checked — the arm
    every correctness run exercises); above it, the same RANGE frame with
    HLL++ register state (approx_count_distinct, rsd 5%) whose per-frame
    cost is O(1) in window cardinality — the only affordable shape at lake
    scale (the exact form's set state made it the round-3 'weak operator':
    33.7 s at the 100x lake and growing superlinearly with density).

    The approx arm's values are engine-specific by nature; its accuracy
    contract is witnessed by the registered ``trailing_hour_uniques_hll``
    self-report (mean/max rel-err vs the exact window on the same data) —
    the approx-function validation split every warehouse engine draws.
    Schema is identical across arms, so downstream plans are
    routing-agnostic.
    """
    from vectra_player_spark.operators.routing import route

    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_599_999_999, Window.currentRow)
    )

    def _approx() -> DataFrame:
        return ev.select(
            "event_type",
            "event_id",
            F.approx_count_distinct("user_id", rsd=0.05)
            .over(w)
            .cast("bigint")
            .alias("uniq_users"),
        )

    return route(ev, lambda: trailing_hour_uniques(spark, sf_dir), _approx)


# --------------------------------------------------------------------------
# Mergeable sketch tables (round 5): the lake-scale pre-aggregation pattern
# — ONE small sketch row per (group, day) at ingest, any later range
# distinct answered by sketch UNION instead of a raw COUNT(DISTINCT) scan
# (operators/sketch_tables.py). Spark 4's native DataSketches HLL
# (hll_sketch_agg/hll_union_agg/hll_sketch_estimate) keeps the whole
# pipeline in codegen. Registered as self-validating error reports
# (sketch values are engine-specific — the accuracy claim is the check),
# like event_value_percentiles_approx / trailing_hour_uniques_hll.
# --------------------------------------------------------------------------


@register(
    "daily_uniques_sketch_rollup",
    oracle=None,
    tags=("events", "timeseries", "sketch"),
    survey_ref="A-family extension: mergeable HLL sketch table (pre-aggregated "
    "distinct over arbitrary ranges; stats-cache analog at lake scale)",
)
def daily_uniques_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build per-(event_type, day) HLL sketches, answer the all-range
    distinct per group from sketch UNION ONLY, report error vs exact —
    proving mergeability end-to-end, not just single-shot estimation."""
    from vectra_player_spark.operators.sketch_tables import sketch_rollup_error_report

    return sketch_rollup_error_report(t(spark, sf_dir, "events"))


@register(
    "token_heavy_hitters_cms",
    oracle=None,
    tags=("documents", "text", "sketch"),
    survey_ref="text-analysis extension: count-min-sketch heavy hitters with "
    "exact-count validation (one-sided error bound checked empirically)",
)
def token_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS over the corpus token stream probed at the exact top-20 tokens:
    checks the sketch never underestimates and overshoot stays within the
    eps*N bound."""
    from vectra_player_spark.operators.sketch_tables import heavy_hitters_report

    return heavy_hitters_report(t(spark, sf_dir, "documents"))

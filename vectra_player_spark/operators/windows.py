"""Per-episode window feature engineering (SURVEY §2.6 W1-W10, M1, M2).

The reference computes tick features with DuckDB window functions over one
game's ticks (src/services/event_store/duckdb.py:408-458: LAG price change,
rolling STDDEV over 5/10-tick frames, running MAX, drawdown with NULLIF
guards) and numpy momentum/mean-reversion passes
(notebooks/bayesian_sidebet_analysis.py:112-219). Here the same shapes are
Spark window expressions over (episode_key, order_key) — one shuffle per
episode key, all expressions evaluated in a single whole-stage-codegen pass,
and at 100 TB the shuffle is on the episode key so each episode's frame
stays within one partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vectra_player_spark.functions.exact import fround


def episode_window(episode_key: str, order_key: str) -> Window:
    return Window.partitionBy(episode_key).orderBy(order_key)


def single_group(col_name: str) -> Column:
    """Non-foldable constant partition key for windows that are
    single-partition BY DESIGN (they run over reduced, domain-bounded
    relations — a duration histogram, a bucket rollup — never over raw
    rows). Semantics are identical to an empty partition spec: every row
    shares the one value. The point is operational: WindowExec logs 'No
    Partition Defined' for an EMPTY spec regardless of input size, and a
    bench log full of justified warnings is a log where a real
    accidental global window can hide. A plain ``lit(0)`` gets
    constant-folded out of the spec, and ``hash(col) * 0`` simplifies to
    0 (hash is non-nullable) with the same outcome; ``pmod(hash(col), 1)``
    — literally "one bucket" — has no simplification rule, so the
    justified sites go quiet and any remaining WindowExec warning is a
    genuine alarm."""
    return F.pmod(F.hash(F.col(col_name)), F.lit(1))


def tick_features(
    df: DataFrame,
    episode_key: str = "game_id",
    order_key: str = "seq",
    price_col: str = "price",
    round_to: int | None = 6,
) -> DataFrame:
    """W1-W4: price_change, pct_change (NULLIF-guarded), vol5, vol10,
    running max, drawdown — the reference's get_tick_features query."""
    w = episode_window(episode_key, order_key)
    p = F.col(price_col).cast("double")
    prev = F.lag(p).over(w)

    def rnd(c: Column) -> Column:
        # fround, not F.round: division-derived features land on decimal
        # representation midpoints ~1e-5/row, where ROUND(double) differs
        # between engines (see functions/exact.fround). The oracle uses
        # the identical FLOOR formula.
        return fround(c, round_to) if round_to is not None else c

    running_max = F.max(p).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return df.select(
        F.col(episode_key),
        F.col(order_key),
        rnd(p).alias("price"),
        rnd(p - prev).alias("price_change"),
        rnd((p - prev) / F.nullif(prev, F.lit(0.0))).alias("pct_change"),
        rnd(F.stddev(p).over(w.rowsBetween(-4, 0))).alias("volatility_5"),
        rnd(F.stddev(p).over(w.rowsBetween(-9, 0))).alias("volatility_10"),
        rnd(running_max).alias("running_max"),
        rnd(p / F.nullif(running_max, F.lit(0.0)) - 1).alias("drawdown"),
    )


def momentum_features(
    df: DataFrame,
    episode_key: str = "game_id",
    order_key: str = "seq",
    price_col: str = "price",
) -> DataFrame:
    """W7/W9/W10: k-step momentum, 2nd-difference acceleration, monotone
    trend flags, ±20% rapid-rise/fall flags, 10-tick mean reversion
    (bayesian_sidebet_analysis.py:156-199)."""
    w = episode_window(episode_key, order_key)
    p = F.col(price_col).cast("double")
    l1, l2, l3, l5 = (F.lag(p, k).over(w) for k in (1, 2, 3, 5))
    ma10 = F.avg(p).over(w.rowsBetween(-10, 0))
    return df.select(
        F.col(episode_key),
        F.col(order_key),
        F.round((p - l3) / 3.0, 6).alias("momentum_3"),
        F.round((p - l5) / 5.0, 6).alias("momentum_5"),
        F.round(p - 2 * l1 + l2, 6).alias("acceleration"),
        ((p > l1) & (l1 > l2) & (l2 > l3)).alias("trend_up_3"),
        ((p < l1) & (l1 < l2) & (l2 < l3)).alias("trend_down_3"),
        (p > l3 * 1.2).alias("rapid_rise"),
        (p < l3 * 0.8).alias("rapid_fall"),
        F.round((p - ma10) / F.nullif(ma10, F.lit(0.0)), 6).alias("mean_reversion"),
    )


def best_row_dedup(df: DataFrame, key: str, order_cols: list[Column]) -> DataFrame:
    """W5/D2: ROW_NUMBER best-row dedup (build_scalping_dataset.py:60-73) —
    keep the top-ranked row per key under an explicit ordering (the
    deterministic replacement for pandas drop_duplicates keep='first')."""
    w = Window.partitionBy(key).orderBy(*order_cols)
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def max_drop_per_episode(
    df: DataFrame,
    episode_key: str = "game_id",
    order_key: str = "seq",
    price_col: str = "price",
) -> DataFrame:
    """M1/M22: rug-tick inference — the order_key whose single-step drop
    (prev - cur) is the largest in the episode; deterministic tie-break on
    earliest order_key (bayesian_sidebet_analysis.py:90-104)."""
    w = episode_window(episode_key, order_key)
    p = F.col(price_col).cast("double")
    dropped = df.select(
        F.col(episode_key),
        F.col(order_key),
        (F.lag(p).over(w) - p).alias("drop"),
    ).where(F.col("drop").isNotNull())
    pick = Window.partitionBy(episode_key).orderBy(F.desc("drop"), F.asc(order_key))
    return (
        dropped.withColumn("_rn", F.row_number().over(pick))
        .where(F.col("_rn") == 1)
        .select(
            F.col(episode_key),
            F.col(order_key).alias("rug_tick"),
            F.round(F.col("drop"), 6).alias("max_drop"),
        )
    )


def scd2_history(
    df: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """SCD2 temporal versioning from an append-only feed (gaps-and-islands):
    collapse each key's consecutive run of the same attribute value into a
    version row with [valid_from_us, valid_to_us) validity, is_current on
    the open version, and the run's event count.

    Plan shape: the change-flag LAG and the running-sum version id share ONE
    (key → ts, id) sort — a single shuffle, two frames over the same
    Exchange; the version-level LEAD runs over the collapsed relation
    (|versions| ≪ |rows|). The total order within a key is (ts, id) so ties
    on ts are deterministic across engines and retries.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    prev = F.lag(attr_col).over(w)
    chg = F.when(prev.isNull() | (prev != F.col(attr_col)), 1).otherwise(0)
    runs = df.select(
        key_col,
        attr_col,
        ts_col,
        id_col,
        F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("version_id"),
    )
    versions = runs.groupBy(key_col, "version_id", attr_col).agg(
        F.min(F.unix_micros(ts_col)).alias("valid_from_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = Window.partitionBy(key_col).orderBy("version_id")
    valid_to = F.lead("valid_from_us").over(wv)
    return versions.select(
        key_col,
        "version_id",
        attr_col,
        "valid_from_us",
        valid_to.alias("valid_to_us"),
        valid_to.isNull().alias("is_current"),
        "n_events",
    )

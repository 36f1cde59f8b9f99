"""Strategy-grid sweep (M15/M16) — the benchmark headline query.

The reference's grid-sweep optimizer evaluates 2,100 strategy configs
against 500-1,772 games in pure Python in 400.6 s
(docs/Scalp Research/checkpoints/scalping_opt_sweep_2026-02-08.json). The
Spark design is a broadcast cross join of the (tiny) parameter grid against
per-episode durations with closed-form window arithmetic — the "does any
bet window contain the rug tick" test reduces to integer div/mod, so no
explode and no UDF; the whole sweep is one whole-stage-codegen pass plus
one aggregate.

Bet-window semantics scaled from the reference (windows of `window_len`
ticks, 2-tick cooldown, up to `num_bets` consecutive windows starting at
`entry_tick`, win pays 5:1; explorer_data.py:47-216):
  off  = duration - entry_tick
  win  = off >= 0 AND off // spacing < num_bets AND off % spacing < window_len
  bets = 0 if off < 0 else min(num_bets, off // spacing + 1)
  profit = 6 - bets if win else -bets (0 if the game ended pre-entry)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectra_player_spark.plans.registry import register
from vectra_player_spark.tables import t

# The sweep is evaluated against the DURATION HISTOGRAM, not raw episodes:
# every episode with the same duration has the same outcome under every
# config, so the cross join is |distinct durations| × |grid| with
# count-weighted aggregates — identical results, and the expanded relation
# stays tiny no matter how many episodes feed the histogram (the 100 TB
# design; the reference sweeps raw games in Python, 400.6 s).
_GRID_ORACLE = """
WITH durations AS (
  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS d
  FROM events GROUP BY 1, 2
),
hist AS (SELECT d, COUNT(*) AS n FROM durations GROUP BY d),
grid AS (
  SELECT e.range * 2 AS entry_tick,
         n.range AS num_bets,
         CAST(L.len AS BIGINT) AS window_len
  FROM range(0, 51) e, range(1, 6) n, (VALUES (4), (6), (8)) L(len)
),
scored AS (
  SELECT
    g.entry_tick, g.num_bets, g.window_len, h.n,
    h.d - g.entry_tick AS off,
    g.window_len + 2 AS spacing
  FROM grid g CROSS JOIN hist h
),
outcomes AS (
  SELECT
    entry_tick, num_bets, window_len, n,
    off,
    CASE WHEN off >= 0
          AND CAST(FLOOR(off * 1.0 / spacing) AS BIGINT) < num_bets
          AND (off % spacing) < window_len
         THEN 1 ELSE 0 END AS win,
    CASE WHEN off < 0 THEN 0
         ELSE LEAST(num_bets, CAST(FLOOR(off * 1.0 / spacing) AS BIGINT) + 1) END AS bets
  FROM scored
)
SELECT
  entry_tick, num_bets, window_len,
  CAST(SUM(n) AS BIGINT) AS n_games,
  CAST(SUM(CASE WHEN off < 0 THEN n ELSE 0 END) AS BIGINT) AS n_early,
  CAST(SUM(win * n) AS BIGINT) AS n_wins,
  ROUND(SUM(win * n) * 1.0
        / NULLIF(SUM(n) - SUM(CASE WHEN off < 0 THEN n ELSE 0 END), 0), 6) AS win_rate,
  ROUND(SUM(n * CASE WHEN off < 0 THEN 0.0 WHEN win = 1 THEN 6.0 - bets ELSE 0.0 - bets END)
        / SUM(n), 6) AS ev
FROM outcomes
GROUP BY entry_tick, num_bets, window_len
"""


def _strategy_outcomes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration histogram × parameter grid with per-row outcome columns —
    the expanded relation is |distinct durations| × |grid| regardless of
    episode count (see _GRID_ORACLE comment)."""
    ev = t(spark, sf_dir, "events")
    durations = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("d")
    )
    hist = durations.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    entries = spark.range(0, 51).select((F.col("id") * 2).alias("entry_tick"))
    bets = spark.range(1, 6).select(F.col("id").alias("num_bets"))
    lens = spark.createDataFrame([(4,), (6,), (8,)], "window_len long")
    grid = entries.crossJoin(bets).crossJoin(lens)

    off = F.col("d") - F.col("entry_tick")
    spacing = F.col("window_len") + F.lit(2)
    slot = F.floor(off * 1.0 / spacing).cast("bigint")
    win = (
        (off >= 0) & (slot < F.col("num_bets")) & ((off % spacing) < F.col("window_len"))
    ).cast("int")
    placed = F.when(off < 0, F.lit(0)).otherwise(
        F.least(F.col("num_bets"), slot + 1)
    )
    return (
        hist.crossJoin(F.broadcast(grid))
        .select(
            "entry_tick",
            "num_bets",
            "window_len",
            "n",
            off.alias("off"),
            win.alias("win"),
            placed.cast("bigint").alias("bets"),
        )
    )


def _sweep_aggregate(outcomes: DataFrame) -> DataFrame:
    n = F.col("n")
    early_n = F.sum(F.when(F.col("off") < 0, n).otherwise(0))
    win_n = F.sum(F.col("win") * n)
    profit = (
        F.when(F.col("off") < 0, F.lit(0.0))
        .when(F.col("win") == 1, F.lit(6.0) - F.col("bets"))
        .otherwise(F.lit(0.0) - F.col("bets"))
    )
    return outcomes.groupBy("entry_tick", "num_bets", "window_len").agg(
        F.sum(n).cast("bigint").alias("n_games"),
        early_n.cast("bigint").alias("n_early"),
        win_n.cast("bigint").alias("n_wins"),
        F.round(
            win_n / F.nullif((F.sum(n) - early_n).cast("double"), F.lit(0.0)), 6
        ).alias("win_rate"),
        F.round(F.sum(n * profit) / F.sum(n), 6).alias("ev"),
    )


@register("strategy_grid_sweep", oracle=_GRID_ORACLE, tags=("strategy", "bench"), survey_ref="M15,M16,A10")
def strategy_grid_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sweep_aggregate(_strategy_outcomes(spark, sf_dir))


# ---------------------------------------------------------------------------
# The reference's stage-A sweep at its EXACT config count: 2,100 configs
# (100 entries × 7 bet counts × 3 window lengths) — the 400.6 s baseline
# workload (scalping_opt_sweep_2026-02-08.json). Same histogram-weighted
# plan; the config axis is nearly free.
# ---------------------------------------------------------------------------

_GRID_2100_ORACLE = _GRID_ORACLE.replace(
    "FROM range(0, 51) e, range(1, 6) n, (VALUES (4), (6), (8)) L(len)",
    "FROM range(0, 100) e, range(1, 8) n, (VALUES (4), (6), (8)) L(len)",
).replace("SELECT e.range * 2 AS entry_tick", "SELECT e.range * 1 AS entry_tick")


@register("strategy_grid_sweep_2100", oracle=_GRID_2100_ORACLE, tags=("strategy", "bench"), survey_ref="M16 (reference stage-A scale)")
def strategy_grid_sweep_2100(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    durations = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("d")
    )
    hist = durations.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    entries = spark.range(0, 100).select((F.col("id") * 1).alias("entry_tick"))
    bets = spark.range(1, 8).select(F.col("id").alias("num_bets"))
    lens = spark.createDataFrame([(4,), (6,), (8,)], "window_len long")
    grid = entries.crossJoin(bets).crossJoin(lens)

    off = F.col("d") - F.col("entry_tick")
    spacing = F.col("window_len") + F.lit(2)
    slot = F.floor(off * 1.0 / spacing).cast("bigint")
    win = (
        (off >= 0) & (slot < F.col("num_bets")) & ((off % spacing) < F.col("window_len"))
    ).cast("int")
    placed = F.when(off < 0, F.lit(0)).otherwise(F.least(F.col("num_bets"), slot + 1))
    outcomes = hist.crossJoin(F.broadcast(grid)).select(
        "entry_tick",
        "num_bets",
        "window_len",
        "n",
        off.alias("off"),
        win.alias("win"),
        placed.cast("bigint").alias("bets"),
    )
    return _sweep_aggregate(outcomes)


_BEST_CONFIG_ORACLE = (
    _GRID_ORACLE.rsplit("GROUP BY entry_tick, num_bets, window_len", 1)[0]
    + """GROUP BY entry_tick, num_bets, window_len
ORDER BY ev DESC, entry_tick ASC, num_bets ASC, window_len ASC
LIMIT 1
"""
)


@register("strategy_best_config", oracle=_BEST_CONFIG_ORACLE, tags=("strategy",), survey_ref="M16,O5")
def strategy_best_config(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = _sweep_aggregate(_strategy_outcomes(spark, sf_dir))
    return agg.orderBy(
        F.desc("ev"), F.asc("entry_tick"), F.asc("num_bets"), F.asc("window_len")
    ).limit(1)

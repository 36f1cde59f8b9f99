"""Survival analysis operators (SURVEY §2.9 M5-M9, W12-W14).

The reference computes Kaplan-Meier survival, hazard rates and conditional
rug probabilities over an array of game durations with numpy loops
(services/optimization/src/analyzers/survival.py). Here the same math is
order-insensitive Spark SQL:

- at-risk counts = reverse cumulative sum window over the grouped duration
  histogram (no per-row loop, one tiny shuffle on the duration value);
- Kaplan-Meier running product = exp(sum(log(conditional survival))) —
  Spark's `log` returns NULL at 0, so the "curve hit zero" case is handled
  with an explicit running flag instead (matches the reference where
  S(t)=0 once events == at-risk);
- np.convolve(mode='same') smoothing with an even bandwidth w maps exactly
  to SUM over ROWS BETWEEN w/2 PRECEDING AND w/2-1 FOLLOWING divided by w
  (truncated edges keep the /w divisor, like the reference — SURVEY §7
  hard-part 3).

The duration histogram is tiny after the first aggregate (distinct
durations), so everything downstream is effectively free and broadcastable
at any input scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def duration_histogram(durations: DataFrame, duration_col: str = "duration") -> DataFrame:
    """Group raw durations into (t, events) — events = episodes ending at t."""
    return durations.groupBy(F.col(duration_col).alias("t")).agg(
        F.count(F.lit(1)).alias("events")
    )


def km_survival(durations: DataFrame, duration_col: str = "duration") -> DataFrame:
    """M5: Kaplan-Meier curve: t, events, at_risk, survival (survival.py:26-71)."""
    hist = duration_histogram(durations, duration_col)
    # Single-partition windows BY DESIGN: they run over the duration
    # HISTOGRAM (|distinct t| rows, ~2k for real feeds — bounded by the
    # value domain, not the lake), never over raw episodes. The single
    # task sorts a broadcast-sized relation. single_group() keeps the
    # spec non-empty so WindowExec's warning stays meaningful elsewhere;
    # it is materialized as ONE column so every window here shares a
    # single Exchange+Sort (per-spec expression instances would not
    # unify under ExtractWindowExpressions).
    from vectra_player_spark.operators.windows import single_group

    hist = hist.withColumn("_one", single_group("t"))
    w_rev = (
        Window.partitionBy("_one")
        .orderBy("t")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    w_cum = (
        Window.partitionBy("_one")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cond = 1.0 - F.col("events") / F.col("at_risk")
    term = F.when(F.col("events") < F.col("at_risk"), F.log(cond))
    return (
        hist.withColumn("at_risk", F.sum("events").over(w_rev))
        .withColumn("_dead", F.max((F.col("events") >= F.col("at_risk")).cast("int")).over(w_cum))
        .withColumn(
            "survival",
            F.round(
                F.when(F.col("_dead") == 1, F.lit(0.0)).otherwise(
                    F.exp(F.coalesce(F.sum(term).over(w_cum), F.lit(0.0)))
                ),
                6,
            ),
        )
        .select("t", "events", "at_risk", "survival")
    )


def hazard_rate(
    durations: DataFrame, duration_col: str = "duration", bandwidth: int = 10
) -> DataFrame:
    """M6: raw hazard events/at_risk + convolve-'same' smoothing (survival.py:74-125)."""
    hist = duration_histogram(durations, duration_col)
    # Single-partition by design: histogram-sized relation (see
    # km_survival, incl. the shared-column rationale).
    from vectra_player_spark.operators.windows import single_group

    hist = hist.withColumn("_one", single_group("t"))
    w_rev = (
        Window.partitionBy("_one")
        .orderBy("t")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    # np.convolve(mode='same') with an even kernel w: out[i] averages
    # a[i-w/2 .. i+w/2-1] with truncated edges keeping the /w divisor —
    # verified against numpy impulse response in tests/test_semantics.py.
    # (Only valid for signals at least w long; numpy swaps operands below
    # that, which real hazard curves never hit.)
    half = bandwidth // 2
    w_smooth = (
        Window.partitionBy("_one")
        .orderBy("t")
        .rowsBetween(-half, bandwidth - half - 1)
    )
    return (
        hist.withColumn("at_risk", F.sum("events").over(w_rev))
        .withColumn("hazard", F.col("events") / F.col("at_risk"))
        .withColumn(
            "hazard_smoothed", F.round(F.sum("hazard").over(w_smooth) / float(bandwidth), 6)
        )
        .select("t", "events", "at_risk", F.round("hazard", 6).alias("hazard"), "hazard_smoothed")
    )


def conditional_end_probability(
    durations: DataFrame,
    grid: DataFrame,
    duration_col: str = "duration",
    window: int = 10,
) -> DataFrame:
    """M7: P(end in [t, t+window) | survived to t) for each grid tick t.

    Expressed as a broadcast cross join of the (tiny) grid against the
    duration histogram — the histogram after the first aggregate is at most
    |distinct durations| rows, so this never shuffles big data
    (survival.py:128-165; SURVEY §4 note on the cumulative-count rewrite).
    """
    hist = duration_histogram(durations, duration_col)
    joined = grid.join(F.broadcast(hist), F.lit(True), "left")
    return (
        joined.groupBy("t_grid")
        .agg(
            F.sum(
                F.when(
                    (F.col("t") >= F.col("t_grid")) & (F.col("t") < F.col("t_grid") + window),
                    F.col("events"),
                ).otherwise(0)
            ).alias("n_end_in_window"),
            F.sum(
                F.when(F.col("t") >= F.col("t_grid"), F.col("events")).otherwise(0)
            ).alias("n_at_risk"),
        )
        .select(
            F.col("t_grid").alias("t"),
            "n_end_in_window",
            "n_at_risk",
            F.round(
                F.when(
                    F.col("n_at_risk") > 0, F.col("n_end_in_window") / F.col("n_at_risk")
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("p_end"),
        )
    )


def kelly_sizing(prob_df: DataFrame, payout_b: float, p_col: str = "p_end") -> DataFrame:
    """M8/M9: edge vs breakeven 1/(b+1) and Kelly fraction max(0,(p·b-q)/b)
    as pure column arithmetic (analyzers/kelly.py:40-337)."""
    p = F.col(p_col)
    breakeven = 1.0 / (payout_b + 1.0)
    kelly = (p * payout_b - (1 - p)) / payout_b
    return prob_df.select(
        "t",
        p.alias("p_end"),
        F.round(p - breakeven, 6).alias("edge"),
        F.round(F.greatest(kelly, F.lit(0.0)), 6).alias("kelly_fraction"),
        F.round(p * (payout_b + 1.0) - 1.0, 6).alias("ev_per_unit"),
    )

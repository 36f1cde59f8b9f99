"""Model training operators (SURVEY §2.9 M19, M23).

- M19: gradient-boosted rug-in-window classifier on the M4 training set via
  Spark ML GBTClassifier (the distributed counterpart of the reference's
  sklearn GradientBoostingClassifier(100 est, depth 4), src/ml/model.py:63-294)
  plus the EV-optimal threshold search over the scored validation split.
- M23: profile producer — optimal-entry + Monte Carlo composed into a
  strategy-profile document (profiles/producer.py:43-106).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

THRESHOLDS = (0.1, 0.167, 0.2, 0.25, 0.3, 0.4, 0.5)


def balanced_class_weights(df: DataFrame, label_col: str = "label") -> DataFrame:
    """sklearn-'balanced' sample weights: w_c = n / (n_classes * n_c).
    The per-class counts are one scalar aggregate (never a row collect);
    weights attach via a broadcast join on the label."""
    counts = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("_n_c"))
    n_classes = counts.count()
    total = df.count()
    weights = counts.select(
        label_col,
        (F.lit(float(total)) / (F.lit(float(n_classes)) * F.col("_n_c"))).alias(
            "weight"
        ),
    )
    return df.join(F.broadcast(weights), label_col)


def train_gbt(
    training: DataFrame,
    feature_cols: list[str],
    label_col: str = "rug_in_window",
    max_iter: int = 20,
    max_depth: int = 4,
    seed: int = 42,
    balance_classes: bool = False,
    split_col: str | None = None,
):
    """Fit GBTClassifier; returns (model, scored_validation). Split is
    deterministic on a hash of the row (no randomSplit order-dependence) —
    by default over the feature tuple; pass `split_col` to key the split
    on an id column instead (required when distinct rows share a feature
    tuple, e.g. stratified fixtures — otherwise whole strata land in one
    fold; also the group-aware-split hook: hash a game/session id to keep
    an episode's rows out of both folds at once).

    balance_classes=True reproduces the reference classifier's balanced
    sample weighting (src/ml/model.py:63-294: rug-in-window positives are
    the rare class, so unweighted training under-calls them); Spark ML's
    weightCol carries the same w_c = n/(n_classes·n_c) weights sklearn's
    'balanced' mode derives."""
    from pyspark.ml.classification import GBTClassifier
    from pyspark.ml.feature import VectorAssembler

    clean = training.na.drop(subset=feature_cols + [label_col]).withColumn(
        "label", F.col(label_col).cast("double")
    )
    # deterministic 80/20 split via hash bucket (feature tuple or split_col)
    split_key = (
        [F.col(split_col)] if split_col else [F.col(c) for c in feature_cols]
    )
    keyed = clean.withColumn("_bucket", F.abs(F.hash(*split_key)) % 5)
    train_df = keyed.where(F.col("_bucket") != 0)
    valid_df = keyed.where(F.col("_bucket") == 0)
    assembler = VectorAssembler(inputCols=feature_cols, outputCol="features")
    gbt = GBTClassifier(
        maxIter=max_iter, maxDepth=max_depth, seed=seed, labelCol="label"
    )
    if balance_classes:
        train_df = balanced_class_weights(train_df)
        gbt = gbt.setWeightCol("weight")
    model = gbt.fit(assembler.transform(train_df))
    scored = model.transform(assembler.transform(valid_df))
    from pyspark.ml.functions import vector_to_array

    p1 = F.element_at(vector_to_array(F.col("probability")), 2)
    return model, scored.select("label", p1.alias("p_rug"))


def threshold_analysis(
    scored: DataFrame, payout: float = 5.0, thresholds=THRESHOLDS
) -> DataFrame:
    """M19's EV-optimal threshold search: for each cutoff, the bet EV over
    the validation split (bet placed when p_rug >= threshold; win pays
    `payout`, loss costs 1)."""
    spark = scored.sparkSession
    th = spark.createDataFrame([(t,) for t in thresholds], "threshold double")
    joined = scored.crossJoin(F.broadcast(th))
    bet = F.col("p_rug") >= F.col("threshold")
    profit = F.when(~bet, 0.0).when(F.col("label") == 1.0, payout).otherwise(-1.0)
    return (
        joined.groupBy("threshold")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(bet.cast("long")).alias("n_bets"),
            F.sum(F.when(bet & (F.col("label") == 1.0), 1).otherwise(0)).alias(
                "n_wins"
            ),
            F.round(F.avg(profit), 6).alias("ev_per_row"),
            F.round(
                F.sum(F.when(bet & (F.col("label") == 1.0), 1).otherwise(0))
                / F.nullif(F.sum(bet.cast("long")).cast("double"), F.lit(0.0)),
                6,
            ).alias("precision"),
            # reference semantics (src/ml/model.py:246-287): a payout:1
            # gross win nets +(payout-1) per unit staked, a loss -1, and
            # EV is normalized PER BET, not per row — ev = TP*(payout-1)
            # - FP over total bets. Emitted alongside ev_per_row so both
            # decision rules are computable from one table.
            F.round(
                (
                    F.sum(F.when(bet & (F.col("label") == 1.0), 1).otherwise(0))
                    * F.lit(payout - 1.0)
                    - F.sum(F.when(bet & (F.col("label") == 0.0), 1).otherwise(0))
                )
                / F.nullif(F.sum(bet.cast("long")).cast("double"), F.lit(0.0)),
                6,
            ).alias("ev_per_bet"),
        )
        .orderBy("threshold")
    )


def optimal_threshold_reference(
    table, min_win_rate: float = 0.25, default: float = 0.25
) -> float:
    """The reference's deployment-threshold decision (src/ml/model.py:
    200-209): walk thresholds in table order (ascending), keep the first
    strictly-highest ev_per_bet among thresholds whose win rate
    (precision) >= min_win_rate; fall back to `default` when none
    qualify. `table` is threshold_analysis' output (small — collected)."""
    best_t, best_ev = default, 0.0
    for r in table.orderBy("threshold").collect():
        if (
            r.precision is not None
            and r.ev_per_bet is not None
            and r.precision >= min_win_rate
            and r.ev_per_bet > best_ev
        ):
            best_t, best_ev = r.threshold, r.ev_per_bet
    return best_t


def produce_strategy_profile(
    durations: DataFrame,
    duration_col: str = "duration",
    payout_b: float = 5.0,
    mc_iterations: int = 2000,
    seed: int = 42,
) -> dict:
    """M23: compose M7/M8 (optimal entry from the duration distribution)
    with M12 (seeded Monte Carlo of the resulting strategy) into a
    strategy-profile document (schema v2.0.0 shape, FIXTURES §7)."""
    from vectra_player_spark.operators.montecarlo import (
        simulate_iterations,
        summarize_simulation,
    )
    from vectra_player_spark.operators.survival import (
        conditional_end_probability,
        kelly_sizing,
    )

    spark = durations.sparkSession
    max_t = durations.agg(F.max(duration_col)).collect()[0][0] or 0
    grid = spark.range(0, int(max_t) + 1).select(F.col("id").alias("t_grid"))
    cond = conditional_end_probability(durations, grid, duration_col, window=10)
    kelly = kelly_sizing(cond, payout_b=payout_b)
    best = (
        kelly.orderBy(F.desc("edge"), F.asc("t")).limit(1).collect()[0]
    )
    win_prob = float(best["p_end"])
    mc = summarize_simulation(
        simulate_iterations(
            spark, n_iterations=mc_iterations, win_prob=win_prob, seed=seed
        )
    ).collect()[0]
    return {
        "schema_version": "2.0.0",
        "execution": {
            "entry_tick": int(best["t"]),
            "bet_sizes": [float(best["kelly_fraction"])],
        },
        "scaling": {"mode": "kelly", "kelly_fraction": float(best["kelly_fraction"])},
        "edge": {"p_win": win_prob, "edge": float(best["edge"])},
        "monte_carlo_metrics": {
            "seed": seed,
            "iterations": mc_iterations,
            "mean_final": float(mc["mean_final"]),
            "p_profit": float(mc["p_profit"]),
            "p_ruin": float(mc["p_ruin"]),
            "var95": float(mc["var95"]),
        },
    }

"""Simulation query surface (M12 Monte Carlo).

No SQL oracle — sequential martingale state is genuinely non-SQL (the
driver records a rows-only check). Determinism is pinned by (seed=42,
iteration_id)-keyed RNG, so repeated runs and different partitionings give
identical output; tests/test_montecarlo.py asserts pinned aggregates, the
analog of the reference's seed-42 strategy-JSON golden metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from vectra_player_spark.operators.montecarlo import simulate_iterations, summarize_simulation
from vectra_player_spark.plans.registry import register


@register("monte_carlo_summary", oracle=None, tags=("simulation", "bench"), survey_ref="M11,M12")
def monte_carlo_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_iter = simulate_iterations(spark, n_iterations=2000, n_games=200, seed=42)
    return summarize_simulation(per_iter)

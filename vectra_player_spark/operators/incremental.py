"""Incremental rollup maintenance: fold mergeable partial aggregates over
event batches instead of recomputing from the full lake.

The reference keeps a stats cache it refreshes from the full store
(src/services/event_store summary paths; SURVEY §2 M24). At 100 TB a
full-recompute refresh is the bottleneck, so the engine's form is the
classic mergeable-partial pattern: each ingest batch reduces to partial
states (count / sum / max / min — all commutative monoids), and the
maintained rollup is `merge(state, partial)` — a union + re-aggregate
whose input is |state| + |batch| rows, never the lake. Deriving averages
(or any algebraic finalizer) happens in a view over the partials.

This is also exactly Structured Streaming's update-mode state model, so
the same aggregate spec serves the batch maintenance job and the
streaming query; the batch form here is what backfills / repairs state.

Correctness is driver-verified: plans/queries_pipeline.py registers a
query that folds 3 deterministic batches through merge_rollup and
oracle-checks the result against DuckDB's single-pass GROUP BY over all
events — incremental == full recompute as a hash-checked invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROLLUP_KEYS = ("user_id", "day")


def rollup_partial(batch: DataFrame) -> DataFrame:
    """Reduce one event batch to mergeable partial states per (user, day)."""
    return batch.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.max("value").alias("max_value"),
        F.min("value").alias("min_value"),
    )


def merge_rollup(state: DataFrame | None, partial: DataFrame) -> DataFrame:
    """Merge a new batch's partials into the maintained state.

    count/sum merge by SUM, max by MAX, min by MIN — each a commutative
    monoid, so batch order and batch boundaries cannot change the result
    (the property the oracle check pins). The merge's cost is
    |state| + |batch partials| rows hashed on the rollup key."""
    if state is None:
        return partial
    return state.unionByName(partial).groupBy(*ROLLUP_KEYS).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").alias("sum_value"),
        F.max("max_value").alias("max_value"),
        F.min("min_value").alias("min_value"),
    )


def finalize_rollup(state: DataFrame) -> DataFrame:
    """Algebraic finalizers over the partial states (the user-facing view)."""
    return state.select(
        "user_id",
        "day",
        F.col("n_events").cast("bigint").alias("n_events"),
        (F.round("sum_value", 6) + 0.0).alias("sum_value"),
        (F.round("max_value", 6) + 0.0).alias("max_value"),
        (F.round("min_value", 6) + 0.0).alias("min_value"),
        (F.round(F.col("sum_value") / F.col("n_events"), 6) + 0.0).alias("avg_value"),
    )

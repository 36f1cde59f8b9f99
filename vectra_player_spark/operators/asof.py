"""As-of join — the time-alignment operator Spark lacks natively.

The reference aligns time series by array index within a game; a general
engine needs a real as-of join (match each left row to the latest right row
with key <= left key). The scalable idiom here avoids any range explosion:

    union the two sides with a side marker, window-sort once on
    (by, key, side), carry the right side's payload forward with
    last_value(ignoreNulls) — one shuffle on the `by` key, O(n log n)
    within partitions, no broadcast requirement on either side.

At 100 TB both inputs shuffle once on `by` (same as any join); there is no
per-row range probe and no grid blow-up. For the purely-batch small-right
case an alternative is bucketize + equi-join, but the union-window form is
shuffle-optimal and skew-tolerant (AQE splits hot `by` keys).

DuckDB expresses the same thing natively as ASOF JOIN, which is what the
oracle uses — two very different physical strategies, same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest `on` value
    <= left's (direction='backward'; 'forward' = smallest >=).

    right_cols: payload columns carried from the right side (default: all
    non-key columns). Left columns are all preserved.

    tolerance: maximum |left.on - right.on| for a match (pandas
    merge_asof semantics) — matches farther away yield NULL payload
    instead of a stale carry-forward. Requires a numeric `on` column
    (convert timestamps to epoch first, as the grid queries do); the gap
    check rides the same window pass, no extra shuffle.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c != by]
    if tolerance is not None:
        # carry the matched right row's `on` through the same fill pass so
        # the gap is computable per left row
        right = right.withColumn("_r_on_val", F.col(on))
        right_cols = [*right_cols, "_r_on_val"]

    lcols = left.columns
    marker = F.lit(1) if direction == "backward" else F.lit(0)
    l_tagged = left.select(
        *lcols,
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
        marker.alias("_side"),
    )
    r_marker = F.lit(0) if direction == "backward" else F.lit(1)
    keep_keys = {on} | ({by} if by else set())
    r_tagged = right.select(
        *[
            F.col(c).alias(c)
            if c in keep_keys
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        r_marker.alias("_side"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    parts = [by] if by else []
    if direction == "backward":
        w = (
            Window.partitionBy(*parts)
            .orderBy(F.col(on).asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = unioned.select(
            *lcols,
            "_side",
            *[
                F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}")
                for c in right_cols
            ],
        )
    else:
        w = (
            Window.partitionBy(*parts)
            .orderBy(F.col(on).asc(), F.col("_side").asc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        filled = unioned.select(
            *lcols,
            "_side",
            *[
                F.first(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}")
                for c in right_cols
            ],
        )
    keep = F.col("_side") == (1 if direction == "backward" else 0)
    out = filled.where(keep)
    if tolerance is not None:
        right_cols = [c for c in right_cols if c != "_r_on_val"]
        gap = (
            (F.col(on) - F.col("_r__r_on_val"))
            if direction == "backward"
            else (F.col("_r__r_on_val") - F.col(on))
        )
        in_tol = F.col("_r__r_on_val").isNotNull() & (gap <= F.lit(tolerance))
        return out.select(
            *lcols,
            *[
                F.when(in_tol, F.col(f"_r_{c}")).alias(c)
                for c in right_cols
            ],
        )
    return out.select(
        *lcols, *[F.col(f"_r_{c}").alias(c) for c in right_cols]
    )

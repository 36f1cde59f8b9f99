"""Cost-based routing between exact and scale-path operator forms.

Two registered operators have an exact form that is correct at any scale
but carries a cost term that explodes with input volume:

- ``interval_range_join`` — bucketed equi-join that ENUMERATES every
  (session, concurrent-event) pair before counting; output-pair volume is
  ~quadratic in timeline density (87 s at the 100x lake, SCALE.md).
- ``trailing_hour_uniques`` — sliding DISTINCT whose per-frame set state
  is proportional to window cardinality (33.7 s at 100x).

Both already have registered scale-path twins (``interval_concurrency_prefix``
— an O(n) order-statistics prefix-sum; ``trailing_hour_uniques_hll`` — O(1)
HLL register state). What was missing (round-3 verdict) is a way for a
caller to get the right form WITHOUT knowing the taxonomy: picking the
enumeration form on a 100 TB lake by accident is exactly the class of
mistake an engine should absorb, the way the dedup family routes
collapse-first internally (operators/dedup.py rep_members).

:func:`route` dispatches on the OPTIMIZER'S size estimate of the input
plan (``optimizedPlan().stats().sizeInBytes`` — file-source scan bytes
after partition pruning; no job is run). The threshold is a session conf
(``spark.vectra.routing.maxExactBytes``, default 64 MiB) so a deployment
can tune where its exact forms stop being affordable. Routing never
changes semantics silently: the interval pair both arms are EXACT (same
oracle); the trailing-uniques approx arm substitutes HLL counts whose
accuracy contract is separately witnessed by the registered
``trailing_hour_uniques_hll`` error report (mean/max rel-err vs exact) —
the same split BigQuery/Snowflake draw for their APPROX_* functions.

Reference parity note: the reference runs every query exactly on a single
node (DuckDB IEJoin / COUNT(DISTINCT) OVER, src/services/event_store) —
affordable at its GB scale, the routed scale paths are what the same
semantics cost at TB scale.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

ROUTING_CONF = "spark.vectra.routing.maxExactBytes"
DEFAULT_MAX_EXACT_BYTES = 64 * 1024 * 1024

ROW_BYTES_CONF = "spark.vectra.routing.assumedRowBytes"
DEFAULT_ASSUMED_ROW_BYTES = 100

# Catalyst reports spark.sql.defaultSizeInBytes (Long.MaxValue unless
# overridden) for any relation it has no statistics for — a derived gate
# (post-join/aggregate with CBO off) propagates it. Anything in that
# magnitude band is a sentinel, not a measurement.
_UNKNOWN_STATS_FLOOR = 1 << 62


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the plan's output (bytes, no job run).

    For file-source scans this is the post-pruning file footprint; for
    derived plans it is the optimizer's propagated estimate — the same
    number AQE and the broadcast-threshold planner consult. Derived plans
    with UNKNOWN stats return the defaultSizeInBytes sentinel
    (Long.MaxValue) — callers must treat that band as "no estimate", not
    "huge" (see :func:`route`).
    """
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def route(
    gate: DataFrame,
    exact_fn: Callable[[], DataFrame],
    scale_fn: Callable[[], DataFrame],
    max_exact_bytes: int | None = None,
) -> DataFrame:
    """Return ``exact_fn()`` when ``gate``'s estimated size is affordable,
    else ``scale_fn()``. ``gate`` is the driving input relation (the one
    whose volume makes the exact form explode).

    Contract: ``gate`` should be a file-source scan (possibly with pushed
    filters), where Catalyst's estimate is the post-pruning file footprint
    — a real measurement. If a derived gate arrives with NO statistics,
    Catalyst propagates the defaultSizeInBytes sentinel, which naive
    comparison would silently read as "huge → scale arm". We refuse to
    route on the sentinel: instead the gate's rows are counted (one cheap
    job — bounded by a scan of the gate, always far below the exploding
    exact arm it guards) and sized at ``spark.vectra.routing.assumedRowBytes``
    (default 100) per row."""
    if max_exact_bytes is None:
        conf = gate.sparkSession.conf.get(ROUTING_CONF, None)
        max_exact_bytes = (
            int(conf) if conf is not None else DEFAULT_MAX_EXACT_BYTES
        )
    est = plan_size_bytes(gate)
    if est >= _UNKNOWN_STATS_FLOOR:  # stats sentinel, not a measurement
        row_bytes_conf = gate.sparkSession.conf.get(ROW_BYTES_CONF, None)
        row_bytes = (
            int(row_bytes_conf)
            if row_bytes_conf is not None
            else DEFAULT_ASSUMED_ROW_BYTES
        )
        est = gate.count() * row_bytes
    if est <= max_exact_bytes:
        return exact_fn()
    return scale_fn()

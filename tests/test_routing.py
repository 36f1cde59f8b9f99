"""Cost-based routing dispatcher (operators/routing.py)."""

from __future__ import annotations

from vectra_player_spark.operators.routing import (
    DEFAULT_MAX_EXACT_BYTES,
    ROUTING_CONF,
    plan_size_bytes,
    route,
)
from vectra_player_spark.tables import t


def test_plan_size_tracks_scan_bytes(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    n = plan_size_bytes(ev)
    # optimizer's estimate for a file scan ~ file footprint (sf0.001
    # events.parquet is ~28 KB on disk; the estimate is in that decade
    # and far below the routing default)
    assert 1_000 < n < DEFAULT_MAX_EXACT_BYTES


def test_route_picks_exact_below_threshold_and_scale_above(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    picked = []
    exact = lambda: (picked.append("exact"), ev)[1]  # noqa: E731
    scale = lambda: (picked.append("scale"), ev)[1]  # noqa: E731
    route(ev, exact, scale)  # default threshold: tiny scan → exact
    route(ev, exact, scale, max_exact_bytes=1)  # forced: scale
    assert picked == ["exact", "scale"]


def test_route_reads_session_conf(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    picked = []
    exact = lambda: (picked.append("exact"), ev)[1]  # noqa: E731
    scale = lambda: (picked.append("scale"), ev)[1]  # noqa: E731
    spark.conf.set(ROUTING_CONF, "1")
    try:
        route(ev, exact, scale)
        assert picked == ["scale"]
    finally:
        spark.conf.unset(ROUTING_CONF)
    route(ev, exact, scale)  # back to default
    assert picked == ["scale", "exact"]


def test_route_refuses_stats_sentinel(spark, sf_dir):
    """A derived gate with no statistics propagates the defaultSizeInBytes
    sentinel; route() must count rows instead of silently reading it as
    'huge → scale arm' (round-5 ADVICE)."""
    from pyspark.sql import functions as F

    from vectra_player_spark.operators.routing import (
        ROW_BYTES_CONF,
        _UNKNOWN_STATS_FLOOR,
    )

    ev = t(spark, sf_dir, "events")
    # An RDD-backed relation is the canonical no-stats plan: LogicalRDD
    # reports the Long.MaxValue defaultSizeInBytes sentinel.
    rdd = ev.select("event_id").limit(500).rdd
    derived = spark.createDataFrame(rdd, "event_id bigint")
    assert plan_size_bytes(derived) >= _UNKNOWN_STATS_FLOOR
    picked = []
    exact = lambda: (picked.append("exact"), ev)[1]  # noqa: E731
    scale = lambda: (picked.append("scale"), ev)[1]  # noqa: E731
    # 500 rows × 100 assumed bytes = 50 kB < 64 MiB → exact
    route(derived, exact, scale)
    assert picked == ["exact"]
    # with a huge assumed row width the same count routes to the scale arm
    spark.conf.set(ROW_BYTES_CONF, str(10**9))
    try:
        route(derived, exact, scale)
    finally:
        spark.conf.unset(ROW_BYTES_CONF)
    assert picked == ["exact", "scale"]

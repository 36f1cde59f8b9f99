"""Incremental layout maintenance (round-6): a lake that grows a new
day's partition must (1) stop routing onto the now-stale bucketed layout,
(2) absorb the delta via a per-bucket append WITHOUT rewriting history,
(3) keep routed window queries Exchange-free and value-identical to the
plain-scan arm, and (4) restore the sort-free plan after compaction.

Reference cadence analog: the recorder appends per-date files
(services/recording/src/storage.py:150-175); the layout must track that
ingest rhythm, not assume a static lake.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from vectra_player_spark.operators.skew import (
    _BUCKETED_EVENTS,
    _events_table_name,
    bucketed_events_if_available,
    compact_bucketed_events_layout,
    materialize_bucketed_events_lake,
    refresh_bucketed_events_layout,
)
from vectra_player_spark.tables import invalidate_lake, t

BUCKETS = 32


@pytest.fixture()
def growing_lake(spark, sf_dir, tmp_path):
    """A temp lake holding day-1 events (lower half by event_id) as a
    parquet DIRECTORY, plus the day-2 delta frame ready to append."""
    ev = t(spark, sf_dir, "events")
    cut = ev.agg(F.expr("percentile_approx(event_id, 0.5)")).collect()[0][0]
    lake = str(tmp_path / "lake")
    (tmp_path / "lake").mkdir()
    ev.where(F.col("event_id") <= cut).coalesce(2).write.parquet(
        f"{lake}/events.parquet"
    )
    day2 = ev.where(F.col("event_id") > cut)
    root = f"/tmp/vectra_bucketed_incr_{id(spark)}"
    spark.conf.set("spark.vectra.bucketed.location", root)
    shutil.rmtree(root, ignore_errors=True)
    yield lake, day2
    spark.conf.unset("spark.vectra.bucketed.location")
    _BUCKETED_EVENTS.clear()
    from vectra_player_spark.operators.skew import _STALE_LAYOUTS

    _STALE_LAYOUTS.clear()
    spark.sql(f"DROP TABLE IF EXISTS {_events_table_name(lake, BUCKETS)}")
    spark.sql(f"DROP TABLE IF EXISTS {_events_table_name(lake, BUCKETS)}_compact")
    shutil.rmtree(root, ignore_errors=True)
    invalidate_lake(lake)


def _window_rows_and_shape(spark, lake):
    """tick_features' exact window shape over the routed events relation:
    (sorted rows, #user_id Exchanges, #user_id Sorts) from the FINAL
    adaptive plan."""
    from vectra_player_spark.tables import events_for_windows

    ev = events_for_windows(spark, lake)
    w = Window.partitionBy("user_id").orderBy("event_id")
    feats = ev.select(
        "user_id",
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("d"),
    )
    feats.write.format("noop").mode("overwrite").save()
    plan = feats._jdf.queryExecution().executedPlan().toString()
    final = plan.split("+- == Initial Plan ==")[0]
    ex = sum(
        1
        for line in final.splitlines()
        if "Exchange hashpartitioning" in line and "user_id" in line
    )
    srt = sum(1 for line in final.splitlines() if "Sort [user_id" in line)
    return sorted(map(tuple, feats.collect())), ex, srt


def _plain_rows(spark, lake):
    from vectra_player_spark.tables import _read

    ev = _read(spark, lake, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return sorted(
        map(
            tuple,
            ev.select(
                "user_id",
                "event_id",
                F.round(F.col("value") - F.lag("value").over(w), 6).alias("d"),
            ).collect(),
        )
    )


def _files_per_bucket(spark, lake):
    import glob
    import os
    import re

    root = spark.conf.get("spark.vectra.bucketed.location")
    loc = os.path.join(root, _events_table_name(lake, BUCKETS))
    counts: dict[int, int] = {}
    for f in glob.glob(f"{loc}/part-*"):
        m = re.search(r"_(\d{5})(?:\.|_)", os.path.basename(f))
        if m:
            b = int(m.group(1))
            counts[b] = counts.get(b, 0) + 1
    return counts


def test_ingest_day_refresh_route_and_compact(spark, growing_lake):
    lake, day2 = growing_lake

    # day 1: full build; routed == plain, Exchange-free AND sort-free
    stats = refresh_bucketed_events_layout(spark, lake, BUCKETS)
    assert stats["mode"] == "built"
    rows1, ex1, srt1 = _window_rows_and_shape(spark, lake)
    assert (ex1, srt1) == (0, 0)
    assert rows1 == _plain_rows(spark, lake)

    # day 2 lands in the RAW lake (new part files in the same directory)
    day2.coalesce(1).write.mode("append").parquet(f"{lake}/events.parquet")
    invalidate_lake(lake)  # a new session would see this listing anyway

    # staleness contract: discovery refuses the outgrown layout (memo'd
    # signature changed), so the routed arm falls back to the plain scan
    assert bucketed_events_if_available(spark, lake, BUCKETS) is None
    rows_stale, ex_stale, _ = _window_rows_and_shape(spark, lake)
    assert ex_stale == 1  # plain arm shuffles — but answers stay right
    assert rows_stale == _plain_rows(spark, lake)

    # incremental refresh: delta-sized append, history untouched
    stats = refresh_bucketed_events_layout(spark, lake, BUCKETS)
    assert stats["mode"] == "appended"
    assert stats["delta_rows"] == day2.count()

    # appended layout: buckets now hold >1 file → Spark drops the scan's
    # sort claim (SortExec returns) but the hash-clustering claim holds
    # (no Exchange); values hash-match the unrouted arm
    rows2, ex2, srt2 = _window_rows_and_shape(spark, lake)
    assert ex2 == 0
    assert srt2 == 1
    assert rows2 == _plain_rows(spark, lake)
    fpb = _files_per_bucket(spark, lake)
    assert max(fpb.values()) > 1  # fragmentation is real, not vacuous

    # idempotent: re-running the refresh is a noop
    assert refresh_bucketed_events_layout(spark, lake, BUCKETS)["mode"] == "noop"

    # compaction: back to one file per bucket, sort claim restored
    assert compact_bucketed_events_layout(spark, lake, BUCKETS)["mode"] == "compacted"
    fpb = _files_per_bucket(spark, lake)
    assert fpb and max(fpb.values()) == 1
    rows3, ex3, srt3 = _window_rows_and_shape(spark, lake)
    assert (ex3, srt3) == (0, 0)
    assert rows3 == _plain_rows(spark, lake)


def test_refresh_invalidates_plan_cache_itself(spark, growing_lake):
    """Round-7 ADVICE (high): refresh must NOT depend on the caller having
    run invalidate_lake first. Sequence that used to bake a wrong layout:
    (1) t() caches the raw plan (listing snapshots at analysis), (2) the
    lake grows, (3) refresh's 'built' path materializes THROUGH the stale
    cached listing → a layout missing the new files, memoized against the
    FRESH signature — discovery then routes queries onto incomplete data
    with every guard already spent. The fix (invalidate at the top of
    refresh + fresh _read inside materialize + post-build count assert)
    makes this sequence safe."""
    lake, day2 = growing_lake

    # (1) cache the raw-events plan on the DAY-1 listing
    n_day1 = t(spark, lake, "events").count()

    # (2) the lake grows — and the caller does NOT invalidate
    day2.coalesce(1).write.mode("append").parquet(f"{lake}/events.parquet")

    # (3) first-ever refresh takes the 'built' path
    stats = refresh_bucketed_events_layout(spark, lake, BUCKETS)
    assert stats["mode"] == "built"

    # the layout must cover the WHOLE lake, not the cached day-1 listing
    layout = bucketed_events_if_available(spark, lake, BUCKETS)
    assert layout is not None
    assert layout.count() == n_day1 + day2.count()


def test_stale_discovery_memoizes_negative_verdict(spark, growing_lake):
    """Round-7 ADVICE (low): once discovery finds the layout stale, repeat
    calls under the unchanged (lake, layout) state must skip the count
    jobs — and a refresh must clear the memo so routing resumes."""
    from vectra_player_spark.operators import skew as _skew

    lake, day2 = growing_lake
    assert refresh_bucketed_events_layout(spark, lake, BUCKETS)["mode"] == "built"
    day2.coalesce(1).write.mode("append").parquet(f"{lake}/events.parquet")
    invalidate_lake(lake)

    assert bucketed_events_if_available(spark, lake, BUCKETS) is None
    stale_key = (id(spark), lake, BUCKETS, "events")
    assert stale_key in _skew._STALE_LAYOUTS  # verdict memoized

    # second call: served from the memo (no count jobs). Proven by
    # poisoning _raw_rowcount — a memo miss would have to call it.
    orig = _skew._raw_rowcount
    _skew._raw_rowcount = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("stale verdict should skip the count jobs")
    )
    try:
        assert bucketed_events_if_available(spark, lake, BUCKETS) is None
    finally:
        _skew._raw_rowcount = orig

    # refresh clears the memo and discovery routes again
    assert refresh_bucketed_events_layout(spark, lake, BUCKETS)["mode"] == "appended"
    assert stale_key not in _skew._STALE_LAYOUTS
    assert bucketed_events_if_available(spark, lake, BUCKETS) is not None


def test_none_signature_never_validates_memo(spark, growing_lake):
    """Round-7 ADVICE (low): a lake whose signature probe FAILS (None)
    must not satisfy the memo's staleness comparison (None == None used to
    pass) — discovery falls through to the count re-validation instead."""
    from unittest import mock

    from vectra_player_spark.operators import skew as _skew

    lake, _ = growing_lake
    assert refresh_bucketed_events_layout(spark, lake, BUCKETS)["mode"] == "built"
    # memoize with a BROKEN signature probe: the cached entry carries None
    key = (id(spark), lake, BUCKETS)
    df_cached, _sig = _skew._BUCKETED_EVENTS[key]
    _skew._BUCKETED_EVENTS[key] = (df_cached, None)

    with mock.patch.object(_skew, "_lake_signature", return_value=None):
        with mock.patch.object(
            _skew, "_raw_rowcount", wraps=_skew._raw_rowcount
        ) as counted:
            out = bucketed_events_if_available(spark, lake, BUCKETS)
            # memo hit was REFUSED: the count check re-validated the layout
            assert counted.called
    assert out is not None  # layout is in fact fine — just re-proven


def test_mutated_history_forces_rebuild(spark, growing_lake):
    """If rows BELOW the watermark changed (the lake was not append-only),
    the append arm cannot reconcile — refresh must detect the count
    mismatch and rebuild from raw, the source of truth."""
    lake, day2 = growing_lake
    assert refresh_bucketed_events_layout(spark, lake, BUCKETS)["mode"] == "built"

    # mutate history: rewrite the raw lake MINUS some old rows (count
    # shrinks, no new watermark rows)
    from vectra_player_spark.tables import _read

    ev = _read(spark, lake, "events").collect()
    keep = ev[: len(ev) - 5]
    import shutil as _sh

    _sh.rmtree(f"{lake}/events.parquet")
    spark.createDataFrame(keep).coalesce(2).write.parquet(f"{lake}/events.parquet")
    invalidate_lake(lake)

    assert bucketed_events_if_available(spark, lake, BUCKETS) is None  # stale
    stats = refresh_bucketed_events_layout(spark, lake, BUCKETS)
    assert stats["mode"] == "rebuilt"
    rows, ex, srt = _window_rows_and_shape(spark, lake)
    assert (ex, srt) == (0, 0)
    assert rows == _plain_rows(spark, lake)


def test_facts_ingest_refresh_and_compact(spark, sf_dir, tmp_path):
    """Facts analog of the events spine: new orders (higher orderkeys)
    append delta-sized into both bucketed fact tables; the q9-shape
    fact-fact join stays Exchange-free on the appended layout (sort
    claim returns until compaction) and value-identical to the plain
    join throughout."""
    from vectra_player_spark.operators.skew import (
        _BUCKETED_FACTS,
        _fact_table_name,
        bucketed_facts_if_available,
        compact_bucketed_facts_layout,
        refresh_bucketed_facts_layout,
    )
    from vectra_player_spark.tables import _read

    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cut = orders.agg(F.expr("percentile_approx(o_orderkey, 0.8)")).collect()[0][0]
    lake = str(tmp_path / "fact_lake")
    (tmp_path / "fact_lake").mkdir()
    orders.where(F.col("o_orderkey") <= cut).write.parquet(f"{lake}/orders.parquet")
    li.where(F.col("l_orderkey") <= cut).write.parquet(f"{lake}/lineitem.parquet")
    # events must exist for the lake signature probe of OTHER layouts;
    # symlink is enough (facts functions never read it)
    import os as _os

    _os.symlink(f"{sf_dir}/events.parquet", f"{lake}/events.parquet")
    root = f"/tmp/vectra_bucketed_factincr_{id(spark)}"
    spark.conf.set("spark.vectra.bucketed.location", root)
    shutil.rmtree(root, ignore_errors=True)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")

    def join_rows_and_shape():
        pair = bucketed_facts_if_available(spark, lake)
        li_a, ord_a = pair if pair is not None else (
            _read(spark, lake, "lineitem"), _read(spark, lake, "orders")
        )
        j = (
            li_a.join(ord_a, li_a.l_orderkey == ord_a.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum(F.col("l_quantity").cast("decimal(18,6)"))
                .cast("double")
                .alias("qty"),
            )
        )
        j.write.format("noop").mode("overwrite").save()
        plan = j._jdf.queryExecution().executedPlan().toString()
        final = plan.split("+- == Initial Plan ==")[0]
        ex = sum(
            1
            for line in final.splitlines()
            if "Exchange hashpartitioning" in line
            and ("l_orderkey" in line or "o_orderkey" in line)
        )
        srt = sum(
            1
            for line in final.splitlines()
            if "Sort [l_orderkey" in line or "Sort [o_orderkey" in line
        )
        return sorted(map(tuple, j.collect())), ex, srt

    def plain_rows():
        li_p, ord_p = _read(spark, lake, "lineitem"), _read(spark, lake, "orders")
        return sorted(
            map(
                tuple,
                li_p.join(ord_p, li_p.l_orderkey == ord_p.o_orderkey)
                .groupBy("o_orderstatus")
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n"),
                    F.sum(F.col("l_quantity").cast("decimal(18,6)"))
                    .cast("double")
                    .alias("qty"),
                )
                .collect(),
            )
        )

    try:
        assert refresh_bucketed_facts_layout(spark, lake)["mode"] == "built"
        rows1, ex1, srt1 = join_rows_and_shape()
        assert (ex1, srt1) == (0, 0)
        assert rows1 == plain_rows()

        # a day of new orders lands in BOTH raw fact tables
        orders.where(F.col("o_orderkey") > cut).write.mode("append").parquet(
            f"{lake}/orders.parquet"
        )
        li.where(F.col("l_orderkey") > cut).write.mode("append").parquet(
            f"{lake}/lineitem.parquet"
        )
        invalidate_lake(lake)
        assert bucketed_facts_if_available(spark, lake) is None  # stale
        stats = refresh_bucketed_facts_layout(spark, lake)
        assert stats["mode"] == "appended" and stats["delta_rows"] > 0

        rows2, ex2, srt2 = join_rows_and_shape()
        assert ex2 == 0 and srt2 >= 1  # appended: exchange-free, sorts back
        assert rows2 == plain_rows()

        assert refresh_bucketed_facts_layout(spark, lake)["mode"] == "noop"
        assert compact_bucketed_facts_layout(spark, lake)["mode"] == "compacted"
        rows3, ex3, srt3 = join_rows_and_shape()
        assert (ex3, srt3) == (0, 0)
        assert rows3 == plain_rows()
    finally:
        spark.conf.unset("spark.vectra.bucketed.location")
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
        _BUCKETED_FACTS.clear()
        for name in ("lineitem", "orders"):
            spark.sql(f"DROP TABLE IF EXISTS {_fact_table_name(name, lake, 32)}")
            spark.sql(
                f"DROP TABLE IF EXISTS {_fact_table_name(name, lake, 32)}_compact"
            )
        shutil.rmtree(root, ignore_errors=True)
        invalidate_lake(lake)

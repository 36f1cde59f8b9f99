"""Mergeable sketch tables (operators/sketch_tables.py): the accuracy and
mergeability contracts the registered error reports rely on."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectra_player_spark.operators.sketch_tables import (
    build_daily_sketch_table,
    heavy_hitters_report,
    range_distinct_from_sketches,
    sketch_rollup_error_report,
)


def _events(spark, n_users=500, n_days=10):
    # each user appears on EVERY day — the union must count them once,
    # not n_days times (the property a naive per-day-count sum gets wrong)
    rows = spark.range(n_users * n_days).select(
        (F.col("id") % n_users).alias("uid"),
        (F.col("id") / n_users).cast("long").alias("d"),
    )
    return rows.select(
        F.concat(F.lit("u"), F.col("uid")).alias("user_id"),
        F.lit("TYPE_A").alias("event_type"),
        F.expr("timestamp_micros(cast(1704067200000000 + d * 86400000000 as long))").alias("ts"),
    )


def test_union_of_daily_sketches_dedups_across_days(spark):
    ev = _events(spark)
    table = build_daily_sketch_table(ev)
    assert table.count() == 10  # one row per (group, day)
    est = range_distinct_from_sketches(table).collect()[0]
    assert est["n_days"] == 10
    # 500 distinct users total (each on all 10 days); a non-mergeable
    # rollup would report ~5000. HLL lgK=12 is exact at this cardinality.
    assert abs(est["est_distinct"] - 500) / 500 < 0.05


def test_range_query_over_day_subset(spark):
    ev = _events(spark)
    table = build_daily_sketch_table(ev).where(F.col("day") >= "2024-01-06")
    est = range_distinct_from_sketches(table).collect()[0]
    exact = (
        ev.where(F.to_date("ts") >= "2024-01-06")
        .agg(F.count_distinct("user_id"))
        .collect()[0][0]
    )
    assert est["n_days"] == 5
    assert abs(est["est_distinct"] - exact) / exact < 0.05


def test_rollup_error_report_contract(spark, sf_dir):
    row = sketch_rollup_error_report(
        __import__(
            "vectra_player_spark.tables", fromlist=["t"]
        ).t(spark, sf_dir, "events")
    ).collect()[0]
    assert row["n_groups"] >= 1
    assert row["max_rel_err"] <= 0.05  # lgK=12 nominal band
    assert row["frac_within_5pct"] == 1.0


def test_cms_never_underestimates_and_bounds_overshoot(spark, sf_dir):
    from vectra_player_spark.tables import t

    row = heavy_hitters_report(t(spark, sf_dir, "documents")).collect()[0]
    assert row["k"] == 20
    assert row["n_under"] == 0  # CMS one-sided guarantee
    assert row["max_overshoot_vs_bound"] <= 1.0  # within eps*N


def test_stream_maintenance_replay_safe(spark, tmp_path):
    """HLL union is register-wise MAX: re-folding the SAME batch into the
    store must not move any estimate (at-least-once replay safety by
    algebra, no batch bookkeeping), while genuinely new ids do."""
    from vectra_player_spark.operators.sketch_tables import (
        range_distinct_from_sketches,
    )
    from vectra_player_spark.streaming.sketch_maintenance import (
        merge_batch_into_store,
        read_sketch_store,
    )

    store = str(tmp_path / "sketch_store")

    def batch(lo, hi, day):
        return spark.range(lo, hi).select(
            F.concat(F.lit("u"), F.col("id")).alias("user_id"),
            F.lit("TYPE_A").alias("event_type"),
            F.expr(
                f"timestamp_micros(cast(1704067200000000 + {day} * 86400000000 as long))"
            ).alias("ts"),
        )

    def estimate():
        table = read_sketch_store(spark, store).select(
            F.col("group").alias("event_type"), "day", "id_sketch"
        )
        return range_distinct_from_sketches(table).collect()[0]["est_distinct"]

    merge_batch_into_store(batch(0, 300, day=0), store)
    e1 = estimate()
    assert abs(e1 - 300) / 300 < 0.05
    # REPLAY the identical batch: estimate must be bit-identical
    merge_batch_into_store(batch(0, 300, day=0), store)
    assert estimate() == e1
    # overlapping new batch on another day: 0-299 again plus 300-399
    merge_batch_into_store(batch(0, 400, day=1), store)
    e2 = estimate()
    assert abs(e2 - 400) / 400 < 0.05
    # store stays tiny: one row per (group, day)
    assert read_sketch_store(spark, store).count() == 2


def test_stream_maintenance_via_streaming_query(spark, tmp_path):
    """End-to-end through a real file stream + foreachBatch."""
    import json as _json

    from vectra_player_spark.operators.sketch_tables import (
        range_distinct_from_sketches,
    )
    from vectra_player_spark.streaming.sketch_maintenance import (
        maintain_daily_sketches,
        read_sketch_store,
    )

    src = tmp_path / "ev_src"
    src.mkdir()
    store = str(tmp_path / "store")

    def write(fname, lo, hi):
        with open(src / fname, "w") as f:
            for i in range(lo, hi):
                f.write(
                    _json.dumps(
                        {
                            "user_id": f"u{i}",
                            "event_type": "TYPE_A",
                            "ts_us": 1704067200000000 + i,
                        }
                    )
                    + "\n"
                )

    write("a.jsonl", 0, 200)
    stream = (
        spark.readStream.format("json")
        .schema("user_id string, event_type string, ts_us long")
        .load(str(src))
        .select("user_id", "event_type", F.expr("timestamp_micros(ts_us)").alias("ts"))
    )
    q = maintain_daily_sketches(stream, store, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        write("b.jsonl", 100, 300)  # overlap 100-199 + new 200-299
        q.processAllAvailable()
    finally:
        q.stop()
    table = read_sketch_store(spark, store).select(
        F.col("group").alias("event_type"), "day", "id_sketch"
    )
    est = range_distinct_from_sketches(table).collect()[0]["est_distinct"]
    assert abs(est - 300) / 300 < 0.05


def test_stream_maintenance_interrupted_swap_is_safe(spark, tmp_path):
    """A kill between 'new generation renamed in' and 'old generations
    deleted' leaves both on disk — readers take the max generation and the
    next merge reclaims the leftovers; history is never absent."""
    import os as _os

    from vectra_player_spark.operators.sketch_tables import (
        range_distinct_from_sketches,
    )
    from vectra_player_spark.streaming.sketch_maintenance import (
        _generations,
        merge_batch_into_store,
        read_sketch_store,
    )

    store = str(tmp_path / "gstore")

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.concat(F.lit("u"), F.col("id")).alias("user_id"),
            F.lit("TYPE_A").alias("event_type"),
            F.expr("timestamp_micros(1704067200000000)").alias("ts"),
        )

    merge_batch_into_store(batch(0, 100), store)
    merge_batch_into_store(batch(100, 200), store)
    assert _generations(store) == [2]
    # simulate the interrupted swap: re-create a stale gen_1 ALONGSIDE
    import shutil as _shutil

    _shutil.copytree(_os.path.join(store, "gen_2"), _os.path.join(store, "gen_1"))
    # reader takes the max generation
    table = read_sketch_store(spark, store).select(
        F.col("group").alias("event_type"), "day", "id_sketch"
    )
    est = range_distinct_from_sketches(table).collect()[0]["est_distinct"]
    assert abs(est - 200) / 200 < 0.05
    # next merge folds from the max gen and reclaims the leftover
    merge_batch_into_store(batch(200, 300), store)
    assert _generations(store) == [3]
    table = read_sketch_store(spark, store).select(
        F.col("group").alias("event_type"), "day", "id_sketch"
    )
    est = range_distinct_from_sketches(table).collect()[0]["est_distinct"]
    assert abs(est - 300) / 300 < 0.05

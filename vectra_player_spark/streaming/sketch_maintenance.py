"""Incremental maintenance of the daily HLL sketch table from a stream.

Batch half: operators/sketch_tables.py builds the (group, day) sketch
table from a static lake. This module keeps that table CURRENT as events
arrive — the ingest-side half of the pre-aggregation pattern: every
micro-batch folds its per-day sketches into the store, and any range
distinct stays answerable from the tiny store without touching raw data.

EXACTLY-ONCE WITHOUT BOOKKEEPING: HLL union is a register-wise MAX, so
re-unioning the SAME data is algebraically a no-op — an at-least-once
foreachBatch replay cannot inflate the estimate. That is strictly
stronger than the batch=N overwrite discipline the near-dup band store
needs (streaming/neardup.py): sketches are idempotent by ALGEBRA, counts
are not, which is why the maintained store carries sketches only
(pinned in tests/test_sketch_tables.py::test_stream_maintenance_replay_safe).

Store layout: GENERATION dirs (gen_1, gen_2, ...), each holding the full
(group, day, sketch) relation — |groups|x|days| SMALL rows (4 KB
registers each), so a full rewrite per batch is cheaper than partition
surgery at any realistic cardinality. A merge writes gen_{N+1} via
staged-write + ONE rename while gen_N still exists, then deletes older
generations: there is NO window where the store's history is absent (a
hard kill leaves either gen_N, both, or gen_{N+1} — readers take the
max; the crash-atomicity lesson from the band-store compactor applied
here from the start... after the first review caught the naive
move-out-then-in swap doing exactly the wrong thing).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from vectra_player_spark.operators.sketch_tables import build_daily_sketch_table

_STORE_SCHEMA = "group string, day date, id_sketch binary"


def _generations(store_dir: str) -> list[int]:
    if not os.path.isdir(store_dir):
        return []
    return sorted(
        int(d.split("_", 1)[1])
        for d in os.listdir(store_dir)
        if d.startswith("gen_") and d.split("_", 1)[1].isdigit()
    )


def _latest_gen_path(store_dir: str) -> str | None:
    gens = _generations(store_dir)
    return os.path.join(store_dir, f"gen_{gens[-1]}") if gens else None


def merge_batch_into_store(
    batch: DataFrame,
    store_dir: str,
    group_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "user_id",
) -> None:
    """Fold one micro-batch's per-day sketches into the store (idempotent)."""
    import shutil
    import uuid

    spark = batch.sparkSession
    fresh = build_daily_sketch_table(batch, group_col, ts_col, id_col).select(
        F.col(group_col).alias("group"), "day", "id_sketch"
    )
    gens = _generations(store_dir)
    if gens:
        existing = spark.read.parquet(os.path.join(store_dir, f"gen_{gens[-1]}"))
        merged = (
            existing.unionByName(fresh)
            .groupBy("group", "day")
            .agg(F.hll_union_agg("id_sketch").alias("id_sketch"))
        )
    else:
        merged = fresh
    staged = os.path.join(store_dir, "_staged", uuid.uuid4().hex)
    merged.coalesce(1).write.mode("overwrite").parquet(staged)
    # one rename IN while the previous generation still exists — no window
    # without history; then retire the older generations
    shutil.move(staged, os.path.join(store_dir, f"gen_{(gens[-1] if gens else 0) + 1}"))
    for g in gens:
        shutil.rmtree(os.path.join(store_dir, f"gen_{g}"), ignore_errors=True)
    shutil.rmtree(os.path.join(store_dir, "_staged"), ignore_errors=True)


def read_sketch_store(spark, store_dir: str) -> DataFrame | None:
    latest = _latest_gen_path(store_dir)
    if latest is None:
        return None
    return spark.read.parquet(latest)


def maintain_daily_sketches(
    events: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    group_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "user_id",
) -> StreamingQuery:
    """Start the maintenance stream over a streaming events DataFrame.
    Column names are configurable so the same maintenance job can ride
    any event-time lake (the ingest spine feeds it the phase-annotated
    tick lake: group=phase, id=game_id)."""
    return (
        events.writeStream.foreachBatch(
            lambda b, _i: merge_batch_into_store(
                b, store_dir, group_col, ts_col, id_col
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )

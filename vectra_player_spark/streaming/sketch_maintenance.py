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

Store layout: one parquet dir, the full (group, day, sketch) relation
rewritten per batch via staged-write + atomic rename. The relation is
|groups|x|days| SMALL rows (4 KB registers each), so the rewrite is
cheaper than partition surgery at any realistic cardinality; the rename
keeps readers consistent (same protocol as event_lake.compact_partition).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from vectra_player_spark.operators.sketch_tables import build_daily_sketch_table

_STORE_SCHEMA = "group string, day date, id_sketch binary"


def _store_current(store_dir: str) -> str:
    return os.path.join(store_dir, "current")


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
    current = _store_current(store_dir)
    if os.path.isdir(current):
        existing = spark.read.parquet(current)
        merged = (
            existing.unionByName(fresh)
            .groupBy("group", "day")
            .agg(F.hll_union_agg("id_sketch").alias("id_sketch"))
        )
    else:
        merged = fresh
    staged = os.path.join(store_dir, "_staged", uuid.uuid4().hex)
    merged.coalesce(1).write.mode("overwrite").parquet(staged)
    tmp_old = os.path.join(store_dir, "_old", uuid.uuid4().hex)
    os.makedirs(os.path.dirname(tmp_old), exist_ok=True)
    if os.path.isdir(current):
        shutil.move(current, tmp_old)
    shutil.move(staged, current)
    shutil.rmtree(os.path.join(store_dir, "_old"), ignore_errors=True)
    shutil.rmtree(os.path.join(store_dir, "_staged"), ignore_errors=True)


def read_sketch_store(spark, store_dir: str) -> DataFrame | None:
    current = _store_current(store_dir)
    if not os.path.isdir(current):
        return None
    return spark.read.parquet(current)


def maintain_daily_sketches(
    events: DataFrame, store_dir: str, checkpoint_dir: str
) -> StreamingQuery:
    """Start the maintenance stream over a streaming events DataFrame
    (needs event_type/ts/user_id columns)."""
    return (
        events.writeStream.foreachBatch(
            lambda b, _i: merge_batch_into_store(b, store_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )

"""Native session_window under Structured Streaming: the SAME groupBy spec
as the batch query native_session_windows, fed through a file stream in
two micro-batches (a session extended across batches must merge state),
checked against the batch computation over the union of all input."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)

BASE = "2025-01-01 00:{m:02d}:00"


def _rows_batch1():
    # user 1: two events 10 min apart (one session, extended in batch 2);
    # user 2: one lone event.
    return [
        {"user_id": 1, "ts": BASE.format(m=0), "value": 1.0},
        {"user_id": 1, "ts": BASE.format(m=10), "value": 2.0},
        {"user_id": 2, "ts": BASE.format(m=5), "value": 5.0},
    ]


def _rows_batch2():
    # user 1: 30 min after last (within 1 h gap → SAME session), then a
    # 2 h jump → new session.
    return [
        {"user_id": 1, "ts": BASE.format(m=40), "value": 3.0},
        {"user_id": 1, "ts": "2025-01-01 03:00:00", "value": 4.0},
    ]


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _sessions(df):
    return (
        df.groupBy("user_id", F.session_window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("session_window.start").cast("string").alias("start"),
            F.col("session_window.end").cast("string").alias("end"),
            "n_events",
            "sum_value",
        )
    )


def test_session_window_streaming_matches_batch(spark, tmp_path):
    src = tmp_path / "stream"
    src.mkdir()
    _write_jsonl(src / "b1.jsonl", _rows_batch1())

    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = (
        _sessions(stream)
        .writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("complete")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
        _write_jsonl(src / "b2.jsonl", _rows_batch2())
        time.sleep(1.5)
        q.processAllAvailable()
        got = {
            (r.user_id, r.start, r.end): (r.n_events, r.sum_value)
            for r in spark.table("sessions_stream").collect()
        }
    finally:
        q.stop()

    batch_df = spark.createDataFrame(
        [tuple(r.values()) for r in _rows_batch1() + _rows_batch2()],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    want = {
        (r.user_id, r.start, r.end): (r.n_events, r.sum_value)
        for r in _sessions(batch_df).collect()
    }
    assert got == want
    # the cross-batch merge actually happened: user 1's first session spans
    # 00:00 → 00:40 + 1 h gap
    assert (1, "2025-01-01 00:00:00", "2025-01-01 01:40:00") in got
    assert got[(1, "2025-01-01 00:00:00", "2025-01-01 01:40:00")] == (3, 6.0)

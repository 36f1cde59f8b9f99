"""Custom Python DataSource (socketio_frames): batch partitioning, filter
pushdown, and streaming-offset recovery semantics."""

from __future__ import annotations

import pytest
from pyspark.sql.datasource import EqualTo, GreaterThan, IsNotNull

from vectra_player_spark.sources.pyds import FrameBatchReader, SocketIOFrameDataSource

FRAMES_A = [
    '42["gameStateUpdate",{"gameId":"g1","tickCount":0,"price":1.0}]',
    "2",  # ping — no event
    '42["tradeEvent",{"id":"t1"}]',
    "garbage-frame",
]
FRAMES_B = [
    '42["gameStateUpdate",{"gameId":"g1","tickCount":1,"price":1.1}]',
    '42/chat,17["message",{"x":1}]',
]


@pytest.fixture()
def frame_dir(tmp_path):
    d = tmp_path / "frames"
    d.mkdir()
    (d / "a.log").write_text("\n".join(FRAMES_A) + "\n")
    (d / "b.log").write_text("\n".join(FRAMES_B) + "\n")
    return d


@pytest.fixture()
def registered(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SocketIOFrameDataSource)
    return spark


def test_batch_read_one_partition_per_file(registered, frame_dir):
    df = registered.read.format("socketio_frames").load(str(frame_dir))
    assert df.rdd.getNumPartitions() == 2
    rows = df.collect()
    assert len(rows) == 6
    by_key = {(r.file, r.line_no): r for r in rows}
    tick = by_key[("a.log", 1)]
    assert tick.event_name == "gameStateUpdate" and tick.parse_error is None
    assert by_key[("a.log", 2)].frame_type == "ping"
    assert by_key[("a.log", 4)].parse_error is not None
    ns = by_key[("b.log", 2)]
    assert ns.namespace == "/chat" and ns.ack_id == 17 and ns.event_name == "message"


def test_filter_pushdown_semantics_and_retention(registered, frame_dir):
    # end-to-end: pushed filter yields the same rows Spark would keep
    df = (
        registered.read.format("socketio_frames")
        .load(str(frame_dir))
        .where("event_name = 'gameStateUpdate'")
    )
    got = sorted((r.file, r.line_no) for r in df.collect())
    assert got == [("a.log", 1), ("b.log", 1)]
    # unit: supported filters are retained, unsupported ones handed back
    r = FrameBatchReader({"path": str(frame_dir)})
    unsupported = list(
        r.pushFilters(
            [
                EqualTo(("event_name",), "gameStateUpdate"),
                IsNotNull(("event_name",)),
                GreaterThan(("line_no",), 1),
            ]
        )
    )
    assert r.event_eq == "gameStateUpdate" and r.event_notnull
    assert unsupported == [GreaterThan(("line_no",), 1)]


def test_stream_read_with_mid_stream_file(registered, frame_dir, tmp_path):
    q = (
        registered.readStream.format("socketio_frames")
        .load(str(frame_dir))
        .writeStream.format("memory")
        .queryName("pyds_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        n1 = registered.table("pyds_stream").count()
        (frame_dir / "c.log").write_text('42["gameStateUpdate",{"tickCount":2}]\n')
        q.processAllAvailable()
        rows = registered.table("pyds_stream").collect()
    finally:
        q.stop()
    assert n1 == 6
    assert len(rows) == 7  # c.log consumed exactly once
    assert {(r.file, r.line_no) for r in rows} >= {("c.log", 1)}


def test_jsonl_atomic_writer_two_phase_commit(registered, tmp_path):
    from vectra_player_spark.sources.pyds import JsonlAtomicDataSource

    registered.dataSource.register(JsonlAtomicDataSource)
    out = tmp_path / "out"
    df = registered.createDataFrame(
        [(i, f"u{i % 3}") for i in range(20)], "id long, user string"
    ).repartition(4)
    df.write.format("jsonl_atomic").option("path", str(out)).mode("append").save()

    files = sorted(p.name for p in out.iterdir())
    assert "_SUCCESS" in files and "_staging" not in files
    parts = [p for p in files if p.startswith("part-")]
    assert len(parts) == 4
    import json as _json

    rows = []
    for p in parts:
        with open(out / p) as fh:
            rows += [_json.loads(line) for line in fh]
    assert sorted(r["id"] for r in rows) == list(range(20))
    manifest = (out / "_SUCCESS").read_text().strip().splitlines()
    assert sum(int(line.split("\t")[1]) for line in manifest) == 20


def test_jsonl_atomic_writer_abort_leaves_nothing_published(registered, tmp_path):
    """A task failure mid-job must not publish ANY partial output: staged
    files stay in _staging and abort() removes them; no part files, no
    _SUCCESS manifest."""
    import pytest as _pytest

    from vectra_player_spark.sources.pyds import JsonlAtomicDataSource

    registered.dataSource.register(JsonlAtomicDataSource)
    out = tmp_path / "out_abort"

    def boom(i):
        if i >= 10:
            raise RuntimeError("simulated task failure")
        return i

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    bad = registered.createDataFrame(
        [(i,) for i in range(20)], "id long"
    ).repartition(4).select(F.udf(boom, LongType())("id").alias("id"))
    with _pytest.raises(Exception, match="simulated task failure"):
        bad.write.format("jsonl_atomic").option("path", str(out)).mode("append").save()
    published = [p.name for p in out.iterdir()] if out.exists() else []
    assert not any(p.startswith("part-") for p in published)
    assert "_SUCCESS" not in published

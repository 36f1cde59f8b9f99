"""T10 — file-based control plane over a checkpointed streaming query:
commands toggle recording (stop / restart-on-checkpoint), stale and
malformed commands are ignored, status publishes atomically, and no row
is lost or duplicated across a pause/resume cycle (the checkpoint IS the
pause state). Reference: src/services/event_store/service.py:156-236."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from vectra_player_spark.streaming.control import (
    FileControlPlane,
    write_control_command,
)


def _land(spark, src: str, lo: int, hi: int) -> None:
    spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("value")
    ).coalesce(1).write.mode("append").parquet(src)


def test_control_plane_pause_resume_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    control = tmp_path / "control.json"
    status = tmp_path / "status.json"
    _land(spark, src, 0, 100)

    def factory():
        stream = spark.readStream.schema("id long, value long").parquet(src)
        return (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    now = [1000.0]
    plane = FileControlPlane(
        factory, control, status, poll_interval=3600, clock=lambda: now[0]
    )
    assert not plane.is_recording

    # dashboard: start recording
    write_control_command(control, True, clock=lambda: now[0])
    plane.poll_once()
    assert plane.is_recording
    plane._query.processAllAvailable()

    # dashboard: pause — checkpointed stop; counters survive in status
    now[0] += 5
    write_control_command(control, False, clock=lambda: now[0])
    plane.poll_once()
    assert not plane.is_recording
    st = json.loads(status.read_text())
    assert st["is_recording"] is False and st["rows_total"] == 100

    # rows landing while paused are NOT lost: the checkpoint resumes them
    _land(spark, src, 100, 150)

    # stale command (older than 10 s) must be ignored
    write_control_command(control, True, clock=lambda: now[0])
    now[0] += 60
    plane.poll_once()
    assert not plane.is_recording

    # malformed control file must be ignored
    control.write_text("{not json")
    plane.poll_once()
    assert not plane.is_recording

    # fresh resume command → restart on the same checkpoint
    write_control_command(control, True, clock=lambda: now[0])
    plane.poll_once()
    assert plane.is_recording
    plane._query.processAllAvailable()
    plane.poll_once()  # harvest + publish

    got = spark.read.parquet(out)
    assert got.count() == 150  # no loss, no duplication across the cycle
    assert got.select("id").distinct().count() == 150
    st = json.loads(status.read_text())
    assert st["is_recording"] is True
    assert st["rows_total"] == 150
    assert st["query_id"] is not None

    plane.stop()
    assert not plane.is_recording

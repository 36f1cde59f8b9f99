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


def test_control_plane_drives_signature_store_spine(spark, sf_dir, tmp_path):
    """T10 integrated with the ingest spine: the documents lake is fed by
    a stream RUN UNDER THE CONTROL PLANE — paused by a dashboard command
    mid-corpus, resumed by another — and the signature store's watermark
    refresh then serves a routed dedup query that matches the direct
    computation exactly. Pausing costs nothing but latency: rows landing
    in the source while paused are picked up on resume from the same
    checkpoint (exactly-once)."""
    import shutil

    from vectra_player_spark.operators import sigstore
    from vectra_player_spark.tables import invalidate_lake, t

    docs = t(spark, sf_dir, "documents")
    cut = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    src = str(tmp_path / "src")
    lake = str(tmp_path / "lake")
    (tmp_path / "lake").mkdir()
    t(spark, sf_dir, "embeddings").write.parquet(f"{lake}/embeddings.parquet")
    docs.where(F.col("doc_id") <= cut).coalesce(1).write.parquet(src)

    def factory():
        stream = spark.readStream.schema(docs.schema).parquet(src)
        return (
            stream.writeStream.format("parquet")
            .option("path", f"{lake}/documents.parquet")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .start()
        )

    now = [5000.0]
    plane = FileControlPlane(
        factory,
        tmp_path / "control.json",
        tmp_path / "status.json",
        poll_interval=3600,
        clock=lambda: now[0],
    )
    root = f"/tmp/vectra_ctl_spine_{id(spark)}"
    spark.conf.set("spark.vectra.bucketed.location", root)
    shutil.rmtree(root, ignore_errors=True)
    try:
        write_control_command(tmp_path / "control.json", True, clock=lambda: now[0])
        plane.poll_once()
        plane._query.processAllAvailable()

        # dashboard pause; wave 2 lands while paused
        write_control_command(tmp_path / "control.json", False, clock=lambda: now[0])
        plane.poll_once()
        assert not plane.is_recording
        docs.where(F.col("doc_id") > cut).coalesce(1).write.mode("append").parquet(src)

        # resume → the checkpoint picks the new files up
        write_control_command(tmp_path / "control.json", True, clock=lambda: now[0])
        plane.poll_once()
        plane._query.processAllAvailable()
        invalidate_lake(lake)
        assert spark.read.parquet(f"{lake}/documents.parquet").count() == docs.count()

        # the store absorbs the streamed lake; routed == direct
        stats = sigstore.refresh_signature_store(spark, lake)
        assert stats["doc"]["mode"] == "built"
        from vectra_player_spark.plans import QUERIES

        def run(name):
            return sorted(map(tuple, QUERIES[name].spark_fn(spark, lake).collect()))

        routed = run("doc_exact_dedup")
        saved = spark.conf.get("spark.vectra.bucketed.location")
        spark.conf.set("spark.vectra.bucketed.location", "/nonexistent_ctl_spine")
        try:
            direct = run("doc_exact_dedup")
        finally:
            spark.conf.set("spark.vectra.bucketed.location", saved)
        assert routed == direct and len(routed) > 0
    finally:
        plane.stop()
        spark.conf.unset("spark.vectra.bucketed.location")
        sigstore._SIG_STORES.clear()
        sigstore._STALE_STORES.clear()
        shutil.rmtree(root, ignore_errors=True)
        invalidate_lake(lake)

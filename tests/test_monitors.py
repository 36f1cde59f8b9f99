"""T8 monitor tests: listener wiring on a live stream + integrity report."""

from __future__ import annotations

import json

from vectra_player_spark.streaming.monitors import FeedHealthListener, integrity_report


def test_listener_observes_progress(spark, tmp_path):
    d = tmp_path / "s"
    d.mkdir()
    rows = [
        {"session_id": "f", "seq": i, "ts_ms": 1_700_000_000_000 + i * 250,
         "game_id": "g1", "active": True, "rugged": False,
         "allow_pre_round_buys": False, "cooldown_timer": 0,
         "price": 1.0, "tick": i, "server_seed": None,
         "backfill_ticks": None, "backfill_prices": None}
        for i in range(20)
    ]
    with open(d / "a.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    listener = FeedHealthListener(min_rows_per_second=0.0)
    spark.streams.addListener(listener)
    try:
        from vectra_player_spark.streaming.jobs import read_tick_stream

        q = (
            read_tick_stream(spark, str(d))
            .writeStream.format("memory")
            .queryName("mon_out")
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(10)
        # listener events arrive on a separate callback thread — poll
        import time

        deadline = time.time() + 20
        while listener.health.n_batches < 1 and time.time() < deadline:
            time.sleep(0.25)
        assert listener.health.n_batches >= 1
        assert not listener.health.degraded
    finally:
        spark.streams.removeListener(listener)


def test_integrity_report(spark):
    rows = [
        ("f", "g1", 1, 0), ("f", "g1", 2, 1), ("f", "g1", 3, 1),   # dup tick
        ("f", "g1", 4, 3),                                          # gap (1->3)
        ("f", "g2", 5, 0), ("f", "g2", 6, 2), ("f", "g2", 7, 1),    # out of order
    ]
    ticks = spark.createDataFrame(
        rows, "session_id string, game_id string, seq long, tick long"
    )
    rep = {r.game_id: r for r in integrity_report(ticks).collect()}
    assert rep["g1"].n_dup_ticks == 1
    assert rep["g1"].n_tick_gaps == 1
    assert rep["g2"].n_out_of_order == 1

"""Timer-driven gap watchdog test: a silent feed produces an alert row
once the processing-time deadline lapses.

Note: with ProcessingTimeTimeout the engine keeps scheduling batches to
evaluate pending timers, so `processAllAvailable` never settles — the
test polls the memory sink with a deadline instead."""

from __future__ import annotations

import json
import time

from vectra_player_spark.streaming.gap_watchdog import gap_alerts
from vectra_player_spark.streaming.jobs import read_tick_stream


def _tick(seq, sid="feed-1"):
    return {
        "session_id": sid, "seq": seq, "ts_ms": 1_700_000_000_000 + seq * 250,
        "game_id": "g1", "active": True, "rugged": False,
        "allow_pre_round_buys": False, "cooldown_timer": 0, "price": 1.0,
        "tick": seq, "server_seed": None,
        "backfill_ticks": None, "backfill_prices": None,
    }


def test_watchdog_alerts_on_silence(spark, tmp_path):
    src = tmp_path / "feed"
    src.mkdir()
    with open(src / "a.jsonl", "w") as f:
        f.write(json.dumps(_tick(1)) + "\n")
        f.write(json.dumps(_tick(2)) + "\n")

    alerts = gap_alerts(read_tick_stream(spark, str(src)), max_silence_ms=1_500)
    q = (
        alerts.writeStream.format("memory")
        .queryName("gap_alerts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        hit = None
        while time.time() < deadline:
            rows = spark.table("gap_alerts").collect()
            match = [
                r
                for r in rows
                if r.session_id == "feed-1" and r.alert == "feed_silent"
            ]
            if match:
                hit = match[0]
                break
            time.sleep(0.5)
        assert hit is not None, "no feed_silent alert within deadline"
        assert hit.last_seq == 2
        assert hit.n_events_seen == 2
    finally:
        q.stop()

"""Stream-stream interval join (T7 live form): trades and ticks as two
independent file streams, joined with watermarked event-time bounds;
result checked against the equivalent batch interval join over the full
inputs. Trades arriving in a LATER micro-batch than their matching tick
must still join (tick rows are buffered in state until the watermark
passes), which is the property a per-micro-batch join cannot provide."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from vectra_player_spark.streaming.jobs import annotate_trades_stream

TICK_SCHEMA = "game_id string, event_time timestamp, price double, tick long"
ACTION_SCHEMA = "game_id string, event_time timestamp, action_type string, amount double"

TS = "2025-01-01 00:00:{s:02d}"

TICKS = [
    {"game_id": "g1", "event_time": TS.format(s=1), "price": 1.10, "tick": 1},
    {"game_id": "g1", "event_time": TS.format(s=3), "price": 1.25, "tick": 2},
    {"game_id": "g1", "event_time": TS.format(s=20), "price": 2.00, "tick": 3},
    {"game_id": "g2", "event_time": TS.format(s=3), "price": 0.90, "tick": 1},
]

ACTIONS = [
    # joins ticks at s=1 and s=3 (both within 5 s before s=4)
    {"game_id": "g1", "event_time": TS.format(s=4), "action_type": "buy", "amount": 10.0},
    # tick at s=20 arrives in a LATER batch than this trade's batch
    {"game_id": "g1", "event_time": TS.format(s=22), "action_type": "sell", "amount": 5.0},
    # wrong game for the s=3 g1 tick; matches only the g2 tick
    {"game_id": "g2", "event_time": TS.format(s=5), "action_type": "buy", "amount": 1.0},
    # nothing within 5 s before it -> no output row
    {"game_id": "g1", "event_time": TS.format(s=12), "action_type": "buy", "amount": 2.0},
]


def _write_jsonl(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    ticks_dir, actions_dir = tmp_path / "ticks", tmp_path / "actions"
    # Batch 1: early ticks + ALL actions (incl. the s=22 trade whose tick
    # hasn't arrived yet). Batch 2: the late tick.
    _write_jsonl(ticks_dir / "b1.jsonl", TICKS[:2] + TICKS[3:])
    _write_jsonl(actions_dir / "b1.jsonl", ACTIONS)

    ticks = spark.readStream.schema(TICK_SCHEMA).json(str(ticks_dir))
    actions = spark.readStream.schema(ACTION_SCHEMA).json(str(actions_dir))
    joined = annotate_trades_stream(actions, ticks, tolerance_seconds=5)
    q = (
        joined.writeStream.format("memory")
        .queryName("trade_ticks")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        _write_jsonl(ticks_dir / "b2.jsonl", TICKS[2:3])
        q.processAllAvailable()
        got = {
            (r.game_id, r.action_type, r.tick)
            for r in spark.table("trade_ticks").collect()
        }
    finally:
        q.stop()

    # Oracle: the same interval join as a batch query over the full inputs
    # (timestamps arrive as strings, cast like the JSON source does).
    bt = spark.createDataFrame(
        [tuple(t.values()) for t in TICKS],
        TICK_SCHEMA.replace("timestamp", "string"),
    ).select(
        F.col("game_id").alias("t_game_id"),
        F.to_timestamp("event_time").alias("tick_time"),
        "price",
        "tick",
    )
    ba = spark.createDataFrame(
        [tuple(a.values()) for a in ACTIONS],
        ACTION_SCHEMA.replace("timestamp", "string"),
    ).withColumn("event_time", F.to_timestamp("event_time"))
    cond = (
        (ba.game_id == bt.t_game_id)
        & (bt.tick_time <= ba.event_time)
        & (bt.tick_time >= ba.event_time - F.expr("INTERVAL 5 SECONDS"))
    )
    want = {
        (r.game_id, r.action_type, r.tick)
        for r in ba.join(bt, cond, "inner").collect()
    }
    assert got == want
    # The late-tick pairing specifically must be present (cross-batch join).
    assert ("g1", "sell", 3) in got
    # And the no-tick-in-range trade must produce nothing.
    assert not any(g == "g1" and a == "buy" and t == 3 for g, a, t in got)

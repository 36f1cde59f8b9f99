"""The full ingest spine, end-to-end, across a mid-stream crash (round-6):

    raw tick frames → phase state machine → event lake (parquet sink)
                    → game sessionization → session lake
    event lake (as a stream) → daily HLL sketch maintenance → sketch store
    sketch store answer == batch recompute over the final lake

This is the deployment story README describes: one pipeline from the
websocket-shaped frame source to the pre-aggregated serving structure a
100 TB lake answers distinct-queries from. The crash is injected at the
sketch stage's write/commit window (the checkpoint's commit marker is
deleted), so Spark REPLAYS that micro-batch through foreachBatch —
at-least-once delivery that the HLL store must absorb exactly-once BY
ALGEBRA (union = register max), extending the round-3 chained-recovery
test (tests/test_streaming.py::test_phase_chain_neardup_gate_survives_
restart) one stage further.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

BASE_MS = 1_700_000_000_000
DAY_MS = 86_400_000


def _tick(seq, game_id, ts_off, **kw):
    return {
        "session_id": kw.get("session", "feed-1"),
        "seq": seq,
        "ts_ms": BASE_MS + ts_off,
        "game_id": game_id,
        "active": kw.get("active", False),
        "rugged": kw.get("rugged", False),
        "allow_pre_round_buys": kw.get("presale", False),
        "cooldown_timer": kw.get("cooldown", 0),
        "price": kw.get("price"),
        "tick": kw.get("tick"),
        "server_seed": kw.get("seed"),
        "backfill_ticks": None,
        "backfill_prices": None,
    }


# batch A: day-0 game g1 (presale → active → rug), day-1 g2 starts
BATCH_A = [
    _tick(1, "g1", 0, presale=True),
    _tick(2, "g1", 250, active=True, price=1.0, tick=0),
    _tick(3, "g1", 500, active=True, price=1.2, tick=1),
    _tick(4, "g1", 750, rugged=True, price=0.02, tick=2, seed="seed-a"),
    _tick(5, "g2", DAY_MS, active=True, price=1.0, tick=0),
]
# batch B: g2 rugs on day 1, g3 runs on day 1 — REPLAYED after the crash
BATCH_B = [
    _tick(6, "g2", DAY_MS + 250, active=True, price=1.5, tick=1),
    _tick(7, "g2", DAY_MS + 500, rugged=True, price=0.01, tick=2, seed="seed-b"),
    _tick(8, "g3", DAY_MS + 750, active=True, price=1.0, tick=0),
    _tick(9, "g3", DAY_MS + 1000, rugged=True, price=0.05, tick=1, seed="seed-c"),
]


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_ingest_spine_survives_mid_stream_crash(spark, tmp_path):
    from vectra_player_spark.operators.sketch_tables import (
        build_daily_sketch_table,
        range_distinct_from_sketches,
    )
    from vectra_player_spark.streaming.jobs import read_tick_stream
    from vectra_player_spark.streaming.sketch_maintenance import (
        maintain_daily_sketches,
        read_sketch_store,
    )
    from vectra_player_spark.streaming.stateful import (
        phase_machine,
        sessionize_games,
    )

    src = tmp_path / "src"
    src.mkdir()
    lake = str(tmp_path / "event_lake")
    sessions_lake = str(tmp_path / "session_lake")
    store = str(tmp_path / "sketch_store")
    ck = {n: str(tmp_path / f"ckpt_{n}") for n in ("phase", "session", "sketch")}

    def run_stage1_and_2():
        q1 = (
            phase_machine(read_tick_stream(spark, str(src)))
            .writeStream.format("parquet")
            .option("path", lake)
            .option("checkpointLocation", ck["phase"])
            .outputMode("append")
            .start()
        )
        q2 = (
            sessionize_games(read_tick_stream(spark, str(src)))
            .writeStream.format("parquet")
            .option("path", sessions_lake)
            .option("checkpointLocation", ck["session"])
            .outputMode("append")
            .start()
        )
        q1.processAllAvailable()
        q2.processAllAvailable()
        q1.stop()
        q2.stop()

    def run_stage3():
        events = (
            spark.readStream.schema(spark.read.parquet(lake).schema)
            .parquet(lake)
            .withColumn("ts", F.timestamp_millis("ts_ms"))
        )
        q = maintain_daily_sketches(
            events, store, ck["sketch"],
            group_col="phase", ts_col="ts", id_col="game_id",
        )
        q.processAllAvailable()
        q.stop()

    # ---- batch A flows the whole spine ----
    _write_jsonl(src / "a.jsonl", BATCH_A)
    run_stage1_and_2()
    run_stage3()
    assert read_sketch_store(spark, store) is not None

    # ---- crash window: stage 3's last commit marker vanishes ----
    commits = os.path.join(ck["sketch"], "commits")
    latest = sorted(f for f in os.listdir(commits) if not f.startswith("."))[-1]
    os.remove(os.path.join(commits, latest))
    crc = os.path.join(commits, f".{latest}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    # ---- batch B arrives; every stage restarts from its checkpoint ----
    _write_jsonl(src / "b.jsonl", BATCH_B)
    run_stage1_and_2()
    run_stage3()  # replays batch A's micro-batch, then processes B

    # 1) the serving answer: per-(phase, day) distinct games from the
    # MAINTAINED store == one-shot batch recompute over the final lake.
    # Same rows → same HLL register state → bit-equal estimates, despite
    # the replay (union is register-max, idempotent by algebra).
    lake_df = spark.read.parquet(lake).withColumn(
        "ts", F.timestamp_millis("ts_ms")
    )
    batch_est = {
        (r["phase"], r["n_days"]): r["est_distinct"]
        for r in range_distinct_from_sketches(
            build_daily_sketch_table(lake_df, "phase", "ts", "game_id"),
            "phase",
        ).collect()
    }
    store_est = {
        (r["group"], r["n_days"]): r["est_distinct"]
        for r in range_distinct_from_sketches(
            read_sketch_store(spark, store), "group"
        ).collect()
    }
    assert store_est == batch_est and len(store_est) >= 3

    # sanity on the actual values: ACTIVE saw g1(day0) + g2,g3(day1);
    # RUGGED saw g1(day0) + g2,g3(day1) — tiny cardinalities, where HLL
    # estimates are exact
    assert store_est[("ACTIVE", 2)] == 3.0
    assert store_est[("RUGGED", 2)] == 3.0

    # 2) the lake itself stayed exactly-once across restarts
    assert sorted(r.seq for r in lake_df.collect()) == list(range(1, 10))

    # 3) sessionization finalized g1 and g2 (g3's boundary never arrives)
    sessions = spark.read.parquet(sessions_lake)
    done = {r.game_id: r for r in sessions.collect()}
    assert set(done) == {"g1", "g2"}
    assert done["g1"].server_seed == "seed-a"
    assert done["g2"].n_ticks == 3

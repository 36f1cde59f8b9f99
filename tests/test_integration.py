"""End-to-end pipeline integration: the reference's full workflow (SURVEY
§3.2 + §3.3) on this engine — stream ticks to a partitioned lake, extract
complete games, dedup, fit the survival model, replay the decision
pipeline — one continuous flow through real files."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from vectra_player_spark.eventstore import EventStore, explode_sidebets, load_games
from vectra_player_spark.sources.event_lake import normalize_envelope, read_event_lake
from vectra_player_spark.streaming.jobs import read_tick_stream, stream_to_lake
from vectra_player_spark.streaming.stateful import sessionize_games


def _game_doc(gid: str, n_ticks: int, peak: float) -> dict:
    prices = [1.0 + 0.1 * i for i in range(n_ticks - 1)] + [0.02]
    return {
        "id": gid,
        "timestamp": 1767916800000,
        "gameVersion": "v3",
        "rugged": True,
        "peakMultiplier": peak,
        "prices": prices,
        "provablyFair": {"serverSeedHash": f"hash-{gid}", "version": "v1"},
        "globalSidebets": [
            {
                "playerId": f"did:p:{gid}",
                "username": f"u-{gid}",
                "betAmount": 0.01,
                "xPayout": 5,
                "startedAtTick": max(0, n_ticks - 5),
                "end": n_ticks + 35,
                "type": "placed",
            }
        ],
    }


@pytest.fixture(scope="module")
def pipeline_lake(spark, tmp_path_factory):
    """Capture-shaped envelope rows (game ticks + duplicated complete_game
    docs, the 12.5x dual-emission pattern) written through the lake
    writer."""
    rows = []
    seq = 0
    game_lengths = {f"g{i:02d}": 10 + (i * 7) % 25 for i in range(12)}
    for gid, n in game_lengths.items():
        for tick in range(n):
            seq += 1
            rows.append(
                {
                    "ts": f"2026-01-10T00:00:{seq % 60:02d}+00:00",
                    "source": "cdp",
                    "doc_type": "game_tick",
                    "session_id": "s1",
                    "seq": seq,
                    "direction": "received",
                    "raw_json": "{}",
                    "game_id": gid,
                    "price": str(round(1.0 + 0.1 * tick, 4)),
                    "tick": tick,
                }
            )
        # duplicated complete_game emissions (rolling history re-broadcast)
        for dup in range(3):
            seq += 1
            rows.append(
                {
                    "ts": f"2026-01-10T01:00:{seq % 60:02d}+00:00",
                    "source": "cdp",
                    "doc_type": "complete_game",
                    "session_id": "s1",
                    "seq": seq,
                    "direction": "received",
                    "raw_json": json.dumps(_game_doc(gid, n, 1.0 + 0.1 * n)),
                    "game_id": gid,
                }
            )
    path = str(tmp_path_factory.mktemp("pipeline") / "lake")
    from vectra_player_spark.sources.event_lake import write_event_lake

    write_event_lake(normalize_envelope(spark.createDataFrame(rows)), path)
    return path


def test_full_analytics_pipeline(spark, pipeline_lake):
    """§3.3: lake → games (dedup) → durations → survival fit → replay."""
    from vectra_player_spark.operators.decision_pipeline import (
        fit_survival_curve,
        replay_decision_pipeline,
        summarize_replay,
    )

    env = read_event_lake(spark, pipeline_lake)
    games = load_games(env)
    assert games.count() == 12  # 36 emissions dedup to 12 games

    bets = explode_sidebets(games)
    assert bets.count() == 12
    assert bets.where(F.col("bet_won")).count() > 0  # late bets land in window

    durations = games.select(F.col("duration_ticks").alias("duration"))
    curve = fit_survival_curve(durations)
    assert curve[min(curve)] >= curve[max(curve)]  # survival is monotone

    ticks = env.where(F.col("doc_type") == "game_tick").select(
        "game_id", "seq", F.col("price").cast("double").alias("value")
    )
    mean_dur = durations.agg(F.avg("duration")).collect()[0][0]
    trace = replay_decision_pipeline(ticks, curve, mean_dur)
    summary = summarize_replay(trace)
    assert summary.count() == 12
    assert trace.count() == ticks.count()  # one trace row per tick


def test_streaming_capture_to_lake(spark, tmp_path):
    """§3.2: tick stream → sessionized games AND envelope rows → lake sink
    with partition layout + checkpoint."""
    import os

    src = tmp_path / "feed"
    src.mkdir()
    rows = []
    for g, gid in enumerate(["gA", "gB"]):
        for i in range(6):
            rows.append(
                {
                    "session_id": "f1",
                    "seq": g * 10 + i,
                    "ts_ms": 1_700_000_000_000 + (g * 10 + i) * 250,
                    "game_id": gid,
                    "active": True,
                    "rugged": i == 5,
                    "allow_pre_round_buys": False,
                    "cooldown_timer": 0,
                    "price": 1.0 + 0.1 * i,
                    "tick": i,
                    "server_seed": "s" if i == 5 else None,
                    "backfill_ticks": None,
                    "backfill_prices": None,
                }
            )
    with open(src / "a.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    stream = read_tick_stream(spark, str(src))
    env = stream.select(
        F.date_format(F.timestamp_millis("ts_ms"), "yyyy-MM-dd'T'HH:mm:ssXXX").alias("ts"),
        F.lit("public_ws").alias("source"),
        F.lit("game_tick").alias("doc_type"),
        F.col("session_id"),
        F.col("seq"),
        F.lit("received").alias("direction"),
        F.to_json(F.struct("game_id", "price", "tick")).alias("raw_json"),
        F.col("game_id"),
        F.col("price").cast("string").alias("price"),
        F.col("tick"),
        F.date_format(F.timestamp_millis("ts_ms"), "yyyy-MM-dd").alias("date"),
    )
    out = str(tmp_path / "lake")
    q = stream_to_lake(env, out, str(tmp_path / "ckpt"), trigger_seconds=1)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert os.path.isdir(f"{out}/doc_type=game_tick/date=2023-11-14")
    lake = read_event_lake(spark, out, doc_type="game_tick")
    assert lake.count() == 12

    # session boundary finalizes gA when gB starts
    q2 = (
        sessionize_games(read_tick_stream(spark, str(src)))
        .writeStream.format("memory")
        .queryName("integ_sessions")
        .outputMode("append")
        .start()
    )
    try:
        q2.processAllAvailable()
        done = spark.table("integ_sessions").collect()
        assert [r.game_id for r in done] == ["gA"]
        assert done[0].server_seed == "s"
    finally:
        q2.stop()


def test_streaming_checkpoint_recovery(spark, tmp_path):
    """Sink restart with the same checkpoint must not duplicate rows
    (exactly-once file sink semantics) and must pick up new input."""
    src = tmp_path / "feed"
    src.mkdir()

    def tick(seq):
        return {
            "session_id": "f1", "seq": seq,
            "ts_ms": 1_700_000_000_000 + seq * 250, "game_id": "g1",
            "active": True, "rugged": False, "allow_pre_round_buys": False,
            "cooldown_timer": 0, "price": 1.0, "tick": seq,
            "server_seed": None, "backfill_ticks": None, "backfill_prices": None,
        }

    with open(src / "a.jsonl", "w") as f:
        for s in range(5):
            f.write(json.dumps(tick(s)) + "\n")

    out, ckpt = str(tmp_path / "lake"), str(tmp_path / "ckpt")

    def env_stream():
        return read_tick_stream(spark, str(src)).select(
            F.lit("game_tick").alias("doc_type"),
            F.lit("2026-01-10").alias("date"),
            "seq",
            "game_id",
        )

    q = stream_to_lake(env_stream(), out, ckpt, trigger_seconds=1)
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(out).count() == 5

    with open(src / "b.jsonl", "w") as f:
        for s in range(5, 8):
            f.write(json.dumps(tick(s)) + "\n")

    q2 = stream_to_lake(env_stream(), out, ckpt, trigger_seconds=1)
    q2.processAllAvailable()
    q2.stop()
    rows = spark.read.parquet(out)
    assert rows.count() == 8  # old batch not re-emitted, new batch present
    assert rows.select("seq").distinct().count() == 8


def test_eventstore_listings(spark, pipeline_lake):
    es = EventStore(read_event_lake(spark, pipeline_lake))
    counts = {r.doc_type: r.n for r in es.doc_type_counts().collect()}
    assert counts["complete_game"] == 36
    assert counts["game_tick"] > 100
    games = es.list_games(limit=5).collect()
    assert len(games) == 5
    assert all(g.n_events > 0 for g in games)


def test_cli_list_names_every_registered_query(capsys):
    from vectra_player_spark import plans
    from vectra_player_spark.__main__ import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    for name in plans.queries():
        assert name in out


def test_cli_run_rejects_unknown_query(spark, capsys):
    from vectra_player_spark.__main__ import main

    assert main(["run", "no_such_query"]) == 2

"""Event-lake + EventStore tests, patterned on the reference's own fixtures
(test_duckdb.py:25-150 via FIXTURES.md §1): 3 games with {10,5,3} ticks of
linearly increasing prices, 2 players, plus duplicated complete_game docs
for dedup checks."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from vectra_player_spark.eventstore import EventStore, explode_sidebets, load_games
from vectra_player_spark.sources.event_lake import (
    normalize_envelope,
    read_event_lake,
    write_event_lake,
)

GAMES = {"g1": (10, 1.0, 0.1), "g2": (5, 2.0, 0.2), "g3": (3, 3.0, 0.3)}
PLAYERS = {"g1": "player-alice", "g2": "player-bob", "g3": "player-alice"}


def _fixture_rows():
    rows = []
    seq = 0
    for gid, (n, base, step) in GAMES.items():
        for t in range(n):
            seq += 1
            rows.append(
                {
                    "ts": f"2026-01-10T00:{seq:02d}:00+00:00",
                    "source": "cdp",
                    "doc_type": "game_tick",
                    "session_id": "sess-1",
                    "seq": seq,
                    "direction": "received",
                    "raw_json": "{}",
                    "game_id": gid,
                    "player_id": None,
                    "price": str(round(base + step * t, 4)),
                    "tick": t,
                }
            )
    for gid, pid in PLAYERS.items():
        seq += 1
        rows.append(
            {
                "ts": f"2026-01-10T01:{seq:02d}:00+00:00",
                "source": "cdp",
                "doc_type": "player_action",
                "session_id": "sess-1",
                "seq": seq,
                "direction": "received",
                "raw_json": "{}",
                "game_id": gid,
                "player_id": pid,
                "action_type": "buy",
            }
        )
    # complete_game docs with duplication: g1 emitted 3x with differing
    # price-array lengths (best-row dedup must prefer the longest).
    game_doc = {
        "id": "g1",
        "timestamp": 1767916800000,
        "gameVersion": "v3",
        "rugged": True,
        "peakMultiplier": 1.9,
        "prices": [1.0, 1.5, 1.9, 0.02],
        "provablyFair": {"serverSeedHash": "h1", "version": "v1"},
        "globalSidebets": [
            {
                "playerId": "did:p:alice",
                "username": "alice",
                "betAmount": 0.005,
                "xPayout": 5,
                "startedAtTick": 1,
                "end": 3,
                "type": "placed",
            }
        ],
    }
    for i, n_prices in enumerate((2, 4, 3)):
        doc = dict(game_doc, prices=game_doc["prices"][:n_prices])
        seq += 1
        rows.append(
            {
                "ts": f"2026-01-10T02:{seq:02d}:00+00:00",
                "source": "cdp",
                "doc_type": "complete_game",
                "session_id": "sess-1",
                "seq": seq,
                "direction": "received",
                "raw_json": json.dumps(doc),
                "game_id": "g1",
            }
        )
    return rows


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lake") / "events_parquet")
    raw = spark.createDataFrame(_fixture_rows())
    env = normalize_envelope(raw)
    write_event_lake(env, path)
    return path


def test_partition_layout_and_pruning(spark, lake):
    import os

    assert os.path.isdir(f"{lake}/doc_type=game_tick/date=2026-01-10")
    df = read_event_lake(spark, lake, doc_type="game_tick")
    assert df.count() == 18
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "doc_type" in plan  # partition filter present, not a full scan


def test_episode_and_qualifying(spark, lake):
    es = EventStore(read_event_lake(spark, lake))
    ep = es.game_episode("g1").where(F.col("doc_type") == "game_tick")
    prices = [r.price for r in ep.select("price").collect()]
    assert prices == [str(round(1.0 + 0.1 * t, 4)) for t in range(10)]
    qual = {r.game_id: r.tick_count for r in es.qualifying_games(5).collect()}
    assert qual == {"g1": 10, "g2": 5}


def test_player_semi_join(spark, lake):
    es = EventStore(read_event_lake(spark, lake))
    games = {
        r.game_id
        for r in es.player_events("player-alice").select("game_id").distinct().collect()
    }
    assert games == {"g1", "g3"}


def test_tick_features_known_values(spark, lake):
    es = EventStore(read_event_lake(spark, lake))
    feats = es.tick_features().where(F.col("game_id") == "g1").orderBy("seq").collect()
    assert feats[0].price_change is None  # LAG null on first row
    assert abs(feats[1].price_change - 0.1) < 1e-9
    assert feats[-1].drawdown == 0.0  # monotone series never draws down
    assert abs(feats[4].volatility_5 - 0.158114) < 1e-6  # std of 5-tick ramp


def test_load_games_best_row_dedup(spark, lake):
    games = load_games(read_event_lake(spark, lake))
    rows = games.collect()
    assert len(rows) == 1  # 3 duplicate emissions -> 1
    g = rows[0]
    assert g.duration_ticks == 4  # longest price array won
    assert g.final_price == 0.02
    assert g.rug_tick == 3  # biggest drop 1.9 -> 0.02 at index 3
    assert g.is_unplayable


def test_explode_sidebets_labels(spark, lake):
    games = load_games(read_event_lake(spark, lake))
    bets = explode_sidebets(games).collect()
    assert len(bets) == 1
    b = bets[0]
    assert b.player_id == "did:p:alice"
    assert not b.bet_won  # duration 4 outside the explicit (1, 3] window
    assert b.ticks_to_rug == 3
    assert not b.bet_in_optimal_zone

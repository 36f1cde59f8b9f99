"""API-parity tests for the EventStoreQuery-equivalent surface
(duckdb.py:48-458 method-for-method)."""

from __future__ import annotations

import pytest

from vectra_player_spark.eventstore import EventStore
from tests.test_eventstore import _fixture_rows


@pytest.fixture(scope="module")
def store(spark):
    from vectra_player_spark.sources.event_lake import normalize_envelope

    env = normalize_envelope(spark.createDataFrame(_fixture_rows()))
    return EventStore(env)


def test_raw_sql_query(store):
    df = store.query(
        "SELECT game_id, COUNT(*) AS n FROM events_lake "
        "WHERE doc_type = 'game_tick' GROUP BY game_id"
    )
    assert {r.game_id: r.n for r in df.collect()} == {"g1": 10, "g2": 5, "g3": 3}


def test_parametrized_sql_query(store):
    # reference parity: $named params (duckdb.py:82-123) -> :named args
    # bound as literals in the analyzed plan, never string-spliced
    df = store.query(
        "SELECT game_id, COUNT(*) AS n FROM events_lake "
        "WHERE doc_type = :dt AND game_id = :gid GROUP BY game_id",
        {"dt": "game_tick", "gid": "g2"},
    )
    assert [(r.game_id, r.n) for r in df.collect()] == [("g2", 5)]
    # injection-shaped value stays a literal, matches nothing
    assert (
        store.query(
            "SELECT COUNT(*) AS n FROM events_lake WHERE game_id = :gid",
            {"gid": "x' OR '1'='1"},
        ).first()["n"]
        == 0
    )


def test_query_arrow(store):
    tbl = store.query_arrow("SELECT COUNT(*) AS n FROM events_lake")
    assert tbl.column("n")[0].as_py() == 24  # 18 ticks + 3 actions + 3 games


def test_iter_episodes(store):
    episodes = list(store.iter_episodes(min_ticks=5))
    assert [g for g, _ in episodes] == ["g1", "g2"]
    g1 = episodes[0][1]
    assert list(g1["seq"]) == sorted(g1["seq"])  # episode-ordered
    assert (g1["game_id"] == "g1").all()


def test_player_queries(store):
    games = store.get_player_games("player-alice").collect()
    assert {g.game_id for g in games} == {"g1", "g3"}
    actions = store.get_player_actions("player-bob").collect()
    assert len(actions) == 1 and actions[0].action_type == "buy"
    players = store.list_players().collect()
    assert {p.player_id for p in players} == {"player-alice", "player-bob"}


def test_count_events(store):
    assert store.count_events() == 24
    assert store.count_events("game_tick") == 18
    assert store.count_events("complete_game") == 3

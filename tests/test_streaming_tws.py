"""transformWithStateInPandas arms.

Two tiers, because the new API's Python↔JVM state protocol needs the
`protobuf` package (absent from this container):

1. PURE parity — the replay cores (_replay_phase/_replay_session) are
   plain functions; drive them and the applyInPandasWithState functions
   (with a stub GroupState) over the same scenarios and compare rows.
   Runs everywhere; pins that the two arms share one semantics.
2. ENGINE tests — the real streaming queries; skipped with a reason when
   protobuf is missing, exercised for real where it exists.
"""

from __future__ import annotations

import importlib.util
import time

import pandas as pd
import pytest

from vectra_player_spark.streaming.stateful import (
    PHASE_OUTPUT_SCHEMA,
    SESSION_OUTPUT_SCHEMA,
    phase_machine_fn,
    sessionize_fn,
)
from vectra_player_spark.streaming.stateful_tws import (
    _PHASE_INIT,
    _SESSION_INIT,
    _flush_session_state,
    _replay_phase,
    _replay_session,
    phase_machine_tws,
    sessionize_games_tws,
)
from tests.test_streaming import SCENARIO_A, SCENARIO_B, _write_jsonl

try:
    # find_spec imports the PARENT package, so a missing 'google'
    # namespace raises instead of returning None
    _HAS_PROTOBUF = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:
    _HAS_PROTOBUF = False

needs_protobuf = pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithState state protocol needs protobuf (not in container)",
)


class _StubState:
    """Minimal GroupState double for driving the applyInPandasWithState
    functions outside the engine (exists/get/update are all they use on
    the data path)."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _scenario_df(rows):
    return pd.DataFrame(rows)


def _run_old_phase(batches):
    st = _StubState()
    out = []
    for b in batches:
        for pdf in phase_machine_fn(("feed-1",), iter([_scenario_df(b)]), st):
            out.extend(map(tuple, pdf.itertuples(index=False)))
    return out, st._v


def _run_new_phase(batches):
    st = _PHASE_INIT
    out = []
    for b in batches:
        rows, st = _replay_phase("feed-1", st, _scenario_df(b))
        out.extend(rows)
    return out, st


def test_phase_replay_core_matches_apply_in_pandas_fn():
    for split in ([SCENARIO_A + SCENARIO_B], [SCENARIO_A, SCENARIO_B]):
        old_rows, old_state = _run_old_phase(split)
        new_rows, new_state = _run_new_phase(split)
        assert new_rows == old_rows and len(new_rows) == 8
        assert tuple(new_state) == tuple(old_state)


def _run_old_session(batches):
    st = _StubState()
    out = []
    for b in batches:
        for pdf in sessionize_fn(("feed-1",), iter([_scenario_df(b)]), st):
            out.extend(map(tuple, pdf.itertuples(index=False)))
    return out, st._v


def _run_new_session(batches):
    st = _SESSION_INIT
    out = []
    for b in batches:
        rows, st = _replay_session("feed-1", st, _scenario_df(b))
        out.extend(rows)
    return out, st


def test_session_replay_core_matches_apply_in_pandas_fn():
    for split in ([SCENARIO_A + SCENARIO_B], [SCENARIO_A, SCENARIO_B]):
        old_rows, old_state = _run_old_session(split)
        new_rows, new_state = _run_new_session(split)
        # tuple-ize nested lists for comparison
        norm = lambda rows: [  # noqa: E731
            tuple(tuple(x) if isinstance(x, list) else x for x in r) for r in rows
        ]
        assert norm(new_rows) == norm(old_rows) and len(new_rows) == 1
        assert tuple(new_state)[0] == tuple(old_state)[0]  # same in-flight game
        assert list(new_state)[1] == list(old_state)[1]  # same pending ticks


def test_session_timer_flush_matches_boundary_flush_shape():
    """The timer-expiry flush must produce exactly what the boundary
    flush would for the same state (minus the fields the boundary path
    resets)."""
    _, st = _run_new_session([SCENARIO_A])  # g1 partial: 5 ticks, 1 backfilled
    rows = _flush_session_state("feed-1", st)
    assert len(rows) == 1
    key, gid, n, prices, peak, gaps, backfilled, seed = rows[0]
    assert (key, gid, n, backfilled, seed) == ("feed-1", "g1", 5, 1, None)
    assert prices == sorted(prices, key=lambda _: 0) and len(prices) == 5
    assert peak == max(prices) and gaps is True
    # empty state flushes nothing
    assert _flush_session_state("feed-1", _SESSION_INIT) == []


@needs_protobuf
def test_phase_machine_tws_engine(spark, tmp_path):
    from vectra_player_spark.streaming.jobs import read_tick_stream
    from vectra_player_spark.streaming.stateful import phase_machine

    d = tmp_path / "tws_phase"
    d.mkdir()
    _write_jsonl(d / "a.jsonl", SCENARIO_A + SCENARIO_B)

    def collect(df, name):
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        rows = sorted(tuple(r) for r in spark.table(name).collect())
        q.stop()
        return rows

    old = collect(phase_machine(read_tick_stream(spark, str(d))), "tws_p_old")
    new = collect(phase_machine_tws(read_tick_stream(spark, str(d))), "tws_p_new")
    assert new == old and len(new) == 8


@needs_protobuf
def test_sessionize_tws_timer_flushes_partial_episode(spark, tmp_path):
    from vectra_player_spark.streaming.jobs import read_tick_stream

    d = tmp_path / "tws_timer"
    d.mkdir()
    _write_jsonl(d / "a.jsonl", SCENARIO_A)
    q = (
        sessionize_games_tws(read_tick_stream(spark, str(d)), idle_ttl_ms=500)
        .writeStream.format("memory")
        .queryName("tws_timer_out")
        .outputMode("append")
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline and not rows:
            rows = spark.table("tws_timer_out").collect()
            time.sleep(0.3)
        assert len(rows) == 1 and rows[0].game_id == "g1"
    finally:
        q.stop()

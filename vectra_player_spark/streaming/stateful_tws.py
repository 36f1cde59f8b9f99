"""Next-gen stateful operators on Spark 4's transformWithStateInPandas.

The applyInPandasWithState arms (streaming/stateful.py) carry the whole
per-key state as ONE tuple and emulate idle eviction with
GroupStateTimeout. transformWithState is the successor API Spark built
for exactly this operator class (SPARK-49564): typed named state slots
(ValueState/ListState/MapState), first-class per-key TIMERS with an
expiry callback that can EMIT rows, and RocksDB-native state encoding.
The engine ships both arms for its two heavyweight operators:

- :func:`phase_machine_tws` — same phase semantics as
  stateful.phase_machine (reference: rugs-sanitizer phase_detector.py),
  state in a ValueState, idle keys evicted by a processing-time timer.
- :func:`sessionize_games_tws` — same episode semantics as
  stateful.sessionize_games (price_history_handler.py:39-116 boundary
  emit + partialPrices backfill), with the idle-timer expiry FLUSHING
  the partial episode downstream — the output-from-timer capability the
  old API lacks (its timeout path can only run inside the next batch's
  function invocation).

Parity between arms is test-pinned (tests/test_streaming_tws.py), so the
engine can move to the new API wholesale when the old one is retired,
and a 100 TB deployment can pick the API its Spark version supports.

ENVIRONMENT GUARD: transformWithState's Python↔JVM state protocol is
protobuf-based (pyspark/sql/streaming/proto/StateMessage_pb2), and the
`protobuf` package is not in this container — the processors are
code-complete but the streaming engine cannot run them here (same class
of seam as the LanceDB / sentence-transformers backends). What IS
executable everywhere is the semantics: the per-row replay cores are
pure functions shared with nothing Spark-side, and the parity tests
drive them directly against the applyInPandasWithState functions on the
same scenarios; the engine-level tests skip with a reason when protobuf
is absent and run for real where it exists.

The per-row replay cores and the partial-episode flush are IMPORTED from
streaming/stateful.py (single-sourced since round 5 — the ADVICE flagged
the earlier copies as drift-prone): one semantics, two harness bindings
by construction.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from vectra_player_spark.streaming.stateful import (
    _PHASE_COLS,
    _PHASE_INIT,
    _SESSION_COLS,
    _SESSION_INIT,
    PHASE_OUTPUT_SCHEMA,
    PHASE_STATE_SCHEMA,
    SESSION_OUTPUT_SCHEMA,
    SESSION_STATE_SCHEMA,
    _flush_session_state,
    _replay_phase,
    _replay_session,
)


def _rearm(handle: StatefulProcessorHandle, timers: TimerValues, ttl_ms: int) -> None:
    # one live timer per key: drop stale registrations, arm the new one.
    # Cost note: delete+register is 2 timer-store ops per ACTIVE key per
    # batch — bounded by batch key activity, not population; the
    # alternative (persisting the last timer in value state to skip
    # no-op re-arms) saves nothing because an active key's deadline
    # always moves.
    for t in handle.listTimers():
        handle.deleteTimer(t)
    handle.registerTimer(timers.getCurrentProcessingTimeInMs() + ttl_ms)


class PhaseProcessor(StatefulProcessor):
    def __init__(self, idle_ttl_ms: int | None = None):
        self._ttl = idle_ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getValueState("phase_state", PHASE_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        st = self._state.get() if self._state.exists() else _PHASE_INIT
        chunks = [c for c in rows]
        batch = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        out = []
        if not batch.empty:
            out, st = _replay_phase(key[0], tuple(st), batch)
        self._state.update(tuple(st))
        if self._ttl is not None:
            _rearm(self._handle, timerValues, self._ttl)
        if out:
            yield pd.DataFrame(out, columns=_PHASE_COLS)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo) -> Iterator[pd.DataFrame]:
        self._state.clear()
        return iter(())

    def close(self) -> None:
        pass


class SessionProcessor(StatefulProcessor):
    def __init__(self, idle_ttl_ms: int | None = None):
        self._ttl = idle_ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getValueState("session_state", SESSION_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        st = self._state.get() if self._state.exists() else _SESSION_INIT
        chunks = [c for c in rows]
        batch = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        finalized = []
        if not batch.empty:
            finalized, st = _replay_session(key[0], tuple(st), batch)
        self._state.update(tuple(st))
        if self._ttl is not None:
            _rearm(self._handle, timerValues, self._ttl)
        if finalized:
            yield pd.DataFrame(finalized, columns=_SESSION_COLS)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo) -> Iterator[pd.DataFrame]:
        # the new API's differentiator: the expiry callback EMITS the
        # partial episode instead of waiting for the key's next batch
        st = self._state.get() if self._state.exists() else None
        self._state.clear()
        rows = _flush_session_state(key[0], tuple(st)) if st is not None else []
        if rows:
            yield pd.DataFrame(rows, columns=_SESSION_COLS)

    def close(self) -> None:
        pass


def phase_machine_tws(ticks: DataFrame, idle_ttl_ms: int | None = None) -> DataFrame:
    """T1/T4 on transformWithState; same output as stateful.phase_machine."""
    return ticks.groupBy("session_id").transformWithStateInPandas(
        PhaseProcessor(idle_ttl_ms),
        outputStructType=PHASE_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="processingTime" if idle_ttl_ms is not None else "none",
    )


def sessionize_games_tws(
    ticks: DataFrame, idle_ttl_ms: int | None = None
) -> DataFrame:
    """T2/T3 on transformWithState; same output as stateful.sessionize_games,
    plus timer-driven partial-episode flush when ``idle_ttl_ms`` is set."""
    return ticks.groupBy("session_id").transformWithStateInPandas(
        SessionProcessor(idle_ttl_ms),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="processingTime" if idle_ttl_ms is not None else "none",
    )

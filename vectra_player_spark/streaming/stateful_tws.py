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

Shared per-row replay logic lives in the pure helpers below — one
semantics, two harness bindings.
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
    PHASE_OUTPUT_SCHEMA,
    PHASE_STATE_SCHEMA,
    SESSION_OUTPUT_SCHEMA,
    SESSION_STATE_SCHEMA,
    _detect_phase,
    _gap_lr,
)

_PHASE_COLS = [f.name for f in PHASE_OUTPUT_SCHEMA.fields]
_SESSION_COLS = [f.name for f in SESSION_OUTPUT_SCHEMA.fields]

_PHASE_INIT = (None, "UNKNOWN", 0, 0, None, False)
_SESSION_INIT = (None, [], [], False, 0, None, None)


def _replay_phase(key_val, st, batch: pd.DataFrame):
    """One batch of ticks through the phase machine; returns (rows, state).
    Pure function of (state tuple, sorted batch) — shared by both API
    bindings so their semantics cannot drift."""
    cur_game, prev_phase, games_seen, rug_count, last_ts, prev_rugged = st
    out = []
    for row in batch.sort_values("seq").itertuples():
        phase = _detect_phase(row)
        gid = row.game_id
        if gid != cur_game:
            games_seen += 1
            if prev_rugged and phase not in ("RUGGED",):
                phase = "COOLDOWN" if phase == "UNKNOWN" else phase
            cur_game = gid
        if phase == "RUGGED" and not prev_rugged:
            rug_count += 1
        gap_ms = int(row.ts_ms - last_ts) if last_ts is not None else 0
        out.append(
            (
                key_val,
                int(row.seq),
                gid,
                phase,
                prev_phase,
                phase != prev_phase,
                games_seen,
                rug_count,
                row.server_seed is not None and phase == "RUGGED",
                gap_ms,
                _gap_lr(gap_ms),
            )
        )
        prev_phase = phase
        prev_rugged = phase == "RUGGED"
        last_ts = int(row.ts_ms)
    return out, (cur_game, prev_phase, games_seen, rug_count, last_ts, prev_rugged)


def _replay_session(key_val, st, batch: pd.DataFrame):
    """One batch of ticks through the sessionizer; returns
    (finalized_rows, state). Same boundary/backfill/duplicate rules as
    stateful.sessionize_fn."""
    gid, ticks, prices, had_gaps, n_backfilled, seed, last_ts = st
    ticks, prices = list(ticks), list(prices)
    finalized = []

    def finalize():
        nonlocal ticks, prices, had_gaps, n_backfilled, seed
        if gid is not None and ticks:
            order = sorted(range(len(ticks)), key=lambda i: ticks[i])
            sp = [prices[i] for i in order]
            finalized.append(
                (key_val, gid, len(sp), sp, max(sp), had_gaps, n_backfilled, seed)
            )
        ticks, prices, had_gaps, n_backfilled, seed = [], [], False, 0, None

    for row in batch.sort_values("seq").itertuples():
        if row.game_id != gid:
            finalize()
            gid = row.game_id
        if last_ts is not None and (row.ts_ms - last_ts) >= 350:
            had_gaps = True
        last_ts = int(row.ts_ms)
        if row.tick is not None and row.price is not None and not pd.isna(row.price):
            tick = int(row.tick)
            if tick in ticks:
                prices[ticks.index(tick)] = float(row.price)
            else:
                ticks.append(tick)
                prices.append(float(row.price))
        bt, bp = row.backfill_ticks, row.backfill_prices
        if bt is not None and len(bt) > 0:
            for bt_i, bp_i in zip(bt, bp):
                bt_i = int(bt_i)
                if bt_i not in ticks:
                    ticks.append(bt_i)
                    prices.append(float(bp_i))
                    n_backfilled += 1
        if row.server_seed is not None and not (
            isinstance(row.server_seed, float) and pd.isna(row.server_seed)
        ):
            seed = row.server_seed
    return finalized, (gid, ticks, prices, had_gaps, n_backfilled, seed, last_ts)


def _flush_session_state(key_val, st):
    """Finalize a partial episode straight from its state tuple (timer
    expiry path — no batch rows involved)."""
    gid, ticks, prices, had_gaps, n_backfilled, seed, _last = st
    if gid is None or not ticks:
        return []
    order = sorted(range(len(ticks)), key=lambda i: ticks[i])
    sp = [prices[i] for i in order]
    return [(key_val, gid, len(sp), sp, max(sp), had_gaps, n_backfilled, seed)]


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

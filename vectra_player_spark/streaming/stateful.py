"""Stateful stream operators: phase machine (T1), game sessionization with
late-tick backfill (T2+T3), gap tracking (T4).

Both operators are `applyInPandasWithState` grouped by `session_id` (the
feed key — the reference runs one state machine per feed,
rugs-sanitizer/src/phase_detector.py). State survives micro-batches; rows
within a batch are sorted by seq before replay, so cadence is preserved
under any micro-batch slicing. At scale each feed is an independent key —
thousands of feeds parallelize across the state store with no cross-key
coupling.

Phase semantics (phase_detector.py:43-165):
  rugged → RUGGED; active → ACTIVE; allowPreRoundBuys → PRESALE;
  cooldownTimer > 0 → COOLDOWN; else UNKNOWN.
Two-broadcast rug (phase_detector.py:119-148): 1st broadcast keeps the
same gameId with rugged=true (seed reveal, rug_count++); the next event
with a NEW gameId starts COOLDOWN and games_seen++.

Sessionization (price_history_handler.py:39-116): the episode boundary is
the gameId change — the previous game finalizes with its price array, peak,
and gap flags; `partialPrices` corrections fill missed ticks in place
before finalization (T3 late-data backfill).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Input rows for both operators (parsed gameStateUpdate ticks).
TICK_SCHEMA = T.StructType(
    [
        T.StructField("session_id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("game_id", T.StringType()),
        T.StructField("active", T.BooleanType()),
        T.StructField("rugged", T.BooleanType()),
        T.StructField("allow_pre_round_buys", T.BooleanType()),
        T.StructField("cooldown_timer", T.LongType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("tick", T.LongType()),
        T.StructField("server_seed", T.StringType()),
        T.StructField("backfill_ticks", T.ArrayType(T.LongType())),
        T.StructField("backfill_prices", T.ArrayType(T.DoubleType())),
    ]
)

PHASE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("session_id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("game_id", T.StringType()),
        T.StructField("phase", T.StringType()),
        T.StructField("prev_phase", T.StringType()),
        T.StructField("is_transition", T.BooleanType()),
        T.StructField("games_seen", T.LongType()),
        T.StructField("rug_count", T.LongType()),
        T.StructField("seed_revealed", T.BooleanType()),
        T.StructField("gap_ms", T.LongType()),
        T.StructField("gap_lr", T.DoubleType()),
    ]
)

PHASE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cur_game_id", T.StringType()),
        T.StructField("prev_phase", T.StringType()),
        T.StructField("games_seen", T.LongType()),
        T.StructField("rug_count", T.LongType()),
        T.StructField("last_ts_ms", T.LongType()),
        T.StructField("prev_rugged", T.BooleanType()),
    ]
)


def _detect_phase(row) -> str:
    if bool(row.rugged):
        return "RUGGED"
    if bool(row.active):
        return "ACTIVE"
    if bool(row.allow_pre_round_buys):
        return "PRESALE"
    if (row.cooldown_timer or 0) > 0:
        return "COOLDOWN"
    return "UNKNOWN"


def _gap_lr(gap_ms: int) -> float:
    """T4 thresholds (analyzers/bayesian.py:62-76): expected 250 ms cadence;
    gaps >= 350/450/500 ms escalate likelihood ratios 1.5/3.0/8.0."""
    if gap_ms >= 500:
        return 8.0
    if gap_ms >= 450:
        return 3.0
    if gap_ms >= 350:
        return 1.5
    return 1.0


def phase_machine_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        cur_game, prev_phase, games_seen, rug_count, last_ts, prev_rugged = state.get
    else:
        cur_game, prev_phase, games_seen, rug_count, last_ts, prev_rugged = (
            None,
            "UNKNOWN",
            0,
            0,
            None,
            False,
        )
    out = []
    # applyInPandasWithState delivers a group's batch as MULTIPLE Arrow
    # chunks (arrow.maxRecordsPerBatch); sorting each chunk independently
    # would replay out-of-order ticks spanning chunk boundaries in the
    # wrong order. Materialize the whole group, then sort ONCE.
    chunks = list(pdfs)
    batch = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
    if not batch.empty:
        for row in batch.sort_values("seq").itertuples():
            phase = _detect_phase(row)
            gid = row.game_id
            if gid != cur_game:
                games_seen += 1
                # second rug broadcast: new game while previous was rugged
                if prev_rugged and phase not in ("RUGGED",):
                    phase = "COOLDOWN" if phase == "UNKNOWN" else phase
                cur_game = gid
            if phase == "RUGGED" and not prev_rugged:
                rug_count += 1
            gap_ms = int(row.ts_ms - last_ts) if last_ts is not None else 0
            out.append(
                (
                    key[0],
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
    state.update((cur_game, prev_phase, games_seen, rug_count, last_ts, prev_rugged))
    yield pd.DataFrame(out, columns=[f.name for f in PHASE_OUTPUT_SCHEMA.fields])


def phase_machine(ticks: DataFrame, idle_ttl_ms: int | None = None) -> DataFrame:
    """T1/T4: per-feed phase state machine with gap signal annotations.

    ``idle_ttl_ms``: per-key state eviction for unbounded key spaces. The
    default (None) keeps state per feed forever — correct for the
    reference's bounded feed set, unbounded at 100k+ churning keys (the
    state-store audit in SCALE.md measures the growth). With a TTL, a
    feed that stays silent for ``idle_ttl_ms`` of processing time has its
    state REMOVED (phase detection restarts from UNKNOWN if the feed
    returns) — the standard idle-session eviction policy; pick a TTL
    above the feed's heartbeat cadence (gap_watchdog covers the
    in-stream gap semantics below that horizon).
    """
    if idle_ttl_ms is None:
        return ticks.groupBy("session_id").applyInPandasWithState(
            phase_machine_fn,
            outputStructType=PHASE_OUTPUT_SCHEMA,
            stateStructType=PHASE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # consume the (empty) input iterator before touching state —
            # the Arrow stream for the group must be drained either way —
            # and yield NOTHING: an evicted phase key has no output rows.
            for _ in pdfs:
                pass
            state.remove()
            return
        yield from phase_machine_fn(key, pdfs, state)
        # runs when Spark exhausts the generator — after the inner fn's
        # state.update, which setTimeoutDuration requires
        state.setTimeoutDuration(idle_ttl_ms)

    return ticks.groupBy("session_id").applyInPandasWithState(
        fn,
        outputStructType=PHASE_OUTPUT_SCHEMA,
        stateStructType=PHASE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("session_id", T.StringType()),
        T.StructField("game_id", T.StringType()),
        T.StructField("n_ticks", T.LongType()),
        T.StructField("prices", T.ArrayType(T.DoubleType())),
        T.StructField("peak_price", T.DoubleType()),
        T.StructField("had_gaps", T.BooleanType()),
        T.StructField("n_backfilled", T.LongType()),
        T.StructField("server_seed", T.StringType()),
    ]
)

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("game_id", T.StringType()),
        T.StructField("ticks", T.ArrayType(T.LongType())),
        T.StructField("prices", T.ArrayType(T.DoubleType())),
        T.StructField("had_gaps", T.BooleanType()),
        T.StructField("n_backfilled", T.LongType()),
        T.StructField("server_seed", T.StringType()),
        T.StructField("last_ts_ms", T.LongType()),
    ]
)


def sessionize_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        gid, ticks, prices, had_gaps, n_backfilled, seed, last_ts = state.get
        ticks = list(ticks)
        prices = list(prices)
    else:
        gid, ticks, prices, had_gaps, n_backfilled, seed, last_ts = (
            None,
            [],
            [],
            False,
            0,
            None,
            None,
        )
    finalized = []

    def finalize():
        nonlocal ticks, prices, had_gaps, n_backfilled, seed
        if gid is not None and ticks:
            order = sorted(range(len(ticks)), key=lambda i: ticks[i])
            sp = [prices[i] for i in order]
            finalized.append(
                (
                    key[0],
                    gid,
                    len(sp),
                    sp,
                    max(sp),
                    had_gaps,
                    n_backfilled,
                    seed,
                )
            )
        ticks, prices, had_gaps, n_backfilled, seed = [], [], False, 0, None

    # Same multi-chunk hazard as phase_machine_fn: concat the group's
    # chunks before the single seq-sort so cross-chunk ordering holds.
    chunks = list(pdfs)
    batch = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
    if not batch.empty:
        for row in batch.sort_values("seq").itertuples():
            if row.game_id != gid:
                finalize()
                gid = row.game_id
            if last_ts is not None and (row.ts_ms - last_ts) >= 350:
                had_gaps = True
            last_ts = int(row.ts_ms)
            if row.tick is not None and row.price is not None and not pd.isna(row.price):
                tick = int(row.tick)
                if tick in ticks:  # duplicate tick broadcast — keep latest
                    prices[ticks.index(tick)] = float(row.price)
                else:
                    ticks.append(tick)
                    prices.append(float(row.price))
            # T3: partialPrices corrections fill missed ticks in place
            bt = row.backfill_ticks
            bp = row.backfill_prices
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
    state.update((gid, ticks, prices, had_gaps, n_backfilled, seed, last_ts))
    yield pd.DataFrame(finalized, columns=[f.name for f in SESSION_OUTPUT_SCHEMA.fields])


def sessionize_games(ticks: DataFrame, idle_ttl_ms: int | None = None) -> DataFrame:
    """T2+T3: episode finalization on gameId boundary with partialPrices
    backfill. Emission is boundary-driven (the rug broadcast), not
    watermark-driven — the reference's policy (SURVEY §7 hard-part 5).

    ``idle_ttl_ms``: idle-key eviction. The boundary-driven emit bounds a
    key's state to ONE in-flight game, but a feed whose rug broadcast
    never arrives (crashed source, abandoned game) pins its partial game
    forever, and the KEY itself lives forever either way — unbounded
    key-churn needs a horizon (the reference's analog is the
    price_history_handler dropping feeds on disconnect). With a TTL, an
    idle key's partial game is FINALIZED (flushed downstream with
    whatever ticks arrived — same rule as the game-boundary flush) and
    its state removed.
    """
    if idle_ttl_ms is None:
        return ticks.groupBy("session_id").applyInPandasWithState(
            sessionize_fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in SESSION_OUTPUT_SCHEMA.fields]
        if state.hasTimedOut:
            for _ in pdfs:  # drain the group's (empty) Arrow stream
                pass
            gid, ticks_, prices, had_gaps, n_backfilled, seed, _last = state.get
            rows = []
            if gid is not None and len(ticks_) > 0:
                order = sorted(range(len(ticks_)), key=lambda i: ticks_[i])
                sp = [prices[i] for i in order]
                rows.append(
                    (key[0], gid, len(sp), sp, max(sp), had_gaps, n_backfilled, seed)
                )
            state.remove()
            if rows:  # yield only non-empty frames (empty-frame Arrow
                # round-trip crashes the worker — measured, not theory)
                yield pd.DataFrame(rows, columns=cols)
            return
        yield from sessionize_fn(key, pdfs, state)
        state.setTimeoutDuration(idle_ttl_ms)

    return ticks.groupBy("session_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )

"""Timer-driven feed-gap watchdog (SURVEY §2.11 T4, the `check_current_gap`
half of the reference's gap detector, analyzers/bayesian.py:62-176).

The batch/event-time half of T4 (inter-event deltas → likelihood ratios)
lives in the phase machine and the bayesian_gap_signal query. What those
cannot express is "the feed went SILENT" — no event arrives, so no row
triggers a computation. The reference solves it with a wall-clock timer
thread; Structured Streaming's equivalent is a processing-time timeout on
keyed state: every event re-arms the timeout, and if it expires before the
next event the state handler fires with `hasTimedOut` and emits an alert.

Implementation note: PySpark 4 also offers transformWithStateInPandas with
explicit timers, but its driver worker needs protobuf (absent in this
container); `applyInPandasWithState` + GroupStateTimeout covers the same
semantics on the stable API.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ALERT_SCHEMA = T.StructType(
    [
        T.StructField("session_id", T.StringType()),
        T.StructField("alert", T.StringType()),
        T.StructField("last_seq", T.LongType()),
        T.StructField("n_events_seen", T.LongType()),
    ]
)

WATCHDOG_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_seq", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def make_watchdog_fn(max_silence_ms: int):
    def watchdog(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            last_seq, n_events = state.get if state.exists else (-1, 0)
            state.remove()  # a fresh event will re-create and re-arm
            yield pd.DataFrame(
                [
                    {
                        "session_id": key[0],
                        "alert": "feed_silent",
                        "last_seq": int(last_seq),
                        "n_events_seen": int(n_events),
                    }
                ]
            )
            return
        last_seq, n_events = state.get if state.exists else (-1, 0)
        for pdf in pdfs:
            if len(pdf):
                last_seq = max(last_seq, int(pdf["seq"].max()))
                n_events += len(pdf)
        state.update((last_seq, n_events))
        state.setTimeoutDuration(max_silence_ms)  # re-arm the deadline
        yield pd.DataFrame(
            [], columns=["session_id", "alert", "last_seq", "n_events_seen"]
        )

    return watchdog


def gap_alerts(ticks: DataFrame, max_silence_ms: int = 2_000) -> DataFrame:
    """Attach the watchdog to a tick stream keyed by feed: one alert row per
    feed per silence period exceeding `max_silence_ms` processing time."""
    return ticks.groupBy("session_id").applyInPandasWithState(
        make_watchdog_fn(max_silence_ms),
        outputStructType=ALERT_SCHEMA,
        stateStructType=WATCHDOG_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )

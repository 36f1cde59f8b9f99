"""Stream health monitors (SURVEY §2.11 T8).

The reference polices its feed with rate limiters and degradation monitors
(src/sources/feed_rate_limiter.py, feed_degradation.py,
data_integrity_monitor.py). In Structured Streaming the equivalent
telemetry arrives through the StreamingQueryListener: per-batch input
rates, processing rates, and state-store sizes. `FeedHealthListener`
aggregates those into the reference's signals — sustained rate drop,
rising batch latency — and exposes them for an ops layer to act on.

Data-integrity checks (the reference's monotone-tick / duplicate-game
validations) are expressed as DataFrame assertions in `integrity_report`,
runnable batch-side over any lake slice.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class FeedHealth:
    rows_per_second: float = 0.0
    avg_batch_ms: float = 0.0
    degraded: bool = False
    reason: str = ""
    n_batches: int = 0


class FeedHealthListener(StreamingQueryListener):
    """T8: tracks input rate + batch duration over a sliding window; flags
    degradation when the rate falls below `min_rows_per_second` or batch
    time exceeds `max_batch_ms` for `patience` consecutive batches."""

    def __init__(
        self,
        min_rows_per_second: float = 1.0,
        max_batch_ms: float = 10_000.0,
        patience: int = 3,
        window: int = 20,
    ):
        self.min_rate = min_rows_per_second
        self.max_batch_ms = max_batch_ms
        self.patience = patience
        self._rates: deque = deque(maxlen=window)
        self._durations: deque = deque(maxlen=window)
        self._bad_streak = 0
        self.health = FeedHealth()

    # StreamingQueryListener interface ------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        rate = p.processedRowsPerSecond or 0.0
        duration = (p.durationMs or {}).get("triggerExecution", 0)
        self._rates.append(rate)
        self._durations.append(float(duration))
        bad = rate < self.min_rate or duration > self.max_batch_ms
        self._bad_streak = self._bad_streak + 1 if bad else 0
        self.health = FeedHealth(
            rows_per_second=sum(self._rates) / len(self._rates),
            avg_batch_ms=sum(self._durations) / len(self._durations),
            degraded=self._bad_streak >= self.patience,
            reason=(
                "low input rate"
                if rate < self.min_rate
                else "slow batches"
                if duration > self.max_batch_ms
                else ""
            ),
            n_batches=self.health.n_batches + 1,
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def integrity_report(ticks: DataFrame) -> DataFrame:
    """Batch-side data-integrity checks per (session, game): duplicate
    ticks, non-monotone tick sequences, and price gaps — the
    data_integrity_monitor's validations as one aggregate."""
    from pyspark.sql import Window

    w = Window.partitionBy("session_id", "game_id").orderBy("seq")
    flagged = ticks.select(
        "session_id",
        "game_id",
        "tick",
        (F.col("tick") == F.lag("tick").over(w)).alias("dup_tick"),
        (F.col("tick") < F.lag("tick").over(w)).alias("out_of_order"),
        (F.col("tick") - F.lag("tick").over(w) > 1).alias("tick_gap"),
    )
    return flagged.groupBy("session_id", "game_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.coalesce(F.col("dup_tick").cast("int"), F.lit(0))).alias("n_dup_ticks"),
        F.sum(F.coalesce(F.col("out_of_order").cast("int"), F.lit(0))).alias(
            "n_out_of_order"
        ),
        F.sum(F.coalesce(F.col("tick_gap").cast("int"), F.lit(0))).alias("n_tick_gaps"),
    )

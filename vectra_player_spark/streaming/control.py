"""T10 — file-based IPC control plane for streaming ingest.

Reference parity: the reference event-store service runs a daemon thread
that polls a JSON control file for dashboard commands ({"recording":
bool, "timestamp": epoch}, commands older than 10 s ignored), toggles
recording, and atomically writes a status file (counters, session id,
heartbeat) for the dashboard to read back
(src/services/event_store/service.py:156-236).

Spark-first mapping: a Structured Streaming query has no native "pause",
and does not need one — the checkpoint IS the pause state. Stopping a
query is loss-free (offsets + sink commit log live in the checkpoint)
and restarting the same plan on the same checkpoint resumes exactly
where it left off, exactly-once. So:

- ``recording: false`` → ``query.stop()`` (checkpointed stop);
- ``recording: true``  → re-invoke the caller's query FACTORY (the same
  writeStream/checkpoint recipe — e.g. a ``stream_to_lake`` closure),
  which resumes from the checkpoint;
- status file → atomic temp-then-rename JSON with the recording flag,
  cumulative input rows observed across starts, last batch id, and a
  heartbeat timestamp — the reference's dashboard contract.

The polling loop itself is a daemon thread, like the reference; all the
decision logic lives in :meth:`poll_once` so tests (and cron-style
deployments that prefer an external scheduler over a thread) can drive
it synchronously.
"""

from __future__ import annotations

import json
import threading
import time
from collections.abc import Callable
from pathlib import Path


class FileControlPlane:
    """Poll ``control_file`` for {"recording": bool, "timestamp": s};
    start/stop the managed streaming query accordingly; publish status.

    ``query_factory`` must return a STARTED StreamingQuery bound to a
    fixed checkpoint — restarting it is what "resume" means on Spark.
    """

    def __init__(
        self,
        query_factory: Callable[[], "object"],
        control_file: str | Path,
        status_file: str | Path,
        poll_interval: float = 1.0,
        stale_after: float = 10.0,
        clock: Callable[[], float] = time.time,
    ) -> None:
        self._factory = query_factory
        self._control_file = Path(control_file)
        self._status_file = Path(status_file)
        self._poll_interval = poll_interval
        self._stale_after = stale_after
        self._clock = clock
        self._query = None
        self._thread: threading.Thread | None = None
        self._running = False
        self._rows_total = 0
        self._last_batch_id: int | None = None
        self._seen_progress: set[tuple[str, int]] = set()

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> None:
        """Start the managed query (recording by default, like the
        reference service) and the polling thread."""
        if self._running:
            return
        self._query = self._factory()
        self._running = True

        def loop() -> None:
            while self._running:
                try:
                    self.poll_once()
                except Exception:  # noqa: BLE001 — poll errors are non-fatal
                    pass
                time.sleep(self._poll_interval)

        self._thread = threading.Thread(
            target=loop, daemon=True, name="VectraControlPoll"
        )
        self._thread.start()

    def stop(self) -> None:
        """Stop polling and the managed query (checkpointed — a later
        start() resumes without loss)."""
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=self._poll_interval * 4)
            self._thread = None
        if self._query is not None and self._query.isActive:
            self._query.stop()

    # -- one control/status cycle (the testable unit) -----------------------

    @property
    def is_recording(self) -> bool:
        return self._query is not None and bool(self._query.isActive)

    def poll_once(self) -> None:
        self._harvest_progress()
        self._check_control_file()
        self._write_status_file()

    def _check_control_file(self) -> None:
        if not self._control_file.exists():
            return
        try:
            control = json.loads(self._control_file.read_text())
        except (json.JSONDecodeError, OSError):
            return  # malformed/racing writer — ignore, like the reference
        should_record = bool(control.get("recording", False))
        command_ts = control.get("timestamp", 0)
        if self._clock() - command_ts > self._stale_after:
            return  # stale command — never act on leftovers
        if should_record and not self.is_recording:
            self._query = self._factory()  # resume = restart on checkpoint
        elif not should_record and self.is_recording:
            self._harvest_progress()  # keep counters through the stop
            self._query.stop()

    def _harvest_progress(self) -> None:
        """Fold new (runId, batchId) progress rows into the cumulative
        input-row counter — survives stop/restart cycles, which reset
        the query's own recentProgress."""
        if self._query is None:
            return
        for p in self._query.recentProgress or []:
            key = (p["runId"], p["batchId"])
            if key in self._seen_progress:
                continue
            self._seen_progress.add(key)
            self._rows_total += int(p.get("numInputRows") or 0)
            self._last_batch_id = int(p["batchId"])

    def _write_status_file(self) -> None:
        now = self._clock()
        status = {
            "is_recording": self.is_recording,
            "rows_total": self._rows_total,
            "last_batch_id": self._last_batch_id,
            "query_id": str(self._query.id) if self._query is not None else None,
            "timestamp": now,
        }
        tmp = self._status_file.with_suffix(".tmp")
        self._status_file.parent.mkdir(parents=True, exist_ok=True)
        tmp.write_text(json.dumps(status))
        tmp.replace(self._status_file)  # atomic, like the reference


def write_control_command(
    control_file: str | Path, recording: bool, clock: Callable[[], float] = time.time
) -> None:
    """The dashboard side of the protocol (atomic write)."""
    p = Path(control_file)
    tmp = p.with_suffix(".tmp")
    p.parent.mkdir(parents=True, exist_ok=True)
    tmp.write_text(json.dumps({"recording": recording, "timestamp": clock()}))
    tmp.replace(p)

"""Keyed upsert sink (SURVEY §2.1 S9) — the reference's SQLite game-record
store (services/rugs-feed/src/storage.py:112-207): INSERT OR IGNORE new
keys, then UPDATE with monotone MAX() flags and COALESCE() keep-existing
semantics, plus an append-only event log and dedup inserts.

Spark shape: `foreachBatch` per micro-batch (or a direct call batch-side).
Each batch is MERGEd into the target with the same monotone/keep rules.
SQLite here (stdlib, single-node edge store exactly like the reference);
swapping the connection factory for a JDBC/Delta target keeps the merge
semantics — at scale this is `MERGE INTO` on Delta/Iceberg, and the batch
is repartitioned so one writer owns each key range.
"""

from __future__ import annotations

import sqlite3
from collections.abc import Callable

from pyspark.sql import DataFrame

GAME_TABLE_DDL = """
CREATE TABLE IF NOT EXISTS games (
  game_id TEXT PRIMARY KEY,
  peak_multiplier REAL,
  rugged INTEGER DEFAULT 0,
  server_seed TEXT,
  n_ticks INTEGER DEFAULT 0
)
"""

EVENT_LOG_DDL = """
CREATE TABLE IF NOT EXISTS event_log (
  seq INTEGER,
  game_id TEXT,
  event_type TEXT,
  payload TEXT
)
"""


def upsert_games_batch(db_path: str, rows: list[dict]) -> None:
    """The reference's upsert contract: new game rows insert; existing rows
    keep MAX(rugged), MAX(peak_multiplier), MAX(n_ticks) and COALESCE the
    seed (never un-reveal a revealed seed)."""
    con = sqlite3.connect(db_path)
    try:
        con.execute(GAME_TABLE_DDL)
        con.executemany(
            "INSERT OR IGNORE INTO games (game_id) VALUES (?)",
            [(r["game_id"],) for r in rows],
        )
        con.executemany(
            """
            UPDATE games SET
              peak_multiplier = MAX(COALESCE(peak_multiplier, 0), COALESCE(?, 0)),
              rugged = MAX(rugged, ?),
              server_seed = COALESCE(server_seed, ?),
              n_ticks = MAX(n_ticks, ?)
            WHERE game_id = ?
            """,
            [
                (
                    r.get("peak_multiplier"),
                    int(bool(r.get("rugged"))),
                    r.get("server_seed"),
                    int(r.get("n_ticks") or 0),
                    r["game_id"],
                )
                for r in rows
            ],
        )
        con.commit()
    finally:
        con.close()


def foreach_batch_upsert(db_path: str) -> Callable[[DataFrame, int], None]:
    """writeStream.foreachBatch handler: collect the (small, per-trigger)
    game-summary batch and merge it."""

    def handle(batch: DataFrame, epoch_id: int) -> None:
        rows = [r.asDict() for r in batch.collect()]
        if rows:
            upsert_games_batch(db_path, rows)

    return handle


def write_upsert(df: DataFrame, db_path: str) -> None:
    """Batch-side entry: merge a game-summary DataFrame into the store."""
    upsert_games_batch(db_path, [r.asDict() for r in df.collect()])

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
    # timeout: partition-parallel writers serialize on SQLite's file lock
    # instead of failing fast with "database is locked".
    con = sqlite3.connect(db_path, timeout=60.0)
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


def _partition_merger(db_path: str, chunk_size: int = 1000):
    """Executor-side merge closure for foreachPartition: applies the same
    INSERT-OR-IGNORE + monotone-MAX/COALESCE rules in bounded chunks —
    rows stream through the worker, never the driver."""

    def merge(rows_iter) -> None:
        chunk: list[dict] = []
        for row in rows_iter:
            chunk.append(row.asDict())
            if len(chunk) >= chunk_size:
                upsert_games_batch(db_path, chunk)
                chunk = []
        if chunk:
            upsert_games_batch(db_path, chunk)

    return merge


def write_upsert(df: DataFrame, db_path: str, num_partitions: int | None = None) -> None:
    """Batch-side entry: partition-parallel merge of a game-summary
    DataFrame into the store — NO driver collect.

    The batch is first pre-aggregated per game_id with the same monotone
    rules the store applies (MAX peak/rugged/n_ticks), so each key reaches
    the store exactly once per batch — Spark's map-side partial aggregation
    shrinks the shuffle AND the DB round-trips, and the per-key fold
    becomes order-independent. The seed uses MIN over non-nulls: the feed
    reveals at most one distinct seed per game (storage.py's COALESCE
    never overwrites), so MIN is just a deterministic way to pick the one
    revealed value under any row order; cross-batch, the store's COALESCE
    still keeps the earliest batch's seed. foreachPartition then merges
    each partition through its own connection. Against SQLite the writers
    serialize on the file lock (busy-timeout); against a real warehouse
    this same aggregated frame feeds a JDBC upsert or a Delta/Iceberg
    MERGE INTO (storage.py:112-207 semantics)."""
    from pyspark.sql import functions as F

    agg = df.groupBy("game_id").agg(
        F.max("peak_multiplier").alias("peak_multiplier"),
        F.max("rugged").alias("rugged"),
        F.min("server_seed").alias("server_seed"),
        F.max("n_ticks").alias("n_ticks"),
    )
    if num_partitions is not None:
        agg = agg.coalesce(num_partitions)
    agg.foreachPartition(_partition_merger(db_path))


def foreach_batch_upsert(db_path: str) -> Callable[[DataFrame, int], None]:
    """writeStream.foreachBatch handler: partition-parallel merge of each
    micro-batch (same path as write_upsert — no driver collect)."""

    def handle(batch: DataFrame, epoch_id: int) -> None:
        write_upsert(batch, db_path)

    return handle

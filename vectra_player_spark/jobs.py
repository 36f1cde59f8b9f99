"""Batch-job parity with the reference's user-facing scripts.

Each function is a drop-in for one script a user of the reference runs
today, composed from the engine's operators:

- build_scalping_dataset ≙ scripts/build_scalping_dataset.py:50-116
  (hive scan + json price-length predicate + ROW_NUMBER best-row dedup +
  price cleaning + JSONL export)
- export_games_julius ≙ scripts/export_for_julius.py:27-110
  (games summary CSV + flattened sidebets CSV)
- export_lake_jsonl ≙ src/scripts/export_jsonl.py:19-92
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectra_player_spark.eventstore import explode_sidebets, load_games
from vectra_player_spark.sources.event_lake import export_csv, export_jsonl, read_event_lake


def build_scalping_dataset(
    spark: SparkSession,
    lake_path: str,
    out_path: str | None = None,
    min_price_len: int = 30,
) -> DataFrame:
    """Clean per-game scalping rows: games with >= min_price_len ticks,
    best-row deduped (longest prices, newest), positive prices only
    (build_scalping_dataset.py P5 + W5/D2 + P7 semantics)."""
    games = load_games(read_event_lake(spark, lake_path), min_prices=min_price_len)
    cleaned = games.select(
        "game_id",
        "timestamp_ms",
        "game_version",
        F.expr("filter(prices, p -> p > 0)").alias("prices"),
        "duration_ticks",
        "peak_multiplier",
        "rugged",
    ).where(F.size("prices") >= min_price_len)
    if out_path is not None:
        cleaned.write.mode("overwrite").json(out_path)
    return cleaned


def export_games_julius(
    spark: SparkSession, lake_path: str, out_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Games-summary + flattened-sidebets CSVs for external analysis."""
    games = load_games(read_event_lake(spark, lake_path))
    summary = games.select(
        "game_id",
        "timestamp_ms",
        "game_version",
        "duration_ticks",
        "peak_multiplier",
        "final_price",
        "rugged",
        "is_unplayable",
        F.col("server_seed_hash"),
    )
    sidebets = explode_sidebets(games)
    export_csv(summary, f"{out_dir}/games_summary")
    export_csv(sidebets, f"{out_dir}/sidebets_flat")
    return summary, sidebets


def export_lake_jsonl(spark: SparkSession, lake_path: str, out_dir: str) -> None:
    """Envelope rows as JSONL, one directory per doc_type."""
    export_jsonl(read_event_lake(spark, lake_path), out_dir, by_doc_type=True)

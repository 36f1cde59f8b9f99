"""Streaming jobs: source → envelope → sinks (T5, T6, T9, T11, S5, S10).

The reference's live chain (service.py / sanitizer.py) as Structured
Streaming queries. Sources are file streams (JSONL directories) standing in
for the WebSocket feed — in production the same plans run off Kafka by
swapping the reader; every transformation below is source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectra_player_spark.streaming.stateful import TICK_SCHEMA


def read_tick_stream(spark: SparkSession, path: str) -> DataFrame:
    """S10 stand-in: stream of parsed gameStateUpdate rows from JSONL."""
    return spark.readStream.schema(TICK_SCHEMA).json(path)


def stream_to_lake(
    env_stream: DataFrame, out_path: str, checkpoint: str, trigger_seconds: int = 5
):
    """T9/S5: partitioned parquet sink with the reference's 5 s flush
    cadence (writer.py:102-160 buffer → trigger interval)."""
    return (
        env_stream.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("doc_type", "date")
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .outputMode("append")
        .start()
    )


def dedup_within_watermark(stream: DataFrame, key: str, ts_col: str, watermark: str = "10 minutes") -> DataFrame:
    """T5/D3: streaming dedup — the reference's seen-game_id LRU set
    (recording/src/dedup.py:16-138) becomes watermark-bounded keyed state."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark([key])


def channel_split(stream: DataFrame) -> dict[str, DataFrame]:
    """T6: typed channel fan-out (sanitizer.py:108-213) — one input stream,
    multiple filtered views; each can drive its own sink (or write all in
    one foreachBatch for a single pass)."""
    game = stream.where(F.col("active") | F.col("rugged")).select(
        "session_id", "seq", "ts_ms", "game_id", "price", "tick"
    )
    stats = stream.select(
        "session_id", "seq", "ts_ms", "game_id", "active", "rugged", "cooldown_timer"
    )
    history = stream.where(F.col("rugged")).select(
        "session_id", "seq", "ts_ms", "game_id", "server_seed"
    )
    return {"GAME": game, "STATS": stats, "HISTORY": history, "ALL": stream}


def windowed_event_rates(stream: DataFrame, window: str = "1 second") -> DataFrame:
    """T11: tumbling event-rate buckets with watermark-bounded state."""
    with_ts = stream.withColumn("event_time", F.timestamp_millis(F.col("ts_ms")))
    return (
        with_ts.withWatermark("event_time", "10 seconds")
        .groupBy(F.window("event_time", window).alias("w"), "game_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("bucket_start"), "game_id", "n")
    )


def annotate_trades(actions: DataFrame, phases: DataFrame) -> DataFrame:
    """T7: trade annotation — join player actions to the phase-stamped
    stream; sells during RUGGED are forced sells
    (rugs-sanitizer/src/trade_annotator.py:17-101)."""
    return actions.join(
        phases.select("session_id", "seq", "phase"), ["session_id", "seq"], "left"
    ).withColumn(
        "is_forced_sell",
        (F.col("action_type") == "sell") & (F.col("phase") == "RUGGED"),
    )

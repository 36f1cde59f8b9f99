"""Streaming throughput bench: rows/s through the stateful chain.

Generates a synthetic multi-feed tick corpus (JSONL, 250 ms cadence, a rug
every ~400 ticks so the state machine exercises every transition), then
measures wall-clock and rows/s for three jobs:

- phase_machine: applyInPandasWithState keyed by feed (T1/T4)
- sessionize_games: stateful episode builder with backfill (T2/T3)
- stateless chain: dedup_within_watermark + windowed_event_rates (T5/T11)

File-stream source + noop sink, so the number is engine + state-store
throughput, not sink cost. Feeds are independent state keys — the local
rows/s scales with executors until the state store dominates, which is the
property the reference's one-process chain (service.py) cannot have.

Usage: python tools/stream_bench.py [n_feeds] [ticks_per_feed]
Prints one JSON line: {"metric": "stream_rows_per_sec", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_MS = 1_700_000_000_000


def _write_corpus(path: str, n_feeds: int, n_ticks: int) -> int:
    """One JSONL file per feed (file-stream parallelism = file count)."""
    n = 0
    for f in range(n_feeds):
        rows = []
        game = 0
        for i in range(n_ticks):
            pos = i % 400
            if pos == 0:
                game += 1
                row = dict(presale=True)
            elif pos == 399:
                row = dict(rugged=True, seed=f"s-{game}")
            else:
                row = dict(active=True, price=1.0 + 0.001 * pos, tick=pos)
            rows.append(
                json.dumps(
                    {
                        "session_id": f"feed-{f}",
                        "seq": i,
                        "ts_ms": BASE_MS + 250 * i,
                        "game_id": f"g{f}-{game}",
                        "active": row.get("active", False),
                        "rugged": row.get("rugged", False),
                        "allow_pre_round_buys": row.get("presale", False),
                        "cooldown_timer": row.get("cooldown", 0),
                        "price": row.get("price"),
                        "tick": row.get("tick"),
                        "server_seed": row.get("seed"),
                        "backfill_ticks": None,
                        "backfill_prices": None,
                    }
                )
            )
            n += 1
        with open(os.path.join(path, f"feed_{f}.jsonl"), "w") as fh:
            fh.write("\n".join(rows) + "\n")
    return n


def _run(df, name: str) -> float:
    t0 = time.monotonic()
    q = (
        df.writeStream.format("noop")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return time.monotonic() - t0


def main() -> int:
    n_feeds = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_ticks = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000

    from pyspark.sql import functions as F

    from vectra_player_spark.session import get_spark
    from vectra_player_spark.streaming.jobs import (
        dedup_within_watermark,
        read_tick_stream,
        windowed_event_rates,
    )
    from vectra_player_spark.streaming.stateful import phase_machine, sessionize_games

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory() as d:
        total = _write_corpus(d, n_feeds, n_ticks)
        results = {}
        for name, job in (
            ("phase_machine", lambda s: phase_machine(read_tick_stream(s, d))),
            ("sessionize_games", lambda s: sessionize_games(read_tick_stream(s, d))),
            (
                # dedup + tumbling rates share ONE watermark (a chain of
                # stateful operators may not redefine it — the library fns
                # each set their own, correct standalone, so the chained
                # form is composed inline here)
                "dedup_plus_rates",
                lambda s: (
                    read_tick_stream(s, d)
                    .withColumn("event_time", F.timestamp_millis(F.col("ts_ms")))
                    .withColumn(
                        "dedup_key",
                        F.concat_ws("-", F.col("session_id"), F.col("seq")),
                    )
                    .withWatermark("event_time", "10 seconds")
                    .dropDuplicatesWithinWatermark(["dedup_key"])
                    .groupBy(
                        F.window("event_time", "1 second").alias("w"), "game_id"
                    )
                    .agg(F.count(F.lit(1)).alias("n"))
                    .select(F.col("w.start").alias("bucket_start"), "game_id", "n")
                ),
            ),
        ):
            sec = _run(job(spark), name)
            results[name] = {
                "sec": round(sec, 2),
                "rows_per_sec": int(total / sec),
            }
        print(
            json.dumps(
                {
                    "metric": "stream_rows_per_sec",
                    "n_feeds": n_feeds,
                    "ticks_per_feed": n_ticks,
                    "total_rows": total,
                    "jobs": results,
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""State-store scale audit: state size vs key cardinality for the two
heavyweight stateful operators (phase_machine, sessionize_games) on
RocksDB, plus TTL-eviction behavior.

The round-3 throughput bench (tools/stream_bench.py) covered RATE
(50-97k rows/s) but not state GROWTH: both operators key by feed, so an
unbounded feed population is unbounded state unless a timeout policy
evicts idle keys. This tool measures, per key-count tier:

- numRowsTotal          — keys resident in the state store
- memoryUsedBytes       — RocksDB memtable+block-cache usage
- rocksdbSstFileSize    — on-disk SST bytes (the durable state footprint)
- checkpoint dir bytes  — changelog+snapshot cost per commit
- batch wall time       — processing cost at that cardinality
- post-TTL numRowsTotal — the same corpus with idle_ttl_ms set, after a
  follow-up batch fires the lapsed timeouts (should collapse to the
  still-active key count)

Usage: python tools/state_audit.py [tiers...]   (default 1000 10000 100000)
Prints one JSON line per (operator, tier).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_MS = 1_700_000_000_000
TICKS_PER_KEY = 10
ROCKS = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def _gen_corpus(spark, path: str, n_keys: int) -> None:
    """n_keys feeds x TICKS_PER_KEY ticks of one in-flight game each
    (active ticks only — no rug boundary, so sessionize state stays
    resident: the worst case the audit is about)."""
    from pyspark.sql import functions as F

    n = n_keys * TICKS_PER_KEY
    (
        spark.range(n)
        .select(
            F.concat(F.lit("feed-"), (F.col("id") % n_keys)).alias("session_id"),
            (F.col("id") / n_keys).cast("long").alias("seq"),
            (F.lit(BASE_MS) + (F.col("id") / n_keys).cast("long") * 250).alias("ts_ms"),
            F.concat(F.lit("g"), (F.col("id") % n_keys)).alias("game_id"),
            F.lit(True).alias("active"),
            F.lit(False).alias("rugged"),
            F.lit(False).alias("allow_pre_round_buys"),
            F.lit(0).cast("long").alias("cooldown_timer"),
            (F.lit(1.0) + (F.col("id") / n_keys).cast("long") * 0.001).alias("price"),
            (F.col("id") / n_keys).cast("long").alias("tick"),
            F.lit(None).cast("string").alias("server_seed"),
            F.lit(None).cast("array<long>").alias("backfill_ticks"),
            F.lit(None).cast("array<double>").alias("backfill_prices"),
        )
        .repartition(16)
        .write.mode("overwrite")
        .json(path)
    )


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _state_metrics(progress: dict) -> dict:
    op = progress["stateOperators"][0]
    custom = op.get("customMetrics", {})
    return {
        "numRowsTotal": op.get("numRowsTotal"),
        "memoryUsedBytes": op.get("memoryUsedBytes"),
        "rocksdbSstFileSize": custom.get("rocksdbSstFileSize"),
        "rocksdbTotalMemoryUsageBytes": custom.get("rocksdbTotalMemoryUsageBytes"),
    }


def _audit_operator(spark, op_name: str, make_df, src: str, n_keys: int) -> dict:
    ckpt = tempfile.mkdtemp(prefix=f"audit_ckpt_{op_name}_")
    t0 = time.monotonic()
    q = (
        make_df()
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    wall = time.monotonic() - t0
    metrics = _state_metrics(q.lastProgress)
    q.stop()
    out = {
        "operator": op_name,
        "n_keys": n_keys,
        "rows_in": n_keys * TICKS_PER_KEY,
        "batch_wall_sec": round(wall, 2),
        "checkpoint_bytes": _du(ckpt),
        **metrics,
    }
    shutil.rmtree(ckpt, ignore_errors=True)
    return out


def _audit_ttl(spark, op_name: str, make_df, src_dir: str, n_keys: int) -> int:
    """Run with idle_ttl_ms; once the corpus drains, timer batches fire
    the lapsed timeouts and the whole key population evicts. Returns the
    post-eviction numRowsTotal (expected: 0). ProcessingTimeTimeout
    queries run continuous timer batches, so the observation method is
    polling lastProgress, never processAllAvailable."""
    ckpt = tempfile.mkdtemp(prefix=f"audit_ttl_{op_name}_")
    q = (
        make_df()
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )

    def rows():
        p = q.lastProgress
        return p["stateOperators"][0]["numRowsTotal"] if p and p.get("stateOperators") else None

    deadline = time.time() + 180
    seen_full = False
    n = None
    while time.time() < deadline:
        n = rows()
        if n == n_keys:
            seen_full = True
        if seen_full and n == 0:
            break
        time.sleep(0.5)
    q.stop()
    shutil.rmtree(ckpt, ignore_errors=True)
    return n


def _checkpoint_inventory(ckpt: str) -> dict:
    """Aggregate the RocksDB checkpoint's state files by kind: .zip =
    full snapshot uploads, .changelog = per-commit deltas. The split IS
    the changelog-checkpointing story: with changelog enabled, most
    versions commit a small delta and snapshots happen at the maintenance
    cadence; without it, every version re-uploads a full snapshot."""
    kinds: dict[str, list[int]] = {}
    for root, _dirs, files in os.walk(os.path.join(ckpt, "state")):
        for f in files:
            ext = f.split(".")[-1]
            try:
                size = os.path.getsize(os.path.join(root, f))
            except OSError:
                continue
            kinds.setdefault(ext, []).append(size)
    return {
        ext: {"n": len(sizes), "bytes": sum(sizes)}
        for ext, sizes in sorted(kinds.items())
    }


def _audit_cadence(spark, op_name: str, make_df, n_keys: int, changelog: bool) -> dict:
    """Multi-commit run (maxFilesPerTrigger=2 over the 16-file corpus → 8
    commits) with changelog checkpointing on/off; reports the checkpoint's
    snapshot-vs-delta byte split and total commit wall time."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        str(changelog).lower(),
    )
    ckpt = tempfile.mkdtemp(prefix=f"audit_cad_{op_name}_")
    t0 = time.monotonic()
    q = (
        make_df()
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    wall = time.monotonic() - t0
    n_batches = q.lastProgress["batchId"] + 1 if q.lastProgress else None
    metrics = _state_metrics(q.lastProgress)
    q.stop()
    out = {
        "mode": "changelog" if changelog else "snapshot",
        "operator": op_name,
        "n_keys": n_keys,
        "n_commits": n_batches,
        "wall_sec": round(wall, 2),
        "checkpoint_bytes_total": _du(ckpt),
        "state_files": _checkpoint_inventory(ckpt),
        "rocksdbSstFileSize": metrics.get("rocksdbSstFileSize"),
    }
    shutil.rmtree(ckpt, ignore_errors=True)
    return out


def cadence_main(tiers: list[int], only_op: str | None = None) -> int:
    from pyspark.sql import functions as F  # noqa: F401

    from vectra_player_spark.session import get_spark
    from vectra_player_spark.streaming.jobs import read_tick_stream
    from vectra_player_spark.streaming.stateful import phase_machine, sessionize_games

    spark = get_spark("state_audit_cadence")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKS)

    for n_keys in tiers:
        src = tempfile.mkdtemp(prefix=f"audit_cad_src_{n_keys}_")
        _gen_corpus(spark, src, n_keys)

        def stream():
            return (
                spark.readStream.format("json")
                .schema(read_tick_stream(spark, src).schema)
                .option("maxFilesPerTrigger", "2")
                .load(src)
            )

        for op_name, op in (("phase_machine", phase_machine),
                            ("sessionize_games", sessionize_games)):
            if only_op is not None and op_name != only_op:
                continue
            for changelog in (False, True):
                res = _audit_cadence(
                    spark, op_name, lambda: op(stream()), n_keys, changelog
                )
                print(json.dumps(res), flush=True)
        shutil.rmtree(src, ignore_errors=True)
    spark.stop()
    return 0


def main() -> int:
    if "--cadence" in sys.argv:
        sys.argv.remove("--cadence")
        only_op = None
        if "--only-op" in sys.argv:
            i = sys.argv.index("--only-op")
            only_op = sys.argv[i + 1]
            del sys.argv[i : i + 2]
        return cadence_main(
            [int(a) for a in sys.argv[1:]] or [10_000, 100_000], only_op
        )
    tiers = [int(a) for a in sys.argv[1:]] or [1_000, 10_000, 100_000]

    from vectra_player_spark.session import get_spark
    from vectra_player_spark.streaming.jobs import read_tick_stream
    from vectra_player_spark.streaming.stateful import phase_machine, sessionize_games

    spark = get_spark("state_audit")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKS)

    for n_keys in tiers:
        src = tempfile.mkdtemp(prefix=f"audit_src_{n_keys}_")
        _gen_corpus(spark, src, n_keys)
        for op_name, op in (("phase_machine", phase_machine),
                            ("sessionize_games", sessionize_games)):
            res = _audit_operator(
                spark, op_name,
                lambda: op(read_tick_stream(spark, src)), src, n_keys,
            )
            # fresh src copy for the TTL arm (its wakeup file must not
            # pollute the next operator's run)
            ttl_src = tempfile.mkdtemp(prefix=f"audit_ttlsrc_{n_keys}_")
            for f in os.listdir(src):
                if f.endswith(".json") or f.endswith(".jsonl"):
                    shutil.copy(os.path.join(src, f), ttl_src)
            res["numRowsTotal_after_ttl"] = _audit_ttl(
                spark, op_name,
                lambda: op(read_tick_stream(spark, ttl_src), idle_ttl_ms=1000),
                ttl_src, n_keys,
            )
            shutil.rmtree(ttl_src, ignore_errors=True)
            print(json.dumps(res), flush=True)
        shutil.rmtree(src, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

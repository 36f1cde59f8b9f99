"""Streaming near-duplicate suppression: the MinHash-LSH dedup mandate
extended to a live document feed.

The batch family (operators/dedup.py) answers "which docs in this corpus
are near-dups of each other"; a training-data INGESTION pipeline needs the
online form: "is this incoming doc a near-dup of anything already
accepted" (the reference's rag_ingester novelty gate,
src/services/rag/ingester.py:140-145, does this with exact ids — LSH makes
it robust to near-identical re-broadcasts, the 12.5× duplication the
reference corpus documents).

Design (foreachBatch over a persistent band store):

1. Per batch, compute the map-side LSH band table (no shuffle, same code
   path as the batch operator — minhash_band_table).
2. A doc is SUPPRESSED if any of its bands exists in the accepted-band
   store (left-semi probe), or if it shares a band with an
   earlier-accepted doc of the same batch (min-id-per-bucket, applied
   iteratively within the batch would be exact; one pass keeps any doc
   that is the minimum id in EVERY bucket it occupies — docs suppressed
   by a non-novel doc are a documented approximation the store probe
   corrects on the next batch, since the novel keeper's bands are what
   lands in the store).
3. Novel docs' bands are appended to the store under a batch=N
   subdirectory with mode=overwrite — re-processing a batch after a
   restart rewrites the identical content, so the store append is
   idempotent (exactly-once effect on at-least-once foreachBatch).

At scale the store is a parquet table keyed by (band_idx, band_hash); the
probe is a broadcast or shuffle semi-join on that key, and nothing ever
funnels through the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from vectra_player_spark.operators.dedup import minhash_band_table


def _bands_store_path(store_dir: str) -> str:
    return os.path.join(store_dir, "bands")


def _read_store(spark, store_dir: str, batch_id: int) -> DataFrame | None:
    """Accepted bands from every batch EXCEPT the current one. Excluding
    the batch's own partition is what makes replay idempotent: on an
    at-least-once re-run the store already contains this batch's bands,
    and probing against them would suppress every doc the first attempt
    accepted (then overwrite the partition with nothing — data loss).
    The `batch` partition column comes from the batch=N subdirectories."""
    path = _bands_store_path(store_dir)
    # Missing path (first batch) is checked EXPLICITLY; any other read
    # failure (permissions, corrupt footer, transient FS error) must
    # propagate — swallowing it would silently disable cross-batch
    # suppression and admit near-dups into novel/. The check goes through
    # the Hadoop FileSystem API so remote lake stores (s3a://, hdfs://)
    # resolve correctly — os.path.isdir is local-only and would report
    # every remote store as absent, disabling suppression on a cluster.
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return None
    store = spark.read.parquet(path)
    return store.where(F.col("batch") != batch_id).select("band_idx", "band_hash")


def process_batch(batch: DataFrame, batch_id: int, store_dir: str) -> None:
    """One ingestion step: suppress near-dups, persist novel docs + bands."""
    spark = batch.sparkSession
    bands = minhash_band_table(batch)

    store = _read_store(spark, store_dir, batch_id)
    if store is not None:
        seen = (
            bands.join(store, ["band_idx", "band_hash"], "left_semi")
            .select("doc_id")
            .distinct()
        )
        fresh = batch.join(seen, "doc_id", "left_anti")
        fresh_bands = bands.join(seen, "doc_id", "left_anti")
    else:
        fresh, fresh_bands = batch, bands

    # Intra-batch keep-first: a doc survives only if it is the minimum
    # doc_id in every band bucket it occupies within the batch.
    bucket_min = fresh_bands.groupBy("band_idx", "band_hash").agg(
        F.min("doc_id").alias("min_id")
    )
    losers = (
        fresh_bands.join(bucket_min, ["band_idx", "band_hash"])
        .where(F.col("doc_id") != F.col("min_id"))
        .select("doc_id")
        .distinct()
    )
    novel = fresh.join(losers, "doc_id", "left_anti")
    novel_bands = fresh_bands.join(losers, "doc_id", "left_anti")

    # Idempotent appends: overwrite this batch's own subdirectory.
    novel.write.mode("overwrite").parquet(
        os.path.join(store_dir, "novel", f"batch={batch_id}")
    )
    novel_bands.write.mode("overwrite").parquet(
        os.path.join(_bands_store_path(store_dir), f"batch={batch_id}")
    )


def compact_band_store(
    spark, store_dir: str, before_batch_id: int, target_files: int = 1
) -> int:
    """Fold the per-batch band partitions older than ``before_batch_id``
    into ONE consolidated negative-generation partition (batch=-1, then
    batch=-2, ...).

    The batch=N layout exists for replay idempotency (process_batch
    overwrites its own partition on an at-least-once re-run), but a
    long-lived ingest accumulates one directory per micro-batch and the
    probe's listing cost grows without bound — the classic small-file
    problem, here with a correctness constraint on top:

    SAFETY RULE: only batches that can never replay may be folded.
    A batch replays only if its foreachBatch epoch never committed, so
    pass ``before_batch_id`` <= the checkpoint's last COMMITTED batch id;
    everything strictly below it is immutable history. Folding a
    replayable batch would be a data-loss bug: the replay overwrites
    batch=N with fresh content while the folded copy of the OLD content
    keeps suppressing the very docs the replay is re-admitting.

    CRASH ATOMICITY (round-5 ADVICE fix): history is never absent. The
    consolidated copy is staged, then renamed IN (one rename) as a NEW
    generation ``batch=-(G+1)`` while every source dir is still present;
    only after that are the folded dirs deleted. A probe or hard kill at
    any point sees either the old dirs, the old dirs PLUS the new
    generation (duplicate rows — harmless to an existence semi-join), or
    the new generation alone. The interrupted-fold leftovers (surviving
    old dirs, stale _compact_tmp) are reclaimed by the next compaction
    run, which folds everything < before_batch_id again (dropDuplicates
    keeps re-folds from growing the store). Negative generations sort
    below every real epoch, so the probe's ``batch != current`` exclusion
    never masks folded history.

    CONCURRENCY CONTRACT: run between micro-batches (or with the ingest
    paused) relative to process_batch WRITES — folding must not race a
    replay overwriting a batch=N source dir. Concurrent probes (reads)
    are safe under this protocol. Maintenance op, not a background
    thread. Returns the number of batch directories folded.
    """
    import shutil
    import uuid

    path = _bands_store_path(store_dir)
    if not os.path.isdir(path):  # driver-side maintenance op: local lake
        return 0
    tmp_root = os.path.join(store_dir, "_compact_tmp")
    shutil.rmtree(tmp_root, ignore_errors=True)  # stale staging from a crash
    gens = [
        int(d.split("=", 1)[1])
        for d in os.listdir(path)
        if d.startswith("batch=")
    ]
    old = [g for g in gens if g < before_batch_id]
    if len(old) <= 1:
        return 0  # nothing to fold (or already a single consolidated dir)
    next_gen = min(min(gens), 0) - 1
    staged = os.path.join(tmp_root, uuid.uuid4().hex)
    merged = (
        spark.read.parquet(path)
        .where(F.col("batch") < before_batch_id)
        .select("band_idx", "band_hash", "doc_id")
        .dropDuplicates(["band_idx", "band_hash", "doc_id"])
    )
    merged.coalesce(target_files).write.mode("overwrite").parquet(staged)
    # One rename makes the consolidated generation live while every source
    # dir still exists — no window without history.
    shutil.move(staged, os.path.join(path, f"batch={next_gen}"))
    for g in old:
        shutil.rmtree(os.path.join(path, f"batch={g}"), ignore_errors=True)
    shutil.rmtree(tmp_root, ignore_errors=True)
    return len(old)


def neardup_suppress_stream(
    docs: DataFrame, store_dir: str, checkpoint_dir: str
) -> StreamingQuery:
    """Start the novelty-gated ingestion stream over a (doc_id, text)
    streaming DataFrame. Novel docs land under {store_dir}/novel/,
    accepted bands under {store_dir}/bands/."""
    return (
        docs.writeStream.foreachBatch(
            lambda b, i: process_batch(b, i, store_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )

"""Streaming LM-perplexity admission gate: the CCNet quality cut applied
at ingestion time.

The batch family (plans/queries_lm) answers "how does each corpus doc
score under the reference LM"; a training-data ingestion pipeline needs
the online form: "does this incoming doc clear the quality bar RIGHT
NOW, against the current model". The model is the persisted LM counts
store (operators/sigstore kind 'lm') — a vocabulary-sized parquet table
of sum-mergeable partials that the ingest spine watermark-appends as the
lake grows.

Design (foreachBatch over the counts store):

1. Per batch, RE-READ the counts store and groupBy-SUM its partials —
   the enrich_stream_with_dim discipline (streaming/jobs): a static join
   planned at stream start would freeze the model at its stream-launch
   state; re-reading inside foreachBatch picks up every append the
   ingest spine has committed since.
2. Score the batch with THE SAME scoring core the batch query uses
   (lm_perdoc_scores(model=...)) — no second implementation to drift.
3. Route: xent_micro <= threshold → accepted/batch=N, else (or
   unscorable: fewer than two tokens, no LM evidence — a quality gate
   rejects what it cannot score) → rejected/batch=N. Batch subdirs are
   written with overwrite, so at-least-once foreachBatch replays rewrite
   identical content — idempotent, same protocol as the neardup gate's
   band store.

At 100 TB the per-batch cost is the batch's own tokenize+score (map-side
joins against the broadcast-sized model) — nothing corpus-sized runs in
the hot path, and nothing funnels through the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def _store_exists(spark, counts_path: str) -> bool:
    """Hadoop-FS existence probe (works on s3a/hdfs, the neardup gate's
    _read_store discipline): an absent or not-yet-built store must not
    kill the stream."""
    from py4j.protocol import Py4JError

    try:
        jp = spark._jvm.org.apache.hadoop.fs.Path(counts_path)
        fs = jp.getFileSystem(spark._jsc.hadoopConfiguration())
        return fs.exists(jp)
    except (Py4JError, AttributeError, RuntimeError):
        return False


def score_batch_against_store(
    batch: DataFrame, counts_path: str
) -> DataFrame:
    """The full batch plus an xent_micro column: the batch query's
    scoring core against the CURRENT store contents. Docs the LM cannot
    score carry NULL — NULL text, fewer than two tokens, or NO STORE at
    all (absent/not-yet-built: no model means no quality evidence, and a
    quality gate fails CLOSED — everything routes to rejected until the
    ingest spine commits counts)."""
    from vectra_player_spark.plans.queries_lm import lm_perdoc_scores

    spark = batch.sparkSession
    if not _store_exists(spark, counts_path):
        return batch.withColumn(
            "xent_micro", F.lit(None).cast("bigint")
        )
    model = (
        spark.read.parquet(counts_path)
        .groupBy("lang", "w1", "w2")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )
    scored = lm_perdoc_scores(
        batch.select("doc_id", "lang", "text"), model=model
    )
    return batch.join(
        scored.select("doc_id", "xent_micro"), "doc_id", "left"
    )


def process_lm_batch(
    batch: DataFrame,
    batch_id: int,
    counts_path: str,
    out_dir: str,
    threshold_micro: int,
) -> None:
    from vectra_player_spark.session import pin_mark, release_new_pins

    # two sinks below — score once; the scoring core pins its
    # vocabulary-sized relations, so release THIS batch's pins once the
    # checkpoint holds the result (a long-running gate would otherwise
    # leak cached relations per micro-batch).
    mark = pin_mark()
    try:
        scored = score_batch_against_store(
            batch, counts_path
        ).localCheckpoint(eager=True)
    finally:
        release_new_pins(mark)
    ok = F.col("xent_micro").isNotNull() & (
        F.col("xent_micro") <= threshold_micro
    )
    scored.where(ok).write.mode("overwrite").parquet(
        f"{out_dir}/accepted/batch={batch_id}"
    )
    scored.where(~F.coalesce(ok, F.lit(False))).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/rejected/batch={batch_id}")


def lm_gate_stream(
    docs: DataFrame,
    counts_path: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold_micro: int,
) -> StreamingQuery:
    """Start the LM-gated ingestion stream over a (doc_id, lang, text)
    streaming DataFrame."""
    return (
        docs.writeStream.foreachBatch(
            lambda b, i: process_lm_batch(
                b, i, counts_path, out_dir, threshold_micro
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )

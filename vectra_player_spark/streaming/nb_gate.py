"""Streaming NB metadata-consistency gate: the classifier applied at
ingestion time.

The batch family (plans/queries_classify) answers "does each corpus
doc's declared lang agree with the NB classifier"; a training-data
ingestion pipeline needs the online form: "does this incoming doc's
metadata check out RIGHT NOW, against the current model". The model is
the persisted NB counts store (operators/sigstore kind 'nb') — a
vocabulary-sized parquet table of sum-mergeable partials the ingest
spine watermark-appends as the lake grows.

Same design as the LM gate (streaming/lm_gate), which documents the
three rules this file inherits:
1. RE-READ the counts store per batch inside foreachBatch (the
   enrich_stream_with_dim discipline — a static join would freeze the
   model at stream launch).
2. Score with THE SAME core the batch query uses
   (nb_predictions(model=..., score_all=True)) — no second
   implementation to drift.
3. Fail CLOSED and stay replay-idempotent: no store / unscorable doc →
   rejected; per-batch subdirs written with overwrite so at-least-once
   replays rewrite identical content.

At 100 TB the per-batch cost is the batch's own tokenize+score
(map-side joins against the broadcast-sized model) — nothing
corpus-sized runs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from vectra_player_spark.streaming.lm_gate import _store_exists


def classify_batch_against_store(
    batch: DataFrame, counts_path: str
) -> DataFrame:
    """The full batch plus (predicted, correct) columns: the batch
    query's scoring core against the CURRENT store contents. Docs the
    classifier cannot score carry NULLs — NULL text/lang, or NO STORE at
    all (absent/not-yet-built: no model means no evidence, and the gate
    fails CLOSED — everything routes to rejected until the ingest spine
    commits counts)."""
    from vectra_player_spark.plans.queries_classify import nb_predictions

    spark = batch.sparkSession
    if not _store_exists(spark, counts_path):
        return batch.withColumn(
            "predicted", F.lit(None).cast("string")
        ).withColumn("correct", F.lit(None).cast("boolean"))
    # raw partials — nb_predictions' model arm does the sum-merge
    model = spark.read.parquet(counts_path).select("cand", "tok", "c")
    preds = nb_predictions(
        batch.select("doc_id", "lang", "text"), score_all=True, model=model
    )
    return batch.join(
        preds.select("doc_id", "predicted", "correct"), "doc_id", "left"
    )


def process_nb_batch(
    batch: DataFrame, batch_id: int, counts_path: str, out_dir: str
) -> None:
    from vectra_player_spark.session import pin_mark, release_new_pins

    # two sinks below — score once; the scoring core pins its rep-space
    # frames, so release THIS batch's pins once the checkpoint holds the
    # result (a long-running gate would otherwise leak 3 cached
    # relations per micro-batch).
    mark = pin_mark()
    try:
        scored = classify_batch_against_store(
            batch, counts_path
        ).localCheckpoint(eager=True)
    finally:
        release_new_pins(mark)
    ok = F.coalesce(F.col("correct"), F.lit(False))
    scored.where(ok).write.mode("overwrite").parquet(
        f"{out_dir}/accepted/batch={batch_id}"
    )
    scored.where(~ok).write.mode("overwrite").parquet(
        f"{out_dir}/rejected/batch={batch_id}"
    )


def nb_gate_stream(
    docs: DataFrame,
    counts_path: str,
    out_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Start the NB-gated ingestion stream over a (doc_id, lang, text)
    streaming DataFrame: docs whose declared lang the current model
    agrees with route to accepted/, everything else to rejected/."""
    return (
        docs.writeStream.foreachBatch(
            lambda b, i: process_nb_batch(b, i, counts_path, out_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )

"""Multimodal query surface: the Arrow-batched decode pipeline verified
against SQL.

The container has no media codecs, so the decode step is the documented
deterministic stub (operators/multimodal.py) — md5 arithmetic over the
payload bytes. That determinism is an asset: DuckDB can reproduce
n_bytes/width/height/luma/phash (and the per-frame digests) in pure SQL,
so the ENTIRE Spark-side plumbing — binary column construction, Arrow
batch transfer, ``mapInPandas`` schema and batching, the explode shape of
frame sampling — is hash-checked cross-engine, not just unit-tested. On a
provisioned cluster only the stub body changes (PIL/ffmpeg at the marked
seam); every plan shape these queries pin stays identical.

Payloads are fabricated from the `documents` table: content =
encode(text), one image per doc; video duration derives from n_chars so
the frame explode is data-dependent but deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectra_player_spark.operators.multimodal import image_features, sample_video_frames
from vectra_player_spark.plans.registry import register
from vectra_player_spark.tables import t


def _media_from_docs(spark: SparkSession, sf_dir: str, kind: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        # video stub reads duration_ms from metadata; derive it from the
        # row so the frame count is data-dependent but deterministic
        F.create_map(
            F.lit("duration_ms"), (F.col("n_chars") % 5000).cast("string")
        ).alias("meta"),
    )


_IMAGE_FEATURES_ORACLE = """
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(64 + CAST('0x' || substring(md5(text), 1, 4) AS BIGINT) % 1024
            AS INT) AS width,
       CAST(64 + CAST('0x' || substring(md5(text), 5, 4) AS BIGINT) % 1024
            AS INT) AS height,
       ROUND((CAST('0x' || substring(md5(text), 9, 4) AS BIGINT) % 10000)
             / 10000.0, 6) AS mean_luma,
       substring(md5(text), 1, 16) AS phash
FROM documents
"""


@register(
    "multimodal_image_features",
    oracle=_IMAGE_FEATURES_ORACLE,
    tags=("multimodal",),
    survey_ref="multimodal mandate: binary columns + Arrow-batched decode/feature stage",
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media_from_docs(spark, sf_dir, "image")
    return image_features(media, decode_stub=True).select(
        "media_id",
        "n_bytes",
        "width",
        "height",
        F.round("mean_luma", 6).alias("mean_luma"),
        "phash",
    )


_FRAME_SAMPLE_ORACLE = """
WITH m AS (
  SELECT CAST(doc_id AS VARCHAR) AS media_id,
         md5(text) AS base,
         n_chars % 5000 AS duration_ms
  FROM documents
)
SELECT media_id,
       CAST(i AS INT) AS frame_idx,
       CAST(i * 1000 AS BIGINT) AS frame_ts_ms,
       substring(md5(base || ':' || CAST(i AS VARCHAR)), 1, 16) AS frame_digest
FROM m, unnest(generate_series(0, CAST(ceil(duration_ms / 1000.0) AS BIGINT) - 1))
       AS u(i)
WHERE duration_ms > 0
"""


@register(
    "multimodal_frame_sample",
    oracle=_FRAME_SAMPLE_ORACLE,
    tags=("multimodal",),
    survey_ref="multimodal mandate: video frame sampling (1 row per sampled frame)",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media_from_docs(spark, sf_dir, "video")
    return sample_video_frames(media, every_ms=1000, decode_stub=True)


_AUDIO_FEATURES_ORACLE = """
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(8000 * (1 + CAST('0x' || substring(md5(text), 13, 4) AS BIGINT) % 4)
            AS INT) AS sample_rate,
       CAST(octet_length(encode(text)) * 4 AS BIGINT) AS n_samples,
       CAST(FLOOR(octet_length(encode(text)) * 4 * 1000.0
                  / (8000 * (1 + CAST('0x' || substring(md5(text), 13, 4) AS BIGINT) % 4)))
            AS BIGINT) AS duration_ms,
       ROUND((CAST('0x' || substring(md5(text), 17, 4) AS BIGINT) % 10000)
             / 10000.0, 6) AS rms,
       substring(md5(text), 17, 16) AS spec_digest
FROM documents
"""


@register(
    "multimodal_audio_features",
    oracle=_AUDIO_FEATURES_ORACLE,
    tags=("multimodal",),
    survey_ref="multimodal mandate: audio decode/feature stage (stubbed codec, real plumbing)",
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vectra_player_spark.operators.multimodal import audio_features

    media = _media_from_docs(spark, sf_dir, "audio")
    return audio_features(media, decode_stub=True).select(
        "media_id",
        "n_bytes",
        "sample_rate",
        "n_samples",
        "duration_ms",
        F.round("rms", 6).alias("rms"),
        "spec_digest",
    )

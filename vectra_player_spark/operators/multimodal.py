"""Multimodal column plumbing (BASELINE.json mandate).

Image/audio/video travel as opaque `binary` columns with typed metadata
structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched `mapInPandas` stages. The media libraries are NOT in this
container, so the codec step is stubbed two ways:

- `decode_stub=True` (default): a deterministic fake decoder that fabricates
  plausible metadata from the bytes (real plumbing: schema, batching,
  partition flow — fake pixels), used by tests.
- `decode_stub=False`: raises NotImplementedError at the exact seam where
  PIL/ffmpeg would be called on a properly-provisioned cluster.

Scale notes: binary payloads dominate row size, so the stages keep
projection narrow (never carry `content` past the stage that needs it) and
rebalance by byte budget, not row count (`target_partition_bytes`).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),  # opaque payload
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id string, n_bytes long, width int, height int, "
    "mean_luma double, phash string"
)


def rebalance_by_bytes(media: DataFrame, target_partition_bytes: int = 128 * 1024 * 1024) -> DataFrame:
    """Repartition so each task holds ~target bytes of payload — row-count
    partitioning is wrong when rows are megabytes each."""
    total = media.select(F.sum(F.length("content"))).collect()[0][0] or 0
    n_parts = max(1, int(total // target_partition_bytes) + 1)
    return media.repartition(n_parts)


def image_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + feature-extract images. Stub fabricates deterministic
    dimensions/luma/phash from the bytes; the real path calls PIL at the
    marked seam."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                content = bytes(r.content) if r.content is not None else b""
                if not decode_stub:
                    # Real implementation seam:
                    #   from PIL import Image; img = Image.open(io.BytesIO(content))
                    raise NotImplementedError(
                        "image decode requires PIL — not provisioned in this container"
                    )
                digest = hashlib.md5(content).hexdigest()
                w = 64 + int(digest[:4], 16) % 1024
                h = 64 + int(digest[4:8], 16) % 1024
                luma = (int(digest[8:12], 16) % 10000) / 10000.0
                rows.append((r.media_id, len(content), w, h, luma, digest[:16]))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_bytes", "width", "height", "mean_luma", "phash"],
            )

    return media.where(F.col("kind") == "image").select("media_id", "content").mapInPandas(
        extract, IMAGE_FEATURES_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = (
    "media_id string, n_bytes long, sample_rate int, n_samples long, "
    "duration_ms long, rms double, spec_digest string"
)


def audio_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + feature-extract audio. Stub fabricates a deterministic
    sample rate / duration / RMS / spectrogram digest from the bytes; the
    real path calls soundfile/librosa at the marked seam. Same Arrow-batched
    mapInPandas shape as image_features — the codec swap changes only the
    per-row body."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                content = bytes(r.content) if r.content is not None else b""
                if not decode_stub:
                    # Real implementation seam:
                    #   import soundfile; data, rate = soundfile.read(io.BytesIO(content))
                    raise NotImplementedError(
                        "audio decode requires soundfile/librosa — not provisioned here"
                    )
                digest = hashlib.md5(content).hexdigest()
                rate = 8000 * (1 + int(digest[12:16], 16) % 4)
                n_samples = len(content) * 4
                duration_ms = n_samples * 1000 // rate
                rms = (int(digest[16:20], 16) % 10000) / 10000.0
                rows.append(
                    (r.media_id, len(content), rate, n_samples, duration_ms, rms, digest[16:32])
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_bytes", "sample_rate", "n_samples",
                    "duration_ms", "rms", "spec_digest",
                ],
            )

    return media.where(F.col("kind") == "audio").select("media_id", "content").mapInPandas(
        extract, AUDIO_FEATURES_SCHEMA
    )


FRAME_SAMPLE_SCHEMA = "media_id string, frame_idx int, frame_ts_ms long, frame_digest string"


def sample_video_frames(media: DataFrame, every_ms: int = 1000, decode_stub: bool = True) -> DataFrame:
    """Frame sampling: one output row per sampled frame. Stub derives a
    deterministic frame count from metadata (`meta['duration_ms']`)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                if not decode_stub:
                    raise NotImplementedError(
                        "video decode requires ffmpeg — not provisioned in this container"
                    )
                duration = int((r.meta or {}).get("duration_ms", "0"))
                content = bytes(r.content) if r.content is not None else b""
                base = hashlib.md5(content).hexdigest()
                for i, ts in enumerate(range(0, duration, every_ms)):
                    fd = hashlib.md5(f"{base}:{i}".encode()).hexdigest()[:16]
                    rows.append((r.media_id, i, ts, fd))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_ts_ms", "frame_digest"]
            )

    return media.where(F.col("kind") == "video").select(
        "media_id", "content", "meta"
    ).mapInPandas(sample, FRAME_SAMPLE_SCHEMA)

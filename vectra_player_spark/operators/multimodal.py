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


# --------------------------------------------------------------------------
# REAL audio arm (round-9): WAV is a stdlib-parseable container (`wave`),
# so the audio decode seam gets a real implementation with no external
# codecs — header fields (rate, frames, channels, width) from the RIFF
# chunks, samples from the PCM payload. Image/video keep their documented
# PIL/ffmpeg stubs; this is the one modality the container can decode for
# real.
# --------------------------------------------------------------------------

WAV_FEATURES_SCHEMA = (
    "media_id string, n_bytes long, sample_rate int, n_samples long, "
    "duration_ms long, rms double, pcm_digest string"
)

# Deterministic synth parameters shared with the oracle SQL
# (plans/queries_multimodal): sample s_i = ((doc_id·31 + i·7919) mod 2001)
# − 1000 — an integer waveform both engines can enumerate exactly.
WAV_SYNTH_RATE_BASE = 8000
WAV_SYNTH_FRAME_BASE = 256
WAV_SYNTH_FRAME_MOD = 1024


def synth_pcm16_wav(keys: DataFrame) -> DataFrame:
    """Fabricate REAL mono PCM16 WAV payloads from (doc_id, n_chars) —
    the lake's stand-in for an ingest source of actual audio files. The
    bytes are a genuine RIFF/fmt/data container (stdlib `wave` writer);
    rate and frame count derive from the row, samples from the shared
    synth formula, so an oracle can predict every decoded value without
    parsing bytes. Output rows are MEDIA_SCHEMA-shaped."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave as wavemod

        import numpy as np

        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                did = int(r.doc_id)
                rate = WAV_SYNTH_RATE_BASE * (1 + did % 4)
                n = WAV_SYNTH_FRAME_BASE + int(r.n_chars) % WAV_SYNTH_FRAME_MOD
                i = np.arange(n, dtype=np.int64)
                samples = ((did * 31 + i * 7919) % 2001 - 1000).astype("<i2")
                buf = io.BytesIO()
                with wavemod.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(rate)
                    w.writeframes(samples.tobytes())
                rows.append(
                    (str(did), "audio", buf.getvalue(), "audio/wav", None)
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "content", "mime", "meta"]
            )

    return keys.select("doc_id", "n_chars").mapInPandas(
        encode, MEDIA_SCHEMA
    )


def wav_features(media: DataFrame) -> DataFrame:
    """REAL audio decode + features — the un-stubbed twin of
    audio_features for WAV payloads: sample rate and frame count read
    from the parsed RIFF header, duration and RMS computed from the
    decoded PCM samples, and pcm_digest = md5 over the decoded sample
    values (comma-joined ints in frame order) so an oracle can verify
    the DECODING, not just the header walk. PCM16 mono is the wired
    path; other widths raise at this seam (extend exactly like the
    image/video codec seams)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import io
        import math
        import wave as wavemod

        import numpy as np

        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                content = bytes(r.content) if r.content is not None else b""
                with wavemod.open(io.BytesIO(content), "rb") as w:
                    rate = w.getframerate()
                    n_frames = w.getnframes()
                    n_ch = w.getnchannels()
                    width = w.getsampwidth()
                    pcm = w.readframes(n_frames)
                if width != 2 or n_ch != 1:
                    raise NotImplementedError(
                        "only mono PCM16 WAV is wired — extend at this seam"
                    )
                samples = np.frombuffer(pcm, dtype="<i2").astype(np.int64)
                sum_sq = int((samples * samples).sum())
                rms = (
                    round(math.sqrt(sum_sq / len(samples)), 6)
                    if len(samples)
                    else 0.0
                )
                digest = hashlib.md5(
                    ",".join(str(int(v)) for v in samples).encode()
                ).hexdigest()[:16]
                rows.append(
                    (
                        r.media_id,
                        len(content),
                        rate,
                        len(samples),
                        len(samples) * 1000 // rate if rate else 0,
                        rms,
                        digest,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_bytes", "sample_rate", "n_samples",
                    "duration_ms", "rms", "pcm_digest",
                ],
            )

    return media.where(F.col("kind") == "audio").select(
        "media_id", "content"
    ).mapInPandas(extract, WAV_FEATURES_SCHEMA)


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

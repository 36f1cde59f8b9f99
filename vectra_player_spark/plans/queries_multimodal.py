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


# --------------------------------------------------------------------------
# REAL WAV decode (round-9): the audio arm un-stubbed. The synth stage
# fabricates genuine RIFF/fmt/data containers (stdlib `wave` writer) whose
# rate/frame-count/samples derive deterministically from the doc row, and
# wav_features decodes them for REAL — header fields from the parsed
# chunks, duration/RMS from the PCM payload, and pcm_digest = md5 over
# the DECODED sample values — so the oracle (which enumerates the same
# integer waveform with generate_series, no byte parsing) verifies the
# decode end to end. tests/test_vector_multimodal.py additionally decodes
# a hand-packed struct.pack WAV so the parser isn't only checked against
# the stdlib writer's own output.
# --------------------------------------------------------------------------

_WAV_FEATURES_ORACLE = """
WITH m AS (
  SELECT doc_id,
         8000 * (1 + doc_id % 4) AS rate,
         256 + n_chars % 1024 AS n_frames
  FROM documents WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
),
v AS (
  SELECT doc_id, rate, n_frames, i,
         ((doc_id * 31 + i * 7919) % 2001) - 1000 AS s
  FROM m, unnest(generate_series(0, n_frames - 1)) AS u(i)
),
agg AS (
  SELECT doc_id, rate, n_frames,
         CAST(SUM(s * s) AS BIGINT) AS sum_sq,
         md5(string_agg(CAST(s AS VARCHAR), ',' ORDER BY i)) AS dig
  FROM v GROUP BY 1, 2, 3
)
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       CAST(44 + n_frames * 2 AS BIGINT) AS n_bytes,
       CAST(rate AS INT) AS sample_rate,
       CAST(n_frames AS BIGINT) AS n_samples,
       CAST((n_frames * 1000) // rate AS BIGINT) AS duration_ms,
       ROUND(sqrt(CAST(sum_sq AS DOUBLE) / n_frames), 6) AS rms,
       substring(dig, 1, 16) AS pcm_digest
FROM agg
"""


@register(
    "multimodal_wav_features",
    oracle=_WAV_FEATURES_ORACLE,
    tags=("multimodal",),
    survey_ref="multimodal mandate: REAL audio decode (stdlib WAV container, "
    "PCM16 features) — the un-stubbed arm of the codec seam",
)
def multimodal_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real WAV decode features over synthesized-but-genuine WAV payloads:
    (media_id, n_bytes, sample_rate, n_samples, duration_ms, rms,
    pcm_digest). Two Arrow-batched mapInPandas stages (encode, decode) —
    the exact plumbing a provisioned cluster uses for real audio files,
    with the container round-trip and the sample decode both
    value-checked cross-engine. n_bytes pins the 44-byte canonical
    header; the digest pins every decoded sample."""
    from vectra_player_spark.operators.multimodal import (
        synth_pcm16_wav,
        wav_features,
    )

    keys = (
        t(spark, sf_dir, "documents")
        .where(F.col("doc_id").isNotNull() & F.col("n_chars").isNotNull())
        .select("doc_id", "n_chars")
    )
    return wav_features(synth_pcm16_wav(keys))


# --------------------------------------------------------------------------
# REAL image + video decode (round-9, completing the trio begun by WAV):
# uncompressed 24-bit BMP is struct-parseable and YUV4MPEG2 is a text
# header plus raw planes — the two container formats whose decode needs
# zero codec libraries. Same verification scheme as WAV: synthesize
# genuine containers from doc rows, decode them for REAL (the BMP arm
# must strip row padding and un-flip bottom-up storage; the y4m arm must
# token-walk the header and step FRAME-delimited 4:2:0 planes), and let
# the oracle enumerate the same pixel formulas with generate_series — a
# value MATCH proves the byte-level parsing, not just the plumbing.
# --------------------------------------------------------------------------

_BMP_FEATURES_ORACLE = """
WITH m AS (
  SELECT doc_id,
         8 + doc_id % 24 AS w,
         8 + n_chars % 24 AS h
  FROM documents WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
),
px AS (
  SELECT doc_id, w, h, y, x,
         (doc_id * 7 + y * 31 + x * 13) % 256 AS v
  FROM m,
       unnest(generate_series(0, h - 1)) AS gy(y),
       unnest(generate_series(0, w - 1)) AS gx(x)
),
agg AS (
  SELECT doc_id, w, h,
         CAST(SUM(v) AS BIGINT) AS sum_v,
         md5(string_agg(CAST(v AS VARCHAR), ',' ORDER BY y, x)) AS dig
  FROM px GROUP BY 1, 2, 3
)
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       CAST(54 + h * (w * 3 + (4 - (w * 3) % 4) % 4) AS BIGINT) AS n_bytes,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       ROUND(CAST(sum_v AS DOUBLE) / (w * h), 6) AS mean_luma,
       substring(dig, 1, 16) AS pix_digest
FROM agg
"""


@register(
    "multimodal_bmp_features",
    oracle=_BMP_FEATURES_ORACLE,
    tags=("multimodal",),
    survey_ref="multimodal mandate: REAL image decode (uncompressed BMP "
    "container) — the un-stubbed arm of the image codec seam",
)
def multimodal_bmp_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real BMP decode features over synthesized-but-genuine 24-bit BMPs:
    (media_id, n_bytes, width, height, mean_luma, pix_digest). n_bytes
    pins the header + row-padding arithmetic; pix_digest is md5 over the
    decoded gray values in row-major TOP-DOWN order, pinning the
    bottom-up un-flip and the padding strip."""
    from vectra_player_spark.operators.multimodal import (
        bmp_features,
        synth_gray_bmp,
    )

    keys = (
        t(spark, sf_dir, "documents")
        .where(F.col("doc_id").isNotNull() & F.col("n_chars").isNotNull())
        .select("doc_id", "n_chars")
    )
    return bmp_features(synth_gray_bmp(keys))


_Y4M_FRAME_ORACLE = """
WITH m AS (
  SELECT doc_id,
         16 + 2 * (doc_id % 5) AS w,
         8 + 2 * (n_chars % 5) AS h,
         1 + n_chars % 7 AS nf
  FROM documents WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
),
fr AS (
  SELECT doc_id, w, h, f FROM m, unnest(generate_series(0, nf - 1)) AS g(f)
),
px AS (
  SELECT doc_id, w, h, f, y, x,
         (doc_id * 11 + f * 97 + y * 31 + x * 13) % 256 AS v
  FROM fr,
       unnest(generate_series(0, h - 1)) AS gy(y),
       unnest(generate_series(0, w - 1)) AS gx(x)
)
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       CAST(f AS INT) AS frame_idx,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       ROUND(CAST(SUM(v) AS DOUBLE) / (w * h), 6) AS mean_y,
       substring(md5(string_agg(CAST(v AS VARCHAR), ',' ORDER BY y, x)),
                 1, 16) AS y_digest
FROM px GROUP BY doc_id, f, w, h
"""


@register(
    "multimodal_y4m_frame_stats",
    oracle=_Y4M_FRAME_ORACLE,
    tags=("multimodal",),
    survey_ref="multimodal mandate: REAL video decode (YUV4MPEG2 container, "
    "per-frame luma stats) — the un-stubbed arm of the video codec seam",
)
def multimodal_y4m_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real y4m decode: one row per frame with decoded dimensions, luma
    mean, and an md5 over the decoded Y plane — the frame-sampling
    explode shape with a genuinely parsed body (header token walk +
    FRAME stepping through raw 4:2:0 planes)."""
    from vectra_player_spark.operators.multimodal import (
        synth_y4m,
        y4m_frame_stats,
    )

    keys = (
        t(spark, sf_dir, "documents")
        .where(F.col("doc_id").isNotNull() & F.col("n_chars").isNotNull())
        .select("doc_id", "n_chars")
    )
    return y4m_frame_stats(synth_y4m(keys))


# --------------------------------------------------------------------------
# Perceptual-hash near-dup: the multimodal twin of the simhash text family.
# The 64-bit pHash (here the stub's md5 prefix; a real DCT pHash on a
# provisioned cluster — same bit width, same query) is banded into 4×16-bit
# bands; bucket collisions are the candidate pairs (pigeonhole: any pair at
# hamming <= 3 agrees on at least one band — exact recall), and candidates
# are verified with a bit_count(XOR) distance over two 32-bit halves (a
# 64-bit hex literal would overflow signed BIGINT). Output is the
# enumeration-free stats shape (doc_simhash_neardup_stats' rule): per-band
# bucket/collision counts from group sizes, plus one 'all' row with the
# DISTINCT candidate union and the verified near-dup count. On this corpus
# the stub hashes are md5-random, so n_neardup_pairs counts exact payload
# duplicates (none at oracle scales) while the band-collision counts are
# non-trivially nonzero (~C(500,2)·4/2^16) — both engines must agree on
# every cell, so the banding, pairing, and distance arithmetic are all
# hash-checked. tests/test_vector_multimodal.py injects crafted duplicate
# payloads to prove the hamming-0 path end to end.
# --------------------------------------------------------------------------

_PHASH_BANDS_CTE = """
WITH ph AS (
  SELECT CAST(doc_id AS VARCHAR) AS media_id,
         substring(md5(text), 1, 16) AS phash
  FROM documents WHERE text IS NOT NULL
),
halves AS (
  SELECT media_id, phash,
         CAST('0x' || substring(phash, 1, 8) AS BIGINT) AS h_hi,
         CAST('0x' || substring(phash, 9, 8) AS BIGINT) AS h_lo
  FROM ph
),
bands AS (
  SELECT media_id, h_hi, h_lo, i AS band_idx,
         substring(phash, 1 + 4 * i, 4) AS band_val
  FROM halves, unnest([0, 1, 2, 3]) AS u(i)
),
cand AS (
  SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
         a.h_hi AS hi_a, a.h_lo AS lo_a, b.h_hi AS hi_b, b.h_lo AS lo_b
  FROM bands a
  JOIN bands b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
              AND a.media_id < b.media_id
),
ham AS (
  SELECT media_a, media_b,
         bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) AS hamming
  FROM cand
)
"""

_PHASH_STATS_ORACLE = (
    _PHASH_BANDS_CTE
    + """
SELECT 'band' || CAST(band_idx AS VARCHAR) AS scope,
       CAST(COUNT(DISTINCT band_val) AS BIGINT) AS n_buckets,
       CAST(SUM((n * (n - 1)) // 2) AS BIGINT) AS n_candidate_pairs,
       CAST(NULL AS BIGINT) AS n_neardup_pairs
FROM (SELECT band_idx, band_val, CAST(COUNT(*) AS BIGINT) AS n
      FROM bands GROUP BY 1, 2)
GROUP BY 1
UNION ALL
SELECT 'all' AS scope,
       CAST(NULL AS BIGINT) AS n_buckets,
       CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs,
       CAST(SUM(CASE WHEN hamming <= 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_neardup_pairs
FROM ham
"""
)


def phash_band_stats(ph: DataFrame, n_bands: int = 4, max_hamming: int = 3) -> DataFrame:
    """Banded-hamming near-dup stats over a (media_id, phash16hex) relation.

    Collapse-first (the d² duplication defense): identical payloads hash
    identically, so the band self-join runs over DISTINCT phash values
    with exact copy-count weighting — intra-group member pairs are
    hamming-0 by definition (Σ C(m,2), always within threshold) and a rep
    pair sharing a band expands to m_a·m_b member pairs. The first
    member-level implementation ran 196 s at the 100× lake (d=100 ⇒ d²
    bucket pairs); rep space restores the 10× cost. Values are identical
    to the direct per-member form the oracle computes.

    Per-band rows count buckets and collision pairs from member-weighted
    group sizes (enumeration-free); the 'all' row enumerates the DISTINCT
    rep-pair candidate union (output-bound — band collisions, never all
    pairs) and verifies with the two-half XOR popcount (a full 64-bit hex
    literal would overflow signed BIGINT).

    NULL hashes (undecodable media) are excluded from dedup on BOTH
    engines — the oracle's equality band join would silently drop them
    while a groupBy collapses them into one fake group. Pair counts
    accumulate as exact per-row BIGINT terms ((n·(n−1)) div 2), never a
    DOUBLE partial — the determinism discipline (a bucket past 2^53
    member pairs would otherwise round engine-dependently)."""
    ph = ph.where(F.col("phash").isNotNull())
    reps = ph.groupBy("phash").agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    halves = reps.select(
        "phash",
        "m",
        F.conv(F.substring("phash", 1, 8), 16, 10).cast("bigint").alias("h_hi"),
        F.conv(F.substring("phash", 9, 8), 16, 10).cast("bigint").alias("h_lo"),
    )
    width = 16 // n_bands  # hex chars per band (4 bits each)
    bands = halves.select(
        "phash",
        "m",
        "h_hi",
        "h_lo",
        F.explode(F.array(*[F.lit(i) for i in range(n_bands)])).alias("band_idx"),
    ).select(
        "phash",
        "m",
        "h_hi",
        "h_lo",
        "band_idx",
        F.expr(f"substring(phash, 1 + {width} * band_idx, {width})").alias("band_val"),
    )
    per_band = (
        bands.groupBy("band_idx", "band_val")
        .agg(F.sum("m").cast("bigint").alias("n"))
        .groupBy("band_idx")
        .agg(
            F.countDistinct("band_val").cast("bigint").alias("n_buckets"),
            F.sum(F.expr("(n * (n - 1)) div 2")).cast("bigint").alias(
                "n_candidate_pairs"
            ),
        )
        .select(
            F.concat(F.lit("band"), F.col("band_idx").cast("string")).alias("scope"),
            "n_buckets",
            "n_candidate_pairs",
            F.lit(None).cast("bigint").alias("n_neardup_pairs"),
        )
    )
    # Intra-group member pairs: identical phash ⇒ collide in every band,
    # hamming 0 — candidates and near-dups by definition.
    intra = reps.agg(
        F.sum(F.expr("(m * (m - 1)) div 2")).cast("bigint").alias("p")
    )
    a = bands.alias("a")
    b = bands.alias("b")
    rep_cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.phash") < F.col("b.phash")),
        )
        .select(
            F.col("a.phash").alias("ph_a"),
            F.col("b.phash").alias("ph_b"),
            F.col("a.m").alias("m_a"),
            F.col("b.m").alias("m_b"),
            F.col("a.h_hi").alias("hi_a"),
            F.col("a.h_lo").alias("lo_a"),
            F.col("b.h_hi").alias("hi_b"),
            F.col("b.h_lo").alias("lo_b"),
        )
        .distinct()
    )
    inter = rep_cand.select(
        "m_a",
        "m_b",
        F.expr("bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)").alias("hamming"),
    ).agg(
        F.coalesce(F.sum(F.col("m_a") * F.col("m_b")), F.lit(0))
        .cast("bigint")
        .alias("cand"),
        F.coalesce(
            F.sum(
                F.when(F.col("hamming") <= max_hamming, F.col("m_a") * F.col("m_b"))
                .otherwise(0)
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("near"),
    )
    allrow = intra.crossJoin(inter).select(
        F.lit("all").alias("scope"),
        F.lit(None).cast("bigint").alias("n_buckets"),
        (F.col("p") + F.col("cand")).cast("bigint").alias("n_candidate_pairs"),
        (F.col("p") + F.col("near")).cast("bigint").alias("n_neardup_pairs"),
    )
    return per_band.unionByName(allrow)


@register(
    "multimodal_phash_neardup_stats",
    oracle=_PHASH_STATS_ORACLE,
    tags=("multimodal", "dedup"),
    survey_ref="multimodal mandate: perceptual-hash near-dup (banded hamming, simhash-family twin)",
)
def multimodal_phash_neardup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media_from_docs(spark, sf_dir, "image")
    ph = image_features(media, decode_stub=True).select("media_id", "phash")
    return phash_band_stats(ph)

"""Deduplication operator family for the training-data pipeline.

Exact, MinHash+LSH, SimHash and n-gram-Jaccard near-dup — each built from
md5 (available identically in Spark and the DuckDB oracle) so correctness
is hash-checkable cross-engine. All are shuffle-frugal by construction:

- exact: one groupBy on the md5 fingerprint.
- minhash_lsh: shingle explode → K min-aggregates per doc (one shuffle on
  doc_id) → band hashes → self-join on (band_idx, band_hash). At 100 TB the
  band join only materializes docs sharing a band bucket — the classic
  LSH candidate generation — never an all-pairs product.
- ngram jaccard: inverted-index join on shingle (pairs only materialize for
  docs sharing a shingle), then one aggregate per pair. Quadratic only
  within a posting list — at scale you'd cap posting-list length (drop
  ultra-common shingles, like stopword shingles) which is exposed as
  `max_doc_freq`.
- simhash: 32-bit fingerprint from per-token md5 hex-nibble parity; near-dup
  = identical fingerprint (scale path: band the 32 bits into 4 bytes for
  hamming<=k candidate search).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vectra_player_spark.functions.text import fingerprint, tokens, word_shingles

MINHASH_K = 8  # permutations, as md5 salts p0..p7
MINHASH_BANDS = 4  # 4 bands x 2 rows


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup groups: fingerprint → (n_dups, keeper=min id)."""
    return (
        docs.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keeper_doc_id"))
    )


def doc_shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", w: int = 3) -> DataFrame:
    """Distinct (doc_id, shingle) pairs."""
    return (
        docs.select(F.col(id_col), tokens(text_col).alias("toks"))
        .select(F.col(id_col), F.explode(word_shingles("toks", w)).alias("shingle"))
        .distinct()
    )


def minhash_signatures(shingled: DataFrame, id_col: str = "doc_id", k: int = MINHASH_K) -> DataFrame:
    """K min-hash values per doc: h_i = min(md5('p<i>|' || shingle))."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"p{i}|"), F.col("shingle")))).alias(f"h{i}")
        for i in range(k)
    ]
    return shingled.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 3,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
) -> DataFrame:
    """LSH candidate pairs (doc_a < doc_b) sharing at least one band."""
    sig = minhash_signatures(doc_shingles(docs, id_col, text_col, w), id_col, k)
    rows_per_band = k // bands
    band_cols = [
        F.md5(
            F.concat_ws("|", *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)])
        ).alias(f"b{b}")
        for b in range(bands)
    ]
    banded = sig.select(F.col(id_col), *band_cols)
    stack_expr = ", ".join(f"{b}, b{b}" for b in range(bands))
    long = banded.select(
        F.col(id_col),
        F.expr(f"stack({bands}, {stack_expr}) AS (band_idx, band_hash)"),
    ).select(id_col, "band_idx", "band_hash")
    a = long.select(
        F.col(id_col).alias("doc_a"), F.col("band_idx"), F.col("band_hash")
    )
    b = long.select(
        F.col(id_col).alias("doc_b"), F.col("band_idx"), F.col("band_hash")
    )
    return (
        a.join(b, ["band_idx", "band_hash"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 3,
    threshold: float = 0.2,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Near-dup pairs by w-gram Jaccard >= threshold via inverted index."""
    sh = doc_shingles(docs, id_col, text_col, w)
    if max_doc_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        sh = sh.join(freq.where(F.col("df") <= max_doc_freq), "shingle").select(
            id_col, "shingle"
        )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_shingles").alias("n_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def simhash_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32
) -> DataFrame:
    """32-bit SimHash: bit i = sign of sum over distinct tokens of
    (parity of md5 hex nibble i) ? +1 : -1."""
    toks = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
        .distinct()
        .withColumn("h", F.md5("tok"))
    )
    bit_sums = toks.groupBy(id_col).agg(
        *[
            F.sum(
                (F.ascii(F.substring("h", i + 1, 1)) % 2) * 2 - 1
            ).alias(f"s{i}")
            for i in range(bits)
        ]
    )
    fp = None
    for i in range(bits):
        term = F.when(F.col(f"s{i}") > 0, F.lit(2 ** i).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        fp = term if fp is None else fp + term
    return bit_sums.select(F.col(id_col), fp.alias("simhash"))

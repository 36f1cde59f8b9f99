"""Persisted dedup signature store — the lake-level serving structure for
the near-dup query family.

At 100 TB the dominant cost of every near-dup query is not the banded
candidate join — it is recomputing content signatures from raw text on
every invocation: the shingle→md5→min-hash chain, the per-token SimHash
bit votes, and the rep-collapse window over wide embedding arrays. All of
those are pure functions of content, so they belong in the lake as an
ingest-time artifact, exactly like the bucketed layouts
(:mod:`vectra_player_spark.operators.skew`): computed once, maintained
incrementally as new documents arrive, discovered (never built) by the
read path, with the raw table remaining the source of truth.

Reference analog: the reference pays its dedup bookkeeping at INGEST,
not per query — the recorder's DeduplicationTracker suppresses repeat
games as data arrives (services/recording/src/dedup.py; "gameId-based
tracking prevents duplicates", services/recording/README.md:15), and the
event-store service keeps a recorded-id set for the same purpose
(src/services/event_store/service.py:83). At lake scale the same
economics demand the derived artifacts (signatures, postings,
quantizers) be persisted relations any Spark job can scan, not
per-query recomputation.

Store layout (external parquet dirs under the shared bucketed root,
``spark.vectra.bucketed.location``):

``doc_sigs_{tag}``
    One row per DISTINCT (whitespace-normalized) text: the group's
    representative ``doc_id`` (min id), the text fingerprint ``fp``
    (md5 — the rep-group key, which is also what makes incremental rep
    assignment possible), MinHash ``h0..h7`` (NULL for shingle-less
    docs, matching minhash_signatures' exclusion), and the 32-bit
    ``simhash``.
``doc_members_{tag}``
    ``(_rep, _member)`` — every doc mapped to its representative.
``emb_sigs_{tag}``
    One row per DISTINCT (label, embedding): rep ``vec_id``, ``label``,
    ``emb`` (double[]), precomputed ``nrm`` and hyperplane-LSH band
    buckets ``bk0..bk2`` (functions/emb_lsh).
``emb_members_{tag}``
    ``(_rep, _member)`` for the embedding table.
``idx_sigs_{tag}_v2`` / ``idx_members_{tag}_v2``
    The lexical inverted index: CASE-SENSITIVE postings ``(term,
    term_lc, doc_id, tf)`` partitioned by ``tb`` (16 md5 hash buckets of
    the LOWERCASED term — a literal query-term set prunes to its
    partitions at the directory level, the 100 TB retrieval read shape)
    and the per-doc length table ``(doc_id, dl)``. One table serves the
    whole lexical family: TF-IDF consumes the case-sensitive rows
    as-is, BM25 sums ``tf`` per ``(doc_id, term_lc)`` — lowercasing
    commutes with whitespace splitting, so the lowercase token count is
    exactly the sum over case variants, and ``dl`` is case-invariant.
    Neither query tokenizes the corpus at read time; N/avgdl aggregate
    off the narrow doclen table. (v2 suffix: the v1 layout lacked
    ``term_lc``; versioned paths make an old on-disk store read as
    absent instead of schema-breaking the routed arms.)
``ivf_sigs_{tag}`` / ``ivf_members_{tag}``
    The IVF coarse quantizer: deterministic-Lloyd centroids
    ``(cell_id, centroid)`` and the cell assignment ``(vec_id,
    cell_id)`` (NULL cell for NULL embeddings). Fit at ingest, searched
    at query time — the classic vector-index economics.
``pq_sigs_{tag}`` / ``pq_members_{tag}``
    Product quantization: codebooks ``(subspace, code, codeword)`` from
    the deterministic joint Lloyd, and the 32×-compressed code table
    ``(vec_id, codes, vhat_norm)``. ADC search reads codes only.

Two refresh regimes, by what the artifact IS:

- CONTENT-PURE stores (doc/emb signatures, the inverted index) append
  under the id watermark — a row's stored value never depends on other
  rows, so the refreshed store equals a from-scratch rebuild exactly.
- CORPUS-STATISTIC stores (ivf/pq quantizers) REBUILD when stale: the
  centroids/codebooks are functions of the whole corpus, so a
  frozen-model append would diverge from direct recomputation and break
  the bit-equal routing contract (and the VALUES pins riding it). A
  production deployment that prefers ingest cheapness can instead opt
  into the freeze cadence (round-9): set
  ``spark.vectra.quantizer.refresh=frozen`` and refresh keeps the
  trained quantizers untouched, assigning/encoding ONLY above-watermark
  vectors (delta-sized, map-only) — the FAISS add-without-retrain
  regime. That explicitly trades the bit-equal routed==direct contract
  for bounded ingest cost (recall degrades gracefully as the corpus
  drifts from the frozen training distribution — floor-tested in
  tests/test_sigstore.py; re-train on a cadence by flipping the conf
  back for one refresh). The default stays ``rebuild`` so the driver's
  oracle-exact contract and the VALUES pins are never at risk.

Correctness contract: every stored column is a deterministic function of
row content, so a routed query is value-IDENTICAL to the direct
computation — routed entries keep their original DuckDB oracles (the
same discipline as the layout routing in tables.events_for_windows).

Staleness contract (mirrors operators/skew, including the round-7
fixes): discovery trusts a store only after the members count equals the
raw table's count (checked once per session), then guards memo hits with
the raw table's listing signature; a None signature never validates; a
stale verdict is memoized against the (lake signature, store _SUCCESS
token) pair so repeat discovery calls skip the count jobs. A grown lake
unroutes (plain recompute — correct, just slower) until
``refresh_signature_store`` absorbs the delta.

Incremental refresh rides the id watermark (append-only lakes with
monotone ids — the reference recorder's cadence): delta docs fingerprint-
join the existing sigs to inherit reps for already-seen texts; unseen
texts become new rep groups whose signatures are computed delta-sized,
never lake-sized. History mutated below the watermark forces a full
rebuild from raw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectra_player_spark.operators.skew import (
    _bucketed_root,
    _lake_signature,
)

# (session id, sf_dir, kind) → ((sigs_df, members_df), raw lake signature
# at validation time). kind ∈ {"doc", "emb"}.
_SIG_STORES: dict[tuple[int, str, str], tuple] = {}

# Negative-discovery memo: (session id, sf_dir, kind) → (raw signature,
# store _SUCCESS token) observed when the count check found the store
# stale — same discipline as skew._STALE_LAYOUTS.
_STALE_STORES: dict[tuple[int, str, str], tuple] = {}

_KIND_TABLES = {
    "doc": ("documents",),
    "emb": ("embeddings",),
    "idx": ("documents",),
    "ivf": ("embeddings",),
    "pq": ("embeddings",),
    "lm": ("documents",),
    "nb": ("documents",),
    "bpe": ("documents",),
}

# The ANN index hyper-parameters are part of the store contract: the
# routed queries embed the same literals, so a store built with these
# reproduces their direct arms bit-for-bit.
IVF_CELLS = 16
PQ_M = 8
PQ_CODES = 64
# Quantizer TRAINING caps (round-8): the ivf/pq stores still REBUILD on
# any lake change (quantizers are corpus statistics — module docstring),
# but the Lloyd fit itself trains on a deterministic md5-coin sample of
# at most this many vectors, so the refit cost is bounded by the cap
# instead of linear in lake size. Assignment/encode remain full-corpus.
# Both the store builders and the direct query arms apply the identical
# rule, so routed == direct stays bit-exact at every lake size.
IVF_TRAIN_CAP = 20_000
PQ_TRAIN_CAP = 20_000

# BPE tokenizer hyperparameters — part of the store contract like the
# ANN constants above: the routed queries embed the same literals, so a
# store built with these reproduces their direct arms bit-for-bit (and
# the VALUES pins riding them).
BPE_N_MERGES = 24
BPE_MIN_COUNT = 2

# term → 16-way md5 hash bucket, identically computable driver-side (for
# literal query-term pruning) and executor-side (for the partition column)
IDX_BUCKETS = 16


def term_bucket(term: str) -> int:
    import hashlib

    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % IDX_BUCKETS


# bucket on the LOWERCASED term: the pruning consumers (BM25) filter by
# lowercase literals, and term_bucket() above hashes what it is given
_TB_EXPR = (
    f"CAST(conv(substring(md5(lower(term)), 1, 8), 16, 10) AS BIGINT)"
    f" % {IDX_BUCKETS}"
)


def _store_tag(sf_dir: str) -> str:
    import hashlib

    return hashlib.md5(sf_dir.encode()).hexdigest()[:8]


# schema-version suffix per kind: bumping it makes every store of the
# OLD layout read as absent (unrouted until the next maintain run
# rebuilds) instead of feeding the routed arms a missing column
_KIND_VERSION = {"idx": "_v2", "lm": "_v2"}  # lm v2: seg-partitioned counts


def _paths(spark: SparkSession, sf_dir: str, kind: str) -> tuple[str, str]:
    root = _bucketed_root(spark)
    tag = _store_tag(sf_dir)
    v = _KIND_VERSION.get(kind, "")
    return f"{root}/{kind}_sigs_{tag}{v}", f"{root}/{kind}_members_{tag}{v}"


def _success_token(spark: SparkSession, paths: tuple[str, ...]) -> tuple | None:
    """_SUCCESS mtimes for the store dirs; None = absent/unprobeable
    (never treated as a match)."""
    from py4j.protocol import Py4JError

    token = []
    try:
        for p in paths:
            jp = spark._jvm.org.apache.hadoop.fs.Path(f"{p}/_SUCCESS")
            fs = jp.getFileSystem(spark._jsc.hadoopConfiguration())
            token.append(fs.getFileStatus(jp).getModificationTime())
        return tuple(token)
    except (Py4JError, AttributeError, RuntimeError):
        return None


def _live(spark: SparkSession, paths: tuple[str, ...]) -> bool:
    """All dirs exist and carry the committer's _SUCCESS (a writer killed
    mid-commit leaves part files without the marker — must read as
    absent, same rationale as skew._locations_live)."""
    from py4j.protocol import Py4JError

    try:
        for p in paths:
            jp = spark._jvm.org.apache.hadoop.fs.Path(f"{p}/_SUCCESS")
            fs = jp.getFileSystem(spark._jsc.hadoopConfiguration())
            if not fs.exists(jp):
                return False
        return True
    except (Py4JError, AttributeError, RuntimeError):
        return False


def _wipe(spark: SparkSession, path: str) -> None:
    jp = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jp.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(jp):
        fs.delete(jp, True)


def _doc_rep_signatures(reps: DataFrame) -> DataFrame:
    """fp + simhash + nullable minhash columns for a rep relation
    (doc_id, text) — the exact expressions the direct query arms use
    (operators/dedup), so stored and recomputed signatures are
    bit-identical."""
    from vectra_player_spark.functions.text import fingerprint
    from vectra_player_spark.operators.dedup import (
        minhash_signatures,
        simhash_fingerprints,
    )

    base = reps.select("doc_id", fingerprint("text").alias("fp"), "text")
    sim = simhash_fingerprints(reps)  # every doc has a fingerprint
    mh = minhash_signatures(reps)  # only docs with >=1 shingle
    return (
        base.join(sim, "doc_id")
        .join(mh, "doc_id", "left")
        .drop("text")
    )


def _emb_rep_signatures(reps: DataFrame) -> DataFrame:
    """nrm + band buckets for a rep relation (vec_id, label, emb[, nrm])."""
    from vectra_player_spark.functions.emb_lsh import LSH_BANDS, band_bucket_col
    from vectra_player_spark.functions.vectors import norm

    if "nrm" not in reps.columns:
        reps = reps.withColumn("nrm", norm("emb"))
    out = reps.select("vec_id", "label", "emb", "nrm")
    for b in range(LSH_BANDS):
        out = out.withColumn(f"bk{b}", band_bucket_col(F.col("emb"), b))
    return out


def _build_doc_store(spark: SparkSession, sf_dir: str) -> None:
    from vectra_player_spark.functions.text import fingerprint
    from vectra_player_spark.operators.dedup import rep_members
    from vectra_player_spark.session import pin
    from vectra_player_spark.tables import _read

    sigs_path, members_path = _paths(spark, sf_dir, "doc")
    _wipe(spark, sigs_path)
    _wipe(spark, members_path)
    # FRESH read (round-7 plan-cache discipline): the store must cover
    # every file the lake holds NOW, not a listing snapshotted earlier.
    raw = _read(spark, sf_dir, "documents").select("doc_id", "text")
    reps, members = rep_members(raw, "doc_id", [fingerprint("text")])
    # three signature branches read the rep relation — one materialization
    reps = pin(reps)
    _doc_rep_signatures(reps).write.parquet(sigs_path)
    members.select("_rep", F.col("_member")).write.parquet(members_path)
    n_store = spark.read.parquet(members_path).count()
    n_raw = _read(spark, sf_dir, "documents").count()
    if n_store != n_raw:
        raise RuntimeError(
            f"doc signature store wrote {n_store} member rows but raw "
            f"documents holds {n_raw} — lake changed mid-build; rerun"
        )


def _build_emb_store(spark: SparkSession, sf_dir: str) -> None:
    from vectra_player_spark.functions.vectors import norm
    from vectra_player_spark.operators.dedup import rep_members
    from vectra_player_spark.session import pin
    from vectra_player_spark.tables import _read

    sigs_path, members_path = _paths(spark, sf_dir, "emb")
    _wipe(spark, sigs_path)
    _wipe(spark, members_path)
    raw = (
        _read(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            "label",
            F.col("embedding").cast("array<double>").alias("emb"),
        )
        .withColumn("nrm", norm("emb"))
    )
    reps, members = rep_members(raw, "vec_id", ["label", "emb"])
    reps = pin(reps)
    _emb_rep_signatures(reps).write.parquet(sigs_path)
    members.select("_rep", F.col("_member")).write.parquet(members_path)
    n_store = spark.read.parquet(members_path).count()
    n_raw = _read(spark, sf_dir, "embeddings").count()
    if n_store != n_raw:
        raise RuntimeError(
            f"embedding signature store wrote {n_store} member rows but raw "
            f"embeddings holds {n_raw} — lake changed mid-build; rerun"
        )


def _idx_tokens(docs: DataFrame) -> DataFrame:
    """The lexical family's shared tokenization (whitespace split,
    CASE-SENSITIVE — functions/text.tokens). The case-insensitive
    consumers (BM25) derive their view by summing tf per lowercased
    term, which is exactly the lowercase tokenization's count because
    lowercasing never creates or removes whitespace."""
    return docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks")
    )


def _build_text_index(spark: SparkSession, sf_dir: str) -> None:
    from vectra_player_spark.tables import _read

    postings_path, doclen_path = _paths(spark, sf_dir, "idx")
    _wipe(spark, postings_path)
    _wipe(spark, doclen_path)
    base = _idx_tokens(_read(spark, sf_dir, "documents").select("doc_id", "text"))
    dls = base.withColumn("dl", F.size("toks").cast("bigint"))
    postings = (
        dls.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("term_lc", F.lower(F.col("term")))
        .withColumn("tb", F.expr(_TB_EXPR))
    )
    postings.write.partitionBy("tb").parquet(postings_path)
    dls.select("doc_id", "dl").write.parquet(doclen_path)
    n_store = spark.read.parquet(doclen_path).count()
    n_raw = _read(spark, sf_dir, "documents").count()
    if n_store != n_raw:
        raise RuntimeError(
            f"text index wrote {n_store} doclen rows but raw documents "
            f"holds {n_raw} — lake changed mid-build; rerun"
        )


def _build_lm_store(spark: SparkSession, sf_dir: str) -> None:
    """Persist the bigram-LM training counts (plans/queries_lm) as an
    ingest artifact: sigs = PARTIAL weighted counts (lang, w1, w2|NULL, c)
    — sum-mergeable, so lake growth appends delta partials instead of
    retraining (counts are additive facts of the text, unlike the ivf/pq
    quantizers which are corpus statistics and must rebuild); members =
    (doc_id, is_ref) one row per document, the coverage map + watermark."""
    from vectra_player_spark.plans.queries_lm import lm_is_ref, lm_model_counts
    from vectra_player_spark.tables import _read

    counts_path, members_path = _paths(spark, sf_dir, "lm")
    _wipe(spark, counts_path)
    _wipe(spark, members_path)
    raw = _read(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    # seg partitions the partials by the refresh watermark that produced
    # them (-1 = the base build) — _refresh_lm OVERWRITES one seg
    # partition instead of appending, which makes a crash between the
    # counts write and the members write replay-safe (see _refresh_lm).
    lm_model_counts(raw).withColumn(
        "seg", F.lit(-1).cast("bigint")
    ).write.partitionBy("seg").parquet(counts_path)
    raw.select(
        "doc_id", lm_is_ref().cast("int").alias("is_ref")
    ).write.parquet(members_path)
    n_store = spark.read.parquet(members_path).count()
    n_raw = _read(spark, sf_dir, "documents").count()
    if n_store != n_raw:
        raise RuntimeError(
            f"lm store wrote {n_store} member rows but raw documents "
            f"holds {n_raw} — lake changed mid-build; rerun"
        )



def _build_nb_store(spark: SparkSession, sf_dir: str) -> None:
    """Persist the NB-classifier training counts (plans/queries_classify)
    as an ingest artifact: sigs = PARTIAL weighted counts
    (cand, tok|NULL, c) — tok NULL rows carry per-class document counts;
    sum-mergeable, so lake growth appends delta partials instead of
    retraining (the lm-store regime: counts are additive facts of the
    text); members = (doc_id, is_train) coverage map + watermark. Same
    crash-safe seg partitioning as the lm store."""
    from vectra_player_spark.plans.queries_classify import (
        nb_is_train,
        nb_model_counts,
    )
    from vectra_player_spark.tables import _read

    counts_path, members_path = _paths(spark, sf_dir, "nb")
    _wipe(spark, counts_path)
    _wipe(spark, members_path)
    raw = _read(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    nb_model_counts(raw).withColumn(
        "seg", F.lit(-1).cast("bigint")
    ).write.partitionBy("seg").parquet(counts_path)
    raw.select(
        "doc_id", nb_is_train().cast("int").alias("is_train")
    ).write.parquet(members_path)
    n_store = spark.read.parquet(members_path).count()
    n_raw = _read(spark, sf_dir, "documents").count()
    if n_store != n_raw:
        raise RuntimeError(
            f"nb store wrote {n_store} member rows but raw documents "
            f"holds {n_raw} — lake changed mid-build; rerun"
        )


def _build_bpe_store(spark: SparkSession, sf_dir: str) -> None:
    """Persist the learned BPE tokenizer (operators/bpe; the
    plans/queries_bpe hyperparams are part of the store contract, like
    IVF_CELLS) as an ingest artifact. sigs = a tagged union of the two
    relations every consumer needs: the merge table rows
    (merge_rank, lhs, rhs, merged, pair_count; word/cnt/syms NULL) and
    the final merged word-symbol table (word, cnt, syms; merge cols
    NULL) — the merge table is the model, the word table is its
    pre-applied encoding of the corpus vocabulary (what the encode /
    vocab-stats queries actually join; the base character-level stats
    also derive from it, vocab-sized, so no routed consumer re-reads
    the corpus to describe the model). members = (doc_id) coverage map
    + watermark. Corpus-statistic regime: the merge sequence is a
    global argmax chain (exactly the ivf/pq rule), so lake growth
    REBUILDS — a frozen-merge append would diverge from direct
    recomputation and break the bit-equal routing contract."""
    from vectra_player_spark.operators.bpe import learn_bpe
    from vectra_player_spark.tables import _read

    sigs_path, members_path = _paths(spark, sf_dir, "bpe")
    _wipe(spark, sigs_path)
    _wipe(spark, members_path)
    raw = _read(spark, sf_dir, "documents").select("doc_id", "text")
    merges, final = learn_bpe(raw, n_merges=BPE_N_MERGES, min_count=BPE_MIN_COUNT)
    merge_rows = spark.createDataFrame(
        merges,
        "merge_rank bigint, lhs string, rhs string, merged string,"
        " pair_count bigint",
    ).select(
        "merge_rank",
        "lhs",
        "rhs",
        "merged",
        "pair_count",
        F.lit(None).cast("string").alias("word"),
        F.lit(None).cast("bigint").alias("cnt"),
        F.lit(None).cast("array<string>").alias("syms"),
    )
    word_rows = final.select(
        F.lit(None).cast("bigint").alias("merge_rank"),
        F.lit(None).cast("string").alias("lhs"),
        F.lit(None).cast("string").alias("rhs"),
        F.lit(None).cast("string").alias("merged"),
        F.lit(None).cast("bigint").alias("pair_count"),
        "word",
        "cnt",
        "syms",
    )
    merge_rows.unionByName(word_rows).write.parquet(sigs_path)
    raw.select("doc_id").write.parquet(members_path)
    n_store = spark.read.parquet(members_path).count()
    n_raw = _read(spark, sf_dir, "documents").count()
    if n_store != n_raw:
        raise RuntimeError(
            f"bpe store wrote {n_store} member rows but raw documents "
            f"holds {n_raw} — lake changed mid-build; rerun"
        )


def _build_ivf_store(spark: SparkSession, sf_dir: str) -> None:
    from vectra_player_spark.operators.knn import assign_cells, kmeans_deterministic
    from vectra_player_spark.tables import _read

    sigs_path, members_path = _paths(spark, sf_dir, "ivf")
    _wipe(spark, sigs_path)
    _wipe(spark, members_path)
    raw = _read(spark, sf_dir, "embeddings")
    emb = raw.where(F.col("embedding").isNotNull())
    if emb.isEmpty():  # k-means cannot fit on zero vectors — empty store
        centroids = spark.createDataFrame([], "cell_id int, centroid array<double>")
        members = raw.select("vec_id", F.lit(None).cast("int").alias("cell_id"))
    else:
        # the SAME sampling rule the direct query arm applies (see
        # IVF_TRAIN_CAP note above), so routed centroids are bit-identical
        n = emb.count()
        frac = min(1.0, IVF_TRAIN_CAP / max(n, 1))
        centroids = kmeans_deterministic(
            emb,
            n_cells=IVF_CELLS,
            sample_fraction=None if frac >= 1.0 else frac,
        )
        members = assign_cells(emb, centroids).select("vec_id", "cell_id").unionByName(
            raw.where(F.col("embedding").isNull()).select(
                "vec_id", F.lit(None).cast("int").alias("cell_id")
            )
        )
    centroids.write.parquet(sigs_path)
    members.write.parquet(members_path)
    n_store = spark.read.parquet(members_path).count()
    n_raw = _read(spark, sf_dir, "embeddings").count()
    if n_store != n_raw:
        raise RuntimeError(
            f"IVF index wrote {n_store} assignment rows but raw embeddings "
            f"holds {n_raw} — lake changed mid-build; rerun"
        )


def _build_pq_store(spark: SparkSession, sf_dir: str) -> None:
    from vectra_player_spark.operators.knn import pq_encode, pq_train_deterministic
    from vectra_player_spark.tables import _read

    sigs_path, members_path = _paths(spark, sf_dir, "pq")
    _wipe(spark, sigs_path)
    _wipe(spark, members_path)
    raw = _read(spark, sf_dir, "embeddings")
    emb = raw.where(F.col("embedding").isNotNull())
    if emb.isEmpty():
        cb_df = spark.createDataFrame(
            [], "subspace int, code int, codeword array<double>"
        )
        members = raw.select(
            "vec_id",
            F.lit(None).cast("array<int>").alias("codes"),
            F.lit(None).cast("double").alias("vhat_norm"),
        )
    else:
        # the SAME sampling rule the direct query arm applies, so the
        # codebooks (and therefore every routed score) are bit-identical
        n = emb.count()
        frac = min(1.0, PQ_TRAIN_CAP / max(n, 1))
        cb = pq_train_deterministic(
            emb, m=PQ_M, n_codes=PQ_CODES, max_iter=8,
            sample_fraction=None if frac >= 1.0 else frac,
        )
        cb_df = spark.createDataFrame(
            [
                (j, c, list(map(float, w)))
                for j, book in enumerate(cb)
                for c, w in enumerate(book)
            ],
            "subspace int, code int, codeword array<double>",
        )
        members = pq_encode(emb, cb).unionByName(
            raw.where(F.col("embedding").isNull()).select(
                "vec_id",
                F.lit(None).cast("array<int>").alias("codes"),
                F.lit(None).cast("double").alias("vhat_norm"),
            )
        )
    cb_df.write.parquet(sigs_path)
    members.write.parquet(members_path)
    n_store = spark.read.parquet(members_path).count()
    n_raw = _read(spark, sf_dir, "embeddings").count()
    if n_store != n_raw:
        raise RuntimeError(
            f"PQ index wrote {n_store} code rows but raw embeddings "
            f"holds {n_raw} — lake changed mid-build; rerun"
        )


def load_pq_codebook(sigs: DataFrame) -> list[list[list[float]]]:
    """Materialize the stored codebook back into the nested-list form the
    ADC/encode kernels inline as literals (driver-side model fetch — the
    same pattern as the broadcast survival curves). Parquet round-trips
    doubles exactly, so the loaded codebook is bit-identical to the fit."""
    rows = sigs.collect()
    if not rows:
        return []
    m = 1 + max(r["subspace"] for r in rows)
    n = 1 + max(r["code"] for r in rows)
    cb: list[list[list[float]]] = [[[] for _ in range(n)] for _ in range(m)]
    for r in rows:
        cb[r["subspace"]][r["code"]] = list(r["codeword"])
    return cb


_BUILDERS = {
    "doc": _build_doc_store,
    "emb": _build_emb_store,
    "idx": _build_text_index,
    "ivf": _build_ivf_store,
    "pq": _build_pq_store,
    "lm": _build_lm_store,
    "nb": _build_nb_store,
    "bpe": _build_bpe_store,
}
_RAW_TABLE = {
    "doc": "documents",
    "emb": "embeddings",
    "idx": "documents",
    "ivf": "embeddings",
    "pq": "embeddings",
    "lm": "documents",
    "nb": "documents",
    "bpe": "documents",
}


def _read_store(
    spark: SparkSession, sf_dir: str, kind: str
) -> tuple[DataFrame, DataFrame]:
    sigs_path, members_path = _paths(spark, sf_dir, kind)
    return spark.read.parquet(sigs_path), spark.read.parquet(members_path)


def _signatures_if_available(
    spark: SparkSession, sf_dir: str, kind: str
) -> tuple[DataFrame, DataFrame] | None:
    """Discovery: return (sigs, members) when a live, lake-covering store
    exists — NEVER builds one (a read must not trigger an ingest-time
    write). Absent, uncommitted, unprobeable, or stale → None (the query
    recomputes signatures inline — correct, just unamortized)."""
    from vectra_player_spark.tables import _read

    key = (id(spark), sf_dir, kind)
    paths = _paths(spark, sf_dir, kind)
    sig = _lake_signature(spark, sf_dir, _KIND_TABLES[kind])
    cached = _SIG_STORES.get(key)
    if cached is not None:
        store_cached, sig_cached = cached
        # None = unknown, never a match (round-7 ADVICE discipline)
        if _live(spark, paths) and sig is not None and sig_cached == sig:
            return store_cached
        _SIG_STORES.pop(key, None)
    if not _live(spark, paths):
        return None
    token = _success_token(spark, paths)
    if (
        sig is not None
        and token is not None
        and _STALE_STORES.get(key) == (sig, token)
    ):
        return None  # known-stale under this exact (lake, store) state
    sigs, members = _read_store(spark, sf_dir, kind)
    if members.count() != _read(spark, sf_dir, _RAW_TABLE[kind]).count():
        if sig is not None and token is not None:
            _STALE_STORES[key] = (sig, token)
        return None  # store no longer covers the lake — refresh needed
    _STALE_STORES.pop(key, None)
    _SIG_STORES[key] = ((sigs, members), sig)
    return sigs, members


def doc_signatures_if_available(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame] | None:
    return _signatures_if_available(spark, sf_dir, "doc")


def emb_signatures_if_available(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame] | None:
    return _signatures_if_available(spark, sf_dir, "emb")


def text_index_if_available(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame] | None:
    """(postings, doclen) — the persisted lexical inverted index."""
    return _signatures_if_available(spark, sf_dir, "idx")


def ivf_index_if_available(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame] | None:
    """(centroids, assignments) — the persisted IVF coarse quantizer."""
    return _signatures_if_available(spark, sf_dir, "ivf")


def pq_index_if_available(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame] | None:
    """(codebooks, codes) — the persisted product-quantization index."""
    return _signatures_if_available(spark, sf_dir, "pq")


def lm_counts_if_available(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame] | None:
    """(partial counts, members) — the persisted bigram-LM training
    counts; consumers groupBy-SUM the partials (vocabulary-sized)."""
    return _signatures_if_available(spark, sf_dir, "lm")


def bpe_model_if_available(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame] | None:
    """(merge table, final word-symbol table) split out of the persisted
    tokenizer store's tagged-union sigs — (merge_rank, lhs, rhs, merged,
    pair_count) and (word, cnt, syms). The word table IS word_counts(
    documents) with the learned merges pre-applied, so consumers derive
    both the model view and the vocabulary view from it without touching
    the corpus."""
    store = _signatures_if_available(spark, sf_dir, "bpe")
    if store is None:
        return None
    sigs, _members = store
    merges = sigs.where(F.col("merge_rank").isNotNull()).select(
        "merge_rank", "lhs", "rhs", "merged", "pair_count"
    )
    words = sigs.where(F.col("word").isNotNull()).select("word", "cnt", "syms")
    return merges, words


def nb_counts_if_available(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame] | None:
    """(partial counts, members) — the persisted NB-classifier training
    counts (cand, tok|NULL, c); consumers groupBy-SUM the partials."""
    return _signatures_if_available(spark, sf_dir, "nb")


_ALL_KINDS = ("doc", "emb", "idx", "ivf", "pq", "lm", "nb", "bpe")


def materialize_signature_store(spark: SparkSession, sf_dir: str) -> None:
    """Full build of all stores (ingest-time; used by
    tools/maintain_layouts.py and as the refresh fallback).

    The five stores are independent relations over two raw tables, so
    their builds submit as CONCURRENT Spark jobs (the standard
    multi-job-scheduler pattern): while one build's driver-side step
    (count verify, commit, model collect) idles the executors, another
    build's stages fill them. Measured at the 100× lake on local[32]:
    127.5 → 84.3 s. Correctness is unaffected — each build writes its
    own directories and the per-store _SUCCESS markers keep the
    all-or-nothing discovery contract per store."""
    from concurrent.futures import ThreadPoolExecutor

    from vectra_player_spark.session import prep_session

    prep_session(spark)
    with ThreadPoolExecutor(max_workers=len(_ALL_KINDS)) as ex:
        futs = {
            kind: ex.submit(_BUILDERS[kind], spark, sf_dir)
            for kind in _ALL_KINDS
        }
        for kind, fut in futs.items():
            fut.result()
            _finish(spark, sf_dir, kind)


def _finish(spark: SparkSession, sf_dir: str, kind: str) -> None:
    key = (id(spark), sf_dir, kind)
    _STALE_STORES.pop(key, None)
    _SIG_STORES[key] = (
        _read_store(spark, sf_dir, kind),
        _lake_signature(spark, sf_dir, _KIND_TABLES[kind]),
    )


def _refresh_doc(spark: SparkSession, sf_dir: str) -> dict:
    from vectra_player_spark.functions.text import fingerprint
    from vectra_player_spark.tables import _read

    sigs_path, members_path = _paths(spark, sf_dir, "doc")
    if not _live(spark, (sigs_path, members_path)):
        _build_doc_store(spark, sf_dir)
        return {"mode": "built", "delta_rows": None}
    sigs, members = _read_store(spark, sf_dir, "doc")
    raw = _read(spark, sf_dir, "documents").select("doc_id", "text")
    wm = members.agg(F.max("_member")).collect()[0][0]
    delta = raw.where(F.col("doc_id") > wm) if wm is not None else raw
    n_delta = delta.count()
    if n_delta:
        dfp = delta.select(
            "doc_id", "text", fingerprint("text").alias("fp")
        ).localCheckpoint(eager=True)  # cut lineage: several consumers below
        known_fps = sigs.select("fp", F.col("doc_id").alias("_rep"))
        known = dfp.join(known_fps, "fp").select(
            "_rep", F.col("doc_id").alias("_member")
        )
        unknown = dfp.join(sigs.select("fp"), "fp", "left_anti")
        # one new rep per unseen fp: min id carries the group (ids are
        # monotone, so existing reps stay minimal — the same watermark
        # algebra as the layout appends)
        new_reps = unknown.groupBy("fp").agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by("text", "doc_id").alias("text"),
        )
        new_sigs = _doc_rep_signatures(new_reps.select("doc_id", "text"))
        new_members = unknown.join(
            new_reps.select("fp", F.col("doc_id").alias("_rep")), "fp"
        ).select("_rep", F.col("doc_id").alias("_member"))
        # align column order with the stored schema before appending
        new_sigs.select(*sigs.columns).write.mode("append").parquet(sigs_path)
        known.unionByName(new_members).select(*members.columns).write.mode(
            "append"
        ).parquet(members_path)
    mode = "appended" if n_delta else "noop"
    if spark.read.parquet(members_path).count() != raw.count():
        _build_doc_store(spark, sf_dir)  # history mutated — rebuild from truth
        mode = "rebuilt"
    return {"mode": mode, "delta_rows": n_delta}


def _refresh_emb(spark: SparkSession, sf_dir: str) -> dict:
    from vectra_player_spark.functions.vectors import norm
    from vectra_player_spark.tables import _read

    sigs_path, members_path = _paths(spark, sf_dir, "emb")
    if not _live(spark, (sigs_path, members_path)):
        _build_emb_store(spark, sf_dir)
        return {"mode": "built", "delta_rows": None}
    sigs, members = _read_store(spark, sf_dir, "emb")
    raw = (
        _read(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            "label",
            F.col("embedding").cast("array<double>").alias("emb"),
        )
        .withColumn("nrm", norm("emb"))
    )
    wm = members.agg(F.max("_member")).collect()[0][0]
    delta = raw.where(F.col("vec_id") > wm) if wm is not None else raw
    n_delta = delta.count()
    if n_delta:
        d = delta.localCheckpoint(eager=True)
        known = d.join(
            sigs.select("label", "emb", F.col("vec_id").alias("_rep")),
            ["label", "emb"],
        ).select("_rep", F.col("vec_id").alias("_member"))
        unknown = d.join(
            sigs.select("label", "emb"), ["label", "emb"], "left_anti"
        )
        new_reps = unknown.groupBy("label", "emb").agg(
            F.min("vec_id").alias("vec_id"), F.first("nrm").alias("nrm")
        )
        new_sigs = _emb_rep_signatures(
            new_reps.select("vec_id", "label", "emb", "nrm")
        )
        new_members = unknown.join(
            new_reps.select("label", "emb", F.col("vec_id").alias("_rep")),
            ["label", "emb"],
        ).select("_rep", F.col("vec_id").alias("_member"))
        new_sigs.select(*sigs.columns).write.mode("append").parquet(sigs_path)
        known.unionByName(new_members).select(*members.columns).write.mode(
            "append"
        ).parquet(members_path)
    mode = "appended" if n_delta else "noop"
    if spark.read.parquet(members_path).count() != raw.count():
        _build_emb_store(spark, sf_dir)
        mode = "rebuilt"
    return {"mode": mode, "delta_rows": n_delta}


def _refresh_idx(spark: SparkSession, sf_dir: str) -> dict:
    """Per-doc artifact (no rep groups), so the watermark append is
    direct: delta docs' postings and lengths shuffle delta-sized into
    the partitioned index."""
    from vectra_player_spark.tables import _read

    postings_path, doclen_path = _paths(spark, sf_dir, "idx")
    if not _live(spark, (postings_path, doclen_path)):
        _build_text_index(spark, sf_dir)
        return {"mode": "built", "delta_rows": None}
    doclen = spark.read.parquet(doclen_path)
    raw = _read(spark, sf_dir, "documents").select("doc_id", "text")
    wm = doclen.agg(F.max("doc_id")).collect()[0][0]
    delta = raw.where(F.col("doc_id") > wm) if wm is not None else raw
    n_delta = delta.count()
    if n_delta:
        dls = _idx_tokens(delta).withColumn("dl", F.size("toks").cast("bigint"))
        (
            dls.select("doc_id", F.explode("toks").alias("term"))
            .groupBy("term", "doc_id")
            .agg(F.count(F.lit(1)).alias("tf"))
            .withColumn("term_lc", F.lower(F.col("term")))
            .withColumn("tb", F.expr(_TB_EXPR))
            .select(*spark.read.parquet(postings_path).columns)
            .write.mode("append")
            .partitionBy("tb")
            .parquet(postings_path)
        )
        dls.select("doc_id", "dl").write.mode("append").parquet(doclen_path)
    mode = "appended" if n_delta else "noop"
    if spark.read.parquet(doclen_path).count() != raw.count():
        _build_text_index(spark, sf_dir)
        mode = "rebuilt"
    return {"mode": mode, "delta_rows": n_delta}


def _refresh_lm(spark: SparkSession, sf_dir: str) -> dict:
    """Sum-mergeable artifact: the delta docs' PARTIAL counts land in the
    counts table (readers groupBy-SUM partials anyway) and the delta's
    coverage rows append to members.

    Crash-safety ordering: the delta's partials DYNAMIC-OVERWRITE their
    own seg=<watermark> partition FIRST, members append SECOND. A crash
    between the two leaves members (hence the watermark) unchanged, so
    the replayed refresh recomputes the identical delta and overwrites
    the same seg partition with identical content — a plain append here
    would silently DOUBLE the delta's gram counts on replay, and summed
    partials leave no duplicate rows to detect it by."""
    from vectra_player_spark.plans.queries_lm import lm_is_ref, lm_model_counts
    from vectra_player_spark.tables import _read

    counts_path, members_path = _paths(spark, sf_dir, "lm")
    if not _live(spark, (counts_path, members_path)):
        _build_lm_store(spark, sf_dir)
        return {"mode": "built", "delta_rows": None}
    members = spark.read.parquet(members_path)
    raw = _read(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    wm = members.agg(F.max("doc_id")).collect()[0][0]
    delta = raw.where(F.col("doc_id") > wm) if wm is not None else raw
    n_delta = delta.count()
    if n_delta:
        counts_cols = spark.read.parquet(counts_path).columns
        (
            lm_model_counts(delta)
            .withColumn(
                "seg", F.lit(wm if wm is not None else -2).cast("bigint")
            )
            .select(*counts_cols)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("seg")
            .parquet(counts_path)
        )
        delta.select(
            "doc_id", lm_is_ref().cast("int").alias("is_ref")
        ).select(*members.columns).write.mode("append").parquet(members_path)
    mode = "appended" if n_delta else "noop"
    if spark.read.parquet(members_path).count() != raw.count():
        _build_lm_store(spark, sf_dir)  # history mutated — rebuild from truth
        mode = "rebuilt"
    return {"mode": mode, "delta_rows": n_delta}



def _refresh_nb(spark: SparkSession, sf_dir: str) -> dict:
    """Sum-mergeable artifact, same crash-safety ordering as _refresh_lm:
    the delta's partials DYNAMIC-OVERWRITE their own seg=<watermark>
    partition FIRST, members append SECOND — a replayed refresh rewrites
    the same partition with identical content instead of double-counting
    the delta."""
    from vectra_player_spark.plans.queries_classify import (
        nb_is_train,
        nb_model_counts,
    )
    from vectra_player_spark.tables import _read

    counts_path, members_path = _paths(spark, sf_dir, "nb")
    if not _live(spark, (counts_path, members_path)):
        _build_nb_store(spark, sf_dir)
        return {"mode": "built", "delta_rows": None}
    members = spark.read.parquet(members_path)
    raw = _read(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    wm = members.agg(F.max("doc_id")).collect()[0][0]
    delta = raw.where(F.col("doc_id") > wm) if wm is not None else raw
    n_delta = delta.count()
    if n_delta:
        counts_cols = spark.read.parquet(counts_path).columns
        (
            nb_model_counts(delta)
            .withColumn(
                "seg", F.lit(wm if wm is not None else -2).cast("bigint")
            )
            .select(*counts_cols)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("seg")
            .parquet(counts_path)
        )
        delta.select(
            "doc_id", nb_is_train().cast("int").alias("is_train")
        ).select(*members.columns).write.mode("append").parquet(members_path)
    mode = "appended" if n_delta else "noop"
    if spark.read.parquet(members_path).count() != raw.count():
        _build_nb_store(spark, sf_dir)  # history mutated — rebuild from truth
        mode = "rebuilt"
    return {"mode": mode, "delta_rows": n_delta}


# Quantizer refresh policy: "rebuild" (default — bit-equal routed==direct,
# the oracle-exact contract) or "frozen" (keep the trained model, absorb
# the lake's delta under it — bounded ingest cost, relaxed contract).
QUANTIZER_REFRESH_CONF = "spark.vectra.quantizer.refresh"


def _refresh_quantizer(kind: str):
    """Refresh for the ivf/pq stores honoring QUANTIZER_REFRESH_CONF:
    rebuild mode defers to _refresh_rebuild; frozen mode keeps sigs (the
    centroids/codebooks) byte-untouched and appends ONLY above-watermark
    assignments/codes to members — delta-sized, map-only (the encode
    inlines the frozen model as literals), never a full-corpus pass.
    COUNT-CHANGING mutation below the watermark forces a rebuild (the
    final row-count check — matching _refresh_rebuild's guarantee); an
    equal-count delete+insert or in-place value edit below the watermark
    is NOT detected and would be served with stale assignments — frozen
    mode bounds ingest cost for append-shaped growth, nothing more."""
    rebuild = _refresh_rebuild(kind)

    def fn(spark: SparkSession, sf_dir: str) -> dict:
        from vectra_player_spark.tables import _read

        mode = (
            spark.conf.get(QUANTIZER_REFRESH_CONF, "rebuild") or "rebuild"
        ).lower()
        if mode != "frozen":
            return rebuild(spark, sf_dir)
        paths = _paths(spark, sf_dir, kind)
        if not _live(spark, paths):
            _BUILDERS[kind](spark, sf_dir)
            return {"mode": "built", "delta_rows": None}
        sigs, members = _read_store(spark, sf_dir, kind)
        raw = _read(spark, sf_dir, "embeddings")
        wm = members.agg(F.max("vec_id")).collect()[0][0]
        delta = raw.where(F.col("vec_id") > wm) if wm is not None else raw
        n_delta = delta.count()
        out_mode = "noop"
        if n_delta:
            if sigs.isEmpty():
                # no trained model to freeze (store built on an
                # all-NULL-embedding lake) — rebuild is the only
                # correct absorption
                _BUILDERS[kind](spark, sf_dir)
                return {"mode": "rebuilt", "delta_rows": n_delta}
            d_emb = delta.where(F.col("embedding").isNotNull())
            d_null = delta.where(F.col("embedding").isNull())
            if kind == "ivf":
                from vectra_player_spark.operators.knn import assign_cells

                new_rows = assign_cells(d_emb, sigs).select(
                    "vec_id", "cell_id"
                ).unionByName(
                    d_null.select(
                        "vec_id", F.lit(None).cast("int").alias("cell_id")
                    )
                )
            else:
                from vectra_player_spark.operators.knn import pq_encode

                new_rows = pq_encode(d_emb, load_pq_codebook(sigs)).unionByName(
                    d_null.select(
                        "vec_id",
                        F.lit(None).cast("array<int>").alias("codes"),
                        F.lit(None).cast("double").alias("vhat_norm"),
                    )
                )
            new_rows.select(*members.columns).write.mode("append").parquet(
                paths[1]
            )
            out_mode = "frozen-append"
        if spark.read.parquet(paths[1]).count() != raw.count():
            _BUILDERS[kind](spark, sf_dir)  # history mutated — full truth
            out_mode = "rebuilt"
        return {"mode": out_mode, "delta_rows": n_delta}

    return fn


def _refresh_rebuild(kind: str):
    """Refresh for the corpus-statistic stores (ivf/pq): rebuild when the
    lake changed — a frozen-quantizer append would diverge from direct
    recomputation (module docstring, 'two refresh regimes')."""

    def fn(spark: SparkSession, sf_dir: str) -> dict:
        from vectra_player_spark.tables import _read

        paths = _paths(spark, sf_dir, kind)
        if not _live(spark, paths):
            _BUILDERS[kind](spark, sf_dir)
            return {"mode": "built", "delta_rows": None}
        n_store = spark.read.parquet(paths[1]).count()
        n_raw = _read(spark, sf_dir, _RAW_TABLE[kind]).count()
        if n_store == n_raw:
            return {"mode": "noop", "delta_rows": 0}
        _BUILDERS[kind](spark, sf_dir)
        return {"mode": "rebuilt", "delta_rows": n_raw - n_store}

    return fn


def refresh_signature_store(spark: SparkSession, sf_dir: str) -> dict:
    """Incremental maintenance for every store: content-pure stores
    absorb the lake's new rows delta-sized (watermark append);
    corpus-statistic stores rebuild; 'built' when absent, 'noop' when
    fresh, 'rebuilt' when history below the watermark changed.
    Invalidate-first and re-memoize-after, per the round-7 refresh
    discipline."""
    from concurrent.futures import ThreadPoolExecutor

    from vectra_player_spark.session import prep_session
    from vectra_player_spark.tables import invalidate_lake

    prep_session(spark)
    invalidate_lake(sf_dir)
    fns = (
        ("doc", _refresh_doc),
        ("emb", _refresh_emb),
        ("idx", _refresh_idx),
        ("ivf", _refresh_quantizer("ivf")),
        ("pq", _refresh_quantizer("pq")),
        ("lm", _refresh_lm),
        ("nb", _refresh_nb),
        ("bpe", _refresh_rebuild("bpe")),
    )
    out: dict = {}
    # concurrent job submission, same rationale + measurement as
    # materialize_signature_store (stores are mutually independent)
    with ThreadPoolExecutor(max_workers=len(fns)) as ex:
        futs = {}
        for kind, fn in fns:
            _STALE_STORES.pop((id(spark), sf_dir, kind), None)
            futs[kind] = ex.submit(fn, spark, sf_dir)
        for kind, fut in futs.items():
            out[kind] = fut.result()
            _finish(spark, sf_dir, kind)
    return out

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
- simhash: 32-bit fingerprint from per-token md5 bit folds; near-dup =
  byte-banded candidate join (4 bands → exact recall for hamming<=3 by
  pigeonhole) + popcount(xor)<=k precision filter — simhash_neardup_pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vectra_player_spark.functions.text import fingerprint, tokens, word_shingles_text
from vectra_player_spark.session import pin

MINHASH_K = 8  # permutations (universal hashes over one md5 base hash)
MINHASH_BANDS = 4  # 4 bands x 2 rows

# Universal-hash permutation constants: h_i = (a_i·h + b_i) mod p. With
# a < 2^31 and h < 2^32, a·h + b stays below 2^63 — no bigint overflow in
# either engine (DuckDB raises on overflow instead of wrapping).
MINHASH_P = 2147483647
MINHASH_AB = (
    (1299721, 12345),
    (2750159, 98765),
    (1203793, 54321),
    (2102917, 11111),
    (1569619, 77777),
    (1300171, 33333),
    (2057731, 99999),
    (1231231, 13579),
)


# Engine-specific hex→int: both parse the first 8 md5 hex chars to the
# identical 32-bit integer (verified cross-engine), each via its native
# builtin — Spark's conv(), DuckDB's 0x-literal cast.
SPARK_HEX8 = "CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT)"
DUCKDB_HEX8 = "CAST('0x' || substring(md5(s), 1, 8) AS BIGINT)"


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup groups: fingerprint → (n_dups, keeper=min id)."""
    return (
        docs.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keeper_doc_id"))
    )


def rep_members(
    docs: DataFrame, id_col: str, key_cols: list,
) -> tuple[DataFrame, DataFrame]:
    """Collapse-first support: group rows equal on ``key_cols`` (exact
    duplicates), representative = min id per group. Returns ``(reps,
    members)`` — ``reps`` is one full row per distinct key (the rep's row),
    ``members`` maps every row to its rep as (_rep, _member).

    Why this exists: every pairwise near-dup operator below generates
    candidates quadratically WITHIN a bucket (posting list, simhash band
    bucket, LSH bucket). On a duplication-heavy corpus (the reference
    documents a 12.5× dedup ratio — 11,130 raw → 888 unique, "Machine
    Learning/models/sidebet-v1/training_data/README.md":162 — and ships a
    DeduplicationTracker at ingest, services/recording/src/dedup.py; the
    100× scale corpus has 100 verbatim copies per doc) bucket population
    scales with the duplication factor d,
    so candidate volume grows d² — a 100× corpus produced tens of GB of
    shuffle and ran out of disk. Since every score below is a pure function
    of content, scoring in representative space is EXACTLY equivalent:
    inter-group member pairs inherit their rep pair's score, intra-group
    pairs have the perfect score by definition. Candidate work drops d²,
    and the final expansion is a pair of equi-joins bounded by output size.

    Plan shape (round-10, guide §2.3 "shuffle fewer bytes"): formerly a
    min-over-window, which shuffles the FULL input row (text included) by
    the group key, re-run by every consumer of the returned frames. Now a
    groupBy (map-side combinable — on a duplication-d corpus the shuffle
    carries ~1/d of the rows, and only (key, id) columns) plus two
    equi-joins: members re-attach by a NULL-SAFE key join (the window
    groups NULL keys together, so the join must too), reps by the id
    join (a group's min id identifies exactly one row). Deliberately NOT
    pinned: a same-session A/B showed the cache write costs more than
    re-running the combined narrow aggregate (v4 2.5→3.4 s pinned, back
    to 2.5 unpinned; jaccard kept its 2.8→1.5 s win either way). Values
    are identical to the window form.
    """
    keyed = docs
    knames: list[str] = []
    for i, k in enumerate(key_cols):
        if isinstance(k, str):
            knames.append(k)
        else:
            name = f"__rk{i}"
            keyed = keyed.withColumn(name, k)
            knames.append(name)
    gids = keyed.groupBy(*[F.col(n) for n in knames]).agg(
        F.min(id_col).alias("_rep")
    )
    cond = None
    for n in knames:
        c = keyed[n].eqNullSafe(gids[n])
        cond = c if cond is None else (cond & c)
    members = keyed.join(gids, cond).select(
        "_rep", keyed[id_col].alias("_member")
    )
    reps = docs.join(
        gids.select(F.col("_rep").alias(id_col)), id_col
    ).select(*docs.columns)
    return reps, members


def expand_rep_pairs(
    rep_pairs: DataFrame,
    members: DataFrame,
    a_col: str,
    b_col: str,
    score_cols: list[str],
    intra_reps: DataFrame | None = None,
    intra_scores: dict | None = None,
) -> DataFrame:
    """Expand representative-space pairs to member-space pairs.

    ``rep_pairs``: (a_col, b_col, *score_cols) with a_col < b_col rep ids.
    Inter-group: every (member of a) × (member of b) pair, re-ordered with
    least/greatest (groups are disjoint so members never tie). Intra-group:
    for groups whose rep appears in ``intra_reps`` (single id column named
    a_col), all C(n,2) member pairs with the constant perfect scores from
    ``intra_scores``. Both are equi-joins — total cost is output-bound."""
    ma = members.select(F.col("_rep").alias(a_col), F.col("_member").alias("_ma"))
    mb = members.select(F.col("_rep").alias(b_col), F.col("_member").alias("_mb"))
    inter = (
        rep_pairs.join(ma, a_col)
        .join(mb, b_col)
        .select(
            F.least("_ma", "_mb").alias(a_col),
            F.greatest("_ma", "_mb").alias(b_col),
            *score_cols,
        )
    )
    if intra_reps is None:
        return inter
    gm = members.join(
        intra_reps.select(F.col(a_col).alias("_rep")).distinct(), "_rep"
    )
    x = gm.select("_rep", F.col("_member").alias("_ma"))
    y = gm.select("_rep", F.col("_member").alias("_mb"))
    intra = (
        x.join(y, "_rep")
        .where(F.col("_ma") < F.col("_mb"))
        .select(
            F.col("_ma").alias(a_col),
            F.col("_mb").alias(b_col),
            *[
                (v if isinstance(v, Column) else F.lit(v)).alias(c)
                for c, v in (intra_scores or {}).items()
            ],
        )
    )
    return inter.unionByName(intra)


def doc_shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", w: int = 3) -> DataFrame:
    """Distinct (doc_id, shingle) pairs."""
    return (
        docs.select(F.col(id_col), F.explode(word_shingles_text(text_col, w)).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 3,
    k: int = MINHASH_K,
) -> DataFrame:
    """K min-hash values per doc via k universal-hash permutations over ONE
    md5 pass: h = int(md5(shingle)[:8], 16); h_i = (a_i·h + b_i) mod p.

    Computed entirely per-row with array higher-order functions — min over
    the shingle ARRAY equals min over the distinct shingle SET, so no
    explode, no distinct, no groupBy: the signature stage is map-side only
    and shuffles nothing regardless of corpus size. Docs with fewer than w
    tokens have no shingles and are excluded (they can't LSH-collide
    meaningfully, and NULL min-hashes would poison band hashes)."""
    shingled = docs.select(
        F.col(id_col), word_shingles_text(text_col, w).alias("shingles")
    ).where(F.size("shingles") > 0)
    base = shingled.select(
        F.col(id_col),
        F.expr(f"transform(shingles, s -> {SPARK_HEX8})").alias("hv"),
    )
    sig_cols = [
        F.array_min(
            F.expr(f"transform(hv, h -> (CAST({a} AS BIGINT) * h + {b}) % {MINHASH_P})")
        ).alias(f"h{i}")
        for i, (a, b) in enumerate(MINHASH_AB[:k])
    ]
    return base.select(F.col(id_col), *sig_cols)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 3,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    prepared: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """LSH candidate pairs (doc_a < doc_b) sharing at least one band.

    Collapse-first: signatures and the band join run over one
    representative per distinct text (see rep_members — candidate volume
    is quadratic in the duplication factor otherwise), then member pairs
    expand via equi-joins. Intra-group pairs exist only for groups WITH
    shingles: docs shorter than w tokens have no signature and produce no
    pairs in the direct computation either.

    ``prepared``: an externally-computed (reps, members) pair from
    rep_members over the same (id_col, text_col) — lets a composition
    that runs SEVERAL pair operators over one corpus (doc_lsh_recall_
    report runs this plus the exact Jaccard form) collapse once instead
    of once per operator."""
    base = docs.select(F.col(id_col), F.col(text_col))
    if prepared is not None:
        reps, members = prepared
    else:
        reps, members = rep_members(base, id_col, [fingerprint(text_col)])
    # THREE consumers read the signature table (both sides of the band
    # self-join + the intra-group rep set), and per-branch pruning defeats
    # ReuseExchange — unpinned, the shingle→md5→min chain (the query's
    # dominant CPU) runs twice. One rep-space materialization (|distinct
    # texts| rows) halves it: measured 2.2 s → 1.45 s at sf0.1.
    sig = pin(minhash_signatures(reps, id_col, text_col, w, k))
    return minhash_pairs_from_signatures(sig, members, id_col, k, bands)


def minhash_pairs_from_signatures(
    sig: DataFrame,
    members: DataFrame,
    id_col: str = "doc_id",
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
) -> DataFrame:
    """Band join + member expansion over a PRECOMPUTED rep signature
    relation (id_col, h0..h{k-1}) — the stage the persisted signature
    store (operators/sigstore) rides: at 100 TB the signatures are an
    ingest-time artifact, so the per-query cost collapses to this banded
    equi-join. ``sig`` must hold only reps WITH signatures (shingle-less
    docs excluded, as minhash_signatures produces); ``members`` maps every
    doc to its rep (_rep, _member). Identical output to minhash_lsh_pairs
    by construction — signatures are pure functions of text."""
    long = band_long(sig, id_col, k, bands)
    a = long.select(
        F.col(id_col).alias("doc_a"), F.col("band_idx"), F.col("band_hash")
    )
    b = long.select(
        F.col(id_col).alias("doc_b"), F.col("band_idx"), F.col("band_hash")
    )
    rep_pairs = (
        a.join(b, ["band_idx", "band_hash"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return expand_rep_pairs(
        rep_pairs, members, "doc_a", "doc_b", [],
        intra_reps=sig.select(F.col(id_col).alias("doc_a")),
        intra_scores={},
    )


def band_long(
    sig: DataFrame,
    id_col: str = "doc_id",
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
) -> DataFrame:
    """Unpivot a signature relation (id, h0..h{k-1}) into the long banded
    form (id, band_idx, band_hash) — the join key of every LSH candidate
    stage. Map-side only (stack is a generator projection, no shuffle)."""
    rows_per_band = k // bands
    band_cols = [
        F.concat_ws(
            "|",
            *[
                F.col(f"h{b * rows_per_band + r}").cast("string")
                for r in range(rows_per_band)
            ],
        ).alias(f"b{b}")
        for b in range(bands)
    ]
    banded = sig.select(F.col(id_col), *band_cols)
    stack_expr = ", ".join(f"{b}, b{b}" for b in range(bands))
    return banded.select(
        F.col(id_col),
        F.expr(f"stack({bands}, {stack_expr}) AS (band_idx, band_hash)"),
    ).select(id_col, "band_idx", "band_hash")


def crosscorpus_neardup_counts(
    docs: DataFrame,
    is_new: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 3,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
) -> DataFrame:
    """Incremental-crawl dedup: for each doc in the NEW batch (``is_new``
    true), count the distinct OLD-corpus docs that are dedup candidates
    against it — exact fingerprint matches ∪ MinHash band collisions. The
    op every corpus refresh runs: dedup the incoming batch AGAINST the
    existing lake, not within itself (RefinedWeb/Dolma-style pipelines).

    Enumeration-free AND collapse-first, with TWO group keys because the
    two candidate arms are pure functions of different text forms
    (the queries_text._text_reps rule): raw-text groups g (md5(text),
    rep = min id) carry the signature arm — identical RAW texts have
    identical signatures, so rep band collisions are exactly member
    collisions, case variants included — while the exact arm rolls the
    raw groups up by the NORMALIZED fingerprint (lower + whitespace
    collapse), matching the direct form's fingerprint join. A new member
    of raw group g counts exact_old(fp(g)) + Σ_{h: fp(h)≠fp(g),
    h band-collides g} old_cnt(h): the fp(h)≠fp(g) filter reproduces the
    direct form's DISTINCT union (a same-fingerprint pair is already an
    exact candidate, banded or not). Cost is the banded rep self-join
    plus three count aggregates — independent of the duplication factor
    and of the candidate-pair count. Docs with NULL text carry no
    fingerprint and no signature (they match nothing in the direct form)
    and are excluded here; the caller left-joins them back with 0."""
    base = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.col(text_col), is_new.alias("_is_new")
    )
    # Narrow groupBy + join instead of a min-over-window (round-10, the
    # rep_members rewrite — guide §2.3): the group key is md5(text) and
    # non-null here, so a plain equi-join groups exactly like the window.
    keyed = base.withColumn("_k", F.md5(F.col(text_col)))
    gids = keyed.groupBy("_k").agg(F.min(id_col).alias("_rep"))
    tagged = keyed.join(gids, "_k")
    reps = base.join(gids.select(F.col("_rep").alias(id_col)), id_col)
    rep_fp = reps.select(
        F.col(id_col).alias("_rep"), fingerprint(text_col).alias("_fp")
    )
    # grp feeds FOUR branches (exact rollup, both band-join sides, the
    # final member join) — pin the narrow rep-space relation.
    grp = pin(
        tagged.groupBy("_rep")
        .agg(
            F.sum(F.when(~F.col("_is_new"), 1).otherwise(0))
            .cast("bigint")
            .alias("_old_cnt")
        )
        .join(rep_fp, "_rep")
    )
    exact_cnt = grp.groupBy("_fp").agg(
        F.sum("_old_cnt").cast("bigint").alias("_fp_old")
    )
    sig = pin(
        minhash_signatures(
            reps.select(id_col, text_col), id_col, text_col, w, k
        )
    )
    long = band_long(sig, id_col, k, bands)
    rep_pairs = (
        long.select(F.col(id_col).alias("_g"), "band_idx", "band_hash")
        .join(
            long.select(F.col(id_col).alias("_h"), "band_idx", "band_hash"),
            ["band_idx", "band_hash"],
        )
        .where(F.col("_g") != F.col("_h"))
        .select("_g", "_h")
        .distinct()
    )
    band_sums = (
        rep_pairs.join(
            grp.select(
                F.col("_rep").alias("_h"),
                "_old_cnt",
                F.col("_fp").alias("_fp_h"),
            ),
            "_h",
        )
        .join(grp.select(F.col("_rep").alias("_g"), F.col("_fp").alias("_fp_g")), "_g")
        .where(F.col("_fp_g") != F.col("_fp_h"))
        .groupBy("_g")
        .agg(F.sum("_old_cnt").cast("bigint").alias("_band_old"))
    )
    n_old = (F.col("_fp_old") + F.coalesce(F.col("_band_old"), F.lit(0))).cast(
        "bigint"
    )
    return (
        tagged.where(F.col("_is_new"))
        .select(F.col(id_col), "_rep")
        .join(grp.select("_rep", "_fp"), "_rep")
        .join(exact_cnt, "_fp")
        .join(band_sums.withColumnRenamed("_g", "_rep"), "_rep", "left")
        .select(
            F.col(id_col),
            n_old.alias("n_old_candidates"),
            (n_old > 0).cast("int").alias("is_dup"),
        )
    )


# Measured posting-list cap default (round-8). Distribution at the 100×
# lake (500k docs, duplication factor d=100): max RAW shingle df = 2,500,
# p99.99 = 2,400 — the raw tail is pure duplication (rep-space posting
# lists top out at 25, total in-list pair work 1.26M pairs, because
# collapse-first already divides the quadratic stage by d²). The default
# is 2× the observed 100× maximum: it drops NOTHING on any tested lake
# (delta = 0, so the oracle-backed queries keep exact semantics), while
# at a real 100 TB corpus it clips the stopword-shingle tail whose
# posting lists would otherwise make in-list pairing quadratic. Dropped
# shingles are COUNTED AND LOGGED whenever the cap binds (no silent
# caps); pass ``max_doc_freq=None`` for the exact uncapped form.
NGRAM_MAX_DOC_FREQ = 5_000

_LOG = __import__("logging").getLogger("vectra_player_spark.dedup")


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 3,
    threshold: float = 0.2,
    max_doc_freq: int | None = NGRAM_MAX_DOC_FREQ,
    prepared: tuple[DataFrame, DataFrame] | None = None,
    return_rep_space: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Near-dup pairs by w-gram Jaccard >= threshold via inverted index.

    Collapse-first: the inverted index and pair scoring run over one
    representative per distinct text (posting lists are otherwise d× longer
    on a corpus with duplication factor d, and the pairs-within-posting-list
    stage d² bigger — the 100× corpus made this the single worst shuffle in
    the engine). Jaccard is a pure function of the two texts, so member
    pairs inherit the rep pair's score; intra-group pairs score exactly 1.0
    and exist only for groups with ≥1 (post-cap) shingle, matching the
    direct computation (shingle-less docs never pair). ``max_doc_freq``
    (default ``NGRAM_MAX_DOC_FREQ`` — see the measured note above)
    counts RAW document frequency — each rep's shingle contributes
    its group size — so capped shingles are dropped identically to an
    uncollapsed computation; when the cap binds, the dropped-shingle
    count is logged (no-silent-caps discipline).
    ``prepared``: see minhash_lsh_pairs — shared rep collapse for
    multi-operator compositions. ``return_rep_space``: skip the member
    expansion and return ``(rep_pairs, intra_reps)`` — the pairs among
    representatives plus the single-column frame of reps eligible for
    intra-group pairing (>= 1 post-cap shingle). Flag-set consumers
    (doc_dedup_method_agreement) use this to stay enumeration-free while
    keeping the cap's RAW-df semantics (pass the real member map)."""
    base = docs.select(F.col(id_col), F.col(text_col))
    if prepared is not None:
        reps, members = prepared
    else:
        reps, members = rep_members(base, id_col, [fingerprint(text_col)])
    sh = doc_shingles(reps, id_col, text_col, w)
    if max_doc_freq is not None:
        # Pre-cap shingles feed two consumers (the df aggregate and the
        # capped join below) — pin so the shingle explosion runs once.
        sh = pin(sh)
        gsize = members.groupBy(F.col("_rep").alias(id_col)).agg(
            F.count(F.lit(1)).alias("_gsize")
        )
        # Two consumers of the df aggregate (the drop accounting below and
        # the cap join) — pin it so the shuffle runs once.
        freq = pin(
            sh.join(gsize, id_col)
            .groupBy("shingle")
            .agg(F.sum("_gsize").alias("df"))
        )
        # No-silent-caps: count what the cap drops and say so. One small
        # aggregate over the pinned df relation; at cluster scale this is
        # the drop-accounting a curation pipeline must emit.
        n_dropped = freq.where(F.col("df") > max_doc_freq).count()
        if n_dropped:
            _LOG.warning(
                "ngram_jaccard_pairs: max_doc_freq=%d dropped %d shingles "
                "(posting lists above the cap; pairs sharing ONLY those "
                "shingles will not be scored)",
                max_doc_freq,
                n_dropped,
            )
        sh = sh.join(freq.where(F.col("df") <= max_doc_freq), "shingle").select(
            id_col, "shingle"
        )
    # THREE consumers of the (possibly df-capped) shingle explosion —
    # sizes + both inverted-index sides; pin it (see minhash_lsh_pairs).
    sh = pin(sh)
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
    rep_pairs = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
            ).alias("_jaccard_raw"),
        )
        # Threshold on the UNROUNDED ratio (matches the oracle's WHERE);
        # round only for the output column.
        .where(F.col("_jaccard_raw") >= threshold)
        .select("doc_a", "doc_b", F.round("_jaccard_raw", 6).alias("jaccard"))
    )
    if return_rep_space:
        return rep_pairs, sizes.select(F.col(id_col).alias("_rep"))
    return expand_rep_pairs(
        rep_pairs, members, "doc_a", "doc_b", ["jaccard"],
        intra_reps=sizes.select(F.col(id_col).alias("doc_a")),
        intra_scores={"jaccard": 1.0},
    )


def simhash_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32
) -> DataFrame:
    """32-bit SimHash: token → 32-bit hash v = int(md5(tok)[:8], 16);
    bit i of the fingerprint = sign of Σ over distinct tokens of
    ((v >> i) & 1 ? +1 : -1).

    Per-row array HOFs, fully map-side (no explode/groupBy). The hex→int
    conversion happens ONCE per token; the 32 per-bit folds are integer
    shift/mask ops over an int array — string work doesn't scale with
    `bits` (the previous nibble-parity form did 32 substring folds per
    token and dominated the 10× scale run)."""
    hashed = docs.select(
        F.col(id_col),
        F.expr(
            f"transform(array_distinct(split(trim({text_col}), '\\\\s+')), s -> {SPARK_HEX8})"
        ).alias("hv"),
    )

    def bit_sum(i: int):
        return F.expr(
            f"aggregate(hv, 0, (acc, v) -> acc + CAST((v >> {i}) & 1 AS INT) * 2 - 1)"
        )

    fp = None
    for i in range(bits):
        term = F.when(bit_sum(i) > 0, F.lit(2**i).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        fp = term if fp is None else fp + term
    return hashed.select(F.col(id_col), fp.alias("simhash"))


def simhash_neardup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs at hamming distance <= k over 32-bit SimHash
    fingerprints, via byte-banded candidate generation.

    The 32-bit fingerprint splits into `bands` bytes; by pigeonhole, any
    pair differing in <= bands-1 bits shares at least one identical byte,
    so for k < bands the band equi-join has EXACT recall — no all-pairs
    product, candidates only materialize inside a (band_idx, band_byte)
    bucket, then popcount(xor) <= k filters precision. The same banded
    shape as minhash_lsh_pairs: 100 TB-safe, shuffle on the band key only.

    Catches the reference stream's near-identical re-broadcasts (12.5×
    dedup ratio, "Machine Learning/models/sidebet-v1/training_data/
    README.md":162; its DeduplicationTracker handles only exact-gameId
    repeats, services/recording/src/dedup.py) that exact fingerprint
    equality misses at hamming 1-3.
    """
    if k >= bands:
        raise ValueError(f"exact recall needs k < bands (got k={k}, bands={bands})")
    # Collapse-first (see rep_members): identical texts share every band
    # byte, so a duplication factor d inflates band buckets d× and the
    # candidate join d² — fingerprint and band-join one rep per distinct
    # text instead, then expand. Every doc has a fingerprint (empty/null
    # text folds to 0), so every group qualifies for intra-group pairs
    # (hamming 0 <= k always).
    base = docs.select(F.col(id_col), F.col(text_col))
    reps, members = rep_members(base, id_col, [fingerprint(text_col)])
    # Both self-join sides read the fingerprint table and ReuseExchange
    # won't fire across the differently-pruned branches (same finding as
    # minhash_lsh_pairs) — pin the rep-space fingerprints so the
    # token→md5→bit-vote chain runs once.
    fp = pin(simhash_fingerprints(reps, id_col, text_col))
    return simhash_pairs_from_fingerprints(fp, members, id_col, k, bands)


def simhash_pairs_from_fingerprints(
    fp: DataFrame,
    members: DataFrame,
    id_col: str = "doc_id",
    k: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Byte-banded hamming<=k pairs + member expansion over PRECOMPUTED
    rep fingerprints (id_col, simhash) — the signature-store stage (see
    minhash_pairs_from_signatures). Every rep has a fingerprint (empty
    text folds to 0), so intra pairs cover all groups, matching
    simhash_neardup_pairs exactly."""
    if k >= bands:
        raise ValueError(f"exact recall needs k < bands (got k={k}, bands={bands})")
    band_width = 32 // bands
    mask = (1 << band_width) - 1
    stack_expr = ", ".join(
        f"{b}, (simhash >> {b * band_width}) & {mask}" for b in range(bands)
    )
    long = fp.select(
        F.col(id_col),
        F.col("simhash"),
        F.expr(f"stack({bands}, {stack_expr}) AS (band_idx, band_byte)"),
    )
    a = long.select(
        F.col(id_col).alias("doc_a"), F.col("simhash").alias("sim_a"),
        "band_idx", "band_byte",
    )
    b = long.select(
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("sim_b"),
        "band_idx", "band_byte",
    )
    rep_pairs = (
        a.join(b, ["band_idx", "band_byte"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.expr("sim_a ^ sim_b")).cast("bigint")
        )
        .where(F.col("hamming") <= k)
        .select("doc_a", "doc_b", "hamming")
    )
    return expand_rep_pairs(
        rep_pairs, members, "doc_a", "doc_b", ["hamming"],
        intra_reps=fp.select(F.col(id_col).alias("doc_a")),
        intra_scores={"hamming": F.lit(0).cast("bigint")},
    )


def simhash_neardup_stats(
    fp: DataFrame,
    members: DataFrame,
    id_col: str = "doc_id",
    k: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Enumeration-free consumer form of simhash_pairs_from_fingerprints:
    (hamming, n_pairs, sum_ids) per hamming distance — WITHOUT ever
    materializing a member pair.

    Why it exists (round-8): on the 100× corpus (duplication factor
    d=100) the pair-ENUMERATION query is output-bound — 15.7B rows exist,
    so 43.5 s is the listing's floor, not a plan defect. Every consumer
    that wants volume/accounting (how much near-duplication is in the
    lake, per distance) gets the same information from group algebra in
    rep space, the ``interval_concurrency_prefix`` pattern: for a rep
    pair (A, B) with member counts (s_a, s_b) and member-id sums
    (m_a, m_b), the expansion contributes s_a·s_b pairs and
    Σ(a+b) = s_b·m_a + s_a·m_b to the id-sum digest — each member of A
    pairs with all s_b members of B, so its id appears s_b times (and
    symmetrically); the digest is orientation-free because every pair
    contributes doc_a + doc_b. Intra-group: C(s,2) pairs at hamming 0,
    id-sum (s−1)·m. Cost is the rep-space band join only — O(rep pairs),
    d² smaller than the enumeration, output |distinct hamming| rows.

    ``fp``: rep fingerprints (id_col, simhash) — every rep (simhash is
    total: empty text folds to 0), exactly as the signature store holds
    them. Values equal aggregating the enumeration, verified against the
    all-pairs SQL oracle. sum_ids accumulates in DECIMAL(38,0) and is
    emitted as a STRING: the 100× lake's digest is ~4e20 (15.7B pairs ×
    ~2.6e10 id sums) — past BIGINT — and exact wide integers round-trip
    engine-portably only as text (the agg-digest tier's HUGEINT→float64
    pandas finding, SCALE.md round 7).
    """
    if k >= bands:
        raise ValueError(f"exact recall needs k < bands (got k={k}, bands={bands})")
    gstats = members.groupBy(F.col("_rep").alias(id_col)).agg(
        F.count(F.lit(1)).alias("_s"),
        F.sum("_member").alias("_m"),
    )
    # rep-space hamming pairs: same byte-band candidate join as the
    # enumeration form (pigeonhole-exact recall for k < bands)
    band_width = 32 // bands
    mask = (1 << band_width) - 1
    stack_expr = ", ".join(
        f"{b}, (simhash >> {b * band_width}) & {mask}" for b in range(bands)
    )
    long = fp.select(
        F.col(id_col),
        F.col("simhash"),
        F.expr(f"stack({bands}, {stack_expr}) AS (band_idx, band_byte)"),
    )
    a = long.select(
        F.col(id_col).alias("_ra"), F.col("simhash").alias("sim_a"),
        "band_idx", "band_byte",
    )
    b = long.select(
        F.col(id_col).alias("_rb"), F.col("simhash").alias("sim_b"),
        "band_idx", "band_byte",
    )
    rep_pairs = (
        a.join(b, ["band_idx", "band_byte"])
        .where(F.col("_ra") < F.col("_rb"))
        .select("_ra", "_rb", "sim_a", "sim_b")
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.expr("sim_a ^ sim_b")).cast("bigint")
        )
        .where(F.col("hamming") <= k)
    )
    sa = gstats.select(
        F.col(id_col).alias("_ra"), F.col("_s").alias("_sa"), F.col("_m").alias("_ma")
    )
    sb = gstats.select(
        F.col(id_col).alias("_rb"), F.col("_s").alias("_sb"), F.col("_m").alias("_mb")
    )
    inter = (
        rep_pairs.join(sa, "_ra")
        .join(sb, "_rb")
        .select(
            "hamming",
            (F.col("_sa") * F.col("_sb")).alias("_n"),
            (F.col("_sb") * F.col("_ma") + F.col("_sa") * F.col("_mb")).alias("_ids"),
        )
    )
    intra = gstats.select(
        F.lit(0).cast("bigint").alias("hamming"),
        (F.col("_s") * (F.col("_s") - 1) / 2).cast("bigint").alias("_n"),
        ((F.col("_s") - 1) * F.col("_m")).alias("_ids"),
    ).where(F.col("_n") > 0)
    return (
        inter.unionByName(intra)
        .groupBy("hamming")
        .agg(
            F.sum("_n").cast("bigint").alias("n_pairs"),
            # exact association-free accumulation; string output (see above)
            F.sum(F.col("_ids").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("sum_ids"),
        )
    )


def chunk_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 16,
) -> DataFrame:
    """Chunk-level (sub-document) exact dedup — the scalable approximation of
    suffix-array substring dedup used by LLM-data pipelines: split each doc
    into consecutive ``chunk_tokens``-token chunks, hash each chunk, and keep
    only the corpus-wide FIRST occurrence (min (doc_id, chunk_idx)) of every
    distinct chunk. Catches boilerplate / quoted passages shared across
    otherwise-distinct documents that document-level fingerprints miss.

    Returns one row per doc: total chunks, duplicated chunks, and an md5 over
    the surviving (kept, in-order) chunk text — NULL when every chunk of the
    doc already appeared earlier in the corpus (i.e. the doc is pure dup).

    Scale shape: one explode (corpus tokens / chunk_tokens rows), ONE
    shuffle on the chunk hash for the keep-first window, one groupBy doc_id.
    No joins, no all-pairs anything — linear in corpus size at 100 TB.
    """
    ct = chunk_tokens
    toks = docs.select(F.col(id_col), tokens(text_col).alias("toks"))
    chunks = toks.select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, CAST(ceil(size(toks) / {ct}.0) AS INT) - 1), "
                f"i -> concat_ws(' ', slice(toks, i * {ct} + 1, {ct})))"
            )
        ).alias("chunk_idx", "chunk_text"),
    ).select(
        F.col(id_col),
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        "chunk_text",
    )
    w = Window.partitionBy(F.md5("chunk_text")).orderBy(id_col, "chunk_idx")
    flagged = chunks.withColumn("kept", F.row_number().over(w) == 1)
    kept_struct = F.when(F.col("kept"), F.struct("chunk_idx", "chunk_text"))
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("kept"), 0).otherwise(1)).cast("bigint").alias("n_dup_chunks"),
        # md5 over kept chunks in document order; NULL when nothing survives
        # (matches the oracle's md5(string_agg(...) FILTER ...) null form).
        F.when(
            F.sum(F.col("kept").cast("int")) > 0,
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(F.collect_list(kept_struct)),
                        lambda x: x["chunk_text"],
                    ),
                )
            ),
        ).alias("clean_hash"),
    )


def connected_components(
    pairs: DataFrame, src: str = "vec_a", dst: str = "vec_b", max_iter: int = 50
) -> DataFrame:
    """Connected components over near-dup pairs — the canonicalization step
    after any pairwise dedup method (minhash/simhash/embedding-LSH): members
    of one component are duplicates of each other; the minimum id is the
    canonical keeper.

    Deterministic min-label propagation (GraphX-style CC without the
    GraphFrames dependency): every node's label converges to the minimum id
    in its component in O(diameter) rounds — dup clusters are shallow, so
    this is typically 2-4 rounds. Each round is two equi-joins on the node
    key; `localCheckpoint(eager)` truncates lineage so the plan stays
    bounded regardless of round count (at cluster scale, swap for
    `checkpoint()` against a reliable store and track convergence with an
    accumulator instead of the count action).

    Returns (node_id, component): one row per node that appears in a pair;
    nodes in no pair are singletons by definition and are omitted.
    """
    edges = (
        pairs.select(F.col(src).cast("bigint").alias("u"), F.col(dst).cast("bigint").alias("v"))
        .union(
            pairs.select(F.col(dst).cast("bigint").alias("u"), F.col(src).cast("bigint").alias("v"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("u").alias("node_id")).distinct().withColumn(
        "component", F.col("node_id")
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["v"] == labels["node_id"])
            .groupBy("u")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node_id"] == nbr_min["u"], "left")
            .select(
                labels["node_id"],
                F.least(
                    labels["component"], F.coalesce(F.col("nbr_min"), labels["component"])
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node_id")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def minhash_band_table(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 3,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
) -> DataFrame:
    """Long-form LSH band table (id, band_idx, band_hash) — one row per
    band per doc, map-side only. The building block the streaming
    near-dup suppressor shares with minhash_lsh_pairs: a doc is a
    near-dup candidate of anything sharing a (band_idx, band_hash)."""
    sig = minhash_signatures(docs, id_col, text_col, w, k)
    rows_per_band = k // bands
    band_cols = [
        F.concat_ws(
            "|",
            *[
                F.col(f"h{b * rows_per_band + r}").cast("string")
                for r in range(rows_per_band)
            ],
        ).alias(f"b{b}")
        for b in range(bands)
    ]
    banded = sig.select(F.col(id_col), *band_cols)
    stack_expr = ", ".join(f"{b}, b{b}" for b in range(bands))
    return banded.select(
        F.col(id_col),
        F.expr(f"stack({bands}, {stack_expr}) AS (band_idx, band_hash)"),
    ).select(id_col, "band_idx", "band_hash")


# --------------------------------------------------------------------------
# Any-alignment duplicated-substring spans (suffix-array dedup, distributed)
# --------------------------------------------------------------------------

DUP_SPAN_K = 8  # window length in tokens; a span is >= k duplicated tokens


def dup_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DUP_SPAN_K,
    min_count: int = 2,
) -> DataFrame:
    """Maximal duplicated token spans at ANY alignment — the distributed
    equivalent of suffix-array substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): a token
    position is *duplicated* when some k-token window covering it occurs
    ``min_count``-or-more times corpus-wide (same doc or another doc — a
    second occurrence anywhere counts, exactly the suffix-array criterion).
    Unlike `chunk_dedup`'s fixed k-token grid, the sliding window catches
    duplicated passages at arbitrary offsets.

    Shape: slide a k-gram window over every doc (one explode, ~1 row per
    corpus token), count occurrences of each window hash (ONE shuffle on
    the hash — the gram text is dropped before the exchange, only
    (id, pos, md5) travels), keep windows seen >= min_count times, then
    merge overlapping/adjacent windows per doc into maximal spans with a
    gaps-and-islands window pass (one shuffle on id, per-doc state only).
    Everything is linear in corpus tokens; nothing is pairwise. A suffix
    array would find spans of length >= k exactly the same way — any
    duplicated substring of length >= k contains a duplicated k-gram at
    every alignment inside it, so the merged k-gram cover IS the set of
    maximal duplicated runs (granularity k at the edges).

    Returns one row per span: (id, span_start, span_end, span_len) in
    token positions, inclusive.
    """
    reps, rep_spans, members = rep_span_frames(docs, id_col, text_col, k, min_count)
    return rep_spans.join(members, rep_spans[id_col] == members["_rep"]).select(
        F.col("_member").alias(id_col), "span_start", "span_end", "span_len"
    )


def rep_span_frames(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    min_count: int,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared collapse-first core of the dup-span family: rep-space spans
    with exact-copy weights.

    Verbatim copies have identical gram sets at identical positions, so
    the gram explode + count-shuffle only needs to see one REPRESENTATIVE
    per distinct raw text (md5(text)-keyed — NOT the normalized dedup
    fingerprint: spans are token-exact, so case/whitespace variants must
    stay distinct), with each gram occurrence weighted by the rep's copy
    count. The weighted sum over a gram hash equals the raw occurrence
    count exactly, so dup flags — and therefore spans — are unchanged; on
    a duplication-heavy corpus the dominant stage shrinks by the
    duplication factor d (the linear-stage analog of the pairwise
    families' d² rep collapse). Costs one (id, text) exchange for the
    collapse — bounded by input size, paid once.

    Returns (reps, rep_spans, members): reps = (id, text, _w copy count);
    rep_spans = (id, span_start, span_end, span_len, _w); members =
    (_rep, _member).
    """
    keyed = docs.select(F.col(id_col), F.col(text_col), F.md5(text_col).alias("_k"))
    reps_raw, members = rep_members(keyed, id_col, ["_k"])
    weights = members.groupBy("_rep").agg(F.count(F.lit(1)).cast("bigint").alias("_w"))
    reps = (
        reps_raw.join(weights, reps_raw[id_col] == weights["_rep"])
        .select(F.col(id_col), F.col(text_col), "_w")
    )
    reps = pin(reps)
    # The gram hash is an INTERNAL grouping key (the oracle's md5 plays the
    # same role on its side; outputs compare over the merged spans, not the
    # hashes) — but dup flags DO depend on hash equality, so the key must
    # stay collision-free at 100 TB gram counts. One xxhash64 lane is not
    # (birthday ~n²/2⁶⁵ is material at 1e10 distinct grams); two
    # independently-salted lanes give an effective 128-bit key
    # (~n²/2¹²⁹ — negligible) while the shuffle still carries 16 bytes
    # instead of a 32-char md5 string.
    grams = reps.select(
        F.col(id_col),
        "_w",
        F.posexplode(word_shingles_text(text_col, k)).alias("pos", "gram"),
    ).select(
        F.col(id_col),
        "_w",
        "pos",
        F.struct(
            F.xxhash64("gram").alias("h1"),
            F.xxhash64(F.concat(F.lit("g2:"), F.col("gram"))).alias("h2"),
        ).alias("gh"),
    )
    w_cnt = Window.partitionBy("gh")
    dup = (
        grams.withColumn("c", F.sum("_w").over(w_cnt))
        .where(F.col("c") >= min_count)
        .select(id_col, "_w", "pos")
    )
    w_doc = Window.partitionBy(id_col).orderBy("pos")
    # new island iff the previous duplicated window ends before this one
    # starts, with no overlap OR adjacency: prev covers [p_prev, p_prev+k-1],
    # this covers [pos, pos+k-1] -> break when pos - p_prev > k.
    brk = (
        dup.withColumn("prev", F.lag("pos").over(w_doc))
        .withColumn(
            "brk",
            F.when(F.col("prev").isNull() | (F.col("pos") - F.col("prev") > k), 1).otherwise(0),
        )
    )
    isl = brk.withColumn(
        "island",
        F.sum("brk").over(w_doc.rowsBetween(Window.unboundedPreceding, 0)),
    )
    rep_spans = (
        isl.groupBy(id_col, "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
            F.first("_w").alias("_w"),
        )
        .select(
            F.col(id_col),
            F.col("span_start").cast("bigint").alias("span_start"),
            F.col("span_end").cast("bigint").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1).cast("bigint").alias("span_len"),
            "_w",
        )
    )
    return reps, rep_spans, members


def dup_span_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DUP_SPAN_K,
    min_count: int = 2,
) -> DataFrame:
    """Per-document duplication profile from `dup_spans`: span count, total
    duplicated tokens, longest span, duplicated fraction. Docs with no
    duplicated span (or fewer than k tokens) report zeros. Stats are
    computed once per distinct raw text (rep space) and expanded to every
    copy through the member map — exact copies share identical stats by
    definition, so the expansion is two agg-bounded equi-joins."""
    from vectra_player_spark.functions.text import token_count

    reps, rep_spans, members = rep_span_frames(docs, id_col, text_col, k, min_count)
    base = reps.select(
        F.col(id_col), token_count(text_col).cast("bigint").alias("n_tokens")
    )
    per_rep = rep_spans.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dup_spans"),
        F.sum("span_len").cast("bigint").alias("dup_tokens"),
        F.max("span_len").cast("bigint").alias("max_span_len"),
    )
    rep_stats = base.join(per_rep, id_col, "left").select(
        F.col(id_col).alias("_rep"),
        "n_tokens",
        F.coalesce("n_dup_spans", F.lit(0)).cast("bigint").alias("n_dup_spans"),
        F.coalesce("dup_tokens", F.lit(0)).cast("bigint").alias("dup_tokens"),
        F.coalesce("max_span_len", F.lit(0)).cast("bigint").alias("max_span_len"),
        F.round(
            F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens").cast("double"), 6
        ).alias("dup_frac"),
    )
    return rep_stats.join(members, "_rep").select(
        F.col("_member").alias(id_col),
        "n_tokens",
        "n_dup_spans",
        "dup_tokens",
        "max_span_len",
        "dup_frac",
    )


# --------------------------------------------------------------------------
# Semantic dedup (SemDeDup, Abbas et al. 2023): cluster-scoped embedding
# near-dup pruning with the centroid-similarity keep rule.
# --------------------------------------------------------------------------


def semantic_dedup(
    emb: DataFrame,
    centroids: DataFrame,
    assignments: DataFrame | None = None,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup: scope pairwise cosine comparison to k-means cells, group
    mutual near-duplicates (cos >= tau) into components, and within each
    component KEEP the member LEAST similar to its cell centroid (the
    paper's rule — the most "central" copies are the redundant ones; the
    outlier carries the most marginal information). Ties break on id.

    Scale shape: collapse-first, then cell-scoped. Exact-duplicate vectors
    collapse to one representative per distinct content BEFORE the pairwise
    stage (rep_members — the same d² defense every pairwise dedup family
    here uses: on a duplication-heavy corpus, in-cell candidate volume
    otherwise grows with the duplication factor squared; measured 175 s →
    sub-second at the 10× lake). The coarse quantizer then bounds the
    rep-space pairwise stage to one cell — with n_cells grown
    proportionally to the corpus, in-cell rep counts stay flat, so the
    quadratic stage never sees the corpus. The cell assignment and
    centroids come from the SAME persisted IVF store the ANN tier serves
    (pass them in; compute-direct fallback at the call site mirrors
    knn_ivf_kmeans_recall's routing), so SemDeDup rides an ingest artifact
    that already exists. Components use the distributed min-label
    propagation over rep edges (cells are disjoint, so global CC on
    in-cell edges == per-cell CC); member labels expand afterwards —
    copies of a rep share its cell, centroid sim, and component (they
    pair with it at cosine exactly 1 >= any tau), and because a rep is
    the MIN id of its copy group, the rep-space component label IS the
    member-space min id.

    Returns one row per vector: (id, cell_id, component, cent_sim, keep) —
    `component` is the min id in the near-dup group (own id for
    singletons), `cent_sim` the rounded cosine to the cell centroid,
    `keep` False exactly for the pruned copies.
    """
    from vectra_player_spark.functions.vectors import cosine
    from vectra_player_spark.operators.knn import assign_cells

    # collapse exact-duplicate vectors: pairwise work runs in rep space
    reps, members = rep_members(emb.select(id_col, vec_col), id_col, [vec_col])
    if assignments is None:
        rep_cells = assign_cells(reps, centroids, id_col=id_col, vec_col=vec_col)
    else:
        # stored assignments are (id, cell_id) — restrict to reps (a rep's
        # copies all hold the identical vector, so the stored cell of the
        # rep id is the cell of every copy)
        rep_cells = reps.join(assignments.select(id_col, "cell_id"), id_col)
    # cosine to own centroid — broadcast the (n_cells)-row model
    with_sim = rep_cells.join(F.broadcast(centroids), "cell_id").select(
        F.col(id_col),
        F.col(vec_col),
        "cell_id",
        F.round(cosine(vec_col, "centroid"), 6).alias("cent_sim"),
    )
    # three consumers (both edge sides + the label expansion) — pin one
    # materialization of the rep frame (the rep_members window is the
    # expensive full-corpus pass)
    with_sim = pin(with_sim)
    # in-cell near-dup edges: the ONLY pairwise stage, bounded per cell
    # and running over DISTINCT vectors only
    a = with_sim.select(
        F.col("cell_id"), F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va")
    )
    b = with_sim.select(
        F.col("cell_id"), F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb")
    )
    edges = (
        a.join(b, "cell_id")
        .where(F.col("vec_a") < F.col("vec_b"))
        .where(cosine("va", "vb") >= tau)
        .select("vec_a", "vec_b")
    )
    comp = connected_components(edges)  # (rep_id, component); singletons absent
    rep_labeled = with_sim.join(
        comp, with_sim[id_col] == comp["node_id"], "left"
    ).select(
        F.col(id_col).alias("_rep"),
        "cell_id",
        "cent_sim",
        F.coalesce("component", F.col(id_col)).cast("bigint").alias("component"),
    )
    # expand rep labels to every copy (reps are min ids, so component
    # labels are already member-space min ids)
    labeled = rep_labeled.join(members, "_rep").select(
        F.col("_member").alias(id_col), "cell_id", "cent_sim", "component"
    )
    # keep rule: min (cent_sim, id) within the component
    w = Window.partitionBy("component").orderBy(F.asc("cent_sim"), F.asc(id_col))
    return labeled.withColumn("keep", F.row_number().over(w) == 1).select(
        id_col, "cell_id", "component", "cent_sim", "keep"
    )


def dup_span_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DUP_SPAN_K,
    min_count: int = 2,
) -> DataFrame:
    """Duplicated-span REMOVAL (the consumer of `dup_spans`): drop every
    token covered by a duplicated span and emit the md5 of each doc's
    surviving text, in token order. This is the aggressive remove-all-
    occurrences policy (cf. chunk_dedup's keep-first): a span that occurs
    twice disappears from BOTH docs — appropriate when the duplicated mass
    is boilerplate; pair with dup_span_stats to size the loss first.

    Shape: rep-space tokens posexplode a second time and anti-join the
    rep span list on (id, s <= pos <= e) — the equi key is the id, so the
    range condition evaluates within a doc's join group against its FEW
    merged spans (islands, not raw windows). Clean hashes are identical
    across exact copies, so the whole removal runs once per distinct text
    and expands through the member map.
    """
    reps, rep_spans, members = rep_span_frames(docs, id_col, text_col, k, min_count)
    spans = rep_spans.select(id_col, "span_start", "span_end")
    toks = reps.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "tok")
    )
    cond = (
        (toks[id_col] == spans[id_col])
        & (toks["pos"] >= spans["span_start"])
        & (toks["pos"] <= spans["span_end"])
    )
    kept = toks.join(spans, cond, "left_anti")
    kept_struct = F.struct("pos", "tok")
    per_rep = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept_tokens"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)), lambda x: x["tok"]
                ),
            )
        ).alias("clean_hash"),
    )
    rep_out = reps.select(F.col(id_col)).join(per_rep, id_col, "left").select(
        F.col(id_col).alias("_rep"),
        F.coalesce("n_kept_tokens", F.lit(0)).cast("bigint").alias("n_kept_tokens"),
        F.col("clean_hash"),  # NULL when the whole doc was duplicated
    )
    return rep_out.join(members, "_rep").select(
        F.col("_member").alias(id_col), "n_kept_tokens", "clean_hash"
    )


def dup_gram_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DUP_SPAN_K,
) -> DataFrame:
    """Weighted k-gram occurrence counts (gh → n_occurrences) — the
    SUM-MERGEABLE ingest artifact a persisted span store would maintain:
    ``counts(A) ⊎ counts(B) == counts(A ∪ B)`` (merge = sum per gh), and
    this holds even when a text's verbatim copies straddle the split,
    because each split's rep collapse weights its grams by its own copy
    count and the weighted sum equals the raw occurrence count either
    way. A watermark-append refresh (the doc/emb/idx stores' regime)
    therefore extends to gram counts with a plain additive merge — no
    rebuild-on-change; pinned by the straddling-split test in
    tests/test_dedup_properties.py.

    Same collapse-first shape as `rep_span_frames` (one gram explode per
    DISTINCT text); the aggregate is one shuffle on the 128-bit gh.
    """
    keyed = docs.select(F.col(id_col), F.col(text_col), F.md5(text_col).alias("_k"))
    reps_raw, members = rep_members(keyed, id_col, ["_k"])
    weights = members.groupBy("_rep").agg(F.count(F.lit(1)).cast("bigint").alias("_w"))
    reps = reps_raw.join(weights, reps_raw[id_col] == weights["_rep"]).select(
        F.col(text_col), "_w"
    )
    grams = reps.select(
        "_w",
        F.explode(word_shingles_text(text_col, k)).alias("gram"),
    ).select(
        "_w",
        F.struct(
            F.xxhash64("gram").alias("h1"),
            F.xxhash64(F.concat(F.lit("g2:"), F.col("gram"))).alias("h2"),
        ).alias("gh"),
    )
    return grams.groupBy("gh").agg(F.sum("_w").cast("bigint").alias("n_occurrences"))

"""Model-based corpus curation: n-gram LM perplexity + DSIR resampling.

Two public-pipeline families the quality tier was still missing:

- **CCNet-style LM filtering** (Wenzek et al. 2020, "CCNet: Extracting
  High Quality Monolingual Datasets from Web Crawl Data"): train a
  language model on a trusted reference slice, score every document by
  per-token cross-entropy, and cut the corpus into head/middle/tail
  perplexity buckets. Here the LM is a per-language bigram model with
  Jelinek–Mercer interpolation (λ2·bigram-MLE + λ1·unigram-MLE +
  λ0·uniform) trained on a deterministic md5-coin half of the corpus —
  closed-form counts, no iterative fitting, so BOTH engines compute the
  identical model and the whole family is oracle-checked.

- **DSIR** (Xie et al. 2023, "Data Selection for Language Models via
  Importance Resampling"): hashed-bigram bag-of-ngrams features, a
  target vs raw bucket distribution (add-1 smoothed), per-document
  importance log-weight = Σ log(p_tgt/p_raw) over the doc's features,
  and Gumbel-top-k resampling of the raw pool (deterministic Gumbel
  noise from an md5 coin — the same Efraimidis–Spirakis trick
  doc_weighted_sample uses, in log space).

Determinism discipline (the repo's standard): per-token/-bucket log
values are snapped to the 1e-6 grid as BIGINT micro-nats
(FLOOR(x·1e6 + 0.5) — functions/exact.fround's grid) and every
accumulation is an exact integer SUM, so aggregation order can never
flip a value; divisions and ln() are single IEEE ops on identical
inputs. Bucket assignment is RANK-based (exact_ntile / NTILE), never a
float-threshold comparison.

Scale shapes (100 TB framing):
- LM training = two groupBy aggregates over the reference slice; the
  count tables are vocabulary-sized (≪ corpus) and the scoring stage is
  three equi-joins Spark sizes itself (broadcast under AQE when the
  vocab fits, shuffle-hash when it doesn't) followed by a map-side
  expression — no UDFs anywhere.
- CCNet buckets ride exact_ntile (operators/rank): the distributed
  two-pass global rank, not a single-partition Window.
- DSIR's bucket table is FIXED at B=4096 rows regardless of corpus
  size → always broadcast; scoring is map-side after that one join;
  selection is TakeOrderedAndProject (operators/rank.ranked_topk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vectra_player_spark.functions.text import fingerprint
from vectra_player_spark.operators.rank import exact_ntile, ranked_topk
from vectra_player_spark.operators.windows import single_group
from vectra_player_spark.plans.registry import register
from vectra_player_spark.session import pin
from vectra_player_spark.tables import t

# The deterministic salted md5 coin — single canonical definition
# (functions/coins); local names kept for the oracle f-strings below.
from vectra_player_spark.functions.coins import (  # noqa: E402
    DUCK_U01 as _DUCK_COIN,
    DUCK_U01_OPEN as _DUCK_COIN_OPEN,
    SPARK_U01 as _SPARK_COIN,
    SPARK_U01_OPEN as _SPARK_COIN_OPEN,
)

# ---------------------------------------------------------------------------
# Shared LM pieces. The per-token Jelinek–Mercer probability is ONE shared
# expression string evaluated by both engines over identically-named
# columns (cb, cu1, cu2, t_tok, v_tok), with explicit parenthesization so
# the IEEE operation tree is the same on both sides. Unseen events: a
# missing bigram/unigram zeroes its term; a lang with no reference rows
# degrades to the uniform floor (COALESCE(v_tok,0)+1 keeps it finite).
# ---------------------------------------------------------------------------

_LM_REF_FRAC = 0.5  # md5-coin share of docs used to train the LM

_P_EXPR = (
    "(((0.7) * (CASE WHEN cb IS NOT NULL AND cu1 IS NOT NULL AND cu1 > 0"
    " THEN CAST(cb AS DOUBLE) / CAST(cu1 AS DOUBLE) ELSE 0.0 END))"
    " + ((0.25) * (CASE WHEN t_tok IS NOT NULL AND t_tok > 0 AND cu2 IS NOT NULL"
    " THEN CAST(cu2 AS DOUBLE) / CAST(t_tok AS DOUBLE) ELSE 0.0 END)))"
    " + ((0.05) * (1.0 / (CAST(COALESCE(v_tok, 0) AS DOUBLE) + 1.0)))"
)
_LP_MICRO = f"CAST(FLOOR((ln({_P_EXPR}) * 1000000.0) + 0.5) AS BIGINT)"

# DuckDB CTE chain shared by both LM oracles: tokens → reference-slice
# unigram/bigram counts → per-bigram-position joined counts → per-token
# micro-nat log-probs → per-doc cross-entropy.
_LM_PERDOC_CTE = rf"""
WITH toks AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents WHERE text IS NOT NULL
),
uni AS (
  SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT lang, unnest(toks) AS tok FROM toks
        WHERE {_DUCK_COIN.format(salt="lmref")} < {_LM_REF_FRAC})
  GROUP BY 1, 2
),
langtot AS (
  SELECT lang, CAST(SUM(c) AS BIGINT) AS t_tok, CAST(COUNT(*) AS BIGINT) AS v_tok
  FROM uni GROUP BY 1
),
big_all AS (
  SELECT doc_id, lang, bg.w1 AS w1, bg.w2 AS w2 FROM (
    SELECT doc_id, lang,
           unnest(list_transform(generate_series(1, len(toks) - 1),
                                 i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS bg
    FROM toks WHERE len(toks) >= 2)
),
bi AS (
  SELECT lang, w1, w2, CAST(COUNT(*) AS BIGINT) AS c
  FROM big_all WHERE {_DUCK_COIN.format(salt="lmref")} < {_LM_REF_FRAC}
  GROUP BY 1, 2, 3
),
joined AS (
  SELECT b.doc_id, b.lang, bi.c AS cb, u1.c AS cu1, u2.c AS cu2,
         lt.t_tok AS t_tok, lt.v_tok AS v_tok
  FROM big_all b
  LEFT JOIN bi ON bi.lang = b.lang AND bi.w1 = b.w1 AND bi.w2 = b.w2
  LEFT JOIN uni u1 ON u1.lang = b.lang AND u1.tok = b.w1
  LEFT JOIN uni u2 ON u2.lang = b.lang AND u2.tok = b.w2
  LEFT JOIN langtot lt ON lt.lang = b.lang
),
scored AS (
  SELECT doc_id, lang, {_LP_MICRO} AS lp_micro FROM joined
),
perdoc AS (
  SELECT doc_id, lang,
         CAST(COUNT(*) AS BIGINT) AS n_scored,
         CAST(FLOOR(CAST(CAST(-SUM(lp_micro) AS BIGINT) AS DOUBLE)
                    / CAST(COUNT(*) AS DOUBLE) + 0.5) AS BIGINT) AS xent_micro
  FROM scored GROUP BY 1, 2
)
"""

_LM_PERPLEXITY_ORACLE = (
    _LM_PERDOC_CTE
    + """
SELECT doc_id, lang, n_scored, xent_micro,
       CAST(xent_micro AS DOUBLE) / 1000000.0 AS xent_per_token
FROM perdoc
"""
)


def _bigrams(toks_df: DataFrame, extra_cols: list[str]) -> DataFrame:
    """Explode a (.., toks) relation into adjacent-token bigrams.

    Spark sequence(1, n) is ascending only for n >= 1 (it REVERSES when
    stop < start, unlike DuckDB's empty generate_series) — the size >= 2
    guard is load-bearing, not cosmetic."""
    return (
        toks_df.where(F.size("toks") >= 2)
        .select(
            *extra_cols,
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> named_struct('w1', toks[i-1], 'w2', toks[i]))"
                )
            ).alias("bg"),
        )
        .select(*extra_cols, "bg.w1", "bg.w2")
    )


def lm_is_ref() -> "F.Column":
    """The reference-slice membership coin — THE definition; the store
    builder/refresh (operators/sigstore kind 'lm') and the inline
    training path must agree or persisted counts silently decouple from
    what the query trains on."""
    return F.expr(_SPARK_COIN.format(salt="lmref")) < _LM_REF_FRAC


def _lm_tagged(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, text, _rep, _is_ref): the (lang, raw-text) collapse
    groups plus the reference-slice coin — the shared base of both the
    model counts and the scoring expansion. Keyed on md5(text), NOT the
    normalized dedup fingerprint: LM scores are token-exact (case- and
    whitespace-sensitive), so a case-variant duplicate must NOT inherit
    its rep's score (the queries_text._text_reps rule)."""
    # Narrow groupBy + null-safe join instead of a min-over-window
    # (round-10, guide §2.3 — the operators/dedup.rep_members rewrite):
    # the window shuffled the full text row per consumer; the groupBy
    # ships (lang, md5, min_id) with map-side combine and the join
    # re-attaches without moving text. lang is nullable → the join must
    # group NULLs like the window did (eqNullSafe).
    base = docs.where(F.col("text").isNotNull()).select(
        "doc_id", "lang", "text", F.md5("text").alias("_k")
    )
    gids = (
        base.groupBy("lang", "_k")
        .agg(F.min("doc_id").alias("_rep"))
        .select(
            F.col("lang").alias("_glang"), F.col("_k").alias("_gk"), "_rep"
        )
    )
    return base.join(
        gids,
        F.col("lang").eqNullSafe(F.col("_glang")) & (F.col("_k") == F.col("_gk")),
    ).select(
        "doc_id",
        "lang",
        "text",
        "_rep",
        lm_is_ref().cast("int").alias("_is_ref"),
    )


def _lm_rep_ref(tagged: DataFrame) -> DataFrame:
    """Rep rows weighted by their group's ref-copy count (reps whose
    group holds no ref copies contribute nothing and are dropped)."""
    n_ref = tagged.groupBy("_rep").agg(
        F.sum("_is_ref").cast("bigint").alias("_n_ref")
    )
    rep_toks = tagged.where(F.col("doc_id") == F.col("_rep")).select(
        "doc_id", "lang", F.split(F.trim("text"), r"\s+").alias("toks")
    )
    return rep_toks.join(
        n_ref.withColumnRenamed("_rep", "doc_id"), "doc_id"
    ).where(F.col("_n_ref") > 0)


def lm_model_counts(docs: DataFrame) -> DataFrame:
    """PARTIAL weighted LM counts for any doc set: (lang, w1, w2, c) with
    w2 NULL on unigram rows. Sum-mergeable by construction — counts are
    additive facts, so partials from disjoint doc sets groupBy-SUM into
    the whole set's counts. This is the relation the signature store
    persists at ingest (operators/sigstore kind 'lm') and watermark-
    appends on lake growth; `lm_perdoc_scores(model=...)` consumes the
    merged form. Weighted rep-space computation — exact raw-slice counts
    at 1/d of the explode on a duplication-d corpus."""
    rep_ref = _lm_rep_ref(_lm_tagged(docs))
    uni_part = (
        rep_ref.select("lang", "_n_ref", F.explode("toks").alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.sum("_n_ref").cast("bigint").alias("c"))
        .select(
            "lang",
            F.col("tok").alias("w1"),
            F.lit(None).cast("string").alias("w2"),
            "c",
        )
    )
    bi_part = (
        _bigrams(rep_ref, ["lang", "_n_ref"])
        .groupBy("lang", "w1", "w2")
        .agg(F.sum("_n_ref").cast("bigint").alias("c"))
        .select("lang", "w1", "w2", "c")
    )
    return uni_part.unionByName(bi_part)


def lm_perdoc_scores(docs: DataFrame, model: DataFrame | None = None) -> DataFrame:
    """Per-doc bigram-LM cross-entropy in micro-nats — the Spark mirror of
    _LM_PERDOC_CTE, over any (doc_id, lang, text) relation. Columns:
    doc_id, lang, n_scored, xent_micro.

    Collapse-first (the d² duplication defense applied to its linear
    cousin): a doc's score is a pure function of (lang, text) given the
    model, and the model's counts from a group of identical ref docs are
    (counts of one copy) × (ref copies in the group). So tokenize, explode
    and score run once per DISTINCT (lang, text) — on the 100×-duplicated
    lake that is 1% of the rows — with exact integer count weighting, and
    members inherit their rep's score through one equi-join. Output is
    value-identical to the direct per-doc form (the oracle computes that
    form).

    ``model``: a MERGED counts relation in lm_model_counts' schema
    (lang, w1, w2|NULL, c) — e.g. the persisted ingest-time store summed
    over its partials. None → counts derive from ``docs`` inline
    (identical values; the store just pays the training explode at
    ingest instead of per query)."""
    tagged = _lm_tagged(docs)
    rep_toks = tagged.where(F.col("doc_id") == F.col("_rep")).select(
        "doc_id", "lang", F.split(F.trim("text"), r"\s+").alias("toks")
    )
    if model is None:
        rep_ref = _lm_rep_ref(tagged)
        # uni feeds three consumers (two scoring joins + langtot) — pin
        # the vocabulary-sized relation so the tokenize+count runs once.
        uni = pin(
            rep_ref.select("lang", "_n_ref", F.explode("toks").alias("tok"))
            .groupBy("lang", "tok")
            .agg(F.sum("_n_ref").cast("bigint").alias("c"))
        )
        bi = (
            _bigrams(rep_ref, ["lang", "_n_ref"])
            .groupBy("lang", "w1", "w2")
            .agg(F.sum("_n_ref").cast("bigint").alias("c"))
        )
    else:
        uni = pin(
            model.where(F.col("w2").isNull()).select(
                "lang", F.col("w1").alias("tok"), "c"
            )
        )
        bi = model.where(F.col("w2").isNotNull()).select(
            "lang", "w1", "w2", "c"
        )
    langtot = uni.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("t_tok"),
        F.count(F.lit(1)).alias("v_tok"),
    )
    # Scoring explode over reps only (one consumer — no pin needed).
    big_rep = _bigrams(rep_toks, ["doc_id", "lang"])
    joined = (
        big_rep.join(
            bi.select("lang", "w1", "w2", F.col("c").alias("cb")),
            ["lang", "w1", "w2"],
            "left",
        )
        .join(
            uni.select("lang", F.col("tok").alias("w1"), F.col("c").alias("cu1")),
            ["lang", "w1"],
            "left",
        )
        .join(
            uni.select("lang", F.col("tok").alias("w2"), F.col("c").alias("cu2")),
            ["lang", "w2"],
            "left",
        )
        .join(langtot, ["lang"], "left")
    )
    scored = joined.select(
        "doc_id", "lang", F.expr(_LP_MICRO).alias("lp_micro")
    )
    per_rep = scored.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.expr(
            "CAST(FLOOR(CAST(CAST(-SUM(lp_micro) AS BIGINT) AS DOUBLE)"
            " / CAST(COUNT(*) AS DOUBLE) + 0.5) AS BIGINT)"
        ).alias("xent_micro"),
    )
    return tagged.select(F.col("doc_id"), F.col("lang"), "_rep").join(
        per_rep.select(
            F.col("doc_id").alias("_rep"), "n_scored", "xent_micro"
        ),
        "_rep",
    ).select("doc_id", "lang", "n_scored", "xent_micro")


def _lm_perdoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-routes onto the persisted LM counts store when one covers
    this lake (operators/sigstore kind 'lm'): the training explode +
    count aggregates were paid at ingest; the query sums the store's
    partials (vocabulary-sized) and keeps only the scoring stage.
    Values identical — counts are additive facts of the text; oracle
    unchanged."""
    from vectra_player_spark.operators.sigstore import lm_counts_if_available

    docs = t(spark, sf_dir, "documents")
    model = None
    store = lm_counts_if_available(spark, sf_dir)
    if store is not None:
        counts, _members = store
        model = counts.groupBy("lang", "w1", "w2").agg(
            F.sum("c").cast("bigint").alias("c")
        )
    return lm_perdoc_scores(docs, model=model)


@register(
    "doc_lm_perplexity",
    oracle=_LM_PERPLEXITY_ORACLE,
    tags=("lm", "pipeline"),
    survey_ref="CCNet LM quality scoring (training-pipeline mandate); F7 family",
)
def doc_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram-LM cross-entropy (micro-nats per token) under a
    Jelinek–Mercer model trained on the md5-coin reference half. Docs with
    fewer than two tokens have no scored positions and are absent, same as
    the oracle."""
    perdoc = _lm_perdoc(spark, sf_dir)
    return perdoc.select(
        "doc_id",
        "lang",
        "n_scored",
        "xent_micro",
        (F.col("xent_micro").cast("double") / 1000000.0).alias("xent_per_token"),
    )


_CCNET_BUCKETS_ORACLE = (
    _LM_PERDOC_CTE
    + """
, tiled AS (
  SELECT lang, xent_micro,
         NTILE(3) OVER (ORDER BY xent_micro ASC, doc_id ASC) AS tile
  FROM perdoc
)
SELECT lang,
       CASE WHEN tile = 1 THEN 'head' WHEN tile = 2 THEN 'middle'
            ELSE 'tail' END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(FLOOR(CAST(SUM(xent_micro) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                  + 0.5) AS BIGINT) AS mean_xent_micro
FROM tiled GROUP BY 1, 2
"""
)


@register(
    "doc_ccnet_buckets",
    oracle=_CCNET_BUCKETS_ORACLE,
    tags=("lm", "pipeline"),
    survey_ref="CCNet head/middle/tail perplexity partition; W5 rank family",
)
def doc_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's corpus cut: global perplexity tertiles → head/middle/tail,
    reported per (lang, bucket). Rank-based assignment (integer keys,
    doc_id tiebreak) — no float-threshold comparison can flip a row —
    via the distributed two-pass exact_ntile, never a single-partition
    Window. CCNet proper buckets per language; on this shared-vocabulary
    corpus the cut is global (partitioning the rank by lang is the same
    operator keyed differently)."""
    perdoc = _lm_perdoc(spark, sf_dir)
    tiled = exact_ntile(
        perdoc.withColumn("_neg", (-F.col("xent_micro")).cast("bigint")),
        "_neg",
        "doc_id",
        3,
        out_col="tile",
    )
    bucket = (
        F.when(F.col("tile") == 1, "head")
        .when(F.col("tile") == 2, "middle")
        .otherwise("tail")
    )
    return (
        tiled.select("lang", bucket.alias("bucket"), "xent_micro")
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr(
                "CAST(FLOOR(CAST(SUM(xent_micro) AS DOUBLE)"
                " / CAST(COUNT(*) AS DOUBLE) + 0.5) AS BIGINT)"
            ).alias("mean_xent_micro"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR: hashed-bigram importance weights + Gumbel-top-k resampling.
# ---------------------------------------------------------------------------

_DSIR_B = 4096  # hashed feature buckets — FIXED, so the table always broadcasts
_DSIR_TGT_FRAC = 0.25  # md5-coin share of docs standing in for the target corpus
_DSIR_K = 100  # resample size

_SPARK_BUCKET = (
    "CAST(conv(substring(md5(concat('dsir:', w1, ' ', w2)), 1, 8), 16, 10)"
    f" AS BIGINT) % {_DSIR_B}"
)
_DUCK_BUCKET = (
    "CAST('0x' || substring(md5('dsir:' || w1 || ' ' || w2), 1, 8) AS BIGINT)"
    f" % {_DSIR_B}"
)

# Per-bucket importance log-ratio on the micro grid. Identical expression
# text both engines over (c_tgt, c_raw, t_tgt, t_raw).
_LR_MICRO = (
    "CAST(FLOOR(((ln((CAST(c_tgt AS DOUBLE) + 1.0)"
    f" / (CAST(t_tgt AS DOUBLE) + {_DSIR_B}.0)))"
    " - (ln((CAST(c_raw AS DOUBLE) + 1.0)"
    f" / (CAST(t_raw AS DOUBLE) + {_DSIR_B}.0))))"
    " * 1000000.0 + 0.5) AS BIGINT)"
)

_DSIR_PERDOC_CTE = rf"""
WITH toks AS (
  SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents WHERE text IS NOT NULL
),
big AS (
  SELECT doc_id, source,
         CASE WHEN {_DUCK_COIN.format(salt="dsirtgt")} < {_DSIR_TGT_FRAC}
              THEN 1 ELSE 0 END AS is_target,
         {_DUCK_BUCKET} AS bucket
  FROM (
    SELECT doc_id, source, bg.w1 AS w1, bg.w2 AS w2 FROM (
      SELECT doc_id, source,
             unnest(list_transform(generate_series(1, len(toks) - 1),
                                   i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS bg
      FROM toks WHERE len(toks) >= 2))
),
bc AS (
  SELECT bucket, CAST(SUM(is_target) AS BIGINT) AS c_tgt,
         CAST(SUM(1 - is_target) AS BIGINT) AS c_raw
  FROM big GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(c_tgt) AS BIGINT) AS t_tgt, CAST(SUM(c_raw) AS BIGINT) AS t_raw
  FROM bc
),
lr AS (SELECT bucket, {_LR_MICRO} AS lr_micro FROM bc, tot),
w AS (
  SELECT b.doc_id, b.source, b.is_target,
         CAST(COUNT(*) AS BIGINT) AS n_feats,
         CAST(SUM(lr.lr_micro) AS BIGINT) AS logw_micro
  FROM big b JOIN lr ON lr.bucket = b.bucket
  GROUP BY 1, 2, 3
)
"""

_DSIR_WEIGHTS_ORACLE = (
    _DSIR_PERDOC_CTE
    + """
SELECT doc_id, source, is_target, n_feats, logw_micro,
       CAST(logw_micro AS DOUBLE) / 1000000.0 AS logw
FROM w
"""
)


def dsir_weight_table(docs: DataFrame) -> DataFrame:
    """Per-doc DSIR importance log-weights (micro-nats) — Spark mirror of
    _DSIR_PERDOC_CTE, over any (doc_id, source, text) relation. Columns:
    doc_id, source, is_target, n_feats, logw_micro.

    Collapse-first like lm_perdoc_scores: the feature bag is a pure
    function of text, and a group of identical docs contributes
    (one copy's bucket occurrences) × (target copies, raw copies) to the
    two distributions. Hash+explode run once per distinct text; the
    bucket table stays exactly the raw-corpus one; members inherit their
    rep's integer weight through one equi-join (is_target/source stay
    per-member — they ride the member row, not the rep's)."""
    # md5(text), not the normalized fingerprint — feature bags are
    # token-exact (the queries_text._text_reps rule). Narrow groupBy +
    # join instead of a min-over-window (round-10, guide §2.3 — the
    # rep_members rewrite): the groupBy ships (md5, min_id) with
    # map-side combine; text never re-shuffles. _k is non-null (text
    # filtered), so a plain equi-join groups exactly like the window.
    base = docs.where(F.col("text").isNotNull()).select(
        "doc_id", "source", "text", F.md5("text").alias("_k")
    )
    gids = base.groupBy("_k").agg(F.min("doc_id").alias("_rep"))
    is_tgt = (
        F.expr(_SPARK_COIN.format(salt="dsirtgt")) < _DSIR_TGT_FRAC
    ).cast("int")
    tagged = base.join(gids, "_k").select(
        "doc_id",
        "source",
        "text",
        "_rep",
        is_tgt.alias("is_target"),
    )
    gcnt = tagged.groupBy("_rep").agg(
        F.sum("is_target").cast("bigint").alias("_n_tgt"),
        F.sum(1 - F.col("is_target")).cast("bigint").alias("_n_raw"),
    )
    rep_toks = (
        tagged.where(F.col("doc_id") == F.col("_rep"))
        .select("doc_id", F.split(F.trim("text"), r"\s+").alias("toks"))
    )
    # big_rep feeds the distribution counts AND the per-rep weight sum —
    # pin the rep-space explode (|distinct texts| × tokens rows).
    big_rep = pin(
        _bigrams(rep_toks, ["doc_id"]).select(
            "doc_id", F.expr(_SPARK_BUCKET).alias("bucket")
        )
    )
    bc = (
        big_rep.join(gcnt.withColumnRenamed("_rep", "doc_id"), "doc_id")
        .groupBy("bucket")
        .agg(
            F.sum("_n_tgt").cast("bigint").alias("c_tgt"),
            F.sum("_n_raw").cast("bigint").alias("c_raw"),
        )
    )
    # Totals over the FIXED 4096-row bucket table: a single-group window
    # (non-foldable constant key — operators/windows.single_group) instead
    # of a 1-row crossJoin keeps the plan audit's BNLJ ban clean; the
    # "global" partition is 4096 rows by construction, never data-sized.
    tw = Window.partitionBy(single_group("bucket"))
    lr = bc.withColumn("t_tgt", F.sum("c_tgt").over(tw)).withColumn(
        "t_raw", F.sum("c_raw").over(tw)
    ).select("bucket", F.expr(_LR_MICRO).alias("lr_micro"))
    rep_w = (
        big_rep.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("lr_micro").cast("bigint").alias("logw_micro"),
        )
    )
    return tagged.select("doc_id", "source", "is_target", "_rep").join(
        rep_w.withColumnRenamed("doc_id", "_rep"), "_rep"
    ).select("doc_id", "source", "is_target", "n_feats", "logw_micro")


def _dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dsir_weight_table(t(spark, sf_dir, "documents"))


@register(
    "doc_dsir_weights",
    oracle=_DSIR_WEIGHTS_ORACLE,
    tags=("lm", "pipeline"),
    survey_ref="DSIR importance weights (training-pipeline mandate)",
)
def doc_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-bigram DSIR importance log-weight per document: how much
    more target-like than raw-like its features are. Exact integer
    accumulation on the micro grid; the B=4096 bucket table is the only
    model state."""
    return _dsir_weights(spark, sf_dir).select(
        "doc_id",
        "source",
        "is_target",
        "n_feats",
        "logw_micro",
        (F.col("logw_micro").cast("double") / 1000000.0).alias("logw"),
    )


_DSIR_RESAMPLE_ORACLE = (
    _DSIR_PERDOC_CTE
    + f"""
, keyed AS (
  SELECT doc_id, source, logw_micro,
         (CAST(logw_micro AS DOUBLE) / 1000000.0)
         + (-ln(-ln({_DUCK_COIN_OPEN.format(salt="dsirgum")}))) AS sel_key
  FROM w WHERE is_target = 0
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY sel_key DESC, doc_id ASC) AS BIGINT) AS rank,
       doc_id, source, logw_micro
FROM keyed
QUALIFY rank <= {_DSIR_K}
"""
)


@register(
    "doc_dsir_resample",
    oracle=_DSIR_RESAMPLE_ORACLE,
    tags=("lm", "pipeline"),
    survey_ref="DSIR Gumbel-top-k resampling; O5 top-k physical path",
)
def doc_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection step: Gumbel-top-k over the raw pool — key =
    log-weight + Gumbel(md5 coin), top {_DSIR_K} kept. Equivalent to
    sampling without replacement proportional to the softmax of the
    importance weights, but with deterministic noise so the selected SET
    is oracle-checkable. Physical path: TakeOrderedAndProject via
    ranked_topk, never a global Window."""
    w = _dsir_weights(spark, sf_dir).where(F.col("is_target") == 0)
    keyed = w.withColumn(
        "sel_key",
        F.expr(
            "(CAST(logw_micro AS DOUBLE) / 1000000.0)"
            f" + (-ln(-ln({_SPARK_COIN_OPEN.format(salt='dsirgum')})))"
        ),
    )
    return ranked_topk(
        keyed,
        "sel_key",
        "doc_id",
        _DSIR_K,
        out_cols=["doc_id", "source", "logw_micro"],
        rank_col="rank",
        rank_type="bigint",
    )


# ---------------------------------------------------------------------------
# corpus_curation_pipeline_v3 — the model-based capstone: compose this
# session's tier the way CCNet/DSIR are actually deployed — dedup FIRST
# (the LM must not memorize duplicates), then perplexity-cut, then
# importance-resample the selection budget, then split. One funnel report:
# (stage, n_docs, n_tokens).
#   a_raw             the corpus
#   b_exact_keepfirst one survivor per normalized fingerprint
#   c_lm_headmid      survivors scored by a survivor-trained bigram LM,
#                     tail tertile dropped (rank-based cut)
#   d_dsir_selected   Gumbel-top-K by DSIR importance among the raw pool
#   e_train           the md5-coin train split of the selection
# Both engines run the SAME LM/DSIR definitions re-scoped to the deduped
# survivor set (the oracle embeds the family CTEs with their single
# `FROM documents` read pointed at the `ded` CTE — the v2 funnel's
# composition trick), so the capstone hash-checks the tier composed, not
# just piecewise.
# ---------------------------------------------------------------------------

_V3_K = 50  # DSIR selection budget


def _curation_v3_oracle() -> str:
    assert _LM_PERDOC_CTE.count("FROM documents") == 1
    assert _DSIR_PERDOC_CTE.count("FROM documents") == 1
    lm_on_ded = (
        _LM_PERDOC_CTE.replace("FROM documents", "FROM ded")
        .replace("WITH toks AS", "toks AS", 1)
        + " SELECT doc_id, xent_micro FROM perdoc"
    )
    dsir_on_ded = (
        _DSIR_PERDOC_CTE.replace("FROM documents", "FROM ded")
        .replace("WITH toks AS", "toks AS", 1)
        + " SELECT doc_id, is_target, logw_micro FROM w"
    )
    u_split = _DUCK_COIN.format(salt="split")
    u_gum = _DUCK_COIN_OPEN.format(salt="dsirgum")
    return rf"""
WITH ded AS (
  SELECT doc_id, lang, source, text FROM (
    SELECT doc_id, lang, source, text,
           min(doc_id) OVER (
             PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
           ) AS keeper
    FROM documents
  ) WHERE doc_id = keeper
),
lm AS (SELECT * FROM (WITH {lm_on_ded}) q),
dsir AS (SELECT * FROM (WITH {dsir_on_ded}) q),
tiled AS (
  SELECT doc_id, NTILE(3) OVER (ORDER BY xent_micro ASC, doc_id ASC) AS tile
  FROM lm
),
ntok AS (
  SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
  FROM ded WHERE text IS NOT NULL
),
cstage AS (
  SELECT t.doc_id, n.n_tok, d.is_target, d.logw_micro
  FROM tiled t
  JOIN ntok n ON n.doc_id = t.doc_id
  JOIN dsir d ON d.doc_id = t.doc_id
  WHERE t.tile <= 2
),
ranked AS (
  SELECT doc_id, n_tok,
         ROW_NUMBER() OVER (
           ORDER BY (CAST(logw_micro AS DOUBLE) / 1000000.0)
                    + (-ln(-ln({u_gum}))) DESC, doc_id ASC) AS rn
  FROM cstage WHERE is_target = 0
),
sel AS (SELECT doc_id, n_tok FROM ranked WHERE rn <= {_V3_K})
SELECT 'a_raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(coalesce(sum(len(regexp_split_to_array(trim(text), '\s+'))), 0) AS BIGINT) AS n_tokens
FROM documents
UNION ALL
SELECT 'b_exact_keepfirst', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(len(regexp_split_to_array(trim(text), '\s+'))), 0) AS BIGINT)
FROM ded
UNION ALL
SELECT 'c_lm_headmid', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM cstage
UNION ALL
SELECT 'd_dsir_selected', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM sel
UNION ALL
SELECT 'e_train', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(n_tok), 0) AS BIGINT)
FROM sel WHERE {u_split} < 0.8
"""


@register(
    "corpus_curation_pipeline_v3",
    oracle=_curation_v3_oracle(),
    tags=("lm", "pipeline"),
    survey_ref="session-3 capstone: keep-first + LM perplexity cut + DSIR "
    "selection + split composed with funnel accounting",
)
def corpus_curation_pipeline_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel shape at 100 TB: one fingerprint window (keep-first), then
    every model stage runs in the collapse-first rep space the standalone
    queries use; the tertile cut is the distributed exact_ntile and the
    selection is TakeOrderedAndProject — the composition adds only
    id-keyed joins and single-row aggregates."""
    from vectra_player_spark.functions.text import token_count

    docs = t(spark, sf_dir, "documents")
    # Keep-first via a PINNED keeper-id set + equi-join (round-10,
    # backported from v4): five consumers re-derive the survivor set, and
    # the previous fingerprint-window form re-ran a corpus-text-wide
    # shuffle per consumer (pinning text-wide `ded` itself was measured
    # SLOWER, 10.0 → 16.7 s at 100× — the cache was corpus-text-sized).
    # The groupBy collapses map-side to one narrow (fp, min_id) shuffle,
    # the pin is id-sized, and every consumer re-reads the parquet but
    # never re-shuffles text. The multi-consumer persist rule applies to
    # NARROW relations (keeper_ids here, cstage below), not text-wide
    # ones.
    keeper_ids = pin(
        docs.groupBy(fingerprint("text").alias("_fp"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    ded = docs.join(keeper_ids, "doc_id")
    lm = lm_perdoc_scores(ded.select("doc_id", "lang", "text"))
    tiled = exact_ntile(
        lm.withColumn("_neg", (-F.col("xent_micro")).cast("bigint")),
        "_neg",
        "doc_id",
        3,
        out_col="tile",
    )
    dsir = dsir_weight_table(ded.select("doc_id", "source", "text"))
    ntok = ded.where(F.col("text").isNotNull()).select(
        "doc_id", token_count("text").cast("bigint").alias("n_tok")
    )
    # cstage feeds the selection AND the c-stage aggregate — a narrow
    # 4-column survivor-sized frame, the shape the persist rule is for
    # (A/B at the 100× lake, min-of-4: pinned 2.4 s vs unpinned 8.1 s —
    # unpinned, each consumer re-runs the LM+ntile+DSIR subtree; pinning
    # the text-wide `ded` instead was measured SLOWER, see above).
    cstage = pin(
        tiled.where(F.col("tile") <= 2)
        .select("doc_id")
        .join(ntok, "doc_id")
        .join(dsir.select("doc_id", "is_target", "logw_micro"), "doc_id")
    )
    keyed = cstage.where(F.col("is_target") == 0).withColumn(
        "sel_key",
        F.expr(
            "(CAST(logw_micro AS DOUBLE) / 1000000.0)"
            f" + (-ln(-ln({_SPARK_COIN_OPEN.format(salt='dsirgum')})))"
        ),
    )
    sel = ranked_topk(
        keyed, "sel_key", "doc_id", _V3_K, out_cols=["doc_id", "n_tok"]
    )

    from vectra_player_spark.plans.funnel import funnel_row as _row

    u_split = F.expr(_SPARK_COIN.format(salt="split"))
    return (
        _row(docs, "a_raw", token_count("text"))
        .unionByName(_row(ded, "b_exact_keepfirst", token_count("text")))
        .unionByName(_row(cstage, "c_lm_headmid", F.col("n_tok")))
        .unionByName(_row(sel, "d_dsir_selected", F.col("n_tok")))
        .unionByName(
            _row(sel.where(u_split < 0.8), "e_train", F.col("n_tok"))
        )
    )

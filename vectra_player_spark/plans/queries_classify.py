"""Supervised corpus classification + leakage-safe splitting.

Two public-pipeline families completing the model-based curation tier:

- **Naive-Bayes text classifier** (the fastText-classifier analog in
  CCNet/RedPajama-style pipelines, where a linear bag-of-words model
  tags documents for quality or language; fastText's flagship use IS
  language-ID). Here: a multinomial Naive Bayes over whitespace
  unigrams predicting ``lang``, trained on the deterministic md5-coin
  half of the corpus and evaluated on the holdout half. Closed-form
  counts + add-1 smoothing — no iterative fitting — so BOTH engines
  compute the identical model and the family is fully oracle-checked.
  (On this synthetic corpus the langs share one vocabulary, so holdout
  accuracy is chance-level by construction; the confusion matrix makes
  that visible. The operator contract — deterministic distributed
  train/score/argmax — is what the queries pin down.)

- **Leakage-safe train/holdout split**: the complement of
  decontamination. A naive per-doc hash split puts near-duplicates of
  a training document into the heldout set (train/test leakage); the
  safe split keys the SAME coin on the near-dup cluster's canonical id
  (MinHash-LSH -> connected components, the doc_dedup_canonical
  assignment), so whole clusters land on one side. The audit query
  counts straddling near-dup pairs under both schemes — safe must be 0
  — enumeration-free (sum of n_train*n_heldout per cluster, never a
  pair explode).

Determinism discipline (the repo's standard, from queries_lm): every
log value is snapped to the 1e-6 grid as BIGINT micro-nats
(FLOOR(x*1e6 + 0.5)) and every accumulation is an exact integer SUM;
argmax is ROW_NUMBER with a total order (score DESC, label ASC), never
a float comparison between engines.

Scale shapes (100 TB framing):
- Training = two groupBy aggregates over the coin slice; the count
  table is vocabulary-sized (≪ corpus), the class table is K rows.
- Scoring is collapse-first (score once per DISTINCT raw text — md5
  keyed, the queries_text._text_reps rule) as (distinct tokens per
  rep) × K rows joined against the count table; members inherit their
  rep's prediction through one equi-join. K is a constant, so the
  blowup is bounded and the count join is an equi-join AQE sizes.
- The split rides the persisted canonical assignment (signature-store
  routed in doc_dedup_canonical); both splits are projections — the
  coin is id-pure, so the assignment is append-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vectra_player_spark.functions.coins import DUCK_U01 as _DUCK_COIN
from vectra_player_spark.functions.coins import SPARK_U01 as _SPARK_COIN
from vectra_player_spark.functions.text import tokens
from vectra_player_spark.plans.registry import register
from vectra_player_spark.session import pin
from vectra_player_spark.tables import t

# ---------------------------------------------------------------------------
# Naive Bayes: shared expression strings. The per-token add-1 likelihood
# and the class prior are ONE formula evaluated by both engines over
# identically-named columns (c, tot, v / n_docs, n_train), explicit casts
# so the IEEE operation tree matches.
# ---------------------------------------------------------------------------

_NB_TRAIN_FRAC = 0.5  # md5-coin share of docs used to train the classifier
_NB_SALT = "nbtrain"

_LP_TOKEN = (
    "CAST(FLOOR(ln(CAST(COALESCE(c, 0) + 1 AS DOUBLE)"
    " / CAST(tot + v AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"
)
_LP_PRIOR = (
    "CAST(FLOOR(ln(CAST(n_docs AS DOUBLE)"
    " / CAST(n_train AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"
)

# DuckDB CTE chain shared by the NB oracles: coin-tagged docs → train
# token counts / class table / vocab → scored-doc tf vectors → per-(doc,
# class) integer scores → argmax with margin. Direct per-doc form — the
# Spark side collapses identical texts first; matching proves the
# equivalence. ``src`` retargets the relation (the v4 funnel scores the
# dedup survivors) and ``holdout_only=False`` scores EVERY doc with the
# coin-half-trained model (the classifier-as-gate shape).


def nb_cte_chain(src: str = "documents", holdout_only: bool = True) -> str:
    scored_filter = "WHERE NOT is_train" if holdout_only else ""
    return rf"""d AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS toks,
         ({_DUCK_COIN.format(salt=_NB_SALT)} < {_NB_TRAIN_FRAC}) AS is_train
  FROM {src} WHERE text IS NOT NULL AND lang IS NOT NULL
),
tok_tr AS (
  SELECT lang AS cand, unnest(toks) AS tok FROM d WHERE is_train
),
cls AS (
  SELECT lang AS cand, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM d WHERE is_train GROUP BY 1
),
ntr AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_train FROM cls),
tot AS (SELECT cand, CAST(COUNT(*) AS BIGINT) AS tot FROM tok_tr GROUP BY 1),
voc AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM tok_tr),
cnt AS (
  SELECT cand, tok, CAST(COUNT(*) AS BIGINT) AS c FROM tok_tr GROUP BY 1, 2
),
ho AS (
  SELECT doc_id, lang, tok, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, lang, unnest(toks) AS tok FROM d {scored_filter})
  GROUP BY 1, 2, 3
),
sc AS (
  SELECT h.doc_id, h.lang, cls.cand,
         CAST(SUM(h.tf * {_LP_TOKEN}) AS BIGINT) + {_LP_PRIOR} AS score
  FROM ho h
  CROSS JOIN cls CROSS JOIN voc CROSS JOIN ntr
  JOIN tot ON tot.cand = cls.cand
  LEFT JOIN cnt ON cnt.cand = cls.cand AND cnt.tok = h.tok
  GROUP BY h.doc_id, h.lang, cls.cand, cls.n_docs, ntr.n_train
),
ranked AS (
  SELECT doc_id, lang, cand, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, cand ASC) AS rk,
         LEAD(score) OVER (PARTITION BY doc_id ORDER BY score DESC, cand ASC) AS nxt
  FROM sc
),
pred AS (
  SELECT doc_id, lang, cand AS predicted, (cand = lang) AS correct,
         CAST(score - nxt AS BIGINT) AS margin_micro
  FROM ranked WHERE rk = 1
)
"""


_NB_CTE = "WITH " + nb_cte_chain()

_NB_CLASSIFIER_ORACLE = (
    _NB_CTE
    + """
SELECT doc_id, lang, predicted, correct, margin_micro FROM pred
"""
)

_NB_CONFUSION_ORACLE = (
    _NB_CTE
    + """
SELECT lang, predicted,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN correct THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
FROM pred GROUP BY 1, 2
"""
)


def nb_is_train() -> "F.Column":
    """The train-slice membership coin — THE definition; the NB counts
    store (operators/sigstore kind 'nb') and the inline training path
    must agree or persisted counts silently decouple from what the query
    trains on (the lm_is_ref rule)."""
    return F.expr(_SPARK_COIN.format(salt=_NB_SALT)) < _NB_TRAIN_FRAC


def _nb_frames(docs: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(base, kstats, rep_tf): the coin-tagged corpus relation, the ONE
    pinned rep-space stats aggregate (train/holdout copy counts per
    (text, class) + the min-id rep carrier — no corpus-wide window; a
    Window-tagged corpus relation re-evaluates per consumer, the round-8
    plan-inventory lesson), and the pinned per-rep token frequencies."""
    base = docs.where(F.col("text").isNotNull() & F.col("lang").isNotNull()).select(
        "doc_id",
        "lang",
        "text",
        F.md5("text").alias("_k"),
        nb_is_train().cast("int").alias("_is_train"),
    )
    kstats = pin(
        base.groupBy("_k", "lang").agg(
            F.min("doc_id").alias("_min_id"),
            F.sum("_is_train").cast("bigint").alias("_n_tr"),
            F.sum(1 - F.col("_is_train")).cast("bigint").alias("_n_ho"),
        )
    )
    # Identical raw text ⇒ identical token multiset, so weighted rep
    # counts = direct counts; the rep is the group's min doc_id (derived
    # from rep space — free).
    grp = kstats.groupBy("_k").agg(F.min("_min_id").alias("_rep"))
    rep_tf = pin(
        base.join(grp.select(F.col("_rep").alias("doc_id"), "_k"), ["doc_id", "_k"])
        .select("_k", F.explode(tokens("text")).alias("tok"))
        .groupBy("_k", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    return base, kstats, rep_tf


def nb_model_counts(docs: DataFrame) -> DataFrame:
    """PARTIAL weighted NB training counts for any doc set:
    (cand, tok, c) with tok NULL on the per-class document-count rows.
    Sum-mergeable by construction — counts are additive facts, so
    partials from disjoint doc sets groupBy-SUM into the whole set's
    counts. This is the relation the signature store persists at ingest
    (operators/sigstore kind 'nb') and watermark-appends on lake growth;
    ``nb_predictions(model=...)`` consumes the merged form."""
    _base, kstats, rep_tf = _nb_frames(docs)
    tok_part = (
        rep_tf.join(kstats.where(F.col("_n_tr") > 0), "_k")
        .groupBy(F.col("lang").alias("cand"), "tok")
        .agg(F.sum(F.col("tf") * F.col("_n_tr")).cast("bigint").alias("c"))
    )
    cls_part = (
        kstats.groupBy(F.col("lang").alias("cand"))
        .agg(F.sum("_n_tr").cast("bigint").alias("c"))
        .where(F.col("c") > 0)
        .select("cand", F.lit(None).cast("string").alias("tok"), "c")
    )
    return tok_part.select("cand", "tok", "c").unionByName(cls_part)


def nb_predictions(
    docs: DataFrame, score_all: bool = False, model: DataFrame | None = None
) -> DataFrame:
    """Holdout-half NB predictions over any (doc_id, lang, text) relation:
    (doc_id, lang, predicted, correct, margin_micro). ``score_all=True``
    scores EVERY doc with the coin-half-trained model instead — the
    classifier-as-gate shape the v4 funnel uses.

    ``model``: a counts relation in nb_model_counts' schema
    (cand, tok|NULL, c) — PARTIALS are fine (this arm is the one
    sum-merger), e.g. the persisted ingest-time store's raw partials.
    None → counts derive from ``docs`` inline (identical values; the
    store just pays the training explode at ingest instead of per
    query).

    Collapse-first: the model is trained with exact integer count
    weighting over the coin slice (a rep's token counts × its group's
    train-copy count), and scoring runs once per DISTINCT raw text
    (md5-keyed — token-exact, the queries_text._text_reps rule); holdout
    members inherit their rep's argmax through one equi-join. Output is
    value-identical to the direct per-doc form the oracle computes."""
    base, kstats, rep_tf = _nb_frames(docs)
    if model is None:
        # Training counts: (class, token) sums of tf × train copies.
        cnt = pin(
            rep_tf.join(kstats.where(F.col("_n_tr") > 0), "_k")
            .groupBy(F.col("lang").alias("cand"), "tok")
            .agg(F.sum(F.col("tf") * F.col("_n_tr")).cast("bigint").alias("c"))
        )
        cls = (
            kstats.groupBy(F.col("lang").alias("cand"))
            .agg(F.sum("_n_tr").cast("bigint").alias("n_docs"))
            .where(F.col("n_docs") > 0)
        )
    else:
        cnt = pin(
            model.where(F.col("tok").isNotNull())
            .groupBy("cand", "tok")
            .agg(F.sum("c").cast("bigint").alias("c"))
        )
        cls = (
            model.where(F.col("tok").isNull())
            .groupBy("cand")
            .agg(F.sum("c").cast("bigint").alias("n_docs"))
        )
    tot = cnt.groupBy("cand").agg(F.sum("c").cast("bigint").alias("tot"))
    voc = cnt.select(F.countDistinct("tok").alias("v"))
    ntr = cls.select(F.sum("n_docs").cast("bigint").alias("n_train"))
    # K-row class table with all scoring constants — always broadcast.
    cdim = F.broadcast(cls.join(tot, "cand").crossJoin(voc).crossJoin(ntr))
    # Score only reps whose group holds at least one member to emit.
    scored_keys = kstats if score_all else kstats.where(F.col("_n_ho") > 0)
    ho_keys = scored_keys.select("_k").distinct()
    scored = (
        rep_tf.join(ho_keys, "_k")
        .crossJoin(cdim)
        .join(cnt, ["cand", "tok"], "left")
        .groupBy("_k", "cand", "n_docs", "n_train")
        .agg(F.sum(F.col("tf") * F.expr(_LP_TOKEN)).cast("bigint").alias("_s"))
        .select("_k", "cand", (F.col("_s") + F.expr(_LP_PRIOR)).alias("score"))
    )
    w = Window.partitionBy("_k").orderBy(F.desc("score"), F.asc("cand"))
    best = (
        scored.select(
            "_k",
            "cand",
            "score",
            F.row_number().over(w).alias("rk"),
            F.lead("score").over(w).alias("nxt"),
        )
        .where(F.col("rk") == 1)
        .select(
            "_k",
            F.col("cand").alias("predicted"),
            (F.col("score") - F.col("nxt")).cast("bigint").alias("margin_micro"),
        )
    )
    emitted = base if score_all else base.where(F.col("_is_train") == 0)
    return (
        emitted.select("doc_id", "lang", "_k")
        .join(best, "_k")
        .select(
            "doc_id",
            "lang",
            "predicted",
            (F.col("predicted") == F.col("lang")).alias("correct"),
            "margin_micro",
        )
    )


def _nb_stored_model(spark: SparkSession, sf_dir: str) -> DataFrame | None:
    """The merged NB model from the persisted ingest-time counts store
    (operators/sigstore kind 'nb') when one covers this lake — the
    training explode was paid at ingest; the query sums the partials
    (vocabulary-sized) and keeps only the scoring stage. Values
    identical — counts are additive facts of the text; oracle
    unchanged. None → train inline."""
    from vectra_player_spark.operators.sigstore import nb_counts_if_available

    store = nb_counts_if_available(spark, sf_dir)
    if store is None:
        return None
    counts, _members = store
    # raw partials pass straight through — nb_predictions' model arm is
    # the ONE merger (a pre-merge here would just add a redundant
    # vocabulary-sized shuffle)
    return counts.select("cand", "tok", "c")


@register(
    "doc_nb_classifier",
    oracle=_NB_CLASSIFIER_ORACLE,
    tags=("classify", "pipeline"),
    survey_ref="fastText-style corpus classifier (training-pipeline mandate); M-family model ops",
)
def doc_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-holdout-doc multinomial-NB language prediction with the integer
    micro-nat score margin. Train slice = md5-coin half; add-1 smoothing
    over the global train vocabulary. Self-routes onto the persisted NB
    counts store when one covers the lake."""
    return nb_predictions(
        t(spark, sf_dir, "documents"), model=_nb_stored_model(spark, sf_dir)
    )


@register(
    "doc_nb_confusion",
    oracle=_NB_CONFUSION_ORACLE,
    tags=("classify", "pipeline"),
    survey_ref="classifier evaluation rollup (confusion matrix); A9 family",
)
def doc_nb_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the NB language classifier on the holdout half:
    (true lang, predicted, n_docs, n_correct). Store-routed like its
    parent."""
    preds = nb_predictions(
        t(spark, sf_dir, "documents"), model=_nb_stored_model(spark, sf_dir)
    )
    return preds.groupBy("lang", "predicted").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col("correct").cast("int")).cast("bigint").alias("n_correct"),
    )


# ---------------------------------------------------------------------------
# Leakage-safe split: key the split coin on the near-dup cluster's
# canonical id instead of the doc id. Reuses doc_dedup_canonical's
# assignment (MinHash-LSH pairs → connected components → min-id keeper)
# and its recursive-CTE oracle, exposed as a CTE by queries_text.
# ---------------------------------------------------------------------------

_LSPLIT_SALT = "lsplit"
_LSPLIT_TRAIN_FRAC = 0.9

_DUCK_DOC_COIN = _DUCK_COIN.format(salt=_LSPLIT_SALT)
_DUCK_CANON_COIN = _DUCK_DOC_COIN.replace("doc_id", "canonical_id")
_SPARK_DOC_COIN = _SPARK_COIN.format(salt=_LSPLIT_SALT)
_SPARK_CANON_COIN = _SPARK_DOC_COIN.replace("doc_id", "canonical_id")


def _canon_cte() -> str:
    """The doc_dedup_canonical oracle's WITH chain ending at
    canon(doc_id, canonical_id) — queries_text exposes it as a constant."""
    from vectra_player_spark.plans.queries_text import DEDUP_CANONICAL_CANON_CTE

    return DEDUP_CANONICAL_CANON_CTE


def _leakage_split_oracle() -> str:
    return (
        _canon_cte()
        + f"""
SELECT doc_id, canonical_id,
       CASE WHEN {_DUCK_DOC_COIN} < {_LSPLIT_TRAIN_FRAC}
            THEN 'train' ELSE 'heldout' END AS naive_split,
       CASE WHEN {_DUCK_CANON_COIN} < {_LSPLIT_TRAIN_FRAC}
            THEN 'train' ELSE 'heldout' END AS safe_split
FROM canon
"""
    )


def _leakage_audit_oracle() -> str:
    return (
        _canon_cte()
        + f"""
, s AS (
  SELECT canonical_id,
         CASE WHEN {_DUCK_DOC_COIN} < {_LSPLIT_TRAIN_FRAC}
              THEN 'train' ELSE 'heldout' END AS naive_split,
         CASE WHEN {_DUCK_CANON_COIN} < {_LSPLIT_TRAIN_FRAC}
              THEN 'train' ELSE 'heldout' END AS safe_split
  FROM canon
),
both_s AS (
  SELECT canonical_id, 'naive' AS scheme, naive_split AS split FROM s
  UNION ALL
  SELECT canonical_id, 'safe' AS scheme, safe_split AS split FROM s
),
g AS (
  SELECT scheme, canonical_id,
         SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS n_tr,
         SUM(CASE WHEN split = 'heldout' THEN 1 ELSE 0 END) AS n_he
  FROM both_s GROUP BY 1, 2
)
SELECT scheme,
       CAST(SUM(n_tr) AS BIGINT) AS n_train,
       CAST(SUM(n_he) AS BIGINT) AS n_heldout,
       CAST(SUM(n_tr * n_he) AS BIGINT) AS leaked_pairs,
       CAST(SUM(CASE WHEN n_tr > 0 AND n_he > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS leaked_clusters
FROM g GROUP BY 1
"""
    )


def _split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vectra_player_spark.plans.queries_text import canonical_assignment

    canon = canonical_assignment(spark, sf_dir)
    return canon.select(
        "doc_id",
        "canonical_id",
        F.when(F.expr(_SPARK_DOC_COIN) < _LSPLIT_TRAIN_FRAC, "train")
        .otherwise("heldout")
        .alias("naive_split"),
        F.when(F.expr(_SPARK_CANON_COIN) < _LSPLIT_TRAIN_FRAC, "train")
        .otherwise("heldout")
        .alias("safe_split"),
    )


@register(
    "doc_leakage_safe_split",
    oracle=_leakage_split_oracle(),
    tags=("classify", "dedup", "pipeline"),
    survey_ref="leakage-safe split (decontamination complement); D scale path",
)
def doc_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc naive (doc-id coin) vs leakage-safe (canonical-id coin)
    train/heldout assignment. The safe split is append-stable: a new
    near-duplicate of an existing doc inherits its cluster's side."""
    return _split_assignment(spark, sf_dir)


@register(
    "doc_split_leakage_audit",
    oracle=_leakage_audit_oracle(),
    tags=("classify", "dedup", "pipeline"),
    survey_ref="split-leakage audit (enumeration-free pair count)",
)
def doc_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs straddling each split scheme — naive leaks, safe is
    provably 0. Enumeration-free: Σ n_train·n_heldout per cluster, never a
    pair explode (the interval_concurrency_prefix rule)."""
    s = _split_assignment(spark, sf_dir)
    both = s.select(
        "canonical_id", F.lit("naive").alias("scheme"), F.col("naive_split").alias("split")
    ).unionByName(
        s.select(
            "canonical_id", F.lit("safe").alias("scheme"), F.col("safe_split").alias("split")
        )
    )
    g = both.groupBy("scheme", "canonical_id").agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("n_tr"),
        F.sum(F.when(F.col("split") == "heldout", 1).otherwise(0)).alias("n_he"),
    )
    return g.groupBy("scheme").agg(
        F.sum("n_tr").cast("bigint").alias("n_train"),
        F.sum("n_he").cast("bigint").alias("n_heldout"),
        F.sum(F.col("n_tr") * F.col("n_he")).cast("bigint").alias("leaked_pairs"),
        F.sum(
            F.when((F.col("n_tr") > 0) & (F.col("n_he") > 0), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("leaked_clusters"),
    )


# ---------------------------------------------------------------------------
# Session-4 capstone: the funnel composing this session's operators —
# exact keep-first dedup → NB language-consistency gate (drop docs whose
# declared lang disagrees with the coin-half-trained classifier: metadata
# validation, a standard curation stage) → leakage-safe train/heldout
# split keyed on the GLOBAL near-dup canonical id (exact keep-first
# leaves near-dups in the pool, so the cluster-keyed coin differs from a
# naive doc-id split — heldout stays clean of train near-dups). Funnel
# accounting rows: (stage, n_docs, n_tokens).
# ---------------------------------------------------------------------------


def _curation_v4_oracle() -> str:
    nb_on_ded = (
        nb_cte_chain("ded", holdout_only=False)
        + " SELECT doc_id, correct FROM pred"
    )
    ntok = r"len(regexp_split_to_array(trim(text), '\s+'))"
    return rf"""{_canon_cte()}
, ded AS (
  SELECT doc_id, lang, text FROM (
    SELECT doc_id, lang, text,
           min(doc_id) OVER (
             PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
           ) AS keeper
    FROM documents
  ) WHERE doc_id = keeper
),
nb AS (SELECT * FROM (WITH {nb_on_ded}) q),
surv AS (
  SELECT ded.doc_id, ded.text FROM ded
  JOIN nb ON nb.doc_id = ded.doc_id WHERE nb.correct
),
sided AS (
  SELECT s.doc_id, s.text,
         CASE WHEN {_DUCK_CANON_COIN} < {_LSPLIT_TRAIN_FRAC}
              THEN 'train' ELSE 'heldout' END AS side
  FROM surv s JOIN canon c ON c.doc_id = s.doc_id
)
SELECT 'a_raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(coalesce(sum({ntok}), 0) AS BIGINT) AS n_tokens
FROM documents
UNION ALL
SELECT 'b_exact_keepfirst', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum({ntok}), 0) AS BIGINT) FROM ded
UNION ALL
SELECT 'c_lang_consistent', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum({ntok}), 0) AS BIGINT) FROM surv
UNION ALL
SELECT 'd_train_safe', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum({ntok}), 0) AS BIGINT) FROM sided WHERE side = 'train'
UNION ALL
SELECT 'e_heldout_safe', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum({ntok}), 0) AS BIGINT) FROM sided WHERE side = 'heldout'
"""


@register(
    "corpus_curation_pipeline_v4",
    oracle=_curation_v4_oracle(),
    tags=("classify", "pipeline"),
    survey_ref="session-4 capstone: keep-first + NB metadata gate + "
    "leakage-safe split composed with funnel accounting",
)
def corpus_curation_pipeline_v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel shape at 100 TB: one fingerprint window (keep-first), the NB
    gate scores in collapse-first rep space (the standalone classifier's
    plan), the split joins the persisted canonical assignment — the
    composition adds only id-keyed joins and single-row aggregates."""
    from vectra_player_spark.functions.text import fingerprint, token_count
    from vectra_player_spark.plans.queries_text import canonical_assignment

    docs = t(spark, sf_dir, "documents")
    # Keep-first via a PINNED rep-space keeper-id set, not a fingerprint
    # window: ded has many consumers here (the NB gate's three passes, the
    # survivor join, the stage aggregate), and a window-tagged corpus
    # relation re-runs its corpus-wide shuffle per consumer — measured
    # 243 s at the 100× lake; the pinned id set + semi-join reads the
    # corpus per pass but never re-shuffles it (v3's narrow-pin rule).
    keeper_ids = pin(
        docs.groupBy(fingerprint("text").alias("_fp"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    ded = docs.join(keeper_ids, "doc_id")
    preds = nb_predictions(ded.select("doc_id", "lang", "text"), score_all=True)
    canon = canonical_assignment(spark, sf_dir).select("doc_id", "canonical_id")
    # One PINNED narrow ded-sized frame feeds stages b-e (the v3 cstage
    # rule): without it the NB and canonical subtrees re-run per stage
    # aggregate (72 s at 100×; 243 s before the keeper-id fix above).
    # LEFT join: ded rows the classifier never scores (NULL lang/text)
    # stay countable in stage b, with correct NULL ⇒ excluded from c-e.
    # canon joins LEFT with a doc_id fallback: canonical_assignment's
    # direct arm buckets docs by token count, and a NULL-text keeper
    # lands in neither bucket — the oracle's canon CTE LEFT-joins from
    # documents and falls back to doc_id, so stage b must still count it.
    stats = pin(
        ded.select("doc_id", token_count("text").cast("bigint").alias("n_tok"))
        .join(preds.select("doc_id", "correct"), "doc_id", "left")
        .join(canon, "doc_id", "left")
        .withColumn(
            "canonical_id", F.coalesce("canonical_id", F.col("doc_id"))
        )
        .withColumn(
            "side",
            F.when(
                F.expr(_SPARK_CANON_COIN) < _LSPLIT_TRAIN_FRAC, "train"
            ).otherwise("heldout"),
        )
        .select("doc_id", "n_tok", "correct", "side")
    )

    from vectra_player_spark.plans.funnel import funnel_row as _row

    surv = stats.where(F.col("correct"))
    return (
        _row(docs, "a_raw", token_count("text"))
        .unionByName(_row(stats, "b_exact_keepfirst", F.col("n_tok")))
        .unionByName(_row(surv, "c_lang_consistent", F.col("n_tok")))
        .unionByName(
            _row(surv.where(F.col("side") == "train"), "d_train_safe", F.col("n_tok"))
        )
        .unionByName(
            _row(
                surv.where(F.col("side") == "heldout"),
                "e_heldout_safe",
                F.col("n_tok"),
            )
        )
    )


# ---------------------------------------------------------------------------
# Hashed-bigram NB with a separable probe slice (round-9). The unigram
# classifier above is fully verified plumbing, but the generated lake's
# langs share ONE token distribution (measured: max per-lang unigram
# frequency spread ~1%, bigrams likewise), so its holdout accuracy is
# chance-level BY CONSTRUCTION and no feature upgrade can fix that — the
# label carries no signal in this lake. To demonstrate real
# discrimination while staying exact-oracle on the driver lake, this
# variant (a) upgrades features to hashed bigrams (B=4096 md5 buckets —
# fastText's bigram trick, the DSIR feature machinery re-salted) and
# (b) appends a deterministic PROBE slice: 150 crafted docs whose texts
# interleave lang-unique function words with corpus-style background
# tokens — the SAME literal rows on both engines (Spark createDataFrame
# / DuckDB VALUES, generated from one Python list at import). The
# confusion matrix is reported per slice: the probe diagonal is
# above-chance (real linguistic signal, learned through the full
# distributed train/score path), the real slice stays honestly at
# chance. Scale shape: collapse-first on md5(text) like every scorer
# here; the probe adds 150 rows to any corpus.
# ---------------------------------------------------------------------------

_BG_B = 4096
_BG_SALT = "nbbg"
_BG_COIN_SALT = "nbbgtrain"

_SPARK_BG_BUCKET = (
    f"CAST(conv(substring(md5(concat('{_BG_SALT}:', w1, ' ', w2)), 1, 8), 16, 10)"
    f" AS BIGINT) % {_BG_B}"
)
_DUCK_BG_BUCKET = (
    f"CAST('0x' || substring(md5('{_BG_SALT}:' || w1 || ' ' || w2), 1, 8) AS BIGINT)"
    f" % {_BG_B}"
)

# add-1 over the FIXED B buckets (the DSIR smoothing shape) — shared
# expression text over (c, tot); prior reuses _LP_PRIOR's (n_docs,
# n_train) form.
_BG_LP_TOKEN = (
    "CAST(FLOOR(ln(CAST(COALESCE(c, 0) + 1 AS DOUBLE)"
    f" / (CAST(tot AS DOUBLE) + {_BG_B}.0)) * 1000000.0 + 0.5) AS BIGINT)"
)


def _probe_rows() -> list[tuple[int, str, str]]:
    """150 deterministic probe docs, 5 langs × 30: texts interleave
    lang-UNIQUE function words (disjoint marker pools — asserted) with
    shared background tokens drawn from the generated corpus's
    vocabulary. Pure index arithmetic, no RNG — the same list literal
    feeds the Spark frame and the oracle VALUES."""
    markers = {
        "de": ("der", "die", "das", "und", "nicht", "ist"),
        "en": ("was", "were", "have", "with", "this", "from"),
        "es": ("el", "los", "una", "por", "como", "pero"),
        "fr": ("le", "les", "une", "pour", "comme", "mais"),
        "zh": ("wo", "ni", "shi", "bu", "hen", "hao"),
    }
    seen: set[str] = set()
    for pool in markers.values():
        assert not (set(pool) & seen), "marker pools must be disjoint"
        seen.update(pool)
    bg = ("data", "window", "scan", "batch", "row", "table")
    langs = tuple(sorted(markers))
    rows = []
    for i in range(150):
        lang = langs[i % len(langs)]
        mk = markers[lang]
        toks = [
            mk[(i * 7 + j) % len(mk)] if (i + j) % 2 == 0
            else bg[(i * 3 + j) % len(bg)]
            for j in range(24)
        ]
        rows.append((10_000_000_000_000 + i, lang, " ".join(toks)))
    return rows


def _bg_confusion_oracle() -> str:
    values = ",\n    ".join(
        f"({did}, '{lang}', '{text}')" for did, lang, text in _probe_rows()
    )
    coin = _DUCK_COIN.format(salt=_BG_COIN_SALT)
    return rf"""
WITH probe(doc_id, lang, text) AS (VALUES
    {values}),
corpus AS (
  SELECT doc_id, lang, text, 'real' AS slice FROM documents
  WHERE text IS NOT NULL AND lang IS NOT NULL
  UNION ALL
  SELECT doc_id, lang, text, 'probe' FROM probe
),
d AS (
  SELECT doc_id, lang, slice,
         regexp_split_to_array(trim(text), '\s+') AS toks,
         ({coin} < {_NB_TRAIN_FRAC}) AS is_train
  FROM corpus
),
bg AS (
  SELECT doc_id, lang, slice, is_train, {_DUCK_BG_BUCKET} AS bucket
  FROM (SELECT doc_id, lang, slice, is_train, toks[i] AS w1, toks[i+1] AS w2
        FROM d, unnest(generate_series(1, len(toks) - 1)) AS u(i)
        WHERE len(toks) >= 2)
),
cnt AS (SELECT lang AS cand, bucket, CAST(COUNT(*) AS BIGINT) AS c
        FROM bg WHERE is_train GROUP BY 1, 2),
cls AS (SELECT lang AS cand, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM bg WHERE is_train GROUP BY 1),
ntr AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_train FROM cls),
tot AS (SELECT cand, CAST(SUM(c) AS BIGINT) AS tot FROM cnt GROUP BY 1),
ho AS (SELECT doc_id, lang, slice, bucket, CAST(COUNT(*) AS BIGINT) AS tf
       FROM bg WHERE NOT is_train GROUP BY 1, 2, 3, 4),
sc AS (
  SELECT h.doc_id, h.lang, h.slice, cls.cand,
         CAST(SUM(h.tf * {_BG_LP_TOKEN}) AS BIGINT) + {_LP_PRIOR} AS score
  FROM ho h
  CROSS JOIN cls CROSS JOIN ntr
  JOIN tot ON tot.cand = cls.cand
  LEFT JOIN cnt ON cnt.cand = cls.cand AND cnt.bucket = h.bucket
  GROUP BY h.doc_id, h.lang, h.slice, cls.cand, cls.n_docs, ntr.n_train
),
pred AS (
  SELECT doc_id, lang, slice, cand AS predicted, (cand = lang) AS correct,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, cand ASC) AS rk
  FROM sc
)
SELECT slice, lang, predicted,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN correct THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
FROM pred WHERE rk = 1 GROUP BY 1, 2, 3
"""


def probe_slice(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        _probe_rows(), "doc_id bigint, lang string, text string"
    )


@register(
    "doc_nb_bigram_confusion",
    oracle=_bg_confusion_oracle(),
    tags=("classify", "pipeline"),
    survey_ref="hashed-bigram NB classifier with separable probe slice "
    "(above-chance diagonal demonstration); fastText-analog features",
)
def doc_nb_bigram_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-slice confusion matrix of the hashed-bigram NB over
    documents ∪ probe: (slice, lang, predicted, n_docs, n_correct).
    Collapse-first on md5(text); participation = docs with ≥2 tokens
    (feature-less docs can neither train nor be scored, both engines).
    The probe-slice diagonal demonstrates real discrimination; the real
    slice documents the lake's label-signal absence."""
    from vectra_player_spark.plans.queries_lm import _bigrams

    real = (
        t(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull() & F.col("lang").isNotNull())
        .select("doc_id", "lang", "text", F.lit("real").alias("slice"))
    )
    corpus = real.unionByName(
        probe_slice(spark).select(
            "doc_id", "lang", "text", F.lit("probe").alias("slice")
        )
    )
    base = corpus.where(
        F.size(F.split(F.trim("text"), r"\s+")) >= 2
    ).select(
        "doc_id",
        "lang",
        "slice",
        "text",
        F.md5("text").alias("_k"),
        (F.expr(_SPARK_COIN.format(salt=_BG_COIN_SALT)) < _NB_TRAIN_FRAC)
        .cast("int")
        .alias("_is_train"),
    )
    kstats = pin(
        base.groupBy("_k", "lang", "slice").agg(
            F.min("doc_id").alias("_min_id"),
            F.sum("_is_train").cast("bigint").alias("_n_tr"),
            F.sum(1 - F.col("_is_train")).cast("bigint").alias("_n_ho"),
        )
    )
    grp = kstats.groupBy("_k").agg(F.min("_min_id").alias("_rep"))
    rep_bf = pin(
        base.join(
            grp.select(F.col("_rep").alias("doc_id"), "_k"), ["doc_id", "_k"]
        )
        .select("_k", F.split(F.trim("text"), r"\s+").alias("toks"))
        .transform(lambda df: _bigrams(df, ["_k"]))
        .select("_k", F.expr(_SPARK_BG_BUCKET).alias("bucket"))
        .groupBy("_k", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    cnt = pin(
        rep_bf.join(kstats.where(F.col("_n_tr") > 0), "_k")
        .groupBy(F.col("lang").alias("cand"), "bucket")
        .agg(F.sum(F.col("tf") * F.col("_n_tr")).cast("bigint").alias("c"))
    )
    cls = (
        kstats.groupBy(F.col("lang").alias("cand"))
        .agg(F.sum("_n_tr").cast("bigint").alias("n_docs"))
        .where(F.col("n_docs") > 0)
    )
    tot = cnt.groupBy("cand").agg(F.sum("c").cast("bigint").alias("tot"))
    ntr = cls.select(F.sum("n_docs").cast("bigint").alias("n_train"))
    cdim = F.broadcast(cls.join(tot, "cand").crossJoin(ntr))
    ho_keys = kstats.where(F.col("_n_ho") > 0).select("_k").distinct()
    scored = (
        rep_bf.join(ho_keys, "_k")
        .crossJoin(cdim)
        .join(cnt, ["cand", "bucket"], "left")
        .groupBy("_k", "cand", "n_docs", "n_train")
        .agg(F.sum(F.col("tf") * F.expr(_BG_LP_TOKEN)).cast("bigint").alias("_s"))
        .select("_k", "cand", (F.col("_s") + F.expr(_LP_PRIOR)).alias("score"))
    )
    w = Window.partitionBy("_k").orderBy(F.desc("score"), F.asc("cand"))
    best = (
        scored.select("_k", "cand", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") == 1)
        .select("_k", F.col("cand").alias("predicted"))
    )
    return (
        base.where(F.col("_is_train") == 0)
        .select("doc_id", "lang", "slice", "_k")
        .join(best, "_k")
        .groupBy("slice", "lang", "predicted")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum((F.col("predicted") == F.col("lang")).cast("int"))
            .cast("bigint")
            .alias("n_correct"),
        )
    )


# ---------------------------------------------------------------------------
# Classifier calibration: does a larger score margin actually mean a more
# reliable prediction? Quartile the holdout predictions by margin (exact
# rank, integer keys, doc_id tiebreak — no float-threshold comparisons)
# and report per-quartile accuracy. The standard post-training evaluation
# of any gate-classifier before its threshold is trusted at 100 TB.
# ---------------------------------------------------------------------------

_NB_CALIBRATION_ORACLE = (
    _NB_CTE
    + """
, tiled AS (
  SELECT correct, margin_micro,
         NTILE(4) OVER (ORDER BY margin_micro ASC, doc_id ASC) AS q
  FROM pred
)
SELECT q AS margin_quartile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN correct THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       CAST(MIN(margin_micro) AS BIGINT) AS min_margin,
       CAST(MAX(margin_micro) AS BIGINT) AS max_margin
FROM tiled GROUP BY 1
"""
)


@register(
    "doc_nb_calibration",
    oracle=_NB_CALIBRATION_ORACLE,
    tags=("classify", "pipeline"),
    survey_ref="classifier calibration curve (margin-quartile accuracy); W5 rank family",
)
def doc_nb_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-quartile accuracy of the NB holdout predictions, via the
    distributed exact_ntile (never a single-partition Window): rank by
    margin ASC with doc_id tiebreak — exact_ntile orders score DESC, so
    it ranks the NEGATED margin (the doc_ccnet_buckets trick)."""
    from vectra_player_spark.operators.rank import exact_ntile

    preds = nb_predictions(
        t(spark, sf_dir, "documents"), model=_nb_stored_model(spark, sf_dir)
    )
    tiled = exact_ntile(
        preds.withColumn("_neg", (-F.col("margin_micro")).cast("bigint")),
        "_neg",
        "doc_id",
        4,
        out_col="q",
    )
    return tiled.groupBy(F.col("q").alias("margin_quartile")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("correct"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_correct"),
        F.min("margin_micro").cast("bigint").alias("min_margin"),
        F.max("margin_micro").cast("bigint").alias("max_margin"),
    )

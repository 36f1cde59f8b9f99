"""Similarity-search query surface over the `embeddings` table.

Brute-force cosine top-k is the oracle-checked baseline (SURVEY §2.10 V4;
BASELINE.json north star). The IVF variant reuses label centroids as the
coarse quantizer — approximate, so rows-only checked.

Oracle notes: embeddings are FLOAT[]; both sides cast to double *before*
the dot product so accumulation error matches (left-to-right double adds),
then round to 6.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from vectra_player_spark.operators.knn import brute_force_topk, ivf_topk
from vectra_player_spark.plans.registry import register
from vectra_player_spark.session import pin
from vectra_player_spark.tables import t

_KNN_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
q AS (SELECT vec_id AS query_id, emb AS q_vec FROM e WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         ROUND(list_dot_product(q.q_vec, c.emb)
               / NULLIF(sqrt(list_dot_product(q.q_vec, q.q_vec))
                        * sqrt(list_dot_product(c.emb, c.emb)), 0), 6) AS cosine_sim
  FROM q JOIN e c ON c.vec_id != q.query_id
)
SELECT query_id, neighbor_id, cosine_sim, CAST(rank AS INT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
WHERE rank <= 5
"""


@register("knn_bruteforce_cosine", oracle=_KNN_ORACLE, tags=("vector", "bench"), survey_ref="V4")
def knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return brute_force_topk(queries, emb, k=5)


_CENTROID_ORACLE = """
SELECT label, g.range AS pos, ROUND(AVG(CAST(embedding AS DOUBLE[])[g.range]), 6) AS centroid_val
FROM embeddings CROSS JOIN range(1, 65) g
GROUP BY label, g.range
"""


@register("embedding_centroids", oracle=_CENTROID_ORACLE, tags=("vector",), survey_ref="V2 aggregate shape")
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode(F.col("embedding").cast("array<double>")))
        .select("label", (F.col("pos") + 1).cast("bigint").alias("pos"), F.col("col").alias("v"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("v"), 6).alias("centroid_val"))
    )


# --------------------------------------------------------------------------
# Embedding-cosine near-dup pairs (BASELINE.json dedup mandate): pairs
# above a cosine threshold, blocked by label — blocking is the scale lever
# (at 100 TB the block key comes from coarse quantization / LSH, same
# plan shape: equi-join on the block, then the exact kernel).
# --------------------------------------------------------------------------

_NEARDUP_ORACLE = """
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_dot_product(a.emb, b.emb) / NULLIF(a.nrm * b.nrm, 0), 6) AS cosine_sim
FROM e a
JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_dot_product(a.emb, b.emb) / NULLIF(a.nrm * b.nrm, 0) >= 0.3
"""


@register("embedding_neardup_pairs", oracle=_NEARDUP_ORACLE, tags=("vector", "dedup", "bench"), survey_ref="embedding near-dup (mandate)")
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact label-blocked pair scoring, collapse-first: the all-pairs
    kernel runs over one representative per distinct (label, embedding) —
    cosine is a pure function of the two vectors, so member pairs inherit
    the rep pair's score and verbatim copies pair at exactly 1.0 (see
    operators.dedup.rep_members for why this matters on duplication-heavy
    corpora). Still quadratic in DISTINCT vectors per label — this is the
    oracle baseline; embedding_neardup_lsh is the scale path."""
    from vectra_player_spark.functions.vectors import dot, norm
    from vectra_player_spark.operators.dedup import expand_rep_pairs, rep_members

    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("emb"),
    ).withColumn("nrm", norm("emb"))
    # Three consumers (both join sides + intra set) of the rep-collapse
    # aggregate; pruning defeats ReuseExchange (the minhash_lsh_pairs
    # finding) — pin one materialization of the rep vectors.
    reps, members = rep_members(emb, "vec_id", ["label", "emb"])
    reps = pin(reps)
    a = reps.select(
        F.col("vec_id").alias("vec_a"), "label",
        F.col("emb").alias("emb_a"), F.col("nrm").alias("n_a"),
    )
    b = reps.select(
        F.col("vec_id").alias("vec_b"), "label",
        F.col("emb").alias("emb_b"), F.col("nrm").alias("n_b"),
    )
    sim = dot("emb_a", "emb_b") / F.nullif(F.col("n_a") * F.col("n_b"), F.lit(0.0))
    rep_pairs = (
        a.join(b, "label")
        .where(F.col("vec_a") < F.col("vec_b"))
        .where(sim >= 0.3)
        .select("vec_a", "vec_b", F.round(sim, 6).alias("cosine_sim"))
    )
    return expand_rep_pairs(
        rep_pairs, members, "vec_a", "vec_b", ["cosine_sim"],
        intra_reps=reps.where(F.col("nrm") > 0).select(F.col("vec_id").alias("vec_a")),
        intra_scores={"cosine_sim": 1.0},
    )


# --------------------------------------------------------------------------
# Finer-blocked near-dup (the SCALE.md lever): banded random-hyperplane LSH.
# Each of 3 bands hashes a vector to a 4-bit sign-pattern bucket; a pair is
# a candidate iff it shares (label, band, bucket) for ANY band
# (OR-amplification, same design as doc_minhash_lsh_pairs). Per-band block
# cost drops ~2^4 vs label-only blocking while ~90% of true near-dup
# (cosine >= 0.9) pairs survive; threshold-level 0.3 pairs keep ~1/3 —
# tune bands/bits per recall target. Hyperplanes derive from md5 (no RNG),
# so the oracle reproduces the EXACT same blocking and this approximate
# scale path is value-hash-checked, not rows-only.
# --------------------------------------------------------------------------

_LSH_DIM = 64
_LSH_BANDS = 3
_LSH_BITS = 4  # per band


def _hyperplane(b: int) -> list[float]:
    """Deterministic pseudo-random ±1 hyperplane from md5 parity."""
    return [
        1.0 if int(hashlib.md5(f"lsh:{b}:{p}".encode()).hexdigest(), 16) % 2 == 0 else -1.0
        for p in range(_LSH_DIM)
    ]


_HYPERPLANES = [_hyperplane(b) for b in range(_LSH_BANDS * _LSH_BITS)]


def _band_bucket_sql(emb: str, band: int) -> str:
    terms = []
    for bit in range(_LSH_BITS):
        h = _HYPERPLANES[band * _LSH_BITS + bit]
        lit = "[" + ", ".join(str(v) for v in h) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({emb}, {lit}) >= 0 THEN {1 << bit} ELSE 0 END)"
        )
    return " + ".join(terms)


_NEARDUP_LSH_ORACLE = f"""
WITH e0 AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
e AS (
  SELECT vec_id, label, emb,
         sqrt(list_dot_product(emb, emb)) AS nrm,
         {_band_bucket_sql("emb", 0)} AS bk0,
         {_band_bucket_sql("emb", 1)} AS bk1,
         {_band_bucket_sql("emb", 2)} AS bk2
  FROM e0
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_dot_product(a.emb, b.emb) / NULLIF(a.nrm * b.nrm, 0), 6) AS cosine_sim
FROM e a
JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        AND (a.bk0 = b.bk0 OR a.bk1 = b.bk1 OR a.bk2 = b.bk2)
WHERE list_dot_product(a.emb, b.emb) / NULLIF(a.nrm * b.nrm, 0) >= 0.3
"""


def _band_bucket_col(emb: Column, band: int) -> Column:
    from vectra_player_spark.functions.vectors import dot

    total = F.lit(0)
    for bit in range(_LSH_BITS):
        h = _HYPERPLANES[band * _LSH_BITS + bit]
        plane = F.array(*[F.lit(v) for v in h])
        total = total + F.when(dot(emb, plane) >= 0, F.lit(1 << bit)).otherwise(F.lit(0))
    return total


def _lsh_neardup_pairs(base: DataFrame) -> DataFrame:
    """Banded-LSH near-dup pairs over (vec_id, label, emb, nrm) rows:
    explode (band, bucket) keys → equi-join candidates on (label, band,
    bucket) → distinct id pairs → re-join embeddings for the exact cosine
    kernel. Every join is equi-keyed so the plan survives 100 TB — no
    OR-join, no per-label cartesian.

    Collapse-first: identical vectors land in the same bucket of EVERY
    band, so a duplication factor d inflates bucket population d× and the
    candidate join d² (the 100× verbatim-duplicated corpus exhausted local
    disk through this stage). Bucketing and the cosine kernel run over one
    representative per distinct (label, embedding); member pairs expand at
    the end (cosine is content-determined, so scores carry over exactly)."""
    from vectra_player_spark.functions.vectors import dot
    from vectra_player_spark.operators.dedup import expand_rep_pairs, rep_members

    base, members = rep_members(base, "vec_id", ["label", "emb"])
    # FOUR consumers (two bucket-join sides + two embedding re-joins) of
    # the rep-collapse aggregate — pin it (see minhash_lsh_pairs).
    base = pin(base)
    keyed = base.select(
        "vec_id",
        "label",
        F.posexplode(
            F.array(*[_band_bucket_col(F.col("emb"), k) for k in range(_LSH_BANDS)])
        ).alias("band", "bucket"),
    )
    cand = (
        keyed.select(F.col("vec_id").alias("vec_a"), "label", "band", "bucket")
        .join(
            keyed.select(F.col("vec_id").alias("vec_b"), "label", "band", "bucket"),
            ["label", "band", "bucket"],
        )
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    sim = dot("emb_a", "emb_b") / F.nullif(F.col("n_a") * F.col("n_b"), F.lit(0.0))
    rep_pairs = (
        cand.join(
            base.select(F.col("vec_id").alias("vec_a"),
                        F.col("emb").alias("emb_a"), F.col("nrm").alias("n_a")),
            "vec_a",
        )
        .join(
            base.select(F.col("vec_id").alias("vec_b"),
                        F.col("emb").alias("emb_b"), F.col("nrm").alias("n_b")),
            "vec_b",
        )
        .where(sim >= 0.3)
        .select("vec_a", "vec_b", F.round(sim, 6).alias("cosine_sim"))
    )
    return expand_rep_pairs(
        rep_pairs, members, "vec_a", "vec_b", ["cosine_sim"],
        intra_reps=base.where(F.col("nrm") > 0).select(F.col("vec_id").alias("vec_a")),
        intra_scores={"cosine_sim": 1.0},
    )


def _lsh_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vectra_player_spark.functions.vectors import norm

    return (
        t(spark, sf_dir, "embeddings")
        .select("vec_id", "label", F.col("embedding").cast("array<double>").alias("emb"))
        .withColumn("nrm", norm("emb"))
    )


@register(
    "embedding_neardup_lsh",
    oracle=_NEARDUP_LSH_ORACLE,
    tags=("vector", "dedup", "bench"),
    survey_ref="embedding near-dup scale path (mandate)",
)
def embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH near-dup pairs (see _lsh_neardup_pairs). The oracle
    expresses the identical candidate set as an OR of band equalities
    (fine at oracle scale)."""
    return _lsh_neardup_pairs(_lsh_base(spark, sf_dir))


@register(
    "knn_ivf_kmeans_recall",
    oracle=None,
    tags=("vector",),
    survey_ref="V4 scale path (k-means IVF, recall@k vs brute force)",
)
def knn_ivf_kmeans_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with a REAL coarse quantizer (Spark ML k-means, 16 cells) and
    its measured quality: one row of (n_queries, mean_recall, min_recall,
    k, nprobe, n_cells) comparing IVF top-10 against exact brute-force
    top-10 over 50 query vectors. Rows-only for the driver (k-means init
    is seed-dependent); tests assert mean_recall >= 0.65 and SCALE.md
    records the measured value (0.78 at sf0.01).

    Calibration note: the synthetic embeddings are near-uniform — the
    structureless worst case for IVF, where recall ≈ nprobe/n_cells
    (measured 0.56 @ 4/16, 0.78 @ 8/16, matching theory). On real
    clustered corpora the same plan reaches high recall at far smaller
    nprobe fractions; the levers are exposed so deployments tune
    (n_cells, nprobe) per recall target."""
    from vectra_player_spark.operators.knn import kmeans_centroids, recall_at_k

    # NULL embeddings can't participate in any ANN path (assign/encode NPE)
    emb = t(spark, sf_dir, "embeddings").where(F.col("embedding").isNotNull())
    # isEmpty() is a head(1) short-circuit over the plain scan+filter —
    # unlike a heavy derived frame, probing it does not re-run real work
    if emb.isEmpty():  # k-means cannot fit on zero vectors — empty report
        return spark.createDataFrame(
            [],
            "n_queries long, mean_recall double, min_recall double,"
            " k int, nprobe int, n_cells int",
        )
    queries = emb.where(F.col("vec_id") < 50)
    exact = brute_force_topk(queries, emb, k=10)
    centroids = kmeans_centroids(emb, n_cells=16)
    approx = ivf_topk(queries, emb, centroids, k=10, nprobe=8)
    return recall_at_k(exact, approx).select(
        "*",
        F.lit(10).alias("k"),
        F.lit(8).alias("nprobe"),
        F.lit(16).alias("n_cells"),
    )


@register(
    "knn_pq_adc_recall",
    oracle=None,
    tags=("vector",),
    survey_ref="V4 compression tier: product quantization + asymmetric distance",
)
def knn_pq_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: 64-dim float vectors compress to 8 one-byte
    codes (32× storage; 4-bit packing doubles it), queries score against
    codes alone via asymmetric distance (operators/knn.pq_train/encode/
    topk_adc — all map-side codegen, no shuffle before the final top-k).
    One row: recall@10 of PQ-ADC vs exact brute force over 50 queries,
    with the compression ratio. Rows-only (k-means codebooks are
    seed-dependent); tests pin a recall floor. The same caveat as IVF
    applies: near-uniform synthetic embeddings are quantization's worst
    case, so the measured recall here is the lower bound of the
    technique, not its typical value on clustered corpora."""
    from vectra_player_spark.operators.knn import (
        pq_encode,
        pq_topk_adc,
        pq_train,
        recall_at_k,
    )

    # NULL embeddings can't participate in any ANN path (assign/encode NPE)
    emb = t(spark, sf_dir, "embeddings").where(F.col("embedding").isNotNull())
    # isEmpty() is a head(1) short-circuit over the plain scan+filter
    if emb.isEmpty():  # codebooks cannot train on zero vectors
        return spark.createDataFrame(
            [],
            "n_queries long, mean_recall double, min_recall double,"
            " k int, m_subspaces int, n_codes int, compression_x double",
        )
    queries = emb.where(F.col("vec_id") < 50)
    exact = brute_force_topk(queries, emb, k=10)
    # Codebooks converge on a sample — cap the k-means training set at
    # ~20k vectors so train cost stays flat as the corpus grows (encode
    # and ADC remain full-corpus; only the model fit is sampled).
    n = emb.count()
    frac = min(1.0, 20_000 / max(n, 1))
    cb = pq_train(
        emb, m=8, n_codes=64, max_iter=8,
        sample_fraction=None if frac >= 1.0 else frac,
    )
    codes = pq_encode(emb, cb)
    approx = pq_topk_adc(queries, codes, cb, k=10)
    return recall_at_k(exact, approx).select(
        "*",
        F.lit(10).alias("k"),
        F.lit(8).alias("m_subspaces"),
        F.lit(64).alias("n_codes"),
        F.lit(32.0).alias("compression_x"),
    )


@register("knn_ivf_cosine", oracle=None, tags=("vector",), survey_ref="V4 scale path")
def knn_ivf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate IVF top-k (coarse cells = per-label centroids); rows-only
    check — approximation makes an exact SQL oracle inapplicable."""
    emb = t(spark, sf_dir, "embeddings")
    centroids = (
        emb.select("label", F.posexplode(F.col("embedding").cast("array<double>")))
        .groupBy(F.col("label").alias("cell_id"), "pos")
        .agg(F.avg("col").alias("v"))
        .groupBy("cell_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("pv"))
        .select("cell_id", F.expr("transform(pv, x -> x.v)").alias("centroid"))
    )
    queries = emb.where(F.col("vec_id") < 10)
    return ivf_topk(queries, emb, centroids, k=5, nprobe=2)


# --------------------------------------------------------------------------
# Dedup-group canonicalization: connected components over the banded-LSH
# near-dup pairs. The oracle computes the same components with a recursive
# transitive closure (fine at oracle scale); the Spark operator is
# min-label propagation — O(diameter) rounds of equi-joins, the standard
# cluster-scale CC. Both are exact integer computations → hash-checked.
# --------------------------------------------------------------------------

_COMPONENTS_ORACLE = f"""
WITH RECURSIVE
e0 AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
e AS (
  SELECT vec_id, label, emb,
         sqrt(list_dot_product(emb, emb)) AS nrm,
         {_band_bucket_sql("emb", 0)} AS bk0,
         {_band_bucket_sql("emb", 1)} AS bk1,
         {_band_bucket_sql("emb", 2)} AS bk2
  FROM e0
),
p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM e a
  JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
          AND (a.bk0 = b.bk0 OR a.bk1 = b.bk1 OR a.bk2 = b.bk2)
  WHERE list_dot_product(a.emb, b.emb) / NULLIF(a.nrm * b.nrm, 0) >= 0.3
),
edges AS (
  SELECT vec_a AS u, vec_b AS v FROM p
  UNION
  SELECT vec_b AS u, vec_a AS v FROM p
),
reach AS (
  SELECT u AS node, v AS r FROM edges
  UNION
  SELECT t.node, e2.v FROM reach t JOIN edges e2 ON t.r = e2.u
)
SELECT CAST(node AS BIGINT) AS node_id,
       CAST(LEAST(node, MIN(r)) AS BIGINT) AS component
FROM reach
GROUP BY node
"""


@register(
    "embedding_neardup_components",
    oracle=_COMPONENTS_ORACLE,
    tags=("vector", "dedup"),
    survey_ref="dedup group canonicalization (mandate)",
)
def embedding_neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters from the banded-LSH pairs: (node_id, component)
    with component = min member id (the canonical keeper).

    Collapses bytewise-identical (label, embedding) rows to one
    representative BEFORE the LSH pair stage: identical vectors share
    every band bucket and have cosine 1.0, so each collapse group is a
    clique in the oracle's pair graph and inter-group edges exist iff the
    rep-level edge exists — the node-level components are provably the
    same, but the candidate join only ever sees distinct vectors (the 10x
    verbatim-duplicated corpus measured 437 s -> ~30 s). A node appears
    in the output iff it is in some pair: group size >= 2, or its rep
    pairs with another rep. Reps are group minima, so component = min
    member id is preserved. The oracle keeps the direct all-rows form,
    proving the equivalence."""
    from vectra_player_spark.operators.dedup import connected_components

    base = _lsh_base(spark, sf_dir)
    grp = base.groupBy("label", "emb").agg(
        F.min("vec_id").alias("rep_id"),
        F.count(F.lit(1)).alias("n_members"),
        F.first("nrm").alias("nrm"),
    )
    reps = grp.select(
        F.col("rep_id").alias("vec_id"), "label", "emb", "nrm"
    )
    pairs = _lsh_neardup_pairs(reps)
    labels = connected_components(pairs, "vec_a", "vec_b")
    members = base.join(grp.select("label", "emb", "rep_id", "n_members"), ["label", "emb"])
    return (
        members.join(labels, members["rep_id"] == labels["node_id"], "left")
        .where((F.col("n_members") >= 2) | F.col("component").isNotNull())
        .select(
            F.col("vec_id").cast("bigint").alias("node_id"),
            F.coalesce("component", "rep_id").cast("bigint").alias("component"),
        )
    )


# --------------------------------------------------------------------------
# End-to-end RAG retrieval: quality-gate the candidate corpus, exact
# cosine top-3 per query vector, then join retrieved-document metadata —
# the full retrieve-for-context pipeline in one declarative plan. The gate
# applies BEFORE ranking (a disqualified doc must not consume a rank
# slot), which is the ordering bug hand-rolled RAG stacks hit; here it is
# oracle-pinned. embeddings.vec_id == documents.doc_id (1:1) in the
# synthetic lake; at 100 TB the doc join is the chunk-manifest lookup and
# the brute-force kernel swaps for the IVF path (same surrounding plan).
# --------------------------------------------------------------------------

_RAG_ORACLE = """
WITH good AS (SELECT doc_id, lang, n_chars, md5(text) AS doc_md5
              FROM documents WHERE n_chars >= 50),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
q AS (SELECT vec_id AS query_id, emb AS q_vec FROM e WHERE vec_id < 5),
cand AS (SELECT e.vec_id, e.emb FROM e JOIN good g ON g.doc_id = e.vec_id
         WHERE e.vec_id >= 5),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         ROUND(list_dot_product(q.q_vec, c.emb)
               / NULLIF(sqrt(list_dot_product(q.q_vec, q.q_vec))
                        * sqrt(list_dot_product(c.emb, c.emb)), 0), 6) AS cosine_sim
  FROM q JOIN cand c ON c.vec_id != q.query_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT r.query_id, CAST(r.rank AS INT) AS rank, r.neighbor_id AS doc_id,
       r.cosine_sim, g.lang, g.n_chars, g.doc_md5
FROM ranked r JOIN good g ON g.doc_id = r.neighbor_id
WHERE r.rank <= 3
"""


@register(
    "rag_retrieval_context",
    oracle=_RAG_ORACLE,
    tags=("vector",),
    survey_ref="V4+V1 end-to-end retrieval (quality gate -> top-k -> context join)",
)
def rag_retrieval_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vectra_player_spark.operators.knn import brute_force_topk

    emb = t(spark, sf_dir, "embeddings")
    docs = t(spark, sf_dir, "documents")
    good = docs.where(F.col("n_chars") >= 50).select(
        "doc_id", "lang", "n_chars", F.md5("text").alias("doc_md5")
    )
    cand = emb.where(F.col("vec_id") >= 5).join(
        good.select(F.col("doc_id").alias("vec_id")), "vec_id", "semi"
    )
    topk = brute_force_topk(emb.where(F.col("vec_id") < 5), cand, k=3)
    return topk.join(good, topk.neighbor_id == good.doc_id).select(
        "query_id",
        F.col("rank").cast("int").alias("rank"),
        "doc_id",
        "cosine_sim",
        "lang",
        "n_chars",
        "doc_md5",
    )


# --------------------------------------------------------------------------
# Scalar int8 quantization of the embedding column (min/max per vector).
# The storage/serving lever for a 100 TB vector corpus: 4× smaller than
# float32, and ADC-style scoring reads codes only (knn_pq_adc_recall is the
# product-quantized sibling). Everything is per-row array HOFs — zero
# shuffle, linear scan — and the code math is integer-exact, so the oracle
# hash-checks the full quantizer: per-vector range, every code (as a sum +
# md5 of the code list), and the reconstruction MSE.
#
# Float discipline: both engines evaluate the IDENTICAL expression tree in
# IEEE double left-to-right — cast-to-double first, then
# floor((v - lo) * 255 / (hi - lo) + 0.5) — so codes match bit-for-bit;
# the MSE is rounded to 6. Degenerate vectors (hi == lo) take an explicit
# all-zero-code branch on both sides.
# --------------------------------------------------------------------------

_QUANT_ORACLE = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb
  FROM embeddings
),
rng AS (
  SELECT vec_id, emb, list_min(emb) AS lo, list_max(emb) AS hi FROM e
),
codes AS (
  SELECT vec_id, emb, lo, hi,
         CASE WHEN hi = lo THEN list_transform(emb, v -> CAST(0 AS BIGINT))
              ELSE list_transform(emb, v ->
                CAST(floor((v - lo) * 255.0 / (hi - lo) + 0.5) AS BIGINT))
         END AS q
  FROM rng
)
SELECT vec_id,
       ROUND(lo, 6) AS q_lo,
       ROUND(hi, 6) AS q_hi,
       CAST(list_sum(q) AS BIGINT) AS code_sum,
       md5(array_to_string(q, ',')) AS code_md5,
       ROUND(list_sum(list_transform(generate_series(1, len(emb)),
               i -> CASE WHEN hi = lo THEN 0.0
                         ELSE (lo + q[i] * (hi - lo) / 255.0 - emb[i])
                              * (lo + q[i] * (hi - lo) / 255.0 - emb[i]) END))
             / len(emb), 6) AS mse
FROM codes
"""


@register(
    "embedding_int8_quantize",
    oracle=_QUANT_ORACLE,
    tags=("vector",),
    survey_ref="V2/V4 storage path (scalar quantization; PQ sibling knn_pq_adc_recall)",
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector min/max int8 quantizer + reconstruction error, all
    JVM-side HOFs (transform/aggregate) inside one codegen stage."""
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("transform(embedding, v -> CAST(v AS DOUBLE))").alias("emb")
    )
    rng = e.select(
        "vec_id",
        "emb",
        F.array_min("emb").alias("lo"),
        F.array_max("emb").alias("hi"),
    )
    codes = rng.withColumn(
        "q",
        F.expr(
            "CASE WHEN hi = lo THEN transform(emb, v -> CAST(0 AS BIGINT)) "
            "ELSE transform(emb, v -> CAST(floor((v - lo) * 255.0 / (hi - lo) + 0.5) AS BIGINT)) END"
        ),
    )
    dequant_sq = (
        "CASE WHEN hi = lo THEN CAST(0.0 AS DOUBLE) "
        "ELSE (lo + q[i - 1] * (hi - lo) / 255.0 - emb[i - 1]) "
        "   * (lo + q[i - 1] * (hi - lo) / 255.0 - emb[i - 1]) END"
    )
    return codes.select(
        "vec_id",
        F.round("lo", 6).alias("q_lo"),
        F.round("hi", 6).alias("q_hi"),
        F.expr("aggregate(q, 0L, (acc, x) -> acc + x)").alias("code_sum"),
        F.md5(F.array_join("q", ",")).alias("code_md5"),
        F.round(
            F.expr(
                f"aggregate(transform(sequence(1, size(emb)), i -> {dequant_sq}), "
                "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
            )
            / F.size("emb"),
            6,
        ).alias("mse"),
    )


# --------------------------------------------------------------------------
# MMR (maximal marginal relevance) diversified re-ranking: from the top-10
# cosine candidates for one query, greedily pick 3 where each pick
# maximizes lambda*rel - (1-lambda)*max_sim_to_already_selected. The
# standard RAG/context-window diversifier (the reference's retriever
# surfaces raw top-k; MMR is the curation step a production RAG adds).
#
# Greedy selection is inherently sequential, but k is tiny and fixed — so
# the k steps UNROLL into k CTE stages (argmax via ORDER BY/LIMIT 1 on
# rounded scores with a vec_id tie-break). The expensive part — scoring
# the whole corpus against the query — happens ONCE in `rel`; every later
# stage touches only the 10-row candidate set, so the 100 TB cost profile
# equals one brute-force (or IVF-pruned) top-k pass. Both engines run the
# same query text modulo the cosine kernel (list_dot_product vs
# aggregate/zip_with HOFs), with every score rounded to 6 BEFORE any
# comparison, so the greedy path is engine-identical.
# --------------------------------------------------------------------------

_MMR_LAMBDA = 0.7
_MMR_QUERY_ID = 0
_MMR_CANDIDATES = 10


def _mmr_sql(cos: "Callable[[str, str], str]", table: str) -> str:
    lam, one_m = _MMR_LAMBDA, round(1 - _MMR_LAMBDA, 10)
    return f"""
WITH e AS (
  SELECT vec_id, {_MMR_EMB_CAST} AS emb FROM {table}
),
q AS (SELECT emb AS q_vec FROM e WHERE vec_id = {_MMR_QUERY_ID}),
rel AS (
  SELECT c.vec_id, ROUND({cos("c.emb", "q.q_vec")}, 6) AS rel
  FROM e c CROSS JOIN q
  WHERE c.vec_id != {_MMR_QUERY_ID}
),
cand AS (SELECT vec_id, rel FROM rel ORDER BY rel DESC, vec_id LIMIT {_MMR_CANDIDATES}),
ce AS (SELECT c.vec_id, c.rel, e.emb FROM cand c JOIN e ON c.vec_id = e.vec_id),
sim AS (
  SELECT a.vec_id AS va, b.vec_id AS vb, ROUND({cos("a.emb", "b.emb")}, 6) AS s
  FROM ce a JOIN ce b ON a.vec_id != b.vec_id
),
p1 AS (SELECT vec_id, rel, rel AS mmr FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
r2 AS (
  SELECT c.vec_id, c.rel, {lam} * c.rel - {one_m} * s.s AS mmr
  FROM cand c
  JOIN sim s ON s.va = c.vec_id
  JOIN p1 ON s.vb = p1.vec_id
  WHERE c.vec_id != p1.vec_id
),
p2 AS (SELECT vec_id, rel, mmr FROM r2 ORDER BY mmr DESC, vec_id LIMIT 1),
sel12 AS (SELECT vec_id FROM p1 UNION ALL SELECT vec_id FROM p2),
r3 AS (
  SELECT c.vec_id, {lam} * c.rel - {one_m} * MAX(s.s) AS mmr
  FROM cand c
  JOIN sim s ON s.va = c.vec_id
  JOIN sel12 ON s.vb = sel12.vec_id
  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel12)
  GROUP BY c.vec_id, c.rel
),
p3 AS (SELECT vec_id, mmr FROM r3 ORDER BY mmr DESC, vec_id LIMIT 1)
SELECT CAST(1 AS INT) AS rank, vec_id, ROUND(mmr, 6) AS mmr_score FROM p1
UNION ALL SELECT CAST(2 AS INT), vec_id, ROUND(mmr, 6) FROM p2
UNION ALL SELECT CAST(3 AS INT), vec_id, ROUND(mmr, 6) FROM p3
"""


_MMR_EMB_CAST = "__EMB_CAST__"  # placeholder substituted per dialect below


def _mmr_greedy_sql(cand: str, sim: str) -> str:
    """The unrolled greedy stages only (shared shape with the oracle's
    tail), over pre-materialized candidate/similarity relations."""
    lam, one_m = _MMR_LAMBDA, round(1 - _MMR_LAMBDA, 10)
    return f"""
WITH p1 AS (SELECT vec_id, rel, rel AS mmr FROM {cand} ORDER BY rel DESC, vec_id LIMIT 1),
r2 AS (
  SELECT c.vec_id, c.rel, {lam} * c.rel - {one_m} * s.s AS mmr
  FROM {cand} c
  JOIN {sim} s ON s.va = c.vec_id
  JOIN p1 ON s.vb = p1.vec_id
  WHERE c.vec_id != p1.vec_id
),
p2 AS (SELECT vec_id, rel, mmr FROM r2 ORDER BY mmr DESC, vec_id LIMIT 1),
sel12 AS (SELECT vec_id FROM p1 UNION ALL SELECT vec_id FROM p2),
r3 AS (
  SELECT c.vec_id, {lam} * c.rel - {one_m} * MAX(s.s) AS mmr
  FROM {cand} c
  JOIN {sim} s ON s.va = c.vec_id
  JOIN sel12 ON s.vb = sel12.vec_id
  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel12)
  GROUP BY c.vec_id, c.rel
),
p3 AS (SELECT vec_id, mmr FROM r3 ORDER BY mmr DESC, vec_id LIMIT 1)
SELECT CAST(1 AS INT) AS rank, vec_id, ROUND(mmr, 6) AS mmr_score FROM p1
UNION ALL SELECT CAST(2 AS INT), vec_id, ROUND(mmr, 6) FROM p2
UNION ALL SELECT CAST(3 AS INT), vec_id, ROUND(mmr, 6) FROM p3
"""


def _duck_cos(a: str, b: str) -> str:
    return (
        f"list_dot_product({a}, {b}) / NULLIF(sqrt(list_dot_product({a}, {a}))"
        f" * sqrt(list_dot_product({b}, {b})), 0)"
    )


def _spark_cos(a: str, b: str) -> str:
    def d(x: str, y: str) -> str:
        return (
            f"aggregate(zip_with({x}, {y}, (p, r) -> p * r), "
            "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )

    return f"{d(a, b)} / NULLIF(sqrt({d(a, a)}) * sqrt({d(b, b)}), 0)"


_MMR_ORACLE = _mmr_sql(_duck_cos, "embeddings").replace(
    _MMR_EMB_CAST, "CAST(embedding AS DOUBLE[])"
)


@register(
    "mmr_rerank_topk",
    oracle=_MMR_ORACLE,
    tags=("vector", "retrieval"),
    survey_ref="V4 retrieval post-processing (greedy MMR diversification, unrolled)",
)
def mmr_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle runs the whole thing as one SQL statement; the Spark
    side is restructured so the corpus is scored EXACTLY once — the naive
    shared-CTE form re-inlines the scoring scan into every one of ~10 CTE
    references (22 joins in the physical plan, multiple corpus passes at
    100×). Here `cand`/`sim` (10 rows / 90 rows) are materialized with an
    eager localCheckpoint — lineage is cut, so the greedy stages read the
    tiny checkpointed relations instead of replaying the scan."""
    from vectra_player_spark.functions.vectors import cosine

    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("transform(embedding, v -> CAST(v AS DOUBLE))").alias("emb")
    )
    q = emb.where(F.col("vec_id") == _MMR_QUERY_ID).select(
        F.col("emb").alias("q_vec")
    )
    rel = (
        emb.where(F.col("vec_id") != _MMR_QUERY_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "emb", F.round(cosine("emb", "q_vec"), 6).alias("rel"))
    )
    cand = (
        rel.orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(_MMR_CANDIDATES)
        .localCheckpoint(eager=True)
    )
    a, b = cand.alias("a"), cand.alias("b")
    sim = (
        a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("va"),
            F.col("b.vec_id").alias("vb"),
            F.round(cosine(F.col("a.emb"), F.col("b.emb")), 6).alias("s"),
        )
    )
    cand.select("vec_id", "rel").createOrReplaceTempView("mmr_cand")
    sim.createOrReplaceTempView("mmr_sim")
    return spark.sql(_mmr_greedy_sql("mmr_cand", "mmr_sim"))


# --------------------------------------------------------------------------
# Hybrid retrieval with reciprocal-rank fusion (RRF, k=60): the standard
# production RAG ranker — a sparse BM25 list and a dense cosine list fused
# by summing 1/(60 + rank) per document. Completes the retrieval triad
# (bm25_topk_retrieval sparse, knn/rag dense, mmr_rerank diversification).
#
# documents.doc_id and embeddings.vec_id share the id space in the test
# lake, standing in for the chunk-id join a real RAG store maintains.
# Both engines run the same query text modulo dialect (tokenizer, list
# HOFs, cosine kernel). Determinism: each list is ranked on ROUND(score,6)
# with an id tie-break, ranks are integers, and the fused score — a sum of
# at most two exact rationals 1/(60+r) — is rounded to 6 before the final
# order, so the fused top-k is engine-identical. Scale shape: each arm is
# the already-audited retrieval plan (term-pruned explode / one broadcast
# dot-product pass); the fusion is a full-outer join of two k-row lists.
# --------------------------------------------------------------------------

_RRF_K = 60
_RRF_TOPK = 10
_RRF_TERMS = ("vector", "stream", "merge")
_RRF_QUERY_VEC = 0


def _rrf_sql(dialect: str, docs: str, embs: str) -> str:
    terms = ", ".join(f"'{t_}'" for t_ in _RRF_TERMS)
    if dialect == "duckdb":
        toks = r"regexp_split_to_array(lower(trim(text)), '\s+')"
        tok_len = "len(toks)"
        tok_filter = f"unnest(list_filter(toks, x -> x IN ({terms})))"
        emb_cast = "CAST(embedding AS DOUBLE[])"
        cos = (
            "list_dot_product(c.emb, q.q_vec) / NULLIF(sqrt(list_dot_product(c.emb, c.emb))"
            " * sqrt(list_dot_product(q.q_vec, q.q_vec)), 0)"
        )
    else:  # spark
        toks = r"split(lower(trim(text)), '\\s+')"
        tok_len = "size(toks)"
        tok_filter = f"explode(filter(toks, x -> x IN ({terms})))"
        emb_cast = "transform(embedding, v -> CAST(v AS DOUBLE))"
        d = (
            "aggregate(zip_with({a}, {b}, (p, r) -> p * r), "
            "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        cos = (
            f"{d.format(a='c.emb', b='q.q_vec')} / NULLIF(sqrt({d.format(a='c.emb', b='c.emb')})"
            f" * sqrt({d.format(a='q.q_vec', b='q.q_vec')}), 0)"
        )
    # Per-arm top-k rank: DuckDB (oracle, single node) keeps the plain
    # ROW_NUMBER window; the Spark arm must NOT plan a partition-less
    # Window over every scored doc — ORDER BY .. LIMIT k compiles to
    # TakeOrderedAndProject and the rank is recovered by array-sorting the
    # <= k survivors in one aggregate (posexplode position + 1). The final
    # fused rank runs over <= 2k rows but uses the same shape so no global
    # Window appears anywhere in the plan.
    # NaN contract (shared with operators.rank.ranked_topk): the negated
    # sort key would rank a NaN score LAST while ORDER BY DESC admits it
    # FIRST. Safe here by construction — bm25 scores are log/ratio terms
    # over positive counts, cosine NULLs (not NaNs) on zero norms via
    # NULLIF, and rrf is a sum of 1/(k+rank) — no NaN can reach the sort.
    if dialect == "duckdb":
        sparse_cte = f"""sparse AS (
  SELECT doc_id, CAST(rnk AS BIGINT) AS rank_sparse
  FROM (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk FROM bm25)
  WHERE rnk <= {_RRF_TOPK}
)"""
        dense_cte = f"""dense AS (
  SELECT doc_id, CAST(rnk AS BIGINT) AS rank_dense
  FROM (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk FROM scored)
  WHERE rnk <= {_RRF_TOPK}
)"""
        final_select = """SELECT doc_id, rank_sparse, rank_dense, rrf,
       CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS INT) AS rank
FROM fused
ORDER BY rrf DESC, doc_id"""
    else:
        sparse_cte = f"""sparse AS (
  SELECT r.doc_id AS doc_id, CAST(pos + 1 AS BIGINT) AS rank_sparse
  FROM (
    SELECT posexplode(array_sort(arr)) AS (pos, r) FROM (
      SELECT collect_list(struct(-score AS ns, doc_id)) AS arr FROM (
        SELECT doc_id, score FROM bm25 ORDER BY score DESC, doc_id LIMIT {_RRF_TOPK}
      ) st0
    ) st1
  ) st2
)"""
        dense_cte = f"""dense AS (
  SELECT r.doc_id AS doc_id, CAST(pos + 1 AS BIGINT) AS rank_dense
  FROM (
    SELECT posexplode(array_sort(arr)) AS (pos, r) FROM (
      SELECT collect_list(struct(-score AS ns, doc_id)) AS arr FROM (
        SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT {_RRF_TOPK}
      ) dt0
    ) dt1
  ) dt2
)"""
        final_select = """SELECT r.doc_id AS doc_id, r.rank_sparse AS rank_sparse,
       r.rank_dense AS rank_dense, r.rrf AS rrf, CAST(pos + 1 AS INT) AS rank
FROM (
  SELECT posexplode(array_sort(arr)) AS (pos, r) FROM (
    SELECT collect_list(struct(-rrf AS nr, doc_id, rank_sparse, rank_dense, rrf)) AS arr
    FROM fused
  ) ft0
) ft1
ORDER BY rank"""
    return f"""
WITH base AS (SELECT doc_id, {toks} AS toks FROM {docs}),
dls AS (SELECT doc_id, CAST({tok_len} AS BIGINT) AS dl, toks FROM base),
stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dls),
hits AS (SELECT doc_id, dl, {tok_filter} AS tok FROM dls),
tf AS (SELECT doc_id, dl, tok, COUNT(*) AS tf FROM hits GROUP BY doc_id, dl, tok),
dfreq AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY tok),
bm25 AS (
  SELECT t.doc_id,
         ROUND(SUM(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * (t.tf * 2.2)
               / (t.tf + 1.2 * (0.25 + 0.75 * t.dl / s.avgdl))), 6) AS score
  FROM tf t JOIN dfreq d ON t.tok = d.tok CROSS JOIN stats s
  GROUP BY t.doc_id
),
{sparse_cte},
e AS (SELECT vec_id, {emb_cast} AS emb FROM {embs}),
q AS (SELECT emb AS q_vec FROM e WHERE vec_id = {_RRF_QUERY_VEC}),
scored AS (
  SELECT c.vec_id AS doc_id, ROUND({cos}, 6) AS score
  FROM e c CROSS JOIN q WHERE c.vec_id != {_RRF_QUERY_VEC}
),
{dense_cte},
fused AS (
  SELECT COALESCE(s.doc_id, d.doc_id) AS doc_id,
         s.rank_sparse, d.rank_dense,
         ROUND(COALESCE(1.0 / ({_RRF_K} + s.rank_sparse), 0)
             + COALESCE(1.0 / ({_RRF_K} + d.rank_dense), 0), 6) AS rrf
  FROM sparse s FULL OUTER JOIN dense d ON s.doc_id = d.doc_id
)
{final_select}
"""


_RRF_ORACLE = _rrf_sql("duckdb", "documents", "embeddings")


@register(
    "hybrid_rrf_retrieval",
    oracle=_RRF_ORACLE,
    tags=("vector", "retrieval"),
    survey_ref="V4 + lexical fusion (reciprocal-rank hybrid ranker)",
)
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "documents").createOrReplaceTempView("rrf_documents")
    t(spark, sf_dir, "embeddings").createOrReplaceTempView("rrf_embeddings")
    return spark.sql(_rrf_sql("spark", "rrf_documents", "rrf_embeddings"))

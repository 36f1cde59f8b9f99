"""Similarity search over embedding columns (BASELINE.json north star).

- brute_force_topk: exact cosine top-k for a query set — the correctness
  baseline. Query side is broadcast; candidates stream through one codegen
  stage; per-query top-k is a window row_number (Spark plans the global
  sort as TakeOrderedAndProject per partition key).
- ivf_topk: the scale path — k-means-free IVF using label centroids (or any
  coarse quantizer DataFrame of (cell_id, centroid)): assign every vector
  to its nearest cell once, then only search cells the query maps to
  (nprobe cells). Cuts candidate count by ~|cells|/nprobe at 100 TB while
  reusing the same exact kernel inside each cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vectra_player_spark.functions.vectors import cosine, dot


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector (excluding self).

    Norms are computed ONCE per vector before the join (the pair kernel is
    then a single dot-product fold) — at n_q × n_c pairs this is the
    difference between 1 and 3 array folds per pair."""
    from vectra_player_spark.functions.vectors import norm

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(vec_col).alias("q_norm"),
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm(vec_col).alias("c_norm"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot("q_vec", "c_vec")
                / F.nullif(F.col("q_norm") * F.col("c_norm"), F.lit(0.0)),
                6,
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def kmeans_centroids(
    vectors: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """Real coarse quantizer for IVF: Spark ML k-means over the embedding
    column (distributed Lloyd iterations; the model's k × dim centers are
    driver-small by construction). Returns (cell_id, centroid) ready for
    assign_cells / ivf_topk."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = vectors.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(feat)
    spark = vectors.sparkSession
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell_id int, centroid array<double>",
    )


def recall_at_k(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """Mean per-query recall of an approximate top-k result vs the exact
    one: |approx ∩ exact| / |exact| per query, averaged. Both inputs are
    (query_id, neighbor_id, ...) frames from *_topk."""
    hits = approx.select("query_id", "neighbor_id").withColumn("hit", F.lit(1))
    per_q = (
        exact.select("query_id", "neighbor_id")
        .join(hits, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.avg(F.coalesce("hit", F.lit(0))).alias("recall"))
    )
    return per_q.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.avg("recall"), 6).alias("mean_recall"),
        F.round(F.min("recall"), 6).alias("min_recall"),
    )


def assign_cells(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell_id",
    centroid_col: str = "centroid",
) -> DataFrame:
    """IVF assignment: nearest centroid per vector (broadcast centroids)."""
    scored = vectors.join(F.broadcast(centroids), F.lit(True)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col(cell_col),
        cosine(vec_col, centroid_col).alias("_sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_sim"), F.asc(cell_col))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, vec_col, cell_col)
    )


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: search only the nprobe nearest cells per query."""
    cand_cells = assign_cells(candidates, centroids, id_col, vec_col)
    q_scored = queries.join(F.broadcast(centroids), F.lit(True)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("cell_id"),
        cosine(vec_col, "centroid").alias("_sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("cell_id"))
    q_cells = (
        q_scored.withColumn("_rn", F.row_number().over(wq))
        .where(F.col("_rn") <= nprobe)
        .select("query_id", "q_vec", "cell_id")
    )
    scored = (
        F.broadcast(q_cells)
        .join(
            cand_cells.withColumnRenamed(id_col, "neighbor_id").withColumnRenamed(
                vec_col, "c_vec"
            ),
            "cell_id",
        )
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine("q_vec", "c_vec"), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )

"""Mergeable sketch tables — pre-aggregated HLL / count-min state that any
later window query UNIONS instead of re-scanning raw data.

The sketch queries the engine already ships (approx percentile error
reports, windowed approx_count_distinct) evaluate sketches INLINE over the
raw rows. The pattern this module adds is the lake-scale one: materialize
ONE small sketch row per (group, day) at ingest, then answer "distinct
users over any date range / per rolling window" by merging sketches —
`hll_union_agg` over k rows instead of a COUNT(DISTINCT) over billions.
Spark 4 ships the Apache DataSketches HLL build/union/estimate functions
natively (hll_sketch_agg / hll_union_agg / hll_sketch_estimate), so the
whole pipeline is JVM-side codegen — no UDF.

Reference parity: the reference's stats cache persists per-day aggregate
rows it can re-serve without rescanning (src/services/event_store
summary-cache paths); exact distincts don't compose that way (a distinct
cannot be summed across days), sketches are the standard lake answer.

Accuracy contract: like every approx operator in this engine, the
registered query is a SELF-VALIDATING error report against the exact
answer on the same data (sketch_accuracy_report precedent) — raw sketch
estimates are engine-specific and never hash-compared.

Scale shape: the sketch table build is one hash aggregate (map-side
partial HLL merge — mergeable state is exactly what makes the partial
aggregation lossless); every downstream range query is an aggregate over
|groups|×|days| SMALL rows. At 100 TB the raw scan happens once at
ingest, never per question.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_daily_sketch_table(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "user_id",
    lg_config_k: int = 12,
) -> DataFrame:
    """One row per (group, day) carrying the day's HLL sketch of distinct
    ids plus exact companions (row count; exact distinct is intentionally
    NOT stored — not mergeable, and its absence is the point).

    lgConfigK=12 → 4 KB registers, ~1.6% relative standard error — the
    DataSketches default tradeoff."""
    return (
        events.groupBy(F.col(group_col), F.to_date(ts_col).alias("day"))
        .agg(
            F.hll_sketch_agg(F.col(id_col).cast("string"), F.lit(lg_config_k)).alias(
                "id_sketch"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def range_distinct_from_sketches(
    sketch_table: DataFrame,
    group_col: str = "event_type",
) -> DataFrame:
    """Distinct-id estimate per group over the WHOLE stored range by
    merging daily sketches — the query that replaces COUNT(DISTINCT) over
    raw data. Returns (group, n_days, est_distinct)."""
    return sketch_table.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("id_sketch"))
        .cast("double")
        .alias("est_distinct"),
    )


def sketch_rollup_error_report(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "user_id",
) -> DataFrame:
    """The registered accuracy contract: build the daily sketch table,
    answer the all-range distinct per group from sketch UNION ONLY, and
    compare against the exact COUNT(DISTINCT) computed directly from the
    raw rows. One summary row: worst/mean relative error and the fraction
    of groups within the sketch's nominal rsd band.

    The exact arm exists here only as the report's yardstick — in
    production it is the query you can no longer afford, which is why the
    estimate must come from the UNION of per-day sketches (proving
    mergeability end-to-end, not just single-shot estimation)."""
    est = range_distinct_from_sketches(
        build_daily_sketch_table(events, group_col, ts_col, id_col), group_col
    )
    exact = events.groupBy(group_col).agg(
        F.count_distinct(F.col(id_col)).cast("double").alias("exact_distinct")
    )
    per_group = est.join(exact, group_col).select(
        F.col(group_col),
        "n_days",
        "est_distinct",
        "exact_distinct",
        (
            F.abs(F.col("est_distinct") - F.col("exact_distinct"))
            / F.nullif(F.col("exact_distinct"), F.lit(0.0))
        ).alias("rel_err"),
    )
    return per_group.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n_days").cast("bigint").alias("n_sketch_rows"),
        F.round(F.avg("rel_err"), 6).alias("mean_rel_err"),
        F.round(F.max("rel_err"), 6).alias("max_rel_err"),
        F.round(F.avg((F.col("rel_err") <= 0.05).cast("double")), 6).alias(
            "frac_within_5pct"
        ),
    )


def heavy_hitters_report(
    docs: DataFrame,
    text_col: str = "text",
    eps: float = 0.001,
    confidence: float = 0.99,
    top_k: int = 20,
) -> DataFrame:
    """Count-min-sketch heavy hitters over the token stream, validated
    against exact counts: tokenize (same whitespace split as the text
    family), build ONE CMS over all tokens, probe it for the exact top-k
    tokens, and report the estimate error. CMS guarantees
    estimate >= true and estimate <= true + eps*N with the given
    confidence — the report checks both sides empirically.

    Scale: the CMS is a fixed (w×d) integer grid built in one aggregate
    (mergeable, map-side combined); the probe touches only the k
    candidate tokens. The exact arm (explode+groupBy over every token)
    is the yardstick this report exists to retire at lake scale."""
    import pyspark.sql.types as T

    tokens = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok")
    ).where(F.col("tok") != "")
    exact_top = (
        tokens.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("tok"))
        .limit(top_k)
    )
    cms_row = tokens.agg(
        F.count_min_sketch(
            "tok", F.lit(eps), F.lit(confidence), F.lit(42)
        ).alias("cms"),
        F.count(F.lit(1)).alias("n_tokens"),
    ).collect()[0]
    n_tokens = int(cms_row["n_tokens"])
    spark = docs.sparkSession

    # Probe the sketch JVM-side: deserialize once on the driver (a few KB)
    # and look up the k candidates — the sketch is the artifact, the probe
    # is O(k).
    jvm = spark._jvm
    bis = jvm.java.io.ByteArrayInputStream(bytes(cms_row["cms"]))
    sketch = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
    rows = []
    for r in exact_top.collect():
        est = int(sketch.estimateCount(r["tok"]))
        rows.append((r["tok"], int(r["exact_n"]), est))
    schema = T.StructType(
        [
            T.StructField("tok", T.StringType()),
            T.StructField("exact_n", T.LongType()),
            T.StructField("cms_n", T.LongType()),
        ]
    )
    per_tok = spark.createDataFrame(rows, schema)
    return per_tok.agg(
        F.count(F.lit(1)).alias("k"),
        F.lit(n_tokens).cast("bigint").alias("n_tokens"),
        # CMS never underestimates
        F.sum((F.col("cms_n") < F.col("exact_n")).cast("bigint")).alias("n_under"),
        # one-sided error bound: overshoot as a fraction of eps*N
        F.round(
            F.max((F.col("cms_n") - F.col("exact_n")) / F.lit(eps * n_tokens)), 6
        ).alias("max_overshoot_vs_bound"),
        F.round(
            F.avg((F.col("cms_n") - F.col("exact_n")) / F.col("exact_n")), 6
        ).alias("mean_rel_overshoot"),
    )

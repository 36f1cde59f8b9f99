"""Training-data pipeline queries: split / scrub / pack / mix / percentile.

The ops a pretraining corpus build needs between "dedup" and "tokenize":
deterministic train/val/test assignment, denylist scrubbing (C4-style
bad-word filtering — reference motivation: the corpus curation described
in training_data/README.md), fixed-token-budget sequence packing, and
per-source mixture sampling (data mixing weights). Plus exact per-group
percentiles (reference: src/analysis/descriptive.py percentile blocks)
as the F7 family's interpolated-quantile representative.

Every query here is deterministic (md5-keyed, no RNG) and expressed as
window/agg SQL on BOTH engines, so all are oracle-checked. Scale notes:
- split/mix are map-only (a hash + a comparison per row; no shuffle).
- packing is one window per source partition — the partition key is the
  source shard, so state never concentrates.
- percentiles use Spark's exact `percentile` (sort-based per group) to
  match DuckDB's quantile_cont; at 100 TB swap to percentile_approx
  (t-digest) — the query shape is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vectra_player_spark.plans.registry import register
from vectra_player_spark.tables import t

# Deterministic uniform in [0, 1): first 8 md5 hex chars as a 32-bit int.
# Same construction both engines (operators/dedup.py SPARK_HEX8/DUCKDB_HEX8).
_SPARK_U01 = (
    "conv(substring(md5(concat('{salt}:', cast(doc_id as string))), 1, 8), 16, 10)"
    " / 4294967296.0"
)
_DUCK_U01 = (
    "CAST('0x' || substring(md5('{salt}:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)"
    " / 4294967296.0"
)

# --------------------------------------------------------------------------
# doc_train_split — deterministic hash split, 80/10/10. The split must be
# stable across runs, engines, and re-shards (keyed on doc_id only), and
# must not shuffle: at 100 TB this is a projection over the scan.
# --------------------------------------------------------------------------

_SPLIT_ORACLE = f"""
SELECT doc_id, source,
       CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
FROM (SELECT doc_id, source, {_DUCK_U01.format(salt="split")} AS u FROM documents)
"""


@register(
    "doc_train_split",
    oracle=_SPLIT_ORACLE,
    tags=("pipeline",),
    survey_ref="training-mix split (mandate-adjacent); M4 dataset assembly",
)
def doc_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    u = F.expr(_SPARK_U01.format(salt="split"))
    return docs.select(
        "doc_id",
        "source",
        F.when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test").alias("split"),
    )


# --------------------------------------------------------------------------
# doc_denylist_scrub — C4-style denylist redaction: whole-word matches
# replaced with a sentinel, with a per-doc removed-count. Map-only (two
# regexes per row, JVM-side); the denylist is a compile-time pattern —
# at a real 100 TB run the list is broadcast and the pattern built once.
# DuckDB dialect: regexp_replace needs the 'g' flag (Spark is global by
# default); both regex engines (Java, RE2) support \\b word boundaries.
# --------------------------------------------------------------------------

_DENY_PAT = r"\b(spark|hash|merge)\b"

_SCRUB_ORACLE = rf"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_DENY_PAT}')) AS BIGINT) AS n_removed,
       md5(regexp_replace(text, '{_DENY_PAT}', '[filtered]', 'g')) AS scrubbed_md5
FROM documents
"""


@register(
    "doc_denylist_scrub",
    oracle=_SCRUB_ORACLE,
    tags=("pipeline",),
    survey_ref="quality/denylist filtering (mandate: text analysis); P7 row cleaning",
)
def doc_denylist_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        # Spark SQL string literals consume backslash escapes ('\b' -> 0x08),
        # so the pattern's backslashes are doubled for the expr path; the
        # Python-API regexp_replace below takes the pattern verbatim.
        F.size(F.expr(f"regexp_extract_all(text, '{_DENY_PAT.replace(chr(92), chr(92) * 2)}', 0)"))
        .cast("bigint")
        .alias("n_removed"),
        F.md5(F.regexp_replace("text", _DENY_PAT, "[filtered]")).alias("scrubbed_md5"),
    )


# --------------------------------------------------------------------------
# doc_sequence_packing — fixed-token-budget packing: within each source
# shard, docs in doc_id order fill 256-token packs greedily (a doc starts
# a new pack when the running total would cross the budget boundary —
# the floor((cum - tok)/budget) form, i.e. boundary-crossing docs belong
# to the pack their first token lands in). Output is pack-level: docs
# per pack, token sum. One window + one groupBy, both partitioned by the
# source shard — no global state, so packing parallelizes per shard
# exactly like a real tokenizer-sharded packing job.
# --------------------------------------------------------------------------

_PACK_BUDGET = 256

_PACK_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, source,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tok
  FROM documents
), packed AS (
  SELECT source, n_tok,
         CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) - n_tok)
                    / {_PACK_BUDGET}.0) AS BIGINT) AS pack_id
  FROM toks
)
SELECT source, pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS pack_tokens
FROM packed
GROUP BY source, pack_id
"""


@register(
    "doc_sequence_packing",
    oracle=_PACK_ORACLE,
    tags=("pipeline",),
    survey_ref="sequence packing for pretraining batches (mandate-adjacent); W-family cumsum",
)
def doc_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim("text"), r"\s+")).cast("bigint")
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    packed = docs.select(
        "source",
        n_tok.alias("n_tok"),
        F.floor((F.sum(n_tok).over(w) - n_tok) / float(_PACK_BUDGET))
        .cast("bigint")
        .alias("pack_id"),
    )
    return packed.groupBy("source", "pack_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("pack_tokens"),
    )


# --------------------------------------------------------------------------
# doc_source_mixture — data-mixing weights: each source is sampled at a
# per-source rate (here 1.0 / 0.5 / 0.25 by source tier) with the same
# deterministic md5 coin as the split, so mixtures are reproducible and
# composable with the split (independent salts). Map-only; the weight
# table would be a broadcast join in the general case — here a CASE so
# the oracle stays a single expression.
# --------------------------------------------------------------------------

_MIX_RATE_DUCK = """CASE WHEN CAST(substring(source, 4) AS INTEGER) < 5 THEN 1.0
            WHEN CAST(substring(source, 4) AS INTEGER) < 10 THEN 0.5
            ELSE 0.25 END"""

_MIX_ORACLE = f"""
SELECT doc_id, source
FROM (SELECT doc_id, source, {_DUCK_U01.format(salt="mix")} AS u FROM documents)
WHERE u < {_MIX_RATE_DUCK}
"""


@register(
    "doc_source_mixture",
    oracle=_MIX_ORACLE,
    tags=("pipeline",),
    survey_ref="training-mix source weighting (mandate-adjacent)",
)
def doc_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    src_num = F.substring("source", 4, 10).cast("int")
    rate = (
        F.when(src_num < 5, F.lit(1.0)).when(src_num < 10, F.lit(0.5)).otherwise(F.lit(0.25))
    )
    u = F.expr(_SPARK_U01.format(salt="mix"))
    return docs.where(u < rate).select("doc_id", "source")


# --------------------------------------------------------------------------
# event_value_percentiles — exact interpolated per-group percentiles
# (Spark `percentile` == DuckDB `quantile_cont`, both linear interpolation
# over the sorted group). Rounded to 6dp to absorb summation-order float
# noise. The 100 TB variant swaps in percentile_approx (t-digest sketch,
# mergeable map-side) — same plan shape, bounded state.
# --------------------------------------------------------------------------

_PCTL_ORACLE = """
SELECT event_type,
       CAST(COUNT(value) AS BIGINT) AS n,
       ROUND(quantile_cont(value, 0.5), 6) + 0.0 AS p50,
       ROUND(quantile_cont(value, 0.9), 6) + 0.0 AS p90,
       ROUND(quantile_cont(value, 0.99), 6) + 0.0 AS p99
FROM events
GROUP BY event_type
"""


@register(
    "event_value_percentiles",
    oracle=_PCTL_ORACLE,
    tags=("pipeline",),
    survey_ref="F7/A6 exact percentiles (reference: src/analysis descriptive blocks)",
)
def event_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("value").cast("bigint").alias("n"),
        (F.round(F.expr("percentile(value, 0.5D)"), 6) + 0.0).alias("p50"),
        (F.round(F.expr("percentile(value, 0.9D)"), 6) + 0.0).alias("p90"),
        (F.round(F.expr("percentile(value, 0.99D)"), 6) + 0.0).alias("p99"),
    )


@register(
    "event_value_percentiles_approx",
    oracle=None,
    tags=("pipeline", "sketch"),
    survey_ref="F7/A6 percentile scale path: mergeable sketch + self-validating error report",
)
def event_value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile path, self-validating (the HLL/sketch-report
    pattern): percentile_approx's mergeable sketch holds bounded state
    per group where the exact form materializes the full sorted group —
    at lake scale the exact form is a per-group sort of everything, the
    sketch a fixed-size map-side-combinable accumulator (relative rank
    error <= 1/accuracy). Values are engine-specific (no DuckDB-matchable
    form), so the registered query emits the ERROR REPORT against the
    exact percentiles computed on the same scan: per-quantile mean/max
    relative error and the within-tolerance fraction. Deterministic (the
    GK-style sketch has no RNG), rows-only driver check."""
    ev = t(spark, sf_dir, "events")
    acc = 1000  # rank error <= 0.1% of the group
    per_group = ev.groupBy("event_type").agg(
        *[
            F.expr(f"percentile(value, {q}D)").alias(f"exact_{tag}")
            for q, tag in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99"))
        ],
        *[
            F.expr(f"percentile_approx(value, {q}D, {acc})").alias(f"approx_{tag}")
            for q, tag in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99"))
        ],
    )
    err_cols = [
        (
            F.abs(F.col(f"approx_{tag}") - F.col(f"exact_{tag}"))
            / F.nullif(F.abs(F.col(f"exact_{tag}")), F.lit(0.0))
        ).alias(f"err_{tag}")
        for tag in ("p50", "p90", "p99")
    ]
    errs = per_group.select("event_type", *err_cols)
    return errs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        *[
            F.round(F.avg(f"err_{tag}"), 6).alias(f"mean_err_{tag}")
            for tag in ("p50", "p90", "p99")
        ],
        *[
            F.round(F.max(f"err_{tag}"), 6).alias(f"max_err_{tag}")
            for tag in ("p50", "p90", "p99")
        ],
        F.round(
            F.avg(
                (
                    (F.col("err_p50") <= 0.01)
                    & (F.col("err_p90") <= 0.01)
                    & (F.col("err_p99") <= 0.01)
                ).cast("double")
            ),
            6,
        ).alias("frac_groups_within_1pct"),
    )


# --------------------------------------------------------------------------
# skewed_event_rollup — the hot-key aggregation lever, oracle-proven
# answer-preserving. event_type is the engine's most skewed key (a handful
# of values over every event row); the query routes COUNT / SUM / MAX and
# an EXACT COUNT(DISTINCT user_id) through the two-stage salted plan in
# operators/skew.py (partial state on (key, hash(user_id) % 16), merge on
# key). The oracle is the plain one-stage GROUP BY — identical rows means
# the salting is semantics-free, which is the property that lets a 100 TB
# job turn it on for any hot key without re-validating results.
# --------------------------------------------------------------------------

# sum_value accumulates in DECIMAL on both sides — see salted_aggregate's
# docstring (100× sweep finding: double partial sums drifted past the
# rounding grid at 10M-row volume).
_SKEW_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       ROUND(MAX(value), 6) + 0.0 AS max_value,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# zorder_box_rollup — the multi-dimensional layout lever (operators/
# layout.write_zordered), oracle-proven answer-preserving the same way
# q9_product_profit_bucketed proves the bucketed lake: the query reads a
# Z-ordered COPY of events (Morton-interleaved (user_id, value), range-
# partitioned + file-sorted on the curve) and answers a 2-D box predicate;
# the oracle runs on the ORIGINAL parquet. Identical hashes = the layout
# changed file placement only. At 100 TB the z-layout is what lets a box
# predicate on two columns skip most files via footer min/max on BOTH
# dimensions (tests/test_layout.py measures the skipping; 1-D sorting
# prunes only its own column).
# --------------------------------------------------------------------------

_ZORDER_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
WHERE user_id BETWEEN 30 AND 90 AND value BETWEEN 10.0 AND 50.0
GROUP BY event_type
"""

# (session id, sf_dir) -> z-ordered events path (write once per session)
_ZORDER_CACHE: dict[tuple[int, str], str] = {}


@register(
    "zorder_box_rollup",
    oracle=_ZORDER_ORACLE,
    tags=("pipeline", "layout"),
    survey_ref="layout lever: Z-order clustering, box-predicate file skipping",
)
def zorder_box_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    from vectra_player_spark.operators.layout import write_zordered

    key = (id(spark), sf_dir)
    path = _ZORDER_CACHE.get(key)
    if path is not None:
        try:  # stale-hit guard: /tmp wiped between runs or dead session
            loc = spark._jvm.org.apache.hadoop.fs.Path(path)
            fs = loc.getFileSystem(spark._jsc.hadoopConfiguration())
            if not fs.exists(loc):
                path = None
        except Exception:  # noqa: BLE001 — dead context: rebuild
            path = None
        if path is None:
            del _ZORDER_CACHE[key]
    if path is None:
        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        path = f"/tmp/vectra_zorder/events_{tag}"
        ev = t(spark, sf_dir, "events").where(F.col("value").isNotNull())
        write_zordered(ev, path, "user_id", "value", bits=10, n_files=16)
        _ZORDER_CACHE[key] = path
    z = spark.read.parquet(path)
    return (
        z.where(
            F.col("user_id").between(30, 90) & F.col("value").between(10.0, 50.0)
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


@register(
    "skewed_event_rollup",
    oracle=_SKEW_ORACLE,
    tags=("pipeline", "skew"),
    survey_ref="A3/A9 under skew; SCALE.md skew levers",
)
def skewed_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vectra_player_spark.operators.skew import salted_aggregate

    ev = t(spark, sf_dir, "events")
    return salted_aggregate(ev, key="event_type", salt_col="user_id", salt_factor=16)


# --------------------------------------------------------------------------
# sketch_accuracy_report — the 100 TB stand-ins, calibrated against their
# exact forms in one pass: HyperLogLog++ distinct counts and t-digest-style
# approximate percentiles next to the exact answers, with error columns.
# Rows-only (DuckDB's approx sketches are a different implementation, so
# no cross-engine hash parity exists BY DESIGN); tests/test_semantics.py
# bounds rel_err_ndv (HLL++ rsd 0.05) and abs_err_p50. This is the query a
# user runs before swapping exact -> sketch in any in-cap query here.
# --------------------------------------------------------------------------


@register(
    "sketch_accuracy_report",
    oracle=None,
    tags=("pipeline", "sketch"),
    survey_ref="A2/F7 sketch path (approx_count_distinct, percentile_approx)",
)
def sketch_accuracy_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("ndv_exact"),
        F.approx_count_distinct("user_id", rsd=0.05).cast("bigint").alias("ndv_hll"),
        F.expr("percentile(value, 0.5D)").alias("p50_exact"),
        F.expr("percentile_approx(value, 0.5D, 10000)").alias("p50_approx"),
    )
    return agg.select(
        "event_type",
        "ndv_exact",
        "ndv_hll",
        (F.abs(F.col("ndv_hll") - F.col("ndv_exact")) / F.col("ndv_exact")).alias(
            "rel_err_ndv"
        ),
        F.round("p50_exact", 6).alias("p50_exact"),
        F.round("p50_approx", 6).alias("p50_approx"),
        F.abs(F.col("p50_approx") - F.col("p50_exact")).alias("abs_err_p50"),
    )


# --------------------------------------------------------------------------
# unpivot_lineitem_measures — wide->long melt (Spark `stack`, the unpivot
# generator), then a small rollup so the output is the 3×|returnflag|
# summary. The melt is map-side (Expand/Generate — no shuffle added by the
# unpivot itself); the only exchange is the final groupBy.
# --------------------------------------------------------------------------

# Totals accumulate in DECIMAL on both sides (functions/exact discipline):
# the 100× sweep caught a real volume-only flip here — SUM(double) over
# 60M extendedprice rows (~1e12 magnitude, ulp ≈ 1.2e-4) drifts by
# shuffle order far beyond the old ROUND(,4) grid. The mean is a ratio
# of the exact sum, froundéd on both engines (the r3 rounding-boundary
# rule for ratio outputs).
_UNPIVOT_ORACLE = """
WITH melted AS (
  SELECT l_returnflag, 'quantity' AS measure, l_quantity AS val FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'discount', l_discount FROM lineitem
)
SELECT l_returnflag, measure,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(val AS DECIMAL(18,6))) AS DOUBLE) AS total,
       FLOOR(CAST(SUM(CAST(val AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
             * 1000000 + 0.5) / 1000000 AS mean
FROM melted
GROUP BY l_returnflag, measure
"""


@register(
    "unpivot_lineitem_measures",
    oracle=_UNPIVOT_ORACLE,
    tags=("pipeline",),
    survey_ref="A9/A11 wide->long reshaping (pivot's inverse)",
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    melted = li.selectExpr(
        "l_returnflag",
        "stack(3, 'quantity', l_quantity, 'extendedprice', l_extendedprice,"
        " 'discount', l_discount) AS (measure, val)",
    )
    from vectra_player_spark.functions.exact import dsum, fround

    return (
        melted.groupBy("l_returnflag", "measure")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            dsum("val").alias("total"),
        )
        .select(
            "l_returnflag",
            "measure",
            "n",
            "total",
            fround(F.col("total") / F.col("n"), 6).alias("mean"),
        )
    )


# --------------------------------------------------------------------------
# incremental_daily_rollup — incremental view maintenance, driver-verified:
# the Spark side folds THREE deterministic batches (event_id % 3) through
# operators/incremental.merge_rollup; the oracle is DuckDB's single-pass
# GROUP BY over all events. A hash match proves incremental == full
# recompute — the invariant a 100 TB stats-cache refresh job rests on.
# --------------------------------------------------------------------------

_INCR_ORACLE = """
SELECT user_id, CAST(ts AS DATE) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 6) + 0.0 AS sum_value,
       ROUND(MAX(value), 6) + 0.0 AS max_value,
       ROUND(MIN(value), 6) + 0.0 AS min_value,
       ROUND(SUM(value) / COUNT(*), 6) + 0.0 AS avg_value
FROM events
GROUP BY user_id, CAST(ts AS DATE)
"""


@register(
    "incremental_daily_rollup",
    oracle=_INCR_ORACLE,
    tags=("pipeline",),
    survey_ref="M24 stats cache, incremental form (mergeable partials; streaming update-mode analog)",
)
def incremental_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vectra_player_spark.operators.incremental import (
        finalize_rollup,
        merge_rollup,
        rollup_partial,
    )

    ev = t(spark, sf_dir, "events")
    state = None
    for i in range(3):
        batch = ev.where(F.pmod("event_id", F.lit(3)) == i)
        state = merge_rollup(state, rollup_partial(batch))
    return finalize_rollup(state)


# --------------------------------------------------------------------------
# doc_weighted_sample — deterministic weighted sampling WITHOUT replacement
# (Efraimidis–Spirakis exponential-key variant): key = -ln(u)/w with an
# md5-derived uniform u and weight w = n_chars; the N smallest keys are an
# exact weighted sample. Reference motivation: corpus builders sample
# documents proportional to length for token-budget planning
# (training_data/README.md mixture notes). No RNG → both engines compute
# the identical key, so the selected SET is oracle-checkable. Scale: the
# key is a map-side projection and the selection is a top-N
# (TakeOrderedAndProject — per-partition heaps, no global sort shuffle).
# The +0.5 offset keeps u strictly inside (0,1) so ln() is finite.
# --------------------------------------------------------------------------

_WS_N = 200

_SPARK_WS_U = (
    "(conv(substring(md5(concat('wsample:', cast(doc_id as string))), 1, 8), 16, 10)"
    " + 0.5) / 4294967296.0"
)
_DUCK_WS_U = (
    "(CAST('0x' || substring(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)"
    " + 0.5) / 4294967296.0"
)

_WSAMPLE_ORACLE = f"""
SELECT doc_id, source, n_chars,
       ROUND(-ln({_DUCK_WS_U}) / n_chars, 6) + 0.0 AS sample_key
FROM documents
ORDER BY -ln({_DUCK_WS_U}) / n_chars, doc_id
LIMIT {_WS_N}
"""


@register(
    "doc_weighted_sample",
    oracle=_WSAMPLE_ORACLE,
    tags=("pipeline",),
    survey_ref="weighted corpus sampling (mandate-adjacent); O3 top-N physical path",
)
def doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    key = -F.expr(f"ln({_SPARK_WS_U})") / F.col("n_chars")
    return (
        docs.select(
            "doc_id",
            "source",
            "n_chars",
            (F.round(key, 6) + 0.0).alias("sample_key"),
            key.alias("_k"),
        )
        .orderBy("_k", "doc_id")
        .limit(_WS_N)
        .drop("_k")
    )


# --------------------------------------------------------------------------
# doc_pii_scrub — PII redaction: emails and IPv4 literals replaced with
# typed sentinels, with per-doc match counts and a hash of the scrubbed
# text (so the redaction itself is value-checked, not just counted).
# A mandated training-pipeline op: corpora are scrubbed before release.
# Map-only — two JVM regexes per row, no shuffle; at 100 TB the cost is
# the scan. Patterns are Java-regex ∩ RE2 compatible (no backrefs or
# lookaround) so Spark and DuckDB match identically; DuckDB needs the
# explicit 'g' flag where Spark's regexp_replace is global by default.
# --------------------------------------------------------------------------

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_PII_ORACLE = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_PII_IPV4}')) AS BIGINT) AS n_ips,
       md5(regexp_replace(regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                          '{_PII_IPV4}', '<IP>', 'g')) AS scrub_sig
FROM documents
"""


@register(
    "doc_pii_scrub",
    oracle=_PII_ORACLE,
    tags=("pipeline",),
    survey_ref="PII redaction (training-pipeline mandate); P7 row-level cleaning family",
)
def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", _PII_EMAIL, "<EMAIL>"), _PII_IPV4, "<IP>"
    )
    # F.regexp_extract_all with a lit() pattern bypasses SQL string-literal
    # escape processing, which would otherwise strip the \b/\d backslashes.
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_PII_EMAIL), F.lit(0)))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_PII_IPV4), F.lit(0)))
        .cast("bigint")
        .alias("n_ips"),
        F.md5(scrubbed).alias("scrub_sig"),
    )


# --------------------------------------------------------------------------
# data_quality_report — constraint-validation sweep: referential integrity
# (FK anti-joins), primary-key uniqueness, null rates, and domain/range
# checks, one row per named check. The pre-ingest gate a lake pipeline runs
# before promoting a batch (reference analog: the recorder's validation
# counters and skip-malformed paths in its JSONL ingest). Scale shape: each
# check is a single-pass conditional aggregate over one scan — the two FK
# checks are key-only anti-joins (null-count per key, no row payload moves);
# everything reduces to one 8-row union of scalar aggregates.
# --------------------------------------------------------------------------

_DQ_ORACLE = """
SELECT 'customer_acctbal_nonneg' AS check_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
FROM customer
UNION ALL
SELECT 'customer_pk_unique', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT)
FROM customer
UNION ALL
SELECT 'documents_min_length', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS BIGINT)
FROM documents
UNION ALL
SELECT 'documents_text_nonempty', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM documents
UNION ALL
SELECT 'events_pk_unique', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT)
FROM events
UNION ALL
SELECT 'events_value_nonnull', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM events
UNION ALL
SELECT 'lineitem_discount_range', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN l_discount IS NULL OR l_discount < 0 OR l_discount > 1
                THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem_orderkey_fk', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'lineitem_qty_positive', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN l_quantity IS NULL OR l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'orders_custkey_fk', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM orders o2 LEFT JOIN customer c ON o2.o_custkey = c.c_custkey
"""


@register(
    "data_quality_report",
    oracle=_DQ_ORACLE,
    tags=("pipeline", "quality"),
    survey_ref="P7 extension: constraint validation report (FK/PK/null/range)",
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every check over a table folds into ONE aggregate on ONE scan of
    that table (count + conditional sums + count_distinct are all
    algebraic, so they share the scan and the map-side partials), then a
    stack() unpivots the scalar row into per-check rows. FK checks ride
    the same discipline: the fact scans ONCE through a key-only left
    join (dim side carries just its key), and the range/null checks for
    that fact are computed over the SAME joined relation — a left join
    on a unique key preserves row count, so n_rows is untouched. Net:
    five full scans (one per table) + two key-only dim sides, versus one
    scan per check (12) in the naive form — at 100 TB that is the
    difference between reading lineitem once and reading it three times
    per nightly QA run."""
    cust = t(spark, sf_dir, "customer")
    docs = t(spark, sf_dir, "documents")
    ev = t(spark, sf_dir, "events")
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")

    def viol(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    def stacked(agg_df, *checks):
        # checks: (check_name, violations_col) pairs sharing the n column
        parts = ", ".join(f"'{n}', n, {c}" for n, c in checks)
        return agg_df.selectExpr(
            f"stack({len(checks)}, {parts}) AS (check_name, n_rows, n_violations)"
        )

    cust_rows = stacked(
        cust.agg(
            F.count(F.lit(1)).alias("n"),
            viol(F.col("c_acctbal") < 0).alias("v_bal"),
            (F.count(F.lit(1)) - F.count_distinct("c_custkey"))
            .cast("bigint")
            .alias("v_pk"),
        ),
        ("customer_acctbal_nonneg", "v_bal"),
        ("customer_pk_unique", "v_pk"),
    )
    doc_rows = stacked(
        docs.agg(
            F.count(F.lit(1)).alias("n"),
            viol(F.col("n_chars") < 100).alias("v_len"),
            viol(F.col("text").isNull() | (F.length("text") == 0)).alias("v_txt"),
        ),
        ("documents_min_length", "v_len"),
        ("documents_text_nonempty", "v_txt"),
    )
    ev_rows = stacked(
        ev.agg(
            F.count(F.lit(1)).alias("n"),
            (F.count(F.lit(1)) - F.count_distinct("event_id"))
            .cast("bigint")
            .alias("v_pk"),
            viol(F.col("value").isNull()).alias("v_val"),
        ),
        ("events_pk_unique", "v_pk"),
        ("events_value_nonnull", "v_val"),
    )
    # lineitem scans ONCE: range/qty checks ride the FK join's probe side
    # (left join on the unique o_orderkey preserves row count)
    li_fk = li.select("l_orderkey", "l_discount", "l_quantity").join(
        orders.select("o_orderkey"), li.l_orderkey == orders.o_orderkey, "left"
    )
    li_rows = stacked(
        li_fk.agg(
            F.count(F.lit(1)).alias("n"),
            viol(
                F.col("l_discount").isNull()
                | (F.col("l_discount") < 0)
                | (F.col("l_discount") > 1)
            ).alias("v_disc"),
            viol(F.col("o_orderkey").isNull()).alias("v_fk"),
            viol(F.col("l_quantity").isNull() | (F.col("l_quantity") <= 0)).alias(
                "v_qty"
            ),
        ),
        ("lineitem_discount_range", "v_disc"),
        ("lineitem_orderkey_fk", "v_fk"),
        ("lineitem_qty_positive", "v_qty"),
    )
    ord_fk = orders.select("o_custkey").join(
        cust.select("c_custkey"), orders.o_custkey == cust.c_custkey, "left"
    )
    ord_rows = stacked(
        ord_fk.agg(
            F.count(F.lit(1)).alias("n"),
            viol(F.col("c_custkey").isNull()).alias("v_fk"),
        ),
        ("orders_custkey_fk", "v_fk"),
    )
    out = cust_rows
    for part in (doc_rows, ev_rows, li_rows, ord_rows):
        out = out.unionByName(part)
    return out


# --------------------------------------------------------------------------
# corpus_curation_pipeline — the END-TO-END training-data curation DAG as
# ONE Catalyst plan: quality filter (C4-style rules) → exact-dedup
# keep-first (md5 fingerprint, min-doc_id keeper) → deterministic 80/10/10
# hash split → per-(split, lang) corpus accounting. Each stage is already
# oracle-checked in isolation (doc_quality_filter, doc_exact_dedup,
# doc_train_split); this query proves the COMPOSITION — one scan, the
# quality predicate evaluated map-side before the dedup shuffle, the split
# a pure projection, one final rollup exchange. The summary row set
# (n_docs, sum_doc_id, total_tokens) hash-pins every doc-level decision:
# a single doc kept/dropped/re-split differently changes a row.
# --------------------------------------------------------------------------

_CURATION_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, lang, text,
         regexp_split_to_array(trim(text), '\s+') AS tokens
  FROM documents
),
m AS (
  SELECT doc_id, lang, text, len(tokens) AS n_tokens,
         len(list_filter(tokens, x -> x IN ({{stop_list}}))) * 1.0
           / NULLIF(len(tokens), 0) AS stop_ratio,
         CAST(list_sum(list_transform(tokens, x -> length(x))) AS DOUBLE)
           / NULLIF(len(tokens), 0) AS mtl
  FROM toks
),
kept AS (
  SELECT doc_id, lang, text, n_tokens FROM m
  WHERE n_tokens >= 20 AND mtl >= 3.0 AND mtl <= 12.0 AND stop_ratio >= 0.02
),
keepers AS (
  SELECT MIN(doc_id) AS doc_id
  FROM kept
  GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
),
unique_docs AS (
  SELECT k.doc_id, k.lang, k.n_tokens FROM kept k JOIN keepers USING (doc_id)
),
split AS (
  SELECT doc_id, lang, n_tokens,
         CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
  FROM (SELECT *, {{duck_u01}} AS u FROM unique_docs)
)
SELECT split, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM split
GROUP BY split, lang
"""


def _curation_oracle() -> str:
    from vectra_player_spark.functions.text import STOPWORDS

    return _CURATION_ORACLE.format(
        stop_list=", ".join(f"'{s}'" for s in STOPWORDS),
        duck_u01=_DUCK_U01.format(salt="split"),
    )


@register(
    "corpus_curation_pipeline",
    oracle=_curation_oracle(),
    tags=("pipeline", "text"),
    survey_ref="mandate capstone: quality filter + D1 dedup + split composed in one plan",
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vectra_player_spark.functions.text import (
        fingerprint,
        mean_token_length,
        stopword_ratio,
        tokens,
    )

    docs = t(spark, sf_dir, "documents").withColumn("tokens", tokens("text"))
    n_tokens = F.size("tokens")
    mtl = mean_token_length("tokens")
    ratio = stopword_ratio("tokens")
    kept = docs.where(
        (n_tokens >= 20) & (mtl >= 3.0) & (mtl <= 12.0) & (ratio >= 0.02)
    ).select(
        "doc_id", "lang", n_tokens.cast("bigint").alias("n_tokens"), fingerprint("text").alias("fp")
    )
    keepers = kept.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    unique_docs = kept.join(keepers, ["fp", "doc_id"]).drop("fp")
    u = F.expr(_SPARK_U01.format(salt="split"))
    split = unique_docs.withColumn(
        "split",
        F.when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test"),
    )
    return split.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )

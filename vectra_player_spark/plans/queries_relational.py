"""Relational core over the TPC-H-ish tables.

Covers SURVEY.md §2.2 (projection/filter), §2.4 (joins J1-J3/J6), §2.5
(aggregations A1-A8/A10-A11), §2.7 (sorts/limits O1-O5), §2.8 (set ops
D5/D6). The reference expresses these through DuckDB SQL over its event
lake (src/services/event_store/duckdb.py); here they're the same logical
plans on Spark, declared so Catalyst chooses broadcast joins for the
dimension tables and pushes filters/projections into the parquet scans.

Float-sum discipline: see vectra_player_spark.functions.exact. Money
columns (2-decimal grid) accumulate on the integer fixed-point path
(floor-to-cents BIGINT terms — 2.3× faster than DECIMAL at 6 GB, same
exact values); gridless doubles keep DECIMAL casts. Either way the
formula is spelled identically in the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectra_player_spark.functions.exact import dec, dsum, fixed, r6d
from vectra_player_spark.plans.registry import register
from vectra_player_spark.tables import facts_for_orderkey, t

# --------------------------------------------------------------------------
# q1_pricing_summary — TPC-H Q1 shape: scan + filter + groupBy + 8 aggregates.
# Reference analog: descriptive-stats blocks (SURVEY A6) and per-type rollups.
# --------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) / 100.0                          AS sum_qty,
  SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0                     AS sum_base_price,
  SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
      * CAST(floor((1 - l_discount) * 100 + 0.5) AS BIGINT)) / 10000.0                AS sum_disc_price,
  SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
      * CAST(floor((1 - l_discount) * 100 + 0.5) AS BIGINT)
      * CAST(floor((1 + l_tax) * 100 + 0.5) AS BIGINT)) / 1000000.0                   AS sum_charge,
  ROUND(AVG(l_quantity), 6)                                                     AS avg_qty,
  ROUND(AVG(l_extendedprice), 6)                                                AS avg_price,
  ROUND(AVG(l_discount), 6)                                                     AS avg_disc,
  COUNT(*)                                                                      AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_Q1_ORACLE, tags=("relational", "bench"), survey_ref="A1,A3,A6,P1,F3")
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Money sums run on the integer fixed-point path (functions.exact:
    # round-to-cents BIGINT terms, one rescale after the sum) — exact and
    # order-insensitive like the decimal form, but 6× faster at 6 GB
    # because SUM(BIGINT) stays in the primitive codegen path while
    # SUM(DECIMAL(18,6)) widens past the compact-long representation.
    li = t(spark, sf_dir, "lineitem")
    base_f = fixed("l_extendedprice")
    disc_f = base_f * fixed(F.lit(1.0) - F.col("l_discount"))
    charge_f = disc_f * fixed(F.lit(1.0) + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(fixed("l_quantity")) / F.lit(100.0)).alias("sum_qty"),
            (F.sum(base_f) / F.lit(100.0)).alias("sum_base_price"),
            (F.sum(disc_f) / F.lit(10000.0)).alias("sum_disc_price"),
            (F.sum(charge_f) / F.lit(1000000.0)).alias("sum_charge"),
            r6d(F.avg("l_quantity")).alias("avg_qty"),
            r6d(F.avg("l_extendedprice")).alias("avg_price"),
            r6d(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# q3_top_revenue_orders — 3-way join + group + top-k (J1 filter-by-aggregate,
# O5 top-k). Mirrors the reference's "qualifying games by tick_count" CTE join
# (duckdb.py:208-224) on star-schema keys.
# --------------------------------------------------------------------------

_Q3_ORACLE = """
SELECT
  o.o_orderkey,
  SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
      * CAST(floor((1 - l.l_discount) * 100 + 0.5) AS BIGINT)) / 10000.0 AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


@register("q3_top_revenue_orders", oracle=_Q3_ORACLE, tags=("relational", "bench"), survey_ref="J1,O5,A11")
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-pushdown-through-join form: revenue is keyed by orderkey
    alone, so lineitem pre-aggregates per order BEFORE meeting orders —
    the map-side combine compresses the fact shuffle and the post-join
    re-aggregation disappears (the semi-join only filters, never fans
    out). Measured at the 6 GB lake: 8.5 s → 3.2 s vs the join-first
    plan, rows identical. Self-routes onto the bucketed fact pair when
    present: the per-order pre-aggregate AND the semi-join then read
    pre-clustered orderkey buckets (layout-only; oracle unchanged)."""
    cust = t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    li, orders = facts_for_orderkey(spark, sf_dir)
    rev = fixed("l_extendedprice") * fixed(F.lit(1.0) - F.col("l_discount"))
    rev_per_order = li.groupBy("l_orderkey").agg(F.sum(rev).alias("rev4"))
    # No broadcast hint: customer is SF-scaled (not a dimension) — a
    # forced broadcast OOMs executors at lake scale. AQE still picks a
    # broadcast join while the filtered side is under the threshold.
    qual = orders.join(cust, orders.o_custkey == cust.c_custkey).select("o_orderkey")
    return (
        rev_per_order.join(
            qual, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi"
        )
        .select(
            F.col("l_orderkey").alias("o_orderkey"),
            (F.col("rev4") / F.lit(10000.0)).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# q5_region_revenue — 5-way star join, dims broadcast (SURVEY §2.4 note on
# broadcast hints for dimension tables).
# --------------------------------------------------------------------------

_Q5_ORACLE = """
SELECT
  r.r_name AS region_name,
  SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
      * CAST(floor((1 - l.l_discount) * 100 + 0.5) AS BIGINT)) / 10000.0 AS revenue,
  COUNT(*) AS n_items
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY r.r_name
"""


@register(
    "q5_region_revenue",
    oracle=_Q5_ORACLE,
    tags=("relational", "bench", "routed"),
    survey_ref="J1,A3,A11 (self-routing onto the bucketed fact layout)",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = t(spark, sf_dir, "region")
    nation = t(spark, sf_dir, "nation")
    cust = t(spark, sf_dir, "customer")
    # The dominant shuffle is the lineitem⋈orders orderkey SMJ — the same
    # join q9/q18 shed by self-routing onto the bucketed fact pair
    # (tables.facts_for_orderkey; layout-only routing, oracle unchanged).
    li, orders = facts_for_orderkey(spark, sf_dir)
    rev = fixed("l_extendedprice") * fixed(F.lit(1.0) - F.col("l_discount"))
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "r_name")
    )
    # NOTE: the q3 aggregate-pushdown rewrite was A/B'd here and does NOT
    # help (9.0 s either way at the 6 GB lake): with ~4 lineitems per
    # order scattered across partitions the map-side combine barely
    # compresses, so pre-aggregating just adds a stage — q3 wins because
    # its post-join re-aggregation AND second fact shuffle disappear
    # (semi-join filter), which q5's 1:1 enrichment join cannot shed.
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # dims rides on customer (SF-scaled): broadcast only the true
        # dimensions (nation/region above); this join is AQE's call.
        .join(dims, orders.o_custkey == dims.c_custkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg((F.sum(rev) / F.lit(10000.0)).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


# --------------------------------------------------------------------------
# Semi / anti joins — the reference's player-games semi-join (duckdb.py:296-310,
# J2) and novel-event anti-join (rag_ingester.py:140-145, J6).
# --------------------------------------------------------------------------

_SEMI_ORACLE = """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
"""


@register("join_semi_active_customers", oracle=_SEMI_ORACLE, tags=("relational",), survey_ref="J2")
def join_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


_ANTI_ORACLE = """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


@register("join_anti_dormant_customers", oracle=_ANTI_ORACLE, tags=("relational",), survey_ref="J6,D5")
def join_anti_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --------------------------------------------------------------------------
# agg_having — GROUP BY + HAVING (A4), the reference's min-tick qualifying
# games (duckdb.py:211-218).
# --------------------------------------------------------------------------

_HAVING_ORACLE = """
SELECT o_custkey, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_spend
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 10
"""


@register("agg_having_big_customers", oracle=_HAVING_ORACLE, tags=("relational",), survey_ref="A4")
def agg_having_big_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total_spend"))
        .where(F.col("n_orders") >= 10)
    )


# --------------------------------------------------------------------------
# distinct + limit/offset pagination (A5, O3) — games-listing pagination
# (data_service.py:112-131). Deterministic ORDER BY before OFFSET.
# --------------------------------------------------------------------------

_PAGINATE_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_orderkey
LIMIT 50 OFFSET 100
"""


@register("paginate_orders", oracle=_PAGINATE_ORACLE, tags=("relational",), survey_ref="O3,O4")
def paginate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(100)
        .limit(50)
    )


# --------------------------------------------------------------------------
# Keyset pagination (O3/O4 scale path). OFFSET pagination re-sorts the whole
# relation every page (measured 19× time at 10× rows in SCALE.md — the sort
# IS the query); a keyset cursor turns each page into a pushed-down range
# scan + TakeOrderedAndProject: the filter reaches the parquet footers, so
# page cost depends on page size, not table size or page number. Composite
# (o_orderdate, o_orderkey) cursor shows the general tuple-comparison form.
# --------------------------------------------------------------------------

_KEYSET_CURSOR_DATE = "1998-03-01 00:00:00"

_KEYSET_PAGINATE_ORACLE = f"""
SELECT o_orderkey, o_custkey,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_date,
       o_totalprice
FROM orders
WHERE o_orderdate > TIMESTAMP '{_KEYSET_CURSOR_DATE}'
   OR (o_orderdate = TIMESTAMP '{_KEYSET_CURSOR_DATE}' AND o_orderkey > 0)
ORDER BY o_orderdate, o_orderkey
LIMIT 50
"""


@register(
    "keyset_paginate_orders",
    oracle=_KEYSET_PAGINATE_ORACLE,
    tags=("relational",),
    survey_ref="O3,O4 scale path (keyset/cursor pagination)",
)
def keyset_paginate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cursor = F.to_timestamp(F.lit(_KEYSET_CURSOR_DATE))
    orders = t(spark, sf_dir, "orders")
    return (
        orders.where(
            (F.col("o_orderdate") > cursor)
            | ((F.col("o_orderdate") == cursor) & (F.col("o_orderkey") > 0))
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("o_date"),
            "o_totalprice",
        )
        .orderBy("o_date", "o_orderkey")
        .limit(50)
    )


_DISTINCT_ORACLE = """
SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment
"""


@register("distinct_segments", oracle=_DISTINCT_ORACLE, tags=("relational",), survey_ref="A5,D5")
def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "customer").select("c_mktsegment").distinct().orderBy("c_mktsegment")


# --------------------------------------------------------------------------
# top-k by sort (O2) — "recent events LIMIT n" shape with deterministic
# tie-break.
# --------------------------------------------------------------------------

_TOPK_ORACLE = """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 25
"""


@register("topk_orders_by_price", oracle=_TOPK_ORACLE, tags=("relational",), survey_ref="O2,O5")
def topk_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


# --------------------------------------------------------------------------
# Set algebra (D5): customers who bought in segment-crossing statuses.
# intersect/except mirror registry coverage math (schema_validator/registry.py).
# --------------------------------------------------------------------------

_SETOP_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


@register("setop_intersect_customers", oracle=_SETOP_ORACLE, tags=("relational",), survey_ref="D5")
def setop_intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    open_c = orders.where(F.col("o_orderstatus") == "O").select("o_custkey")
    filled = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_c.intersect(filled)


_EXCEPT_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


@register("setop_except_customers", oracle=_EXCEPT_ORACLE, tags=("relational",), survey_ref="D5")
def setop_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    open_c = orders.where(F.col("o_orderstatus") == "O").select("o_custkey")
    filled = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_c.subtract(filled)


# --------------------------------------------------------------------------
# union_by_name across schema generations (D6) — union_by_name=true reads
# (query_session.py:49). Two projections with disjoint optional columns.
# --------------------------------------------------------------------------

_UNION_ORACLE = """
SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority FROM orders WHERE o_orderstatus = 'O'
UNION ALL BY NAME
SELECT o_orderkey, NULL AS o_totalprice, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
"""


@register("union_by_name_orders", oracle=_UNION_ORACLE, tags=("relational",), survey_ref="D6")
def union_by_name_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderstatus") == "O").select("o_orderkey", "o_totalprice")
    b = orders.where(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderpriority")
    return a.unionByName(b, allowMissingColumns=True)


# --------------------------------------------------------------------------
# Histogram (A7) — np.histogram analog via fixed-width buckets
# (explorer_data.py:272-288). floor(x/width) is portable to any engine.
# --------------------------------------------------------------------------

_HIST_ORACLE = """
SELECT CAST(FLOOR(o_totalprice / 10000.0) AS BIGINT) AS bucket, COUNT(*) AS n
FROM orders
GROUP BY 1
"""


@register("histogram_order_totals", oracle=_HIST_ORACLE, tags=("relational",), survey_ref="A7")
def histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .groupBy(F.floor(F.col("o_totalprice") / 10000.0).cast("bigint").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# Correlation (A8) — pairwise corr of measures (volatility_study.py:186-196).
# --------------------------------------------------------------------------

_CORR_ORACLE = """
SELECT
  ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
  ROUND(CORR(l_discount, l_extendedprice), 6) AS corr_disc_price,
  ROUND(CORR(l_quantity, l_tax), 6) AS corr_qty_tax
FROM lineitem
"""


@register("corr_lineitem_measures", oracle=_CORR_ORACLE, tags=("relational",), survey_ref="A8")
def corr_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.corr("l_discount", "l_extendedprice"), 6).alias("corr_disc_price"),
        F.round(F.corr("l_quantity", "l_tax"), 6).alias("corr_qty_tax"),
    )


# --------------------------------------------------------------------------
# COUNT(DISTINCT) (A2) + grouped min/max (A3) — session/lake stat blocks
# (query_session.py:161-179, session_tracker.py).
# --------------------------------------------------------------------------

_STATS_ORACLE = """
SELECT
  o_orderstatus,
  COUNT(*) AS n_orders,
  COUNT(DISTINCT o_custkey) AS n_customers,
  ROUND(MIN(o_totalprice), 6) AS min_price,
  ROUND(MAX(o_totalprice), 6) AS max_price,
  STRFTIME(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S') AS first_order,
  STRFTIME(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S') AS last_order
FROM orders
GROUP BY o_orderstatus
"""


@register("order_status_stats", oracle=_STATS_ORACLE, tags=("relational",), survey_ref="A2,A3")
def order_status_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.round(F.min("o_totalprice"), 6).alias("min_price"),
        F.round(F.max("o_totalprice"), 6).alias("max_price"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("first_order"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("last_order"),
    )


# --------------------------------------------------------------------------
# LATERAL top-n per group (Spark 4 / DuckDB both speak SQL-standard LATERAL).
# The naive reading is "re-run the subquery per outer row"; Catalyst
# DECORRELATES it into one Window rank over the joined relation (pinned in
# test_plans: no CartesianProduct/BNLJ) — i.e. the same physical plan as
# the hand-written row_number() top-n, which is the 100 TB shape: a single
# shuffle on the group key, no per-group re-scan.
# --------------------------------------------------------------------------

_LATERAL_ORACLE = """
SELECT r.r_name, top.c_name, top.c_acctbal
FROM region r,
LATERAL (
  SELECT c.c_name, c.c_acctbal
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE n.n_regionkey = r.r_regionkey
  ORDER BY c.c_acctbal DESC, c.c_custkey
  LIMIT 3
) top
"""


@register(
    "lateral_topn_per_region",
    oracle=_LATERAL_ORACLE,
    tags=("relational",),
    survey_ref="J1/O3 (correlated LATERAL → decorrelated window top-n)",
)
def lateral_topn_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    for name in ("region", "nation", "customer"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"lat_{name}")
    return spark.sql("""
        SELECT r.r_name, top.c_name, top.c_acctbal
        FROM lat_region r,
        LATERAL (
          SELECT c.c_name, c.c_acctbal
          FROM lat_customer c JOIN lat_nation n ON c.c_nationkey = n.n_nationkey
          WHERE n.n_regionkey = r.r_regionkey
          ORDER BY c.c_acctbal DESC, c.c_custkey
          LIMIT 3
        ) top
    """)


# --------------------------------------------------------------------------
# q14_promo_revenue — TPC-H Q14 shape: conditional CASE aggregation forming
# a ratio (promo revenue share by ship month). Exercises a path no other
# in-cap query has: two decimal-exact conditional sums over the same scan
# reduced in ONE aggregate (no self-join), with the fact→part join left to
# AQE (part is SF-scaled, not a true dim). Ratio division happens once,
# in double, after the exact sums.
# --------------------------------------------------------------------------

_Q14_ORACLE = """
SELECT STRFTIME(DATE_TRUNC('month', l_shipdate), '%Y-%m') AS ship_month,
       ROUND(100.0 * (SUM(CASE WHEN p_type = 'PROMO'
                  THEN CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                       * CAST(floor((1 - l_discount) * 100 + 0.5) AS BIGINT)
                  ELSE 0 END) / 10000.0)
             / (SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                    * CAST(floor((1 - l_discount) * 100 + 0.5) AS BIGINT)) / 10000.0),
             6) AS promo_share_pct,
       SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
           * CAST(floor((1 - l_discount) * 100 + 0.5) AS BIGINT)) / 10000.0 AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1
"""


@register(
    "q14_promo_revenue",
    oracle=_Q14_ORACLE,
    tags=("relational",),
    survey_ref="A5 conditional aggregation ratio (TPC-H Q14 shape)",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    part = t(spark, sf_dir, "part")
    disc = fixed("l_extendedprice") * fixed(F.lit(1.0) - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0).cast("bigint"))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias("ship_month"))
        .agg(
            F.round(
                F.lit(100.0)
                * (F.sum(promo) / F.lit(10000.0))
                / (F.sum(disc) / F.lit(10000.0)),
                6,
            ).alias("promo_share_pct"),
            (F.sum(disc) / F.lit(10000.0)).alias("total_revenue"),
        )
    )


# --------------------------------------------------------------------------
# q19_disjunctive_revenue — TPC-H Q19 shape: an OR of three AND-clauses
# mixing both join sides' columns. The optimizer path this pins: the
# part-side conjuncts (brand/size) and lineitem-side conjuncts (quantity)
# are NOT individually pushable below the join — but the derived common
# disjuncts (p_size ranges union, l_quantity range union) are, and the
# remainder evaluates as a post-join filter. Grouped by brand so the hash
# check sees one row per disjunct arm.
# --------------------------------------------------------------------------

_Q19_ORACLE = """
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
           * CAST(floor((1 - l_discount) * 100 + 0.5) AS BIGINT)) / 10000.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1  AND 15 AND l_quantity BETWEEN 1  AND 20)
   OR (p_brand = 'Brand#2'  AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
GROUP BY p_brand
"""


@register(
    "q19_disjunctive_revenue",
    oracle=_Q19_ORACLE,
    tags=("relational",),
    survey_ref="P4 disjunctive predicate pushdown (TPC-H Q19 shape)",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    arm = lambda brand, s_lo, s_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(s_lo, s_hi)
        & F.col("l_quantity").between(q_lo, q_hi)
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .where(arm("Brand#1", 1, 15, 1, 20) | arm("Brand#2", 10, 30, 10, 30) | arm("Brand#13", 20, 50, 20, 50))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (
                F.sum(fixed("l_extendedprice") * fixed(F.lit(1.0) - F.col("l_discount")))
                / F.lit(10000.0)
            ).alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# q7_volume_shipping — TPC-H Q7 shape: the same dimension table joined
# TWICE under different roles (supplier nation vs customer nation), a
# cross-pair predicate over the two aliases, and a year extraction in the
# group key. No other query self-aliases a broadcast dim — regressions in
# alias resolution or double-broadcast planning surface here.
# --------------------------------------------------------------------------

_Q7_ORACLE = """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
           * CAST(floor((1 - l_discount) * 100 + 0.5) AS BIGINT)) / 10000.0 AS revenue
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE ((n1.n_name = 'FRANCE' AND n2.n_name = 'GERMANY')
    OR (n1.n_name = 'GERMANY' AND n2.n_name = 'FRANCE'))
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2, 3
"""


@register(
    "q7_volume_shipping",
    oracle=_Q7_ORACLE,
    tags=("relational",),
    survey_ref="J1 self-aliased dim joins + cross-pair predicate (TPC-H Q7 shape)",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT routed onto the bucketed pair — A/B'd at 10× (0.08 s plain vs
    # 0.16 s routed): the shipdate filter is selective enough that AQE
    # broadcasts the small side and the plain scan's size-based splits
    # beat the 32-bucket read; co-location only pays when both join
    # sides stay fact-sized (q3/q4/q5/q8/q12/q21). orderkey join still
    # goes FIRST so the plan keeps one fact shuffle at most.
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = t(spark, sf_dir, "orders")
    sup = t(spark, sf_dir, "supplier")
    cust = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "FRANCE") & (F.col("cust_nation") == "GERMANY")
    ) | ((F.col("supp_nation") == "GERMANY") & (F.col("cust_nation") == "FRANCE"))
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(sup, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            (
                F.sum(fixed("l_extendedprice") * fixed(F.lit(1.0) - F.col("l_discount")))
                / F.lit(10000.0)
            ).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# q13_customer_distribution — TPC-H Q13 shape: LEFT OUTER join + count of a
# NULLABLE column (zero-order groups must survive), then a second-level
# GROUP BY over the counts. The only query whose aggregate input includes
# rows synthesized by outer-join null-extension — COUNT(o_orderkey) vs
# COUNT(*) semantics is exactly what it pins. Two exchanges total: custkey
# (reusing the join's partitioning) and the tiny count-distribution key.
# --------------------------------------------------------------------------

_Q13_ORACLE = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
"""


@register(
    "q13_customer_distribution",
    oracle=_Q13_ORACLE,
    tags=("relational",),
    survey_ref="J-family left-outer + A9 count-of-counts (TPC-H Q13 shape)",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist")
    )

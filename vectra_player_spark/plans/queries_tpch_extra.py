"""TPC-H breadth batch 2: Q6/Q10/Q12/Q16/Q18/Q22 shapes on the test lake.

The reference accepts arbitrary DuckDB SQL over its lake
(src/services/event_store/duckdb.py raw ``query(sql)``), so the engine
must run the full ad-hoc relational repertoire, not just the shapes its
services happen to use. This module adds the six classic TPC-H plans the
surface didn't yet exercise, adapted to the test lake's reduced schemas
(no partsupp / l_commitdate / c_phone — each docstring states the stand-in
predicate):

- q6:  zero-join triple-range scan (the pushdown benchmark staple)
- q10: 4-way join + top-20 (TakeOrderedAndProject over grouped revenue)
- q12: cross-table join predicate + conditional counts
- q16: anti-join (NOT IN, non-null rhs) + COUNT(DISTINCT) rollup
- q18: IN over a HAVING-filtered aggregate (filter-by-aggregate semi)
- q22: exact scalar-average threshold + anti-join + segment rollup

Scale notes: q6 is scan-bound with every predicate pushed; q10/q18 shuffle
on the join keys with AQE free to broadcast the filtered sides; q16's anti
side is a <=|suppliers| broadcast; q22's threshold is ONE scalar broadcast
and the anti side prunes to a 7-month order slice. Money math follows the
functions.exact fixed-point discipline so every aggregate is
order-insensitive and engine-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectra_player_spark.functions.exact import fixed, r6d
from vectra_player_spark.plans.registry import register
from vectra_player_spark.tables import facts_for_orderkey, t

# --------------------------------------------------------------------------
# q6 — forecast-revenue-change: single scan, three pushed range predicates,
# one-row exact aggregate. The point of this query is its PLAN: all three
# filters land in PushedFilters on the parquet scan (pinned in test_plans).
# --------------------------------------------------------------------------

_Q6_ORACLE = """
SELECT
  SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
      * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) / 10000.0 AS revenue,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register(
    "q6_revenue_forecast",
    oracle=_Q6_ORACLE,
    tags=("relational", "tpch"),
    survey_ref="P1,P5,A1,F3 (triple range pushdown + exact one-row agg)",
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both engines compare the same stored doubles against the same
    literals, so BETWEEN on the 2-decimal discount grid cannot flip; the
    revenue product accumulates on the BIGINT fixed-point path."""
    li = t(spark, sf_dir, "lineitem")
    rev = fixed("l_extendedprice") * fixed("l_discount")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(rev) / F.lit(10000.0)).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# q10 — returned-item revenue: who returned the most value in a quarter.
# 4-way join (nation broadcast), grouped fixed-point revenue, top-20 via
# ORDER BY .. LIMIT (TakeOrderedAndProject — never a global Window).
# --------------------------------------------------------------------------

_Q10_ORACLE = """
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
       SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
           * CAST(floor((1 - l.l_discount) * 100 + 0.5) AS BIGINT)) / 10000.0 AS revenue,
       ROUND(MIN(c.c_acctbal), 6) + 0.0 AS acctbal
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@register(
    "q10_returned_item_revenue",
    oracle=_Q10_ORACLE,
    tags=("relational", "tpch"),
    survey_ref="J1,A11,O5 (multi-join rollup + deterministic top-k)",
)
def q10_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    # NOT routed onto the bucketed pair — A/B'd at 10× (0.40 s plain vs
    # 0.57 s routed): the 3-month orders window collapses to broadcast
    # size, so AQE's BHJ (zero fact shuffle, zero sort) beats the
    # bucketed SMJ; co-location pays only for fact-sized join sides.
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    li = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = t(spark, sf_dir, "nation")
    rev = fixed("l_extendedprice") * fixed(F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            (F.sum(rev) / F.lit(10000.0)).alias("revenue"),
            (F.round(F.min("c_acctbal"), 6) + 0.0).alias("acctbal"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# q12 — priority shipping: conditional counts with a CROSS-TABLE join
# predicate (l_shipdate >= o_orderdate stands in for the reduced schema's
# missing commit/receipt dates). The residual non-equi condition rides the
# equi hash join; counts are exact integers.
# --------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT l.l_linestatus AS linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= o.o_orderdate
  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_linestatus
"""


@register(
    "q12_priority_shipping",
    oracle=_Q12_ORACLE,
    tags=("relational", "tpch"),
    survey_ref="J1,P9,A9 (cross-table residual predicate + conditional counts)",
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    # self-routes: equi-key is the order key, the residual date predicate
    # rides the co-located SMJ (layout-only; oracle unchanged)
    li_raw, orders = facts_for_orderkey(spark, sf_dir)
    li = li_raw.where(
        F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate >= orders.o_orderdate),
        )
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# q16 — supplier counts per part attribute, excluding flagged suppliers.
# lineitem is the part↔supplier bridge (the lake has no partsupp); the
# "complaints" exclusion becomes NOT IN (negative account balance) — a
# non-null rhs, so it is exactly a left-anti join on both engines.
# --------------------------------------------------------------------------

_Q16_ORACLE = """
SELECT p.p_brand, p.p_type, CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_size IN (1, 2, 3, 4, 5)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type
"""


@register(
    "q16_parts_supplier_counts",
    oracle=_Q16_ORACLE,
    tags=("relational", "tpch"),
    survey_ref="J6,A2 (anti-join exclusion + grouped COUNT DISTINCT)",
)
def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").where(F.col("p_size").isin(1, 2, 3, 4, 5))
    bad = t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# q18 — large-volume orders: IN over a HAVING-filtered aggregate (the
# filter-by-aggregate semi-join), then re-aggregate with customer context.
# The qualifying set is computed once on the fixed-point quantity sum.
# --------------------------------------------------------------------------

_Q18_QTY_CENTS = 25_000  # SUM(l_quantity) > 250, in cents

_Q18_ORACLE = f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       ROUND(o.o_totalprice, 6) + 0.0 AS totalprice,
       SUM(CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT)) / 100.0 AS total_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) > {_Q18_QTY_CENTS}
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
"""


@register(
    "q18_large_volume_orders",
    oracle=_Q18_ORACLE,
    tags=("relational", "tpch", "routed"),
    survey_ref="J3,A4,A11 (HAVING semi-join + contextual re-aggregation; "
    "self-routing onto the bucketed fact layout when it exists)",
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every relation in q18's spine keys on the order key (the HAVING
    pre-aggregate, the semi-join, the orders join), so the bucketed fact
    layout removes three shuffles at once when present — same
    layout-only self-routing as q9_product_profit (r4 measured 12.0 →
    7.8 s at the 100× lake on this layout)."""
    from vectra_player_spark.operators.skew import bucketed_facts_if_available

    pair = bucketed_facts_if_available(spark, sf_dir)
    cust = t(spark, sf_dir, "customer")
    if pair is None:
        li = t(spark, sf_dir, "lineitem")
        orders = t(spark, sf_dir, "orders")
    else:
        li, orders = pair
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(fixed("l_quantity")).alias("qty_cents"))
        .where(F.col("qty_cents") > _Q18_QTY_CENTS)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        li.join(big, li.l_orderkey == big.big_orderkey, "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            (F.round(F.col("o_totalprice"), 6) + 0.0).alias("totalprice"),
        )
        .agg((F.sum(fixed("l_quantity")) / F.lit(100.0)).alias("total_qty"))
    )


# --------------------------------------------------------------------------
# q22 — sales opportunity: above-average-balance customers with no recent
# orders, rolled up by segment. The average threshold is compared in EXACT
# decimal with no division (bal * n > total — the queries_subqueries float
# discipline), so a one-ulp AVG difference can never flip a boundary row;
# the "no recent orders" arm is a NOT EXISTS ≡ left-anti join against a
# date-pruned order slice.
# --------------------------------------------------------------------------

_Q22_SINCE = "2001-01-01 00:00:00"

_Q22_ORACLE = f"""
WITH pos AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS total,
         COUNT(*) AS n
  FROM customer WHERE c_acctbal > 0.0
),
eligible AS (
  SELECT c.c_mktsegment, c.c_acctbal
  FROM customer c CROSS JOIN pos
  WHERE CAST(c.c_acctbal AS DECIMAL(18,6)) * pos.n > pos.total
    AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '{_Q22_SINCE}'
    )
)
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
       SUM(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) / 100.0 AS totacctbal
FROM eligible
GROUP BY c_mktsegment
"""


@register(
    "q22_sales_opportunity",
    oracle=_Q22_ORACLE,
    tags=("relational", "tpch"),
    survey_ref="J6,A3 (exact scalar-avg threshold + anti-join + rollup)",
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    recent = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit(_Q22_SINCE).cast("timestamp_ntz"))
        .select("o_custkey")
    )
    pos = cust.where(F.col("c_acctbal") > 0.0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(18,6)"))
        .cast("decimal(38,6)")
        .alias("total"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        cust.crossJoin(F.broadcast(pos))
        .where(F.col("c_acctbal").cast("decimal(18,6)") * F.col("n") > F.col("total"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            (F.sum(fixed("c_acctbal")) / F.lit(100.0)).alias("totacctbal"),
        )
    )


# ==========================================================================
# Round-3 completion of the TPC-H-shape family (q2,q4,q8,q9,q11,q15,q17,
# q20,q21) — the lake's reduced schema (no partsupp/commitdate/receiptdate/
# container) keeps each query's CHARACTERISTIC plan shape and swaps only
# the missing columns for present ones (noted per query). Money and
# quantity math stays on the functions.exact fixed-point BIGINT grid so
# every aggregate and threshold comparison is order-insensitive and
# engine-identical; the two ratio outputs (q8 share, q17 yearly average)
# go through the fround formula on BOTH engines.
# ==========================================================================

# --------------------------------------------------------------------------
# q2 — min-cost supplier: correlated scalar-MIN subquery shape. partsupp's
# ps_supplycost is absent; the supplier's standing offer for a part is its
# cheapest observed lineitem price (exact cents), making the correlated
# predicate an integer equality — no float boundary can flip membership.
# --------------------------------------------------------------------------

_Q2_ORACLE = """
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS offer_cents
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT p.p_partkey, p.p_name, s.s_name, n.n_name AS nation,
       o.offer_cents / 100.0 AS offer
FROM offers o
JOIN part p ON p.p_partkey = o.l_partkey
JOIN supplier s ON s.s_suppkey = o.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_size IN (10, 20, 30)
  AND o.offer_cents = (
    SELECT MIN(o2.offer_cents) FROM offers o2 WHERE o2.l_partkey = o.l_partkey
  )
"""


@register(
    "q2_min_cost_supplier",
    oracle=_Q2_ORACLE,
    tags=("relational", "tpch"),
    survey_ref="J1,A3 (correlated scalar-MIN subquery as per-key min join)",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated subquery decorrelates to a per-part MIN aggregate
    joined back on (partkey, offer) — one extra shuffle over the offers
    relation instead of a per-row subquery, the shape that survives when
    offers is lake-sized."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").where(F.col("p_size").isin(10, 20, 30))
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    # Prune lineitem to qualifying parts BEFORE the (part, supp) aggregate:
    # per-part minima never compare across parts, so the broadcast semi-join
    # is answer-preserving and cuts the offers shuffle to the filtered part
    # fraction (solo at the 6 GB lake: 20.9 s unpruned -> 7.5 s; the oracle
    # keeps the unpruned form as the naive statement of the same relation).
    offers = (
        li.join(
            F.broadcast(part.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(fixed("l_extendedprice")).alias("offer_cents"))
    )
    # TWO consumers (the per-part best aggregate + the join-back) re-run
    # the lineitem scan + semi-join + aggregate without a pin — offers is
    # |qualifying (part,supp)| rows, far smaller than one lineitem scan.
    from vectra_player_spark.session import pin

    offers = pin(offers)
    best = offers.groupBy("l_partkey").agg(
        F.min("offer_cents").alias("best_cents")
    ).withColumnRenamed("l_partkey", "best_partkey")
    return (
        offers.join(
            best,
            (offers.l_partkey == best.best_partkey)
            & (offers.offer_cents == best.best_cents),
            "left_semi",
        )
        .join(part, offers.l_partkey == part.p_partkey)
        .join(supp, offers.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.col("n_name").alias("nation"),
            (F.col("offer_cents") / F.lit(100.0)).alias("offer"),
        )
    )


# --------------------------------------------------------------------------
# q4 — order priority checking: correlated EXISTS over lineitem. The
# commit/receipt-date lateness test becomes "shipped more than 30 days
# after ordering"; the EXISTS rides the equi hash join as a left-semi with
# a residual cross-table date predicate.
# --------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o.o_orderpriority
"""


@register(
    "q4_order_priority",
    oracle=_Q4_ORACLE,
    tags=("relational", "tpch"),
    survey_ref="J2 (correlated EXISTS semi-join with residual date predicate)",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # self-routes: the EXISTS semi-join keys on the order key, so the
    # bucketed pair makes it exchange-free (layout-only; oracle unchanged)
    li, orders_raw = facts_for_orderkey(spark, sf_dir)
    orders = orders_raw.where(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp_ntz"))
    )
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.expr("o_orderdate + INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
    )


# --------------------------------------------------------------------------
# q8 — national market share: one nation's slice of AMERICA-region revenue
# for a part type, by order year. Both numerator and denominator are exact
# BIGINT revenue sums; the single ratio goes through fround on both
# engines (the SCALE.md rounding-boundary discipline).
# --------------------------------------------------------------------------

_Q8_ORACLE = """
WITH sales AS (
  SELECT strftime(o.o_orderdate, '%Y') AS o_year,
         CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
           * CAST(floor((1 - l.l_discount) * 100 + 0.5) AS BIGINT) AS rev4,
         ns.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation nc ON nc.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = nc.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation ns ON ns.n_nationkey = s.s_nationkey
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
)
SELECT o_year,
       FLOOR((CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev4 ELSE 0 END)
                   AS DOUBLE) / CAST(SUM(rev4) AS DOUBLE)) * 1e6 + 0.5) / 1e6
         AS mkt_share
FROM sales GROUP BY o_year
"""


@register(
    "q8_market_share",
    oracle=_Q8_ORACLE,
    tags=("relational", "tpch"),
    survey_ref="J1,A9,F3 (8-way join + conditional-share rollup, fround ratio)",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vectra_player_spark.functions.exact import fround

    # self-routes: the first (and biggest) join keys on the order key —
    # it comes first in the chain so the bucketed distribution feeds it
    li, orders = facts_for_orderkey(spark, sf_dir)
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    supp = t(spark, sf_dir, "supplier")
    part = t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    nc = nation.alias("nc")
    ns = nation.alias("ns")
    rev4 = fixed("l_extendedprice") * fixed(F.lit(1.0) - F.col("l_discount"))
    sales = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nc), cust.c_nationkey == F.col("nc.n_nationkey"))
        .join(F.broadcast(region), F.col("nc.n_regionkey") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(ns), supp.s_nationkey == F.col("ns.n_nationkey"))
        .join(part, li.l_partkey == part.p_partkey)
        .select(
            F.date_format("o_orderdate", "yyyy").alias("o_year"),
            rev4.alias("rev4"),
            F.col("ns.n_name").alias("supp_nation"),
        )
    )
    target = F.when(F.col("supp_nation") == "NATION_3", F.col("rev4")).otherwise(
        F.lit(0)
    )
    return sales.groupBy("o_year").agg(
        fround(
            F.sum(target).cast("double") / F.sum("rev4").cast("double"), 6
        ).alias("mkt_share")
    )


# --------------------------------------------------------------------------
# q9 — product-type profit by supplier nation and year. ps_supplycost is
# absent: cost = p_retailprice per unit. profit = extprice·(1-disc) −
# retail·qty, every term an exact scale-4 BIGINT, so negative profits and
# summation order are exact on both engines.
# --------------------------------------------------------------------------

_Q9_ORACLE = """
SELECT ns.n_name AS nation, strftime(o.o_orderdate, '%Y') AS o_year,
       SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
             * CAST(floor((1 - l.l_discount) * 100 + 0.5) AS BIGINT)
           - CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT)
             * CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT)) / 10000.0
         AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY ns.n_name, strftime(o.o_orderdate, '%Y')
"""


@register(
    "q9_product_profit",
    oracle=_Q9_ORACLE,
    tags=("relational", "tpch", "routed"),
    survey_ref="J1,A11,F3 (profit rollup, signed exact fixed-point; "
    "self-routing onto the bucketed fact layout when it exists)",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DEFAULT q9 entry self-routes (round-5): when the bucketed fact
    pair exists for this lake (operators/skew.bucketed_facts_if_available
    — memo, catalog, or an earlier session's on-disk layout), the
    fact-fact orderkey join reads co-located buckets (1 Exchange in the
    plan); otherwise plain scans (3 Exchanges). Both arms are the SAME
    relational plan over different layouts, so one oracle covers both —
    unlike value-divergent routing (trailing_hour_uniques), this row stays
    hash-checked regardless of arm. Discovery never BUILDS the layout
    (that is q9_product_profit_bucketed / an ingest-time decision)."""
    from vectra_player_spark.operators.skew import bucketed_facts_if_available

    pair = bucketed_facts_if_available(spark, sf_dir)
    if pair is None:
        li, orders = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "orders")
    else:
        li, orders = pair
    return _q9_plan(spark, sf_dir, li, orders)


def _q9_plan(
    spark: SparkSession, sf_dir: str, li: DataFrame, orders: DataFrame
) -> DataFrame:
    part = t(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    profit4 = fixed("l_extendedprice") * fixed(
        F.lit(1.0) - F.col("l_discount")
    ) - fixed("p_retailprice") * fixed("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_format("o_orderdate", "yyyy").alias("o_year"),
        )
        .agg((F.sum(profit4) / F.lit(10000.0)).alias("profit"))
    )


@register(
    "q9_product_profit_bucketed",
    oracle=_Q9_ORACLE,
    tags=("relational", "tpch", "bucketed"),
    survey_ref="J1,A11 over a bucketed fact lake (Exchange-free orderkey join)",
)
def q9_product_profit_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q9 over the bucketed fact pair: lineitem and orders both bucketed
    on the order key (operators/skew.materialize_bucketed_facts), so the
    fact-fact sort-merge join — the round-3 audit's one accepted
    super-linear join cost — reads co-located buckets with NO Exchange on
    either side. Same oracle as q9_product_profit: the layout changes the
    physical plan only, and the driver's hash comparison proves it."""
    from vectra_player_spark.operators.skew import materialize_bucketed_facts

    li_b, orders_b = materialize_bucketed_facts(spark, sf_dir)
    return _q9_plan(spark, sf_dir, li_b, orders_b)


# --------------------------------------------------------------------------
# q11 — important parts: a nation's per-part value vs a fraction of its
# total (scalar-subquery threshold). Integer cross-multiplication
# (val·10000 > total) replaces the float fraction so the cut is exact;
# the total is a 1-row broadcast like q22's average.
# --------------------------------------------------------------------------

_Q11_ORACLE = """
WITH vals AS (
  SELECT l.l_partkey,
         SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS val_cents
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_7'
  GROUP BY l.l_partkey
),
tot AS (SELECT SUM(val_cents) AS total FROM vals)
SELECT v.l_partkey AS partkey, v.val_cents / 100.0 AS value
FROM vals v CROSS JOIN tot
WHERE v.val_cents * 10000 > tot.total
"""


@register(
    "q11_important_parts",
    oracle=_Q11_ORACLE,
    tags=("relational", "tpch"),
    survey_ref="A11,J1 (scalar-total threshold via 1-row broadcast)",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    vals = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(fixed("l_extendedprice")).alias("val_cents"))
    )
    tot = vals.agg(F.sum("val_cents").alias("total"))
    return (
        vals.crossJoin(F.broadcast(tot))
        .where(F.col("val_cents") * 10000 > F.col("total"))
        .select(
            F.col("l_partkey").alias("partkey"),
            (F.col("val_cents") / F.lit(100.0)).alias("value"),
        )
    )


# --------------------------------------------------------------------------
# q15 — top supplier(s): quarterly revenue per supplier, keep those equal
# to the MAX (the view+scalar-MAX shape). Revenue is an exact scale-4
# BIGINT, so `rev = max(rev)` is integer equality — the classic q15 tie
# ambiguity is exact here, and ALL tied suppliers surface.
# --------------------------------------------------------------------------

_Q15_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             * CAST(floor((1 - l_discount) * 100 + 0.5) AS BIGINT)) AS rev4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.rev4 / 10000.0 AS total_revenue
FROM supplier s JOIN rev r ON r.l_suppkey = s.s_suppkey
WHERE r.rev4 = (SELECT MAX(rev4) FROM rev)
"""


@register(
    "q15_top_supplier",
    oracle=_Q15_ORACLE,
    tags=("relational", "tpch"),
    survey_ref="A3,O5 (scalar-MAX filter over a derived revenue view)",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    supp = t(spark, sf_dir, "supplier")
    rev4 = fixed("l_extendedprice") * fixed(F.lit(1.0) - F.col("l_discount"))
    rev = li.groupBy("l_suppkey").agg(F.sum(rev4).alias("rev4"))
    mx = rev.agg(F.max("rev4").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("rev4") == F.col("mx"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev4") / F.lit(10000.0)).alias("total_revenue"),
        )
    )


# --------------------------------------------------------------------------
# q17 — small-quantity revenue: lineitems under 20% of their part's average
# quantity, for one brand. The correlated AVG decorrelates to a per-part
# (sum, count) aggregate; qty < 0.2·avg becomes the integer cross-product
# qty_cents·5·n < sum_cents — no division anywhere in the predicate.
# --------------------------------------------------------------------------

_Q17_ORACLE = """
WITH pq AS (
  SELECT l_partkey,
         SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS sum_cents,
         COUNT(*) AS n
  FROM lineitem GROUP BY l_partkey
)
SELECT FLOOR((CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                   AS DOUBLE) / 100.0 / 7.0) * 1e6 + 0.5) / 1e6 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN pq ON pq.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT) * 5 * pq.n < pq.sum_cents
"""


@register(
    "q17_small_quantity_revenue",
    oracle=_Q17_ORACLE,
    tags=("relational", "tpch"),
    survey_ref="J1,A3,F3 (decorrelated AVG threshold, integer cross-multiply)",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vectra_player_spark.functions.exact import fround

    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    pq = li.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        F.sum(fixed("l_quantity")).alias("sum_cents"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(pq, li.l_partkey == pq.pq_partkey)
        .where(fixed("l_quantity") * 5 * F.col("n") < F.col("sum_cents"))
        .agg(
            fround(
                F.sum(fixed("l_extendedprice")).cast("double")
                / F.lit(100.0)
                / F.lit(7.0),
                6,
            ).alias("avg_yearly")
        )
    )


# --------------------------------------------------------------------------
# q20 — part promotion candidates: suppliers of one nation who shipped a
# meaningful volume of matching parts in a year (nested IN → two chained
# semi-joins; the volume threshold is an exact cents comparison).
# --------------------------------------------------------------------------

_Q20_ORACLE = """
SELECT s.s_name, n.n_name AS nation
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_5'
  AND s.s_suppkey IN (
    SELECT sh.l_suppkey FROM (
      SELECT l_suppkey, l_partkey,
             SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS qty_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey, l_partkey
    ) sh
    WHERE sh.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      AND sh.qty_cents > 2000
  )
"""


@register(
    "q20_part_promotion",
    oracle=_Q20_ORACLE,
    tags=("relational", "tpch"),
    survey_ref="J2,J3,A4 (nested IN as chained semi-joins + HAVING threshold)",
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_5")
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    parts = (
        t(spark, sf_dir, "part")
        .where(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    shipped = (
        li.join(parts, li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(fixed("l_quantity")).alias("qty_cents"))
        .where(F.col("qty_cents") > 2000)
        .select("l_suppkey")
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(shipped, supp.s_suppkey == shipped.l_suppkey, "left_semi")
        .select("s_name", F.col("n_name").alias("nation"))
    )


# --------------------------------------------------------------------------
# q21 — waiting suppliers: the sole late supplier on a multi-supplier
# finalized order. The classic EXISTS / NOT EXISTS pair decorrelates to
# one per-(order, supplier) aggregate — total suppliers and late suppliers
# per order — the aggregation form both engines run IDENTICALLY (the
# correlated form is a per-row re-scan the lake cannot afford; the
# EXISTS-shaped operators are witnessed by exists_late_shipments /
# not_exists_lapsed_customers).
# --------------------------------------------------------------------------

_Q21_ORACLE = """
WITH per_os AS (
  SELECT l.l_orderkey, l.l_suppkey,
         MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS is_late,
         COUNT(*) AS n_items
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY l.l_orderkey, l.l_suppkey
),
per_order AS (
  SELECT l_orderkey, COUNT(*) AS n_supps, SUM(is_late) AS n_late
  FROM per_os GROUP BY l_orderkey
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per_os p
JOIN per_order po ON po.l_orderkey = p.l_orderkey
JOIN supplier s ON s.s_suppkey = p.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.is_late = 1 AND po.n_supps >= 2 AND po.n_late = 1
  AND n.n_name = 'NATION_2'
GROUP BY s.s_name
"""


@register(
    "q21_waiting_suppliers",
    oracle=_Q21_ORACLE,
    tags=("relational", "tpch"),
    survey_ref="J2,J6,A9 (EXISTS/NOT-EXISTS pair as per-order culprit agg)",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The whole spine keys on the order key (the li⋈orders join, the
    # per-(order,supp) aggregate, the per-order aggregate, the culprit
    # self-join) — the bucketed pair removes every one of those
    # exchanges at once (layout-only; oracle unchanged).
    li, orders_raw = facts_for_orderkey(spark, sf_dir)
    orders = orders_raw.where(F.col("o_orderstatus") == "F")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_2")
    late = F.when(
        F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS"), 1
    ).otherwise(0)
    per_os = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("is_late"), F.count(F.lit(1)).alias("n_items"))
    )
    per_order = per_os.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.count(F.lit(1)).alias("n_supps"), F.sum("is_late").alias("n_late")
    )
    return (
        per_os.join(per_order, per_os.l_orderkey == F.col("po_orderkey"))
        .where(
            (F.col("is_late") == 1) & (F.col("n_supps") >= 2) & (F.col("n_late") == 1)
        )
        .join(supp, per_os.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
    )

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
from vectra_player_spark.tables import t

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
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").where(
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
    tags=("relational", "tpch"),
    survey_ref="J3,A4,A11 (HAVING semi-join + contextual re-aggregation)",
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
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

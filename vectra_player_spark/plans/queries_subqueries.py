"""Correlated-subquery surface (SURVEY §2.4 J-family extensions).

The reference's SQL layer accepts arbitrary DuckDB SQL, including
EXISTS / NOT EXISTS predicates and correlated scalar subqueries
(src/services/event_store/duckdb.py exposes raw `query(sql)`); the engine
must therefore run the same shapes. PySpark's DataFrame API has no
subquery-expression surface, so these plans are declared in Spark SQL over
temp views — the Spark-first answer, because Catalyst *decorrelates* them
(RewritePredicateSubquery → left-semi/anti joins with mixed equi + range
conditions; RewriteCorrelatedScalarSubquery → aggregate-then-join), which
is exactly the distributed plan you'd hand-write. test_plans pins the
decorrelated shapes (no CartesianProduct / BNLJ).

Float discipline: every threshold comparison is spelled in exact DECIMAL
arithmetic (`x * n > sum`, never `x > sum/n`) so the Spark and DuckDB
sides cannot disagree on a boundary row by one double ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from vectra_player_spark.plans.registry import register
from vectra_player_spark.tables import t


# One conf-isolated clone per parent session (recursive_hierarchy_rollup's
# raised cteRecursionRowLimit must not touch the shared session, but a fresh
# newSession() per call leaks sessions + their plan-cache entries — the
# memo bounds that at one clone per parent, reused across invocations).
_ISO_SESSIONS: dict[int, SparkSession] = {}


def _iso_session(spark: SparkSession) -> SparkSession:
    iso = _ISO_SESSIONS.get(id(spark))
    if iso is not None:
        try:  # id() reuse after a session stop could hand back a clone of
            # a DEAD context — probe cheaply and rebuild if so
            iso.conf.get("spark.sql.cteRecursionRowLimit")
            return iso
        except Exception:  # noqa: BLE001 — any Py4J/closed-context error
            del _ISO_SESSIONS[id(spark)]
    from vectra_player_spark.session import prep_session

    iso = spark.newSession()
    prep_session(iso)
    iso.conf.set("spark.sql.cteRecursionRowLimit", 2_000_000_000)
    _ISO_SESSIONS[id(spark)] = iso
    return iso


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    # Session-scoped temp views over the cached table plans: re-registering
    # per call keeps the query correct when one session sweeps several
    # sf_dirs (tests at sf0.001, the driver harness at sf0.01).
    for name in names:
        t(spark, sf_dir, name).createOrReplaceTempView(f"sq_{name}")


# --------------------------------------------------------------------------
# EXISTS semi (TPC-H Q4 shape): orders in a window having at least one
# late-shipping lineitem. Correlation is an equi key (l_orderkey) PLUS a
# non-equi condition on the outer column (shipdate > orderdate + 60d) —
# Catalyst rewrites to a left-semi hash join with the range residual.
# --------------------------------------------------------------------------

_EXISTS_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


@register(
    "exists_late_shipments",
    oracle=_EXISTS_ORACLE,
    tags=("relational", "subquery"),
    survey_ref="J2,P4 (EXISTS decorrelation)",
)
def exists_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql("""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM sq_orders
        WHERE o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP_NTZ '1997-01-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM sq_lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL '60' DAY
          )
        GROUP BY o_orderpriority
    """)


# --------------------------------------------------------------------------
# Correlated scalar subqueries (TPC-H Q17 shape): lineitems below half the
# per-part average quantity. The avg comparison is rewritten into exact
# integers/decimals (2*qty*cnt < sum) — equivalent for cnt > 0 — so both
# engines decide each boundary row identically. Catalyst turns each scalar
# subquery into a per-part aggregate joined back on l_partkey.
# --------------------------------------------------------------------------

_SCALAR_ORACLE = """
SELECT l1.l_returnflag, COUNT(*) AS n_small,
  CAST(SUM(CAST(l1.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS small_qty_revenue
FROM lineitem l1
WHERE CAST(l1.l_quantity AS DECIMAL(18,6)) * 2
        * (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
    < (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,6)))
       FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
GROUP BY l1.l_returnflag
"""


@register(
    "scalar_subquery_small_qty",
    oracle=_SCALAR_ORACLE,
    tags=("relational", "subquery"),
    survey_ref="J1,A3 (correlated scalar decorrelation)",
)
def scalar_subquery_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem")
    return spark.sql("""
        SELECT l1.l_returnflag, COUNT(*) AS n_small,
          CAST(SUM(CAST(l1.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS small_qty_revenue
        FROM sq_lineitem l1
        WHERE CAST(l1.l_quantity AS DECIMAL(18,6)) * 2
                * (SELECT COUNT(*) FROM sq_lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
            < (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,6)))
               FROM sq_lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
        GROUP BY l1.l_returnflag
    """)


# --------------------------------------------------------------------------
# NOT EXISTS anti + uncorrelated scalar threshold (TPC-H Q22 shape):
# above-average-balance customers with no orders in the lake's final months.
# The scalar aggregates run once as a broadcast subquery result; NOT EXISTS
# becomes a left-anti join with the date residual pushed into the scan.
# --------------------------------------------------------------------------

_ANTI_ORACLE = """
SELECT c.c_mktsegment, COUNT(*) AS n_customers,
  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_acctbal
FROM customer c
WHERE CAST(c.c_acctbal AS DECIMAL(18,6))
        * (SELECT COUNT(*) FROM customer c2 WHERE c2.c_acctbal > 0)
    > (SELECT SUM(CAST(c2.c_acctbal AS DECIMAL(18,6))) FROM customer c2 WHERE c2.c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
  )
GROUP BY c.c_mktsegment
"""


@register(
    "not_exists_lapsed_customers",
    oracle=_ANTI_ORACLE,
    tags=("relational", "subquery"),
    survey_ref="J6,A3 (NOT EXISTS decorrelation)",
)
def not_exists_lapsed_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql("""
        SELECT c.c_mktsegment, COUNT(*) AS n_customers,
          CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_acctbal
        FROM sq_customer c
        WHERE CAST(c.c_acctbal AS DECIMAL(18,6))
                * (SELECT COUNT(*) FROM sq_customer c2 WHERE c2.c_acctbal > 0)
            > (SELECT SUM(CAST(c2.c_acctbal AS DECIMAL(18,6))) FROM sq_customer c2 WHERE c2.c_acctbal > 0)
          AND NOT EXISTS (
            SELECT 1 FROM sq_orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP_NTZ '2001-01-01 00:00:00'
          )
        GROUP BY c.c_mktsegment
    """)


# --------------------------------------------------------------------------
# Recursive CTE (Spark 4.1 WITH RECURSIVE): ancestor-chain rollup over a
# synthetic-but-deterministic reporting hierarchy (parent(k) = floor(k/2),
# a binary forest over the contiguous customer keys — the fixture's stand-in
# for the org/category hierarchies a warehouse walks with recursion). The
# chain from a leaf to its root is UNIQUE, so UNION ALL recursion is exact
# (Spark does not yet support UNION-distinct recursion, which cyclic
# closures would need — connected_components in operators/dedup.py remains
# the cycle-safe path). Depth is log2(|customers|) ≈ 11 iterations at
# sf0.01; each iteration is one equi-join of the frontier against the
# (broadcastable) dimension — the textbook distributed hierarchy walk.
# Balance accumulates in DECIMAL(28,6) with explicit casts so the
# recursive schema is iteration-stable and engine-identical.
# --------------------------------------------------------------------------

_RECURSIVE_ORACLE = """
WITH RECURSIVE chain(leaf, node, depth, bal_sum) AS (
  SELECT c_custkey, c_custkey, 0, CAST(c_acctbal AS DECIMAL(28,6))
  FROM customer
  UNION ALL
  SELECT chain.leaf, p.c_custkey, chain.depth + 1,
         CAST(chain.bal_sum + CAST(p.c_acctbal AS DECIMAL(28,6)) AS DECIMAL(28,6))
  FROM chain JOIN customer p ON p.c_custkey = CAST(FLOOR(chain.node / 2.0) AS BIGINT)
  WHERE chain.node > 1
)
SELECT leaf AS c_custkey, CAST(depth AS BIGINT) AS chain_len,
       CAST(bal_sum AS DOUBLE) AS chain_balance
FROM chain WHERE node <= 1
"""


@register(
    "recursive_hierarchy_rollup",
    oracle=_RECURSIVE_ORACLE,
    tags=("relational", "subquery"),
    survey_ref="J-family extension: WITH RECURSIVE hierarchy walk (Spark 4.1)",
)
def recursive_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The walk materializes ~n·log2(n) frontier rows total (every leaf ×
    # its unique root chain) — ~31M at the 100× lake, over the 1M-row
    # safety default, which exists to catch RUNAWAY recursion, not large
    # finite ones. Depth stays log2(n) (~21 at 100×), far under the
    # level limit, so raise only the row cap — in an ISOLATED session
    # (same SparkContext, separate SQLConf/temp views): the limit is read
    # at EXECUTION time (measured), so a try/finally restore around plan
    # construction would re-expose the 1M default when the caller finally
    # collects, while setting it on the shared session would disable the
    # runaway-recursion guard for every later query in the session.
    # The isolated session is memoized PER PARENT SESSION: newSession()
    # per call would leak — tables._PLAN_CACHE keys by id(session) and
    # each cached DataFrame pins its session, so repeated invocations
    # (bench best-of-3, full-registry harness sweeps) would retain every
    # clone, its temp views, and its cache entries forever.
    iso = _iso_session(spark)
    _views(iso, sf_dir, "customer")
    return iso.sql("""
        WITH RECURSIVE chain(leaf, node, depth, bal_sum) AS (
          SELECT c_custkey, c_custkey, 0, CAST(c_acctbal AS DECIMAL(28,6))
          FROM sq_customer
          UNION ALL
          SELECT chain.leaf, p.c_custkey, chain.depth + 1,
                 CAST(chain.bal_sum + CAST(p.c_acctbal AS DECIMAL(28,6)) AS DECIMAL(28,6))
          FROM chain JOIN sq_customer p
            ON p.c_custkey = CAST(FLOOR(chain.node / 2.0) AS BIGINT)
          WHERE chain.node > 1
        )
        SELECT leaf AS c_custkey, CAST(depth AS BIGINT) AS chain_len,
               CAST(bal_sum AS DOUBLE) AS chain_balance
        FROM chain WHERE node <= 1
    """)

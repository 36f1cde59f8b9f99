"""Loading the driver's synthetic tables (TESTDATA.md).

All tables are single parquet files under ``{sf_dir}/{name}.parquet``.
``load`` reads one table; ``t`` is the terse alias used inside query
definitions. Reads are plain ``spark.read.parquet`` — column pruning and
predicate pushdown are then Catalyst's job, and partition-style pruning is
exercised by the lake-layout writer in :mod:`vectra_player_spark.sources`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# (session id, session timezone, sf_dir, name) → DataFrame. A DataFrame
# is an immutable logical plan, so reuse across queries in the same
# session is free and skips the per-read parquet footer/schema inference
# (~0.1-0.3 s per call — material when the correctness harness runs the
# full registry).
# The key must identify the SESSION, not the application: newSession()
# clones (recursive_hierarchy_rollup's conf isolation) share an
# applicationId, and a DataFrame is bound to the session that read it —
# createOrReplaceTempView on a cross-session cache hit would register the
# view in the wrong catalog. id(spark) is stable while the entry lives
# because the cached DataFrame holds a reference to its session.
# The TIMEZONE is part of the key because events' NTZ→LTZ ts cast freezes
# the session timezone AT ANALYSIS: a plan cached before prep_session
# normalized the session to UTC would keep converting naive timestamps in
# the wrong zone for every later (correctly-UTC) query — a 5-hour shift
# on every ts-derived value, caught by the round-5 hostile sweep.
_PLAN_CACHE: dict[tuple[int, str, str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    tz = spark.conf.get("spark.sql.session.timeZone", "")
    key = (id(spark), tz, sf_dir, name)
    cached = _PLAN_CACHE.get(key)
    if cached is not None:
        return cached
    df = _read(spark, sf_dir, name)
    _PLAN_CACHE[key] = df
    return df


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # The driver's events.ts is parquet TIMESTAMP(NANOS), which Spark's
        # vectorized reader rejects; read it as long nanoseconds and
        # truncate to microseconds (exactly what DuckDB's reader does with
        # ns → us). Files already carrying µs timestamps pass through.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            # µs-precision files read as TIMESTAMP_NTZ; sessions run in UTC
            # (session.prep_session), so the LTZ cast is value-identical and
            # keeps every downstream expression (unix_micros, tz-aware
            # windowing) on one timestamp type across driver data versions.
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


t = load


def invalidate_lake(sf_dir: str) -> None:
    """Drop every cached plan for a lake whose FILES changed (daily
    ingest appended a partition): a DataFrame's file listing snapshots at
    analysis, so cached plans would silently miss the new files. Called
    by the layout refresh path (operators/skew); a static lake never
    needs it."""
    for key in [k for k in _PLAN_CACHE if k[2] == sf_dir]:
        del _PLAN_CACHE[key]


def facts_for_orderkey(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(lineitem, orders) self-routed onto the orderkey-bucketed fact
    pair when the layout exists for this lake — the fact-side analog of
    events_for_windows. The TPC-H queries whose orderkey join keeps BOTH
    sides fact-sized ride it (q3/q4/q5/q8/q9/q12/q18/q21 — measured
    1.2-1.9× at the 10× lake): the SMJ plans with no Exchange on either
    fact side, and with the bucketed-scan ordering conf no per-task Sort
    either. Queries whose filters collapse one side to broadcast size
    (q7, q10) deliberately do NOT route — AQE's BHJ over size-based
    splits beats the 32-bucket read there (A/B'd in their docstrings).
    Layout-only routing — values are identical on both arms, so every
    routed query keeps its original oracle. Discovery never builds the
    layout; absent/stale layout → the plain parquet scans."""
    from vectra_player_spark.operators.skew import bucketed_facts_if_available

    pair = bucketed_facts_if_available(spark, sf_dir)
    if pair is not None:
        return pair
    return load(spark, sf_dir, "lineitem"), load(spark, sf_dir, "orders")


def events_for_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table, self-routed onto the window-family bucketed
    layout when one exists for this lake (bucketed by user_id, sorted by
    (user_id, event_id) — operators/skew.materialize_bucketed_events_lake).

    Per-episode window queries (partitionBy user_id, orderBy event_id)
    then read pre-shuffled, pre-sorted buckets: the Window's Exchange
    disappears, and with the bucketed-scan ordering conf so does its
    SortExec. Values are layout-independent — every routed query keeps
    its original oracle, so the driver's hash comparison holds on either
    arm. Discovery never builds the layout (ingest-time decision); absent
    layout → the plain parquet scan."""
    from vectra_player_spark.operators.skew import bucketed_events_if_available

    ev = bucketed_events_if_available(spark, sf_dir)
    return ev if ev is not None else load(spark, sf_dir, "events")

"""Registry mapping query names → (Spark impl, DuckDB oracle SQL, tags).

The driver contract (``__spark_entry__.py``) needs two dicts:
``queries()[name](spark, sf_dir) -> DataFrame`` and ``oracle_sql()[name]``.
Register each operator once here; both dicts are derived.

Conventions enforced by the comparison harness:
- Every computed column is aliased identically on both sides (the driver
  sorts columns by name before hashing values).
- Floating aggregates that accumulate in engine-dependent order are either
  computed in exact DECIMAL arithmetic and cast to double, or rounded to a
  fixed number of decimals on BOTH sides (see queries_relational docstring).
- Timestamps are only emitted as formatted strings or epoch numbers.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    spark_fn: SparkQuery
    oracle: str | None = None  # DuckDB SQL; None → driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    survey_ref: str = ""  # SURVEY.md §2 operator ids this query covers


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    survey_ref: str = "",
) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from vectra_player_spark.session import prep_session

            prep_session(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = QuerySpec(name, wrapped, oracle, tuple(tags), survey_ref)
        return fn

    return deco


def queries() -> dict[str, SparkQuery]:
    return {name: spec.spark_fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship tick-features query (the reference's
get_tick_features, src/services/event_store/duckdb.py:408-458, re-expressed
as Spark window functions) on sf0.001. ``queries()`` / ``oracle_sql()`` are
generated from the engine's plan registry
(vectra_player_spark/plans/registry.py) — one entry per implemented
operator from SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver may import this module by file path from another CWD; make the
# engine package importable regardless.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from vectra_player_spark import plans  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return plans.queries()["tick_features"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    return plans.oracle_sql()

"""Query plan registry — the engine's declared operator surface.

Every operator family from SURVEY.md §2 is declared here as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (where expressible)
an equivalent DuckDB SQL string over the same parquet tables. The driver's
correctness harness runs both sides and hash-compares; ``tests/`` runs the
same comparison locally at sf0.001.
"""

from vectra_player_spark.plans.registry import QUERIES, QuerySpec, oracle_sql, queries, register

# Importing the query modules populates the registry.
from vectra_player_spark.plans import (  # noqa: E402,F401
    queries_relational,
    queries_events,
    queries_survival,
    queries_strategy,
    queries_text,
    queries_vector,
    queries_simulation,
    queries_ml,
    queries_backtest,
    queries_multimodal,
    queries_pipeline,
    queries_lm,
    queries_classify,
    queries_bpe,
    queries_timeseries,
    queries_subqueries,
    queries_tpch_extra,
)

__all__ = ["QUERIES", "QuerySpec", "register", "queries", "oracle_sql"]

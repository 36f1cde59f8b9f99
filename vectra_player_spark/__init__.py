"""vectra_player_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query + data-processing capabilities of
the reference event-capture/analytics platform (Dutchthenomad/VECTRA-PLAYER)
on Apache Spark: DataFrame/SQL for relational + window analytics, grouped-map
pandas for per-episode stateful algorithms, Structured Streaming for the
live pipeline, plus the large-scale training-data operators (dedup families,
similarity search, text analysis, multimodal plumbing) the reference's
north-star use case needs at 100 TB.

Design rules (see SURVEY.md §4, §7):
- Declarative first: every operator expressible in Spark SQL is Spark SQL,
  so Catalyst gives pushdown / pruning / join selection / AQE for free.
- UDFs only where semantics demand sequential per-group state (backtests,
  Monte Carlo) — always Arrow-batched pandas, never row-at-a-time Python.
- Every query in `plans.registry` carries a DuckDB oracle SQL string; the
  driver (and our own tests) run both and compare.
"""

__version__ = "0.1.0"

"""Shared funnel-accounting row for the curation capstones (v3/v4):
one (stage, n_docs, n_tokens) aggregate per stage relation, with the
empty-lake coalesce guard. One definition — a schema or guard change
must not drift between funnels."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_row(df: DataFrame, stage: str, tok_col: Column) -> DataFrame:
    return df.agg(
        F.lit(stage).alias("stage"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.coalesce(F.sum(tok_col), F.lit(0)).cast("bigint").alias("n_tokens"),
    )

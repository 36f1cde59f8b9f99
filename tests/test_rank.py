"""operators/rank.py: scale-safe global ranking vs the Window reference.

Every assertion compares the distributed form against the partition-less
Window it replaces (computed on the same tiny frame, where the global
Window is harmless) — exact equality, including NTILE's ceil/floor bucket
sizing and tie handling, plus plan-shape pins: ranked_topk plans a
TakeOrderedAndProject and NO Window; exact_ntile plans only
bucket-partitioned Windows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from vectra_player_spark.operators.rank import exact_ntile, global_rank, ranked_topk


def _frame(spark, n=257, ties=True):
    df = spark.range(n).select(
        F.col("id").alias("row_id"),
        # pmod → heavy ties when ties=True, unique scores otherwise
        (F.pmod(F.col("id") * 37, F.lit(50 if ties else 100000)))
        .cast("double")
        .alias("score"),
    )
    return df


def test_ranked_topk_matches_window(spark):
    df = _frame(spark)
    got = ranked_topk(df, "score", "row_id", 17).orderBy("rank").collect()
    w = Window.orderBy(F.col("score").desc(), F.col("row_id").asc())
    want = (
        df.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 17)
        .orderBy("rank")
        .collect()
    )
    assert [(r.row_id, r.score, r.rank) for r in got] == [
        (r.row_id, r.score, r.rank) for r in want
    ]


def test_ranked_topk_plan_has_no_window(spark):
    df = _frame(spark)
    plan = (
        ranked_topk(df, "score", "row_id", 17)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Window [" not in plan


def test_ranked_topk_empty_input(spark):
    df = _frame(spark).where(F.lit(False))
    assert ranked_topk(df, "score", "row_id", 5).count() == 0


@pytest.mark.parametrize("n,ties", [(257, True), (100, False), (3, True), (1, False)])
def test_exact_ntile_matches_window_ntile(spark, n, ties):
    df = _frame(spark, n=n, ties=ties)
    got = {
        r.row_id: r.q
        for r in exact_ntile(df, "score", "row_id", 4, out_col="q").collect()
    }
    w = Window.orderBy(F.col("score").desc(), F.col("row_id").asc())
    want = {
        r.row_id: r.q
        for r in df.withColumn("q", F.ntile(4).over(w).cast("bigint")).collect()
    }
    assert got == want


def test_global_rank_matches_row_number(spark):
    df = _frame(spark, n=300, ties=True)
    got = {r.row_id: r.rank for r in global_rank(df, "score", "row_id").collect()}
    w = Window.orderBy(F.col("score").desc(), F.col("row_id").asc())
    want = {
        r.row_id: r.rank
        for r in df.withColumn("rank", F.row_number().over(w).cast("bigint")).collect()
    }
    assert got == want


def test_exact_ntile_plan_windows_are_partitioned(spark):
    df = _frame(spark)
    plan = (
        exact_ntile(df, "score", "row_id", 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    for line in plan.splitlines():
        m = re.search(r"windowspecdefinition\(([^)]*)\)", line)
        if m:
            # first argument of a partitioned spec is the partition column
            assert "__bucket" in m.group(1), line


@pytest.mark.parametrize("const,k", [(0.0, 4), (-7.5, 3)])
def test_exact_ntile_degenerate_and_negative_scores(spark, const, k):
    """All-ties (every row in ONE bucket — the documented empty-sample /
    single-bucket degenerate path) and negative scores (the struct-sort
    negation in ranked_topk and the cut comparison must not assume
    non-negativity)."""
    df = spark.range(37).select(
        F.col("id").alias("row_id"), F.lit(const).cast("double").alias("score")
    )
    got = {
        r.row_id: r.q for r in exact_ntile(df, "score", "row_id", k, out_col="q").collect()
    }
    w = Window.orderBy(F.col("score").desc(), F.col("row_id").asc())
    want = {
        r.row_id: r.q
        for r in df.withColumn("q", F.ntile(k).over(w).cast("bigint")).collect()
    }
    assert got == want
    top = ranked_topk(df, "score", "row_id", 5).orderBy("rank").collect()
    assert [r.row_id for r in top] == [0, 1, 2, 3, 4]  # id tiebreak order

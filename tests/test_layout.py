"""Z-order layout: identical data, measurably better file-level pruning.

The check reads parquet footers directly (pyarrow) and counts which files
a box predicate could touch under min/max skipping — the same statistics
Spark's parquet reader and any lakehouse manifest use — so the assertion
is about layout, not reader implementation."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from vectra_player_spark.operators.layout import write_zordered


def _files_overlapping_box(path: str, x_col: str, y_col: str, box) -> tuple[int, int]:
    x_lo, x_hi, y_lo, y_hi = box
    files = sorted(glob.glob(f"{path}/*.parquet"))
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        fx_lo = fy_lo = float("inf")
        fx_hi = fy_hi = float("-inf")
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name not in (x_col, y_col) or col.statistics is None:
                    continue
                lo, hi = col.statistics.min, col.statistics.max
                if name == x_col:
                    fx_lo, fx_hi = min(fx_lo, lo), max(fx_hi, hi)
                else:
                    fy_lo, fy_hi = min(fy_lo, lo), max(fy_hi, hi)
        if fx_lo <= x_hi and fx_hi >= x_lo and fy_lo <= y_hi and fy_hi >= y_lo:
            hit += 1
    return hit, len(files)


def test_zorder_layout_prunes_files_naive_does_not(spark, tmp_path):
    # Two independent uniform dimensions derived from md5 halves — no
    # correlation, so 1-D sorting on either column alone cannot cluster
    # the other.
    df = (
        spark.range(40_000)
        .withColumn("h", F.md5(F.col("id").cast("string")))
        .select(
            "id",
            (F.conv(F.substring("h", 1, 6), 16, 10).cast("long") % 1000).alias("x"),
            (F.conv(F.substring("h", 7, 6), 16, 10).cast("long") % 1000).alias("y"),
        )
    )
    naive = str(tmp_path / "naive")
    zord = str(tmp_path / "zord")
    df.repartition(16).write.mode("overwrite").parquet(naive)
    write_zordered(df, zord, "x", "y", bits=10, n_files=16)

    # identical data back
    a = spark.read.parquet(naive)
    b = spark.read.parquet(zord)
    assert a.count() == b.count() == 40_000
    assert a.exceptAll(b).count() == 0

    box = (0, 99, 0, 99)  # 1% of the (x, y) space
    naive_hit, naive_total = _files_overlapping_box(naive, "x", "y", box)
    z_hit, z_total = _files_overlapping_box(zord, "x", "y", box)
    assert naive_total == z_total == 16
    # round-robin files all span the full range → no pruning possible
    assert naive_hit == naive_total
    # z-ordered: the box lives in the low-z corner → a small minority of files
    assert z_hit <= naive_hit // 4, (z_hit, naive_hit)


def test_zorder_degenerate_dimension(spark, tmp_path):
    # A constant dimension must not break the writer (span == 0 path).
    df = spark.range(1000).select(
        "id", F.col("id").alias("x"), F.lit(7).alias("y")
    )
    out = str(tmp_path / "degen")
    write_zordered(df, out, "x", "y", bits=8, n_files=4)
    assert spark.read.parquet(out).count() == 1000

"""Multi-dimensional data layout: Z-order (Morton-curve) clustering.

Partition pruning and parquet row-group skipping are 1-dimensional: files
sorted by one key prune perfectly on that key and not at all on a second.
Z-ordering interleaves the bits of two (or more) normalized keys so that
rows close in BOTH dimensions land in the same files — each file then
covers a small rectangle of the (x, y) space, and a scan with predicates
on either or both columns skips most files via footer min/max stats.
This is the layout lever behind Delta/Iceberg OPTIMIZE ZORDER; here it's
a plain repartitionByRange+sortWithinPartitions over the Morton code, so
it works on vanilla parquet.

At 100 TB: the range partitioner samples the z-values (one pass), the
sort is per-output-file, and nothing here is driver-sided — the only
driver traffic is the 4-scalar min/max frame used for normalization.

Measured (tests/test_layout.py): a 1%-of-space box predicate touches
every naively-written file but only the files whose z-rectangle overlaps
the box in the z-ordered layout.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_code(x: Column, y: Column, bits: int = 12) -> Column:
    """Interleave the low `bits` bits of two non-negative ints (x even
    positions, y odd) — a JVM-side bitwise expression, no UDF."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def _normalize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Scale a numeric column to [0, 2^bits) as a long (degenerate ranges
    collapse to 0 — a constant column contributes nothing to ordering)."""
    span = hi - lo
    if span <= 0:
        return F.lit(0).cast("long")
    scale = (2**bits - 1) / span
    return F.least(
        F.lit(2**bits - 1),
        F.greatest(F.lit(0), ((col - F.lit(lo)) * F.lit(scale)).cast("long")),
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    bits: int = 12,
    n_files: int = 16,
) -> None:
    """Write `df` as parquet clustered on the Z-curve of (col_x, col_y).

    repartitionByRange assigns contiguous z-ranges to files (sampled range
    boundaries); sortWithinPartitions orders rows inside each file so
    row-group stats are tight too."""
    lo_x, hi_x, lo_y, hi_y = df.agg(
        F.min(col_x), F.max(col_x), F.min(col_y), F.max(col_y)
    ).first()
    # empty (or all-null) input: no ordering to establish — normalize to a
    # constant 0 frame so the write still produces a valid (empty) table
    lo_x, hi_x, lo_y, hi_y = (
        0.0 if v is None else float(v) for v in (lo_x, hi_x, lo_y, hi_y)
    )
    z = morton_code(
        _normalize(F.col(col_x), float(lo_x), float(hi_x), bits),
        _normalize(F.col(col_y), float(lo_y), float(hi_y), bits),
        bits,
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )

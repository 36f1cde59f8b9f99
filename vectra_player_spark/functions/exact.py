"""Exact / engine-portable numeric helpers.

Why: a double SUM over N shuffled partitions accumulates in a different
order in Spark than in a single-threaded oracle, so the last few ulps
differ and a value-hash comparison fails. Two portable disciplines:

1. **Decimal-exact accumulation** — cast each operand to DECIMAL(18, s)
   *before* arithmetic. A double like 9.64 (stored 9.6400000000000006) is
   1e-15 away from the 6-decimal gridpoint, so double→decimal rounding is
   unambiguous in every engine; decimal +/* are then exact and
   order-insensitive, and the final CAST(... AS DOUBLE) is exact too.
2. **round-to-k on both sides** — for quantities whose relative error is
   tiny vs the rounding grid (avgs, ratios, correlations), `round(x, 6)`
   applied identically in Spark and the oracle.

The same patterns are mirrored in the oracle SQL strings (see
plans/queries_*.py); keep the scales in sync.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dec(col: Column | str) -> Column:
    """Operand cast for exact arithmetic (6-decimal grid)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: Column | str) -> Column:
    """Order-insensitive exact sum of a double column, returned as double."""
    return F.sum(dec(col)).cast("double")


def r6(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, 6)


def r6d(col: Column | str) -> Column:
    """round(x, 6) cast to double — canonical float output column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c.cast("double"), 6)

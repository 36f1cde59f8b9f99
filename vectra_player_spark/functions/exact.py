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


def fround(col: Column | str, digits: int = 6) -> Column:
    """Engine-stable round for doubles: floor(x * 10^d + 0.5) / 10^d.

    ROUND(double, d) is NOT cross-engine deterministic at representation
    midpoints: Spark's round() goes through the double's SHORTEST decimal
    repr (BigDecimal.valueOf → "8.0046875" → HALF_UP → ...688) while
    DuckDB rounds the exact binary expansion (8.00468749999999886… →
    ...687). Measured at the 10× lake: 1 row in 1e5 flipped by exactly
    1e-6 (SCALE.md §rounding boundary). This formula uses only IEEE
    double multiply/add/floor — bit-identical in every engine by
    construction — at the cost of a fixed convention (half toward +inf)
    that differs from ROUND only on the ambiguous midpoint set. Use it
    with the SAME formula in the DuckDB oracle:
    FLOOR(x * 1e6 + 0.5) / 1e6.
    """
    c = F.col(col) if isinstance(col, str) else col
    scale = F.lit(float(10**digits))
    return F.floor(c.cast("double") * scale + F.lit(0.5)) / scale


# -- integer fixed-point accumulation (the fast exact path) -----------------
#
# Decimal sums are exact but slow in the JVM: SUM(decimal(18,6)) widens to
# precision 28, leaving the compact-long representation for boxed
# BigDecimal — measured 6.4× slower than a double sum at 6 GB (SCALE.md).
# When every operand sits on a known decimal grid (money: 2 digits), the
# same exactness costs nothing as integer arithmetic: scale each operand
# to an integer with round(x * 10^k) (the double product is identical in
# every engine, and both Spark and DuckDB round half away from zero for
# positives), multiply/sum as BIGINTs — exact and order-insensitive — and
# divide by the combined scale ONCE at the end. long/double division is a
# correctly-rounded conversion of the exact rational, the same value the
# decimal path's final CAST(... AS DOUBLE) produces, so oracle hashes are
# unchanged.
#
# Overflow budget: int64 holds ±9.2e18. A 3-factor charge term (2+2+2
# digits) on 1e4-magnitude prices is ~2e10 per row — safe to ~4e8 rows per
# final aggregate. Past that, partial-sum as BIGINT per group-shard and
# re-aggregate CAST AS DECIMAL(38,0), or drop to dsum().


def fixed(col: Column | str, digits: int = 2) -> Column:
    """Operand scaled to an exact BIGINT on its 10^-digits grid.

    floor(x*10^k + 0.5), NOT round(): Spark's round() on doubles goes
    through BigDecimal per value (as slow as the decimal path it's meant
    to replace); floor stays primitive. For non-negative operands the two
    are identical (half-up); both engines' floor/cast agree bit-for-bit
    on the same input double. Negative operands would round toward
    +inf here — money grids in this schema are non-negative."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(10**digits) + F.lit(0.5)).cast("bigint")


def fsum(term: Column, total_digits: int) -> Column:
    """Exact BIGINT sum of a fixed-point term, rescaled to double."""
    return (F.sum(term) / F.lit(float(10**total_digits))).alias("fsum")

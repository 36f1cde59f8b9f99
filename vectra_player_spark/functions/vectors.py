"""Vector math over array<float> embedding columns.

Pure higher-order-function SQL (zip_with + aggregate) — stays JVM-side and
matches the oracle's left-to-right double accumulation order, so cosine
scores agree bit-for-bit (then rounded to 6 for hashing). For the 100 TB
path the brute-force form is the verification baseline; the scale path is
the LSH/IVF bucketing in operators/knn.py which prunes the candidate set
before this kernel runs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    sq = F.transform(_c(a), lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))

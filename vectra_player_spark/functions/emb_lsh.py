"""Deterministic random-hyperplane LSH for embedding near-dup blocking.

Each of ``LSH_BANDS`` bands hashes a vector to a ``LSH_BITS``-bit
sign-pattern bucket; a pair is a candidate iff it shares (label, band,
bucket) for ANY band (OR-amplification, the same banded design as
minhash). Hyperplanes derive from md5 — no RNG — so the DuckDB oracle
reproduces the EXACT same blocking and the approximate scale path stays
value-hash-checked, not rows-only.

Shared between the query plans (plans/queries_vector.py — Spark and
oracle-SQL forms) and the persisted signature store
(operators/sigstore.py), which precomputes the band buckets at ingest.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

LSH_DIM = 64
LSH_BANDS = 3
LSH_BITS = 4  # per band


def _hyperplane(b: int) -> list[float]:
    """Deterministic pseudo-random ±1 hyperplane from md5 parity."""
    return [
        1.0
        if int(hashlib.md5(f"lsh:{b}:{p}".encode()).hexdigest(), 16) % 2 == 0
        else -1.0
        for p in range(LSH_DIM)
    ]


HYPERPLANES = [_hyperplane(b) for b in range(LSH_BANDS * LSH_BITS)]


def band_bucket_sql(emb: str, band: int) -> str:
    """DuckDB expression for one band's bucket id (oracle side)."""
    terms = []
    for bit in range(LSH_BITS):
        h = HYPERPLANES[band * LSH_BITS + bit]
        lit = "[" + ", ".join(str(v) for v in h) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({emb}, {lit}) >= 0 THEN {1 << bit} ELSE 0 END)"
        )
    return " + ".join(terms)


def band_bucket_col(emb: Column, band: int) -> Column:
    """Spark expression for one band's bucket id."""
    from vectra_player_spark.functions.vectors import dot

    total = F.lit(0)
    for bit in range(LSH_BITS):
        h = HYPERPLANES[band * LSH_BITS + bit]
        plane = F.array(*[F.lit(v) for v in h])
        total = total + F.when(dot(emb, plane) >= 0, F.lit(1 << bit)).otherwise(
            F.lit(0)
        )
    return total

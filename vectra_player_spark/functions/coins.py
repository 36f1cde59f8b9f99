"""THE deterministic md5 coin — single definition for both engines.

A salted uniform in [0,1): the first 8 md5 hex chars of
'{salt}:{doc_id}' as a 32-bit integer over 2^32. Deterministic, id-pure
and content-independent, so it is append-safe (a row's coin never
changes) and both engines compute the identical value — every split /
sample / slice-membership decision in the engine builds on it.

Two variants: the half-open [0,1) form for threshold comparisons, and
the strictly-interior (0,1) form (+0.5 numerator offset) for ln()/
ln(-ln()) chains that must never see 0. Use ``.format(salt=...)``;
the id column is ``doc_id`` (rename upstream when keying other ids).
"""

SPARK_U01 = (
    "(conv(substring(md5(concat('{salt}:', cast(doc_id as string))), 1, 8), 16, 10)"
    " / 4294967296.0)"
)
DUCK_U01 = (
    "(CAST('0x' || substring(md5('{salt}:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)"
    " / 4294967296.0)"
)
SPARK_U01_OPEN = (
    "((conv(substring(md5(concat('{salt}:', cast(doc_id as string))), 1, 8), 16, 10)"
    " + 0.5) / 4294967296.0)"
)
DUCK_U01_OPEN = (
    "((CAST('0x' || substring(md5('{salt}:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)"
    " + 0.5) / 4294967296.0)"
)

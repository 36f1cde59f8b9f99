"""Text-analysis columns for the large-scale training-data pipeline.

All JVM-side built-ins (split/regexp/md5/higher-order functions) — no UDFs,
so the whole document pass stays inside whole-stage codegen and scales
linearly with the corpus. Semantics are deliberately engine-portable so the
DuckDB oracle can reproduce them token for token:

- tokens: trim + split on \\s+
- shingles: w-word sliding windows over the token array
- quality: length / token stats, stopword ratio, mean token length
- language-ID: stopword-hit heuristic (n-gram LM stub — deterministic)
- fingerprint: md5 of whitespace-normalized lowercase text

Functions operating on a token-array column take the COLUMN NAME (they are
built with expr() higher-order lambdas).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def word_shingles(tokens_col: str, w: int = 3) -> Column:
    """w-gram shingles: 'tok[i] tok[i+1] ... tok[i+w-1]' for each window.

    Empty array when the document has fewer than w tokens (sequence(0, n)
    with n < 0 would error, so the size is guarded with greatest()).
    """
    joined = ", ".join(f"{tokens_col}[i + {k}]" for k in range(w))
    return F.expr(
        f"CASE WHEN size({tokens_col}) < {w} THEN array() "
        f"ELSE transform(sequence(0, size({tokens_col}) - {w}), "
        f"i -> concat_ws(' ', {joined})) END"
    )


def word_shingles_text(text_col: str, w: int = 3) -> Column:
    """w-gram shingles straight from a text column, bind-once.

    Catalyst pushes filters below projects and inlines aliases while doing
    so; if the shingle expression indexes an aliased token array, the
    inlined form re-evaluates split() per element access — O(tokens²) per
    document. Binding the token array as a lambda variable (via a
    single-element array + flatten) keeps it evaluated exactly once no
    matter how the optimizer rewrites the tree."""
    refs = ", ".join(f"t[i + {k}]" for k in range(w))
    return F.expr(
        f"flatten(transform(array(split(trim({text_col}), '\\\\s+')), "
        f"t -> CASE WHEN size(t) < {w} THEN array() "
        f"ELSE transform(sequence(0, size(t) - {w}), i -> concat_ws(' ', {refs})) END))"
    )


def stopword_ratio(tokens_col: str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    in_list = ", ".join(f"'{s}'" for s in stopwords)
    hits = F.expr(f"size(filter({tokens_col}, x -> x IN ({in_list})))")
    return hits / F.nullif(F.size(F.col(tokens_col)).cast("double"), F.lit(0.0))


def mean_token_length(tokens_col: str) -> Column:
    total = F.expr(f"aggregate({tokens_col}, 0L, (acc, x) -> acc + length(x))")
    return total / F.nullif(F.size(F.col(tokens_col)).cast("double"), F.lit(0.0))


def language_id(stop_ratio: Column) -> Column:
    """Deterministic heuristic stub for n-gram language ID (the container has
    no language model): high stopword density → 'en', some → 'latin-like',
    none → 'unknown'. Both engines compute the identical rule."""
    return (
        F.when(stop_ratio >= 0.08, F.lit("en"))
        .when(stop_ratio >= 0.02, F.lit("latin-like"))
        .otherwise(F.lit("unknown"))
    )


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 over lowercase, whitespace-collapsed text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))

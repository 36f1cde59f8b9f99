"""Distributed BPE merge learning — tokenizer training for the corpus tier.

Byte-pair encoding (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units") learns a merge table by repeatedly fusing
the most frequent adjacent symbol pair. The classic learner operates on a
word→count dictionary; the distributed form here keeps that table as a
DataFrame:

- **Collapse-first by construction**: the corpus collapses to DISTINCT
  pre-tokenized words with counts (a vocabulary-sized relation, ≪ corpus
  — duplication factor d costs nothing), exactly like the reference
  learners' word-frequency dict. Every subsequent round touches only
  this table.
- **Incremental pair-count maintenance (round-9)**: the classic
  re-learn re-explodes every word's adjacent pairs each round — a
  vocabulary-sized shuffle × n_merges, which at a production merge
  budget (30k+) is the wrong plan. A merge (a, b) only changes the
  pair counts of words that CONTAIN (a, b) adjacent, so the learner
  keeps the aggregated pair table (w1, w2, c) as loop state and updates
  it by exact ± deltas from the affected words only: old adjacencies
  leave with weight −cnt, post-merge adjacencies enter with +cnt. The
  full explode runs exactly once (round 0). Per round the heavy work —
  the merge fold and the delta explode — evaluates only on affected
  rows (a lazy CASE WHEN gates the fold behind a cheap adjacent-pair
  containment probe); the residual linear terms are one columnar scan
  of the checkpointed word table for that probe and one union-aggregate
  of the pair table with the (small) delta. Maintained counts are
  exactly the recount — differential-tested against a full-rescan
  learner and a pure-Python reference at n_merges=512
  (tests/test_bpe.py).
- **Per round**: a TakeOrderedAndProject top-1 over the maintained pair
  table with a TOTAL order (count DESC, pair lexicographic ASC —
  deterministic under any topology), and a JVM-side higher-order fold
  applying the merge greedily left-to-right non-overlapping. The top-1
  collect is a scalar driver probe (the watermark-probe class), one per
  merge — inherent to BPE's sequential dependency.
- **Lineage control**: the word AND pair tables are localCheckpoint'ed
  each round, so the nested fold expressions never stack (n_merges deep
  plans blow codegen otherwise) — the connected_components discipline.

At 100 TB the word-count collapse IS the scale story: the iteration cost
depends on |vocab| (and, per round, mostly on the affected slice of it),
not corpus bytes, and the one corpus-sized pass is the initial
pre-tokenize+count aggregate. The learned merge table itself is a corpus
statistic exactly like the IVF/PQ quantizers, so it persists in the
signature store (operators/sigstore kind 'bpe') and the registered
queries serve from it instead of re-learning per query.

No UDFs anywhere: pre-tokenization is regexp_extract_all, symbol
splitting and merge application are transform/aggregate higher-order
expressions inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Pre-tokenizer: letter runs | digit runs | single other non-space — the
# BPE-ish pattern the token-counting query uses (queries_text._BPE_PATTERN).
BPE_PRETOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

END_OF_WORD = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """DISTINCT pre-tokenized words with corpus counts: (word, cnt)."""
    return (
        docs.where(F.col(text_col).isNotNull())
        .select(
            # F.lit, not an F.expr SQL literal: the pattern's \s would be
            # eaten by SQL string-escape processing (the queries_text rule).
            F.explode(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(BPE_PRETOKEN_PATTERN), F.lit(0)
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def initial_symbols(words: DataFrame) -> DataFrame:
    """(word, cnt, syms): characters plus the end-of-word marker."""
    return words.select(
        "word",
        "cnt",
        F.expr(
            "concat(transform(sequence(1, char_length(word)),"
            f" i -> substring(word, i, 1)), array('{END_OF_WORD}'))"
        ).alias("syms"),
    )


def _adjacent_pairs(df: DataFrame) -> DataFrame:
    """Explode (cnt, syms) into count-weighted adjacent pairs (w1, w2, cnt).
    Overlapping positions all count (get_stats semantics)."""
    return (
        df.where(F.size("syms") >= 2)
        .select(
            "cnt",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1),"
                    " i -> named_struct('w1', syms[i-1], 'w2', syms[i]))"
                )
            ).alias("bg"),
        )
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"), "cnt")
    )


def pair_counts(df: DataFrame) -> DataFrame:
    """Aggregated global pair counts (w1, w2, c) for a (cnt, syms)
    relation — the learner's round-0 state (ONE full explode; afterwards
    the table is maintained by deltas)."""
    return (
        _adjacent_pairs(df)
        .groupBy("w1", "w2")
        .agg(F.sum("cnt").cast("bigint").alias("c"))
    )


def _has_adjacent(syms_col: str, a: str, b: str) -> Column:
    """Cheap containment probe: does the symbol array hold (a, b) at any
    adjacent position? Gates the expensive fold/delta work to affected
    rows. The size >= 2 guard is load-bearing: Spark's sequence(1, n)
    REVERSES when n < 1 instead of returning empty (the queries_lm
    bigram rule). Literals go through F.lit — symbols may contain
    quotes."""
    idx = F.sequence(F.lit(1), F.size(syms_col) - F.lit(1))
    return F.when(
        F.size(syms_col) >= 2,
        F.exists(
            idx,
            lambda i: (F.element_at(F.col(syms_col), i) == F.lit(a))
            & (F.element_at(F.col(syms_col), i + F.lit(1)) == F.lit(b)),
        ),
    ).otherwise(F.lit(False))


def apply_merge(syms_col: str, a: str, b: str) -> Column:
    """Greedy left-to-right non-overlapping application of merge (a, b) to
    a symbol array — a single JVM-side fold. The accumulator carries the
    emitted prefix plus one pending symbol; a pending ``a`` followed by
    ``b`` emits the fused symbol and clears the pending slot (so a merged
    token never re-fuses within the same pass — the reference scanner's
    i += 2). Literals go through F.lit, never SQL strings: symbols may
    contain quotes."""
    merged = a + b
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc: Column, x: Column) -> Column:
        return (
            F.when(
                acc["pend"].isNull(),
                F.struct(acc["out"].alias("out"), x.alias("pend")),
            )
            .when(
                (acc["pend"] == F.lit(a)) & (x == F.lit(b)),
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["pend"])).alias("out"),
                    x.alias("pend"),
                )
            )
        )

    def finish(acc: Column) -> Column:
        return F.when(acc["pend"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pend"]))
        )

    return F.aggregate(F.col(syms_col), init, step, finish)


def learn_bpe(
    docs: DataFrame,
    n_merges: int = 24,
    min_count: int = 2,
    text_col: str = "text",
    base: DataFrame | None = None,
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """Learn up to ``n_merges`` BPE merges; stop early when the best pair's
    corpus count drops below ``min_count``. Returns the merge table rows
    (merge_rank, left, right, merged, pair_count) and the final
    (word, cnt, syms) relation under all learned merges.

    ``base``: a precomputed initial_symbols(word_counts(...)) relation —
    pass it when the caller also consumes the base table, so the one
    corpus-sized pre-tokenize pass runs once, not per consumer
    (materialize it first, e.g. localCheckpoint).

    Incremental pair-count maintenance (module docstring): the pair
    table is loop state, updated by exact ± deltas from the words a
    merge actually touched — the full pair explode runs once, at round
    0, so the per-merge cost scales with the affected slice of the
    vocabulary and the plan stays honest at production merge budgets
    (differential-tested at n_merges=512)."""
    if base is None:
        base = initial_symbols(word_counts(docs, text_col))
    cur = base.localCheckpoint()
    pairs = pair_counts(cur).localCheckpoint()
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        top = (
            pairs.orderBy(F.desc("c"), F.asc("w1"), F.asc("w2"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] < min_count:
            break
        a, b, c = top[0]["w1"], top[0]["w2"], int(top[0]["c"])
        merges.append((rank, a, b, a + b, c))
        hit = _has_adjacent("syms", a, b)
        # ± pair deltas from the AFFECTED words only: their old
        # adjacencies leave with weight -cnt, their post-merge
        # adjacencies enter with +cnt. Everything derives from the
        # checkpointed `cur`, so the fold runs on hit rows alone.
        changed = cur.where(hit).select(
            "cnt", "syms", apply_merge("syms", a, b).alias("nsyms")
        )
        delta = pair_counts(
            changed.select(F.col("cnt"), F.col("nsyms").alias("syms"))
        ).unionByName(
            pair_counts(changed.select((-F.col("cnt")).alias("cnt"), "syms"))
        )
        pairs = (
            pairs.unionByName(delta)
            .groupBy("w1", "w2")
            .agg(F.sum("c").cast("bigint").alias("c"))
            .where(F.col("c") > 0)
            .localCheckpoint()
        )
        # Lazy CASE WHEN gates the fold behind the containment probe —
        # unaffected rows pass through without paying it.
        cur = cur.withColumn(
            "syms", F.when(hit, apply_merge("syms", a, b)).otherwise(F.col("syms"))
        ).localCheckpoint()
    return merges, cur


def learn_bpe_rescan(
    docs: DataFrame,
    n_merges: int = 24,
    min_count: int = 2,
    text_col: str = "text",
    base: DataFrame | None = None,
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """The classic full-rescan learner (re-explode + re-aggregate every
    round) — the pre-round-9 plan, kept as the differential baseline the
    incremental learner is tested against (tests/test_bpe.py). Not used
    by any query: at production merge budgets its n_merges vocabulary-
    sized shuffles are the wrong plan."""
    if base is None:
        base = initial_symbols(word_counts(docs, text_col))
    cur = base.localCheckpoint()
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        top = (
            pair_counts(cur)
            .orderBy(F.desc("c"), F.asc("w1"), F.asc("w2"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] < min_count:
            break
        a, b, c = top[0]["w1"], top[0]["w2"], int(top[0]["c"])
        merges.append((rank, a, b, a + b, c))
        cur = cur.withColumn("syms", apply_merge("syms", a, b)).localCheckpoint()
    return merges, cur

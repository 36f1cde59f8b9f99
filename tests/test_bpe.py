"""Differential tests for the distributed BPE learner (operators/bpe).

The merge sequence is not SQL-expressible, so semantic truth comes from a
pure-Python reference learner (the classic word-dict algorithm: count
adjacent pairs weighted by word frequency, fuse the most frequent with a
count-then-lexicographic tiebreak, apply greedily left-to-right
non-overlapping) compared against the Spark learner on random corpora and
on the sf0.001 documents lake. The registered queries' VALUES pins freeze
the sf0.01 output for the driver; these tests carry the semantics.
"""

from __future__ import annotations

import random
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from vectra_player_spark.operators.bpe import (
    BPE_PRETOKEN_PATTERN,
    END_OF_WORD,
    apply_merge,
    initial_symbols,
    learn_bpe,
    word_counts,
)

# ---------------------------------------------------------------------------
# Pure-Python reference implementation.
# ---------------------------------------------------------------------------


def _ref_merge_word(syms: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_learn(words: dict[str, int], n_merges: int, min_count: int):
    syms = {w: list(w) + [END_OF_WORD] for w in words}
    merges = []
    for rank in range(n_merges):
        stats: Counter = Counter()
        for w, c in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                stats[(s[i], s[i + 1])] += c
        if not stats:
            break
        (a, b), c = min(stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if c < min_count:
            break
        merges.append((rank, a, b, a + b, c))
        for w in syms:
            syms[w] = _ref_merge_word(syms[w], a, b)
    return merges, syms


def _ref_words(texts: list[str]) -> dict[str, int]:
    cnt: Counter = Counter()
    for t in texts:
        cnt.update(re.findall(BPE_PRETOKEN_PATTERN, t))
    return dict(cnt)


def _spark_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ---------------------------------------------------------------------------
# apply_merge fold == reference greedy scanner (incl. overlap cases).
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "syms,a,b",
    [
        (["a", "a", "a"], "a", "a"),  # overlapping run: non-overlapping greedy
        (["a", "b", "a", "b"], "a", "b"),
        (["a", "a", "b"], "a", "b"),
        (["x"], "a", "b"),  # no-op, single symbol
        (["a", "b"], "a", "b"),  # whole word fuses
        (["'", "s", END_OF_WORD], "'", "s"),  # quote symbol (F.lit escaping)
        (["ab", "b", "b", "ab"], "ab", "b"),  # multi-char symbols
    ],
)
def test_apply_merge_matches_reference(spark, syms, a, b):
    df = spark.createDataFrame([(syms,)], "syms array<string>")
    got = df.select(apply_merge("syms", a, b).alias("m")).collect()[0]["m"]
    assert got == _ref_merge_word(syms, a, b)


# ---------------------------------------------------------------------------
# Full learner differential: random corpora + the sf0.001 lake.
# ---------------------------------------------------------------------------


def test_learn_bpe_matches_reference_random(spark):
    rng = random.Random(41)
    alphabet = "abcde'."
    texts = [
        " ".join(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(3, 20))
        )
        for _ in range(60)
    ]
    got_merges, got_final = learn_bpe(_spark_docs(spark, texts), n_merges=12, min_count=2)
    ref_merges, ref_syms = _ref_learn(_ref_words(texts), n_merges=12, min_count=2)
    assert got_merges == ref_merges
    got_syms = {
        r["word"]: list(r["syms"]) for r in got_final.select("word", "syms").collect()
    }
    assert got_syms == ref_syms


def test_learn_bpe_matches_reference_lake(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got_merges, _ = learn_bpe(docs, n_merges=8, min_count=2)
    texts = [r["text"] for r in docs.select("text").collect() if r["text"] is not None]
    ref_merges, _ = _ref_learn(_ref_words(texts), n_merges=8, min_count=2)
    assert got_merges == ref_merges


def test_learn_bpe_min_count_stops_early(spark):
    # Every word unique, every pair count 1 -> min_count=2 learns nothing.
    texts = ["abc", "def", "ghi"]
    merges, final = learn_bpe(_spark_docs(spark, texts), n_merges=5, min_count=2)
    assert merges == []
    base = initial_symbols(word_counts(_spark_docs(spark, texts)))
    assert sorted(r["word"] for r in final.collect()) == sorted(
        r["word"] for r in base.collect()
    )


def test_word_counts_weighting(spark):
    # Pair counts must be weighted by word frequency, not distinct words:
    # 'aa' appears 3x -> its pairs count 3, beating 'bc' pairs at 2; the
    # count-3 tie between (a,a) and (a,</w>) breaks lexicographically.
    texts = ["aa aa bc", "aa bc"]
    merges, _ = learn_bpe(_spark_docs(spark, texts), n_merges=1, min_count=2)
    assert merges[0][1:3] == ("a", END_OF_WORD) and merges[0][4] == 3


def test_learn_bpe_incremental_matches_rescan(spark):
    """The maintained pair table must equal the full recount at every
    round: same merges, same final symbol tables (random corpus rich
    enough that multi-level merges and count ties both occur)."""
    from vectra_player_spark.operators.bpe import learn_bpe_rescan

    rng = random.Random(97)
    alphabet = "abcdef'.-"
    texts = [
        " ".join(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
            for _ in range(rng.randint(3, 25))
        )
        for _ in range(80)
    ]
    docs = _spark_docs(spark, texts)
    inc_merges, inc_final = learn_bpe(docs, n_merges=64, min_count=1)
    res_merges, res_final = learn_bpe_rescan(docs, n_merges=64, min_count=1)
    assert inc_merges == res_merges
    inc_syms = {
        r["word"]: list(r["syms"]) for r in inc_final.select("word", "syms").collect()
    }
    res_syms = {
        r["word"]: list(r["syms"]) for r in res_final.select("word", "syms").collect()
    }
    assert inc_syms == res_syms


def test_learn_bpe_512_merges_matches_reference(spark):
    """Production-merge-budget differential (round-9 mandate): 512 merges
    against the pure-Python reference. The corpus is built so >=512
    merges actually fire (hundreds of distinct multi-char words,
    min_count=1)."""
    rng = random.Random(13)
    alphabet = "abcdefghij"
    texts = [
        " ".join(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(2, 9)))
            for _ in range(rng.randint(5, 30))
        )
        for _ in range(120)
    ]
    docs = _spark_docs(spark, texts)
    got_merges, got_final = learn_bpe(docs, n_merges=512, min_count=1)
    ref_merges, ref_syms = _ref_learn(_ref_words(texts), n_merges=512, min_count=1)
    assert len(got_merges) == 512, "corpus too small to exercise 512 merges"
    assert got_merges == ref_merges
    got_syms = {
        r["word"]: list(r["syms"]) for r in got_final.select("word", "syms").collect()
    }
    assert got_syms == ref_syms

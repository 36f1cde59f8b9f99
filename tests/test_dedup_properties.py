"""Dedup-family property tests: statistical behavior, not just oracle
equality — minhash signature agreement estimates Jaccard; exact dups
always LSH-collide; near-dups beat unrelated docs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectra_player_spark.operators.dedup import (
    MINHASH_K,
    doc_shingles,
    exact_duplicates,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash_fingerprints,
)

VOCAB = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _doc(words):
    return " ".join(words)


@pytest.fixture(scope="module")
def corpus(spark):
    base = [VOCAB[(i * 3 + j) % len(VOCAB)] for i in range(30) for j in (0, 1)]
    docs = [
        (0, _doc(base)),                       # original
        (1, _doc(base)),                       # exact duplicate
        (2, _doc(base[:50] + ["omega"] * 10)), # near duplicate (~80% overlap)
        (3, _doc([VOCAB[(7 * i) % 10] + "x" for i in range(60)])),  # unrelated
    ]
    return spark.createDataFrame(docs, "doc_id long, text string")


def _true_jaccard(spark_df, a, b):
    sh = doc_shingles(spark_df).toPandas()
    sa = set(sh[sh.doc_id == a].shingle)
    sb = set(sh[sh.doc_id == b].shingle)
    return len(sa & sb) / len(sa | sb)


def test_exact_duplicates_group(corpus):
    groups = exact_duplicates(corpus).collect()
    dup_group = [g for g in groups if g.n_dups == 2]
    assert len(dup_group) == 1
    assert dup_group[0].keeper_doc_id == 0


def test_identical_docs_always_lsh_collide(corpus):
    pairs = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(corpus).collect()}
    assert (0, 1) in pairs  # identical signatures -> every band collides
    assert (0, 3) not in pairs and (1, 3) not in pairs  # unrelated never


def test_signature_agreement_tracks_jaccard(corpus):
    sigs = {r.doc_id: [r[f"h{i}"] for i in range(MINHASH_K)] for r in
            minhash_signatures(corpus).collect()}
    agree_near = sum(a == b for a, b in zip(sigs[0], sigs[2])) / MINHASH_K
    agree_far = sum(a == b for a, b in zip(sigs[0], sigs[3])) / MINHASH_K
    j_near = _true_jaccard(corpus, 0, 2)
    assert j_near > 0.3
    # K=8 is coarse; assert ordering + ballpark rather than tight bounds
    assert agree_near > agree_far
    assert agree_far <= 0.25
    assert abs(agree_near - j_near) < 0.5


def test_simhash_hamming_ordering(corpus):
    fps = {r.doc_id: r.simhash for r in simhash_fingerprints(corpus).collect()}
    assert fps[0] == fps[1]  # identical docs -> identical fingerprints

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(fps[0], fps[2]) < hamming(fps[0], fps[3])


def test_simhash_banded_recall_is_exact(corpus):
    """Pigeonhole guarantee: for k < bands the byte-banded candidate join
    finds EXACTLY the brute-force hamming<=k pairs."""
    from vectra_player_spark.operators.dedup import simhash_neardup_pairs

    fps = {r.doc_id: r.simhash for r in simhash_fingerprints(corpus).collect()}

    def hamming(a, b):
        return bin(a ^ b).count("1")

    for k in (0, 1, 3):
        brute = {
            (a, b)
            for a in fps
            for b in fps
            if a < b and hamming(fps[a], fps[b]) <= k
        }
        banded = {
            (r.doc_a, r.doc_b)
            for r in simhash_neardup_pairs(corpus, k=k).collect()
        }
        assert banded == brute, f"k={k}"

    with pytest.raises(ValueError):
        simhash_neardup_pairs(corpus, k=4, bands=4)


def test_compaction_roundtrip(spark, tmp_path):
    """S6: multi-file partition compacts to one file, rows intact."""
    import glob

    from vectra_player_spark.sources.event_lake import (
        compact_partition,
        normalize_envelope,
        read_event_lake,
        write_event_lake,
    )

    path = str(tmp_path / "lake")
    for batch in range(3):  # three appends -> multiple files per partition
        raw = spark.createDataFrame(
            [
                {
                    "ts": "2026-01-10T00:00:00+00:00", "source": "cdp",
                    "doc_type": "game_tick", "session_id": "s",
                    "seq": batch * 10 + i, "direction": "received",
                    "raw_json": "{}", "game_id": "g1",
                }
                for i in range(5)
            ]
        )
        write_event_lake(normalize_envelope(raw), path)
    part = f"{path}/doc_type=game_tick/date=2026-01-10"
    assert len(glob.glob(f"{part}/*.parquet")) >= 3
    compact_partition(spark, path, "game_tick", "2026-01-10", target_files=1)
    assert len(glob.glob(f"{part}/*.parquet")) == 1
    assert read_event_lake(spark, path, doc_type="game_tick").count() == 15


# --------------------------------------------------------------------------
# Banded-hyperplane LSH near-dup (embedding_neardup_lsh) guarantees:
# candidates are a subset of the exact label-blocked pairs, and pairs that
# are duplicates after rounding (cosine 1.0) collide in every band, so the
# scale path never loses a true duplicate.
# --------------------------------------------------------------------------


def test_embedding_lsh_subset_and_exact_dup_recall(spark, sf_dir):
    from vectra_player_spark import plans

    exact = plans.QUERIES["embedding_neardup_pairs"].spark_fn(spark, sf_dir).toPandas()
    lsh = plans.QUERIES["embedding_neardup_lsh"].spark_fn(spark, sf_dir).toPandas()
    exact_pairs = set(zip(exact.vec_a, exact.vec_b))
    lsh_pairs = set(zip(lsh.vec_a, lsh.vec_b))
    assert exact_pairs, "fixture should produce at least one near-dup pair"
    assert lsh_pairs <= exact_pairs
    true_dups = {
        (r.vec_a, r.vec_b) for r in exact.itertuples() if r.cosine_sim >= 1.0
    }
    assert true_dups <= lsh_pairs


def test_connected_components_known_graph(spark):
    from vectra_player_spark.operators.dedup import connected_components

    # path 1-2-3 plus isolated pair 10-11: two components, min-id keepers
    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (10, 11)], "vec_a long, vec_b long"
    )
    got = {
        (r.node_id, r.component)
        for r in connected_components(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_collapse_first_canonical_equals_direct(spark, tmp_path):
    """doc_dedup_canonical collapses exact dups before the LSH pair stage;
    its oracle runs pairs over ALL docs. The two must agree even on the
    edge the real corpus may lack: exact-dup groups of SHORT docs
    (< 3 tokens — no shingles, never LSH-paired, so the direct form leaves
    them as singletons while a naive collapse would merge them)."""
    import duckdb
    import pandas as pd

    from tests.oracle_harness import compare
    from vectra_player_spark import plans

    base = " ".join(VOCAB[(i * 3) % len(VOCAB)] for i in range(40))
    near = " ".join(VOCAB[(i * 3) % len(VOCAB)] for i in range(36)) + " omega omega"
    docs = pd.DataFrame(
        {
            "doc_id": range(10),
            "lang": ["en"] * 10,
            "source": ["s"] * 10,
            "n_chars": [1] * 10,
            "text": [
                base, base, base,        # exact-dup clique, shingled
                near,                    # near-dup of the clique via LSH
                "tiny doc", "tiny doc",  # exact-dup SHORT group: singletons
                "x", "",                 # short singletons
                " ".join(VOCAB[(7 * i) % 10] + "q" for i in range(50)),  # unrelated
                base + " extra tail words here",
            ],
        }
    )
    sf = str(tmp_path)
    docs.to_parquet(f"{sf}/documents.parquet", index=False)
    spec = plans.QUERIES["doc_dedup_canonical"]
    got = spec.spark_fn(spark, sf).toPandas().sort_values("doc_id")
    # short exact dups stay singletons (each its own keeper)
    by_id = got.set_index("doc_id")
    assert by_id.loc[4, "canonical_id"] == 4 and bool(by_id.loc[4, "is_keeper"])
    assert by_id.loc[5, "canonical_id"] == 5 and bool(by_id.loc[5, "is_keeper"])
    # shingled exact-dup clique collapses to min id
    assert set(by_id.loc[[0, 1, 2], "canonical_id"]) == {0}
    # full agreement with the direct all-docs oracle
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    oracle_pdf = con.execute(spec.oracle).df()
    problems = compare(spec.spark_fn(spark, sf), oracle_pdf)
    assert not problems, problems


def test_ngram_jaccard_posting_cap_binds_and_logs(spark, caplog):
    """max_doc_freq drop semantics where the cap actually BINDS (the
    test lakes never reach NGRAM_MAX_DOC_FREQ, so the registered query
    witnesses only the non-binding delta=0 case): raw document frequency
    counts every duplicate copy (rep shingles weighted by group size),
    dropped shingles stop contributing to pair scores, and the drop is
    logged — the no-silent-caps accounting. Checked against a plain
    per-doc Python reference of the same capped semantics."""
    import itertools
    import logging

    from vectra_player_spark.operators.dedup import ngram_jaccard_pairs

    t0 = "a b c d e f"          # shingles: abc bcd cde def
    t4 = "a b c x y z"          # shares only 'a b c' with t0
    t5 = "p q r s t u"          # unrelated
    rows = [(0, t0), (1, t0), (2, t0), (3, t0), (4, t4), (5, t5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def reference(cap):
        sh = {
            i: {" ".join(txt.split()[j : j + 3]) for j in range(len(txt.split()) - 2)}
            for i, txt in rows
        }
        df = {}
        for s in set().union(*sh.values()):
            df[s] = sum(1 for v in sh.values() if s in v)
        kept = {
            i: {s for s in v if cap is None or df[s] <= cap}
            for i, v in sh.items()
        }
        out = set()
        for a, b in itertools.combinations(sorted(kept), 2):
            if not kept[a] and not kept[b]:
                continue
            inter = len(kept[a] & kept[b])
            union = len(kept[a] | kept[b])
            if union and inter / union >= 0.1:
                out.add((a, b, round(inter / union, 6)))
        return out

    for cap in (None, 4):
        with caplog.at_level(logging.WARNING, "vectra_player_spark.dedup"):
            caplog.clear()
            got = {
                (r.doc_a, r.doc_b, r.jaccard)
                for r in ngram_jaccard_pairs(
                    docs, threshold=0.1, max_doc_freq=cap
                ).collect()
            }
        assert got == reference(cap), (cap, got, reference(cap))
        dropped_logged = any("dropped" in m for m in caplog.messages)
        assert dropped_logged == (cap == 4)
    # raw-df weighting: 'a b c' appears in 4 dup copies + doc 4 → df 5 > 4,
    # so the capped run must lose exactly the (t0-group × doc 4) pairs
    assert {(p[0], p[1]) for p in reference(None)} - {
        (p[0], p[1]) for p in reference(4)
    } == {(0, 4), (1, 4), (2, 4), (3, 4)}


def test_simhash_stats_equals_aggregated_enumeration(spark):
    """The enumeration-free (hamming, n_pairs, sum_ids) form must equal
    aggregating the pair LISTING, on a corpus with real duplication so
    the group algebra (s_a*s_b pairs, s_b*m_a + s_a*m_b id sums, C(s,2)
    intra pairs) is exercised — the 100× consumer-arm contract."""
    from collections import defaultdict

    from vectra_player_spark.operators.dedup import (
        rep_members,
        simhash_fingerprints,
        simhash_neardup_pairs,
        simhash_neardup_stats,
    )
    from vectra_player_spark.functions.text import fingerprint

    t0 = "alpha beta gamma delta"
    t1 = "alpha beta gamma zeta"     # near t0 in simhash space (maybe)
    t2 = "totally different words here"
    rows = [(10, t0), (11, t0), (12, t0), (20, t1), (21, t1), (30, t2), (31, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    listed = simhash_neardup_pairs(docs, k=3, bands=4).collect()
    want = defaultdict(lambda: [0, 0])
    for r in listed:
        want[r.hamming][0] += 1
        want[r.hamming][1] += r.doc_a + r.doc_b
    reps, members = rep_members(
        docs.select("doc_id", "text"), "doc_id", [fingerprint("text")]
    )
    got = {
        r.hamming: (r.n_pairs, int(r.sum_ids))
        for r in simhash_neardup_stats(
            simhash_fingerprints(reps), members, k=3, bands=4
        ).collect()
    }
    assert got == {h: tuple(v) for h, v in want.items()}
    assert sum(v[0] for v in want.values()) >= 4  # dup groups did pair


# --------------------------------------------------------------------------
# dup_spans: any-alignment duplicated-substring spans
# --------------------------------------------------------------------------


class TestDupSpans:
    def _spans(self, spark, docs, k=4):
        from vectra_player_spark.operators.dedup import dup_spans

        df = spark.createDataFrame(docs, "doc_id long, text string")
        rows = dup_spans(df, k=k).collect()
        return {(r.doc_id, r.span_start, r.span_end, r.span_len) for r in rows}

    def test_cross_doc_passage_any_alignment(self, spark):
        # 6-token passage shared across two docs at DIFFERENT offsets —
        # the fixed-grid chunk dedup misses this; the sliding window must not.
        passage = "p1 p2 p3 p4 p5 p6"
        docs = [
            (0, f"a0 a1 {passage} a2 a3"),          # passage at pos 2..7
            (1, f"b0 b1 b2 {passage} b3 b4 b5"),    # passage at pos 3..8
        ]
        spans = self._spans(spark, docs, k=4)
        # k=4 windows inside the passage: exactly positions [2..7]/[3..8]
        assert spans == {(0, 2, 7, 6), (1, 3, 8, 6)}

    def test_within_doc_repeat_counts(self, spark):
        # a doc repeating its own phrase is duplicated (suffix-array
        # criterion: ANY second occurrence, same doc included)
        docs = [(0, "x1 x2 x3 x4 mid1 mid2 x1 x2 x3 x4")]
        spans = self._spans(spark, docs, k=4)
        assert spans == {(0, 0, 3, 4), (0, 6, 9, 4)}

    def test_overlapping_windows_merge_to_maximal_span(self, spark):
        # two docs sharing an 8-token run -> five overlapping k=4 windows
        # merge into ONE maximal span, not five
        run = "r1 r2 r3 r4 r5 r6 r7 r8"
        docs = [(0, f"{run} u1 u2"), (1, f"v1 {run} v2")]
        spans = self._spans(spark, docs, k=4)
        assert spans == {(0, 0, 7, 8), (1, 1, 8, 8)}

    def test_adjacent_spans_merge_distinct_spans_do_not(self, spark):
        # doc 0 carries two shared runs separated by a unique gap longer
        # than k-1 tokens: two separate spans
        docs = [
            (0, "s1 s2 s3 s4 g1 g2 g3 g4 g5 t1 t2 t3 t4"),
            (1, "s1 s2 s3 s4 z1 z2 z3 z4 z5 t1 t2 t3 t4"),
        ]
        spans = self._spans(spark, docs, k=4)
        assert spans == {
            (0, 0, 3, 4), (0, 9, 12, 4),
            (1, 0, 3, 4), (1, 9, 12, 4),
        }

    def test_short_docs_and_unique_docs_emit_nothing(self, spark):
        from vectra_player_spark.operators.dedup import dup_span_stats

        docs = [(0, "only two"), (1, "w1 w2 w3 w4 w5 w6 all unique here")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        rows = {r.doc_id: r for r in dup_span_stats(df, k=4).collect()}
        assert set(rows) == {0, 1}  # short doc still reports a zero row
        assert rows[0].n_dup_spans == 0 and rows[0].dup_tokens == 0
        assert rows[0].dup_frac == 0.0 and rows[0].n_tokens == 2
        assert rows[1].n_dup_spans == 0

    def test_stats_match_span_algebra(self, spark):
        from vectra_player_spark.operators.dedup import dup_span_stats

        run = "c1 c2 c3 c4 c5"
        docs = [
            (0, f"{run} u1 u2 u3 {run}"),  # repeat within + across
            (1, f"{run} w1 w2 w3 w4 w5"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        rows = {r.doc_id: r for r in dup_span_stats(df, k=4).collect()}
        assert rows[0].n_dup_spans == 2 and rows[0].dup_tokens == 10
        assert rows[0].max_span_len == 5 and rows[0].n_tokens == 13
        assert abs(rows[0].dup_frac - round(10 / 13, 6)) < 1e-9
        assert rows[1].n_dup_spans == 1 and rows[1].dup_tokens == 5


class TestSemanticDedup:
    def test_keep_rule_and_components(self, spark):
        # hand-built geometry: cell 0 along +x, cell 1 along +y.
        # a/b/c near-identical (pairwise cos ~1); d unrelated in the same
        # cell; e alone in cell 1.
        from vectra_player_spark.operators.dedup import semantic_dedup

        emb = spark.createDataFrame(
            [
                (0, [1.0, 0.02, 0.0]),   # group, closest to centroid
                (1, [1.0, 0.00, 0.0]),   # group, LEAST central -> keeper
                (2, [1.0, 0.01, 0.0]),   # group
                (3, [0.6, 0.0, 0.8]),    # same cell, not a near-dup
                (4, [0.0, 1.0, 0.0]),    # cell 1 singleton
            ],
            "vec_id long, embedding array<double>",
        )
        centroids = spark.createDataFrame(
            [(0, [1.0, 0.02, 0.1]), (1, [0.0, 1.0, 0.0])],
            "cell_id int, centroid array<double>",
        )
        rows = {r.vec_id: r for r in semantic_dedup(emb, centroids, tau=0.99).collect()}
        assert [rows[i].cell_id for i in range(5)] == [0, 0, 0, 0, 1]
        # one component {0,1,2} labeled by min id
        assert rows[0].component == rows[1].component == rows[2].component == 0
        assert rows[3].component == 3 and rows[4].component == 4
        # keep rule: the member least similar to the centroid survives
        group_sims = {i: rows[i].cent_sim for i in (0, 1, 2)}
        keeper = min(group_sims, key=lambda i: (group_sims[i], i))
        assert keeper == 1
        assert [rows[i].keep for i in range(5)] == [False, True, False, True, True]

    def test_stored_assignments_match_direct(self, spark):
        # routed (id, cell_id) arm == compute-direct arm
        from vectra_player_spark.operators.dedup import semantic_dedup
        from vectra_player_spark.operators.knn import assign_cells

        import random

        rng = random.Random(7)
        emb = spark.createDataFrame(
            [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)],
            "vec_id long, embedding array<double>",
        )
        centroids = spark.createDataFrame(
            [(c, [rng.uniform(-1, 1) for _ in range(8)]) for c in range(4)],
            "cell_id int, centroid array<double>",
        )
        stored = assign_cells(emb, centroids).select("vec_id", "cell_id")
        direct = sorted(
            map(tuple, semantic_dedup(emb, centroids, tau=0.5).collect())
        )
        routed = sorted(
            map(tuple, semantic_dedup(emb, centroids, stored, tau=0.5).collect())
        )
        assert direct == routed


class TestDupSpanClean:
    def test_removal_complements_stats(self, spark):
        import hashlib

        from vectra_player_spark.operators.dedup import dup_span_clean, dup_span_stats

        run = "c1 c2 c3 c4 c5"
        docs = [
            (0, f"{run} u1 u2 u3 {run}"),   # both copies removed
            (1, f"{run} w1 w2 w3 w4 w5"),
            (2, "z1 z2 z3"),                # short doc untouched
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        clean = {r.doc_id: r for r in dup_span_clean(df, k=4).collect()}
        stats = {r.doc_id: r for r in dup_span_stats(df, k=4).collect()}
        for i in range(3):
            assert clean[i].n_kept_tokens == stats[i].n_tokens - stats[i].dup_tokens
        md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
        assert clean[0].clean_hash == md5("u1 u2 u3")
        assert clean[1].clean_hash == md5("w1 w2 w3 w4 w5")
        assert clean[2].clean_hash == md5("z1 z2 z3")

    def test_fully_duplicated_doc_yields_null_hash(self, spark):
        from vectra_player_spark.operators.dedup import dup_span_clean

        docs = [(0, "a1 a2 a3 a4"), (1, "a1 a2 a3 a4")]
        clean = {r.doc_id: r for r in dup_span_clean(
            spark.createDataFrame(docs, "doc_id long, text string"), k=4).collect()}
        assert clean[0].n_kept_tokens == 0 and clean[0].clean_hash is None
        assert clean[1].n_kept_tokens == 0 and clean[1].clean_hash is None


class TestDupSpanRepCollapse:
    def test_verbatim_copies_share_spans_and_weighted_counts(self, spark):
        # d=3 verbatim copies + one doc sharing only a 4-token run + one
        # unique doc: collapse-first must reproduce raw-count semantics —
        # a gram occurring once in rep space but with weight 3 is duplicated
        from vectra_player_spark.operators.dedup import (
            dup_span_clean,
            dup_span_stats,
            dup_spans,
        )

        base = "s1 s2 s3 s4 u1 u2 u3 u4"
        docs = [
            (0, base), (1, base), (2, base),      # 3 verbatim copies
            (3, "x1 s1 s2 s3 s4 x2 x3 x4"),       # shares the 4-token run
            (4, "q1 q2 q3 q4 q5 q6 q7 q8"),       # unique
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        spans = {(r.doc_id, r.span_start, r.span_end) for r in dup_spans(df, k=4).collect()}
        # copies are duplicated wall to wall (every window has weight 3);
        # doc 3 only over the shared run; doc 4 clean
        assert spans == {(0, 0, 7), (1, 0, 7), (2, 0, 7), (3, 1, 4)}
        stats = {r.doc_id: r for r in dup_span_stats(df, k=4).collect()}
        assert [stats[i].dup_tokens for i in range(5)] == [8, 8, 8, 4, 0]
        assert stats[0].dup_frac == 1.0 and stats[4].n_dup_spans == 0
        clean = {r.doc_id: r for r in dup_span_clean(df, k=4).collect()}
        assert clean[0].clean_hash is None and clean[0].n_kept_tokens == 0
        assert clean[1].clean_hash is None and clean[2].clean_hash is None
        assert clean[3].n_kept_tokens == 4 and clean[4].n_kept_tokens == 8

    def test_case_variants_do_not_collapse(self, spark):
        # the collapse key is raw md5(text) — a case variant is a DIFFERENT
        # text whose grams must not merge with the original's
        from vectra_player_spark.operators.dedup import dup_span_stats

        docs = [(0, "a1 a2 a3 a4"), (1, "A1 a2 a3 a4")]
        stats = {r.doc_id: r for r in dup_span_stats(
            spark.createDataFrame(docs, "doc_id long, text string"), k=4).collect()}
        assert stats[0].dup_tokens == 0 and stats[1].dup_tokens == 0


class TestDupSpanDifferential:
    """Randomized differential test: dup_spans vs a brute-force python
    reference (count every k-window occurrence corpus-wide, cover, merge)."""

    @staticmethod
    def _reference(texts, k):
        from collections import Counter

        toks = {i: t.split() for i, t in texts.items()}
        counts = Counter()
        for tl in toks.values():
            for i in range(max(len(tl) - k + 1, 0)):
                counts[" ".join(tl[i : i + k])] += 1
        spans = set()
        for doc, tl in toks.items():
            covered = sorted(
                i
                for i in range(max(len(tl) - k + 1, 0))
                if counts[" ".join(tl[i : i + k])] >= 2
            )
            # merge overlap/adjacency of [i, i+k-1] windows
            cur = None
            for p in covered:
                if cur is not None and p <= cur[1] + 1:
                    cur = (cur[0], p + k - 1)
                else:
                    if cur is not None:
                        spans.add((doc, cur[0], cur[1]))
                    cur = (p, p + k - 1)
            if cur is not None:
                spans.add((doc, cur[0], cur[1]))
        return spans

    def test_random_corpora_match_reference(self, spark):
        import random

        from vectra_player_spark.operators.dedup import dup_spans

        rng = random.Random(20260816)
        vocab = [f"w{j}" for j in range(12)]  # small vocab -> real collisions
        for trial in range(4):
            n_docs = rng.randint(4, 10)
            texts = {}
            i = 0
            while i < n_docs:
                words = [rng.choice(vocab) for _ in range(rng.randint(1, 40))]
                texts[i] = " ".join(words)
                i += 1
                # sprinkle verbatim copies to exercise the rep collapse
                if rng.random() < 0.3 and i < n_docs:
                    texts[i] = texts[i - 1]
                    i += 1
            df = spark.createDataFrame(
                list(texts.items()), "doc_id long, text string"
            )
            got = {
                (r.doc_id, r.span_start, r.span_end)
                for r in dup_spans(df, k=4).collect()
            }
            want = self._reference(texts, 4)
            assert got == want, f"trial {trial}: {got ^ want}"


class TestGramCountMergeability:
    def test_split_counts_merge_to_union_counts(self, spark):
        # verbatim copies STRADDLE the split: doc 0 (half A) == doc 5
        # (half B), so each half's rep collapse sees a different weight —
        # the merged weighted counts must still equal the union's
        from pyspark.sql import functions as F

        from vectra_player_spark.operators.dedup import dup_gram_counts

        base = "s1 s2 s3 s4 s5 s6"
        docs = [
            (0, base), (1, "a1 a2 a3 a4 a5"), (2, base),
            (5, base), (6, "b1 b2 b3 b4 b5"), (7, "a1 a2 a3 a4 a5"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        half_a = df.where(F.col("doc_id") < 5)
        half_b = df.where(F.col("doc_id") >= 5)

        def counts(frame):
            return {
                (r.gh.h1, r.gh.h2): r.n_occurrences
                for r in dup_gram_counts(frame, k=4).collect()
            }

        ca, cb, cu = counts(half_a), counts(half_b), counts(df)
        merged = {gh: ca.get(gh, 0) + cb.get(gh, 0) for gh in set(ca) | set(cb)}
        assert merged == cu
        # the merged table reproduces the union's dup verdicts: base's
        # grams occur 3x, a-doc grams 2x (one per half), b-doc grams once
        assert sorted(cu.values()) == sorted(merged.values())
        assert max(cu.values()) == 3 and min(cu.values()) == 1


def test_cdc_chunking_shift_invariance(spark, sf_dir):
    """The CDC scheme's reason to exist: the one-token-prepended probe
    twin shares MOST of its content-defined chunks with the base doc,
    while the fixed grid shares none (every boundary moved)."""
    from vectra_player_spark import plans

    rows = {
        r["variant"]: r
        for r in plans.QUERIES["doc_cdc_chunking_report"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert rows["fixed"]["probe_shared_chunks"] == 0
    assert rows["cdc"]["probe_shared_chunks"] >= 5
    for r in rows.values():
        assert r["n_chunks"] >= r["n_distinct_chunks"]

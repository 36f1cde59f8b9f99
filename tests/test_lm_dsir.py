"""Unit/differential tests for the LM-perplexity + DSIR curation family
(plans/queries_lm) and the cross-corpus incremental dedup operator
(operators/dedup.crosscorpus_neardup_counts).

The oracle comparisons run in the registry-wide gates; these tests pin
the SEMANTICS on constructed corpora: exact closed-form scores for
unseen-token docs, ordering properties the smoothing must produce, and
a brute-force python reference for the enumeration-free candidate
counts (which the collapse-first rep-space computation must equal
exactly, duplicates included)."""

from __future__ import annotations

import hashlib
import math
import random

from pyspark.sql import functions as F


def _coin(salt: str, doc_id: int) -> float:
    return (
        int(hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:8], 16)
        / 4294967296.0
    )


def _ids_where(salt: str, pred, n: int, start: int = 0) -> list[int]:
    out = []
    i = start
    while len(out) < n:
        if pred(_coin(salt, i)):
            out.append(i)
        i += 1
    return out


class TestLmPerplexity:
    def test_unseen_token_doc_scores_exact_uniform_floor(self, spark):
        from vectra_player_spark.plans.queries_lm import (
            _LM_REF_FRAC,
            lm_perdoc_scores,
        )

        ref_ids = _ids_where("lmref", lambda u: u < _LM_REF_FRAC, 2)
        held_ids = _ids_where("lmref", lambda u: u >= _LM_REF_FRAC, 2)
        train = "a b c a b c a b"  # vocab {a,b,c} -> V = 3
        rows = [
            (ref_ids[0], "en", train),
            (ref_ids[1], "en", "a b a b"),
            (held_ids[0], "en", "z1 z2 z3"),  # every bigram unseen
            (held_ids[1], "en", train),  # verbatim in-distribution
        ]
        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        got = {r.doc_id: r for r in lm_perdoc_scores(df).collect()}

        v = 3  # distinct ref tokens
        p_floor = 0.05 * (1.0 / (v + 1.0))
        lp_micro = math.floor(math.log(p_floor) * 1e6 + 0.5)
        assert got[held_ids[0]].n_scored == 2
        assert got[held_ids[0]].xent_micro == -lp_micro
        # the in-distribution doc must score far better than the floor
        assert got[held_ids[1]].xent_micro < got[held_ids[0]].xent_micro

    def test_identical_docs_get_identical_scores(self, spark):
        from vectra_player_spark.plans.queries_lm import lm_perdoc_scores

        rows = [(i, "en", "x y z x y") for i in range(6)]
        got = lm_perdoc_scores(
            spark.createDataFrame(rows, "doc_id long, lang string, text string")
        ).collect()
        assert len(got) == 6
        assert len({(r.n_scored, r.xent_micro) for r in got}) == 1


class TestCcnetBuckets:
    def test_tertiles_partition_the_scored_corpus(self, spark, sf_dir):
        from vectra_player_spark.plans.registry import QUERIES

        per = QUERIES["doc_lm_perplexity"].spark_fn(spark, sf_dir).collect()
        buckets = QUERIES["doc_ccnet_buckets"].spark_fn(spark, sf_dir).collect()
        assert sum(r.n_docs for r in buckets) == len(per)
        by_bucket: dict[str, int] = {}
        for r in buckets:
            by_bucket[r.bucket] = by_bucket.get(r.bucket, 0) + r.n_docs
        assert set(by_bucket) == {"head", "middle", "tail"}
        # NTILE(3): bucket totals differ by at most 1
        assert max(by_bucket.values()) - min(by_bucket.values()) <= 1


class TestDsir:
    def test_target_like_raw_doc_outweighs_raw_like(self, spark):
        from vectra_player_spark.plans.queries_lm import (
            _DSIR_TGT_FRAC,
            dsir_weight_table,
        )

        tgt_ids = _ids_where("dsirtgt", lambda u: u < _DSIR_TGT_FRAC, 4)
        raw_ids = _ids_where("dsirtgt", lambda u: u >= _DSIR_TGT_FRAC, 6)
        rows = [(i, "s", "ta tb tc ta tb tc ta tb") for i in tgt_ids]
        # raw bulk uses a disjoint vocabulary
        rows += [(i, "s", "ra rb rc ra rb rc ra rb") for i in raw_ids[:4]]
        probe_tgtlike, probe_rawlike = raw_ids[4], raw_ids[5]
        rows += [
            (probe_tgtlike, "s", "ta tb tc ta tb"),
            (probe_rawlike, "s", "ra rb rc ra rb"),
        ]
        got = {
            r.doc_id: r
            for r in dsir_weight_table(
                spark.createDataFrame(
                    rows, "doc_id long, source string, text string"
                )
            ).collect()
        }
        assert got[probe_tgtlike].is_target == 0
        assert got[probe_rawlike].is_target == 0
        assert got[probe_tgtlike].logw_micro > got[probe_rawlike].logw_micro
        # weights are exact integer sums of per-bucket values: identical
        # feature bags => identical weights
        assert got[probe_tgtlike].n_feats == got[probe_rawlike].n_feats == 4

    def test_resample_ranks_contiguous_and_raw_only(self, spark, sf_dir):
        from vectra_player_spark.plans.queries_lm import _DSIR_K
        from vectra_player_spark.plans.registry import QUERIES

        w = QUERIES["doc_dsir_weights"].spark_fn(spark, sf_dir)
        n_raw = w.where(F.col("is_target") == 0).count()
        sel = QUERIES["doc_dsir_resample"].spark_fn(spark, sf_dir).collect()
        assert len(sel) == min(_DSIR_K, n_raw)
        assert sorted(r.rank for r in sel) == list(range(1, len(sel) + 1))
        tgt_ids = {
            r.doc_id
            for r in w.where(F.col("is_target") == 1).select("doc_id").collect()
        }
        assert not ({r.doc_id for r in sel} & tgt_ids)


class TestCrossCorpusDifferential:
    """Brute-force python reference: per-doc signatures computed directly
    (no rep collapse), candidates = exact fingerprint matches ∪ band
    collisions between the new and old slices."""

    @staticmethod
    def _reference(texts: dict[int, str], new_ids: set[int]) -> dict[int, int]:
        from vectra_player_spark.operators.dedup import (
            MINHASH_AB,
            MINHASH_P,
        )

        def fp(t: str) -> str:
            norm = " ".join(t.lower().strip().split())
            return hashlib.md5(norm.encode()).hexdigest()

        def sig(t: str):
            toks = t.strip().split()
            shingles = {
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            }
            if not shingles:
                return None
            hv = [
                int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
                for s in shingles
            ]
            mins = [min((a * h + b) % MINHASH_P for h in hv) for a, b in MINHASH_AB]
            return [
                (i, f"{mins[2 * i]}|{mins[2 * i + 1]}") for i in range(4)
            ]

        fps = {i: fp(t) for i, t in texts.items()}
        sigs = {i: sig(t) for i, t in texts.items()}
        out = {}
        for n in new_ids:
            cnt = 0
            for o in texts:
                if o == n or o in new_ids:
                    continue
                hit = fps[n] == fps[o]
                if not hit and sigs[n] is not None and sigs[o] is not None:
                    hit = bool(set(sigs[n]) & set(sigs[o]))
                cnt += hit
            out[n] = cnt
        return out

    def test_random_corpora_match_reference(self, spark):
        from vectra_player_spark.operators.dedup import crosscorpus_neardup_counts

        rng = random.Random(20260817)
        vocab = [f"w{j}" for j in range(8)]  # tiny vocab -> real collisions
        for trial in range(4):
            n_docs = rng.randint(6, 14)
            texts: dict[int, str] = {}
            i = 0
            while i < n_docs:
                ln = rng.choice([1, 2, 4, 8, 15])  # include shingle-less docs
                texts[i] = " ".join(rng.choice(vocab) for _ in range(ln))
                i += 1
                if rng.random() < 0.4 and i < n_docs:  # verbatim duplicates
                    texts[i] = texts[i - 1]
                    i += 1
                elif rng.random() < 0.3 and i < n_docs:
                    # CASE VARIANT: same normalized fingerprint (exact
                    # candidate), different raw text (different minhash
                    # signature) — the two-key collapse must keep both
                    # arms exact
                    texts[i] = texts[i - 1].upper()
                    i += 1
            new_ids = {i for i in texts if rng.random() < 0.4}
            rows = [(i, t, int(i in new_ids)) for i, t in texts.items()]
            df = spark.createDataFrame(
                rows, "doc_id long, text string, is_new int"
            )
            got = {
                r.doc_id: (r.n_old_candidates, r.is_dup)
                for r in crosscorpus_neardup_counts(
                    df, F.col("is_new") == 1
                ).collect()
            }
            want = self._reference(texts, new_ids)
            assert got == {
                k: (v, int(v > 0)) for k, v in want.items()
            }, f"trial {trial}"

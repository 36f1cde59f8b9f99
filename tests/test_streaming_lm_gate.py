"""Streaming LM admission gate (streaming/lm_gate): scores must equal the
batch query's core against the same store, routing must partition the
feed, a mid-stream store APPEND must change the next batch's model (the
fresh-read-per-batch discipline), and batch replay must be idempotent."""

from __future__ import annotations

import json

from pyspark.sql import functions as F


def _mk_counts(spark, docs_rows, path):
    from vectra_player_spark.plans.queries_lm import lm_model_counts

    df = spark.createDataFrame(
        docs_rows, "doc_id long, lang string, text string"
    )
    lm_model_counts(df).write.mode("overwrite").parquet(path)
    return df


class TestLmGate:
    def test_routes_and_matches_batch_core(self, spark, tmp_path):
        from vectra_player_spark.plans.queries_lm import lm_perdoc_scores
        from vectra_player_spark.streaming.lm_gate import lm_gate_stream

        counts = str(tmp_path / "lm_counts")
        # train on an in-distribution corpus: "a b c" grams are cheap
        ref_rows = [(i, "en", "a b c a b c a b") for i in range(40)]
        _mk_counts(spark, ref_rows, counts)

        src = tmp_path / "feed"
        src.mkdir()
        feed = [
            {"doc_id": 100, "lang": "en", "text": "a b c a b c"},  # head
            {"doc_id": 101, "lang": "en", "text": "zz qq rr ss"},  # unseen
            {"doc_id": 102, "lang": "en", "text": "one"},  # unscorable
        ]
        with open(src / "a.jsonl", "w") as f:
            for r in feed:
                f.write(json.dumps(r) + "\n")

        # threshold between the in-distribution score and the uniform floor
        model = spark.read.parquet(counts).groupBy("lang", "w1", "w2").agg(
            F.sum("c").cast("bigint").alias("c")
        )
        batch_scores = {
            r.doc_id: r.xent_micro
            for r in lm_perdoc_scores(
                spark.createDataFrame(
                    [(r["doc_id"], r["lang"], r["text"]) for r in feed],
                    "doc_id long, lang string, text string",
                ),
                model=model,
            ).collect()
        }
        assert batch_scores[100] < batch_scores[101]
        thr = int((batch_scores[100] + batch_scores[101]) // 2)

        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        stream = spark.readStream.schema(
            "doc_id long, lang string, text string"
        ).json(str(src))
        q = lm_gate_stream(stream, counts, out, ckpt, thr)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        acc = spark.read.parquet(f"{out}/accepted").collect()
        rej = spark.read.parquet(f"{out}/rejected").collect()
        assert {r.doc_id for r in acc} == {100}
        assert {r.doc_id for r in rej} == {101, 102}
        # the streamed scores ARE the batch core's scores
        for r in acc + rej:
            assert r.xent_micro == batch_scores.get(r.doc_id)

    def test_store_append_changes_next_batch_model(self, spark, tmp_path):
        """The gate must see counts appended AFTER stream start: vocab
        that was OOV in batch 1 scores as in-distribution in batch 2 once
        the ingest spine appends its partial counts."""
        from vectra_player_spark.plans.queries_lm import lm_model_counts
        from vectra_player_spark.streaming.lm_gate import lm_gate_stream

        counts = str(tmp_path / "lm_counts")
        _mk_counts(
            spark, [(i, "en", "a b a b a b") for i in range(40)], counts
        )
        probe = {"doc_id": 200, "lang": "en", "text": "x y x y x y"}

        src = tmp_path / "feed"
        src.mkdir()
        with open(src / "a.jsonl", "w") as f:
            f.write(json.dumps(probe) + "\n")

        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        stream = spark.readStream.schema(
            "doc_id long, lang string, text string"
        ).json(str(src))
        # threshold rejects the uniform floor but accepts seen bigrams
        q = lm_gate_stream(stream, counts, out, ckpt, 2_000_000)
        try:
            q.processAllAvailable()
            assert {
                r.doc_id for r in spark.read.parquet(f"{out}/rejected").collect()
            } == {200}
            # ingest spine appends "x y" vocabulary partial counts; only
            # ref-coin docs contribute, so pick ids on the ref side
            import hashlib

            ids_where_ref = [
                i
                for i in range(1000, 1400)
                if int(
                    hashlib.md5(f"lmref:{i}".encode()).hexdigest()[:8], 16
                )
                / 4294967296.0
                < 0.5
            ]
            new_rows = [(i, "en", "x y x y x y x y") for i in ids_where_ref[:40]]
            lm_model_counts(
                spark.createDataFrame(
                    new_rows, "doc_id long, lang string, text string"
                )
            ).write.mode("append").parquet(counts)
            with open(src / "b.jsonl", "w") as f:
                f.write(
                    json.dumps({**probe, "doc_id": 201}) + "\n"
                )
            q.processAllAvailable()
        finally:
            q.stop()
        accepted = {
            r.doc_id for r in spark.read.parquet(f"{out}/accepted").collect()
        }
        assert 201 in accepted  # same text, now in-distribution

    def test_absent_store_fails_closed(self, spark, tmp_path):
        """No model → no quality evidence → everything rejected (and the
        stream must NOT crash on the missing path)."""
        from vectra_player_spark.streaming.lm_gate import process_lm_batch

        batch = spark.createDataFrame(
            [(1, "en", "a b a b")], "doc_id long, lang string, text string"
        )
        out = str(tmp_path / "out")
        process_lm_batch(batch, 0, str(tmp_path / "missing"), out, 10**9)
        rej = spark.read.parquet(f"{out}/rejected").collect()
        assert {r.doc_id for r in rej} == {1}
        assert rej[0].xent_micro is None

    def test_batch_replay_is_idempotent(self, spark, tmp_path):
        from vectra_player_spark.streaming.lm_gate import process_lm_batch

        counts = str(tmp_path / "lm_counts")
        _mk_counts(spark, [(i, "en", "a b a b") for i in range(20)], counts)
        batch = spark.createDataFrame(
            [(1, "en", "a b a b"), (2, "en", "q r s t")],
            "doc_id long, lang string, text string",
        )
        out = str(tmp_path / "out")
        process_lm_batch(batch, 0, counts, out, 10_000_000)
        first = sorted(
            (r.doc_id, r.xent_micro)
            for r in spark.read.parquet(f"{out}/accepted").collect()
        )
        process_lm_batch(batch, 0, counts, out, 10_000_000)  # replay
        second = sorted(
            (r.doc_id, r.xent_micro)
            for r in spark.read.parquet(f"{out}/accepted").collect()
        )
        assert first == second and len(first) == 2

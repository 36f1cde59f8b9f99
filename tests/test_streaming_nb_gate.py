"""Streaming NB metadata-consistency gate (streaming/nb_gate):
predictions must equal the batch query's core against the same store,
routing must partition the feed, a mid-stream store APPEND must change
the next batch's model (fresh-read-per-batch), and batch replay must be
idempotent. Mirrors the LM gate suite."""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import functions as F


def _train_ids(salt: str, lo: int, hi: int, n: int) -> list[int]:
    """Ids on the train side of the md5 coin."""
    out = []
    for i in range(lo, hi):
        u = int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16) / 4294967296.0
        if u < 0.5:
            out.append(i)
        if len(out) == n:
            break
    return out


def _mk_counts(spark, docs_rows, path, mode="overwrite"):
    from vectra_player_spark.plans.queries_classify import nb_model_counts

    df = spark.createDataFrame(
        docs_rows, "doc_id long, lang string, text string"
    )
    nb_model_counts(df).write.mode(mode).parquet(path)
    return df


class TestNbGate:
    def test_routes_and_matches_batch_core(self, spark, tmp_path):
        from vectra_player_spark.plans.queries_classify import nb_predictions
        from vectra_player_spark.streaming.nb_gate import nb_gate_stream

        counts = str(tmp_path / "nb_counts")
        # two classes with DISJOINT vocabularies so the model discriminates
        en_ids = _train_ids("nbtrain", 0, 200, 20)
        fr_ids = _train_ids("nbtrain", 200, 400, 20)
        ref_rows = [(i, "en", "aa bb cc aa bb") for i in en_ids] + [
            (i, "fr", "xx yy zz xx yy") for i in fr_ids
        ]
        _mk_counts(spark, ref_rows, counts)

        src = tmp_path / "feed"
        src.mkdir()
        feed = [
            {"doc_id": 1000, "lang": "en", "text": "aa bb cc"},  # consistent
            {"doc_id": 1001, "lang": "en", "text": "xx yy zz"},  # mislabeled
            {"doc_id": 1002, "lang": "en", "text": None},  # unscorable
        ]
        with open(src / "a.jsonl", "w") as f:
            for r in feed:
                f.write(json.dumps(r) + "\n")

        model = spark.read.parquet(counts).groupBy("cand", "tok").agg(
            F.sum("c").cast("bigint").alias("c")
        )
        batch_preds = {
            r.doc_id: (r.predicted, r.correct)
            for r in nb_predictions(
                spark.createDataFrame(
                    [(r["doc_id"], r["lang"], r["text"]) for r in feed],
                    "doc_id long, lang string, text string",
                ),
                score_all=True,
                model=model,
            ).collect()
        }
        assert batch_preds[1000] == ("en", True)
        assert batch_preds[1001] == ("fr", False)

        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        stream = spark.readStream.schema(
            "doc_id long, lang string, text string"
        ).json(str(src))
        q = nb_gate_stream(stream, counts, out, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        acc = spark.read.parquet(f"{out}/accepted").collect()
        rej = spark.read.parquet(f"{out}/rejected").collect()
        assert {r.doc_id for r in acc} == {1000}
        assert {r.doc_id for r in rej} == {1001, 1002}
        # the streamed predictions ARE the batch core's predictions
        for r in acc + rej:
            if r.doc_id in batch_preds:
                assert r.predicted == batch_preds[r.doc_id][0]
        assert next(r for r in rej if r.doc_id == 1002).predicted is None

    def test_store_append_changes_next_batch_model(self, spark, tmp_path):
        """Vocabulary appended AFTER stream start must flip the next
        batch's verdict: a declared-de doc is mislabeled under the
        en/fr-only model, consistent once de counts land."""
        from vectra_player_spark.plans.queries_classify import nb_model_counts
        from vectra_player_spark.streaming.nb_gate import nb_gate_stream

        counts = str(tmp_path / "nb_counts")
        en_ids = _train_ids("nbtrain", 0, 200, 20)
        fr_ids = _train_ids("nbtrain", 200, 400, 20)
        _mk_counts(
            spark,
            [(i, "en", "aa bb aa bb") for i in en_ids]
            + [(i, "fr", "xx yy xx yy") for i in fr_ids],
            counts,
        )
        probe = {"doc_id": 2000, "lang": "de", "text": "mm nn mm nn"}

        src = tmp_path / "feed"
        src.mkdir()
        with open(src / "a.jsonl", "w") as f:
            f.write(json.dumps(probe) + "\n")

        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        stream = spark.readStream.schema(
            "doc_id long, lang string, text string"
        ).json(str(src))
        q = nb_gate_stream(stream, counts, out, ckpt)
        try:
            q.processAllAvailable()
            assert {
                r.doc_id
                for r in spark.read.parquet(f"{out}/rejected").collect()
            } == {2000}
            # ingest spine appends the de class's partial counts (only
            # train-coin docs contribute)
            de_ids = _train_ids("nbtrain", 400, 800, 20)
            nb_model_counts(
                spark.createDataFrame(
                    [(i, "de", "mm nn mm nn") for i in de_ids],
                    "doc_id long, lang string, text string",
                )
            ).write.mode("append").parquet(counts)
            with open(src / "b.jsonl", "w") as f:
                f.write(json.dumps({**probe, "doc_id": 2001}) + "\n")
            q.processAllAvailable()
        finally:
            q.stop()
        accepted = {
            r.doc_id for r in spark.read.parquet(f"{out}/accepted").collect()
        }
        assert 2001 in accepted  # same text+label, now consistent

    def test_absent_store_fails_closed(self, spark, tmp_path):
        from vectra_player_spark.streaming.nb_gate import process_nb_batch

        batch = spark.createDataFrame(
            [(1, "en", "aa bb")], "doc_id long, lang string, text string"
        )
        out = str(tmp_path / "out")
        process_nb_batch(batch, 0, str(tmp_path / "missing"), out)
        rej = spark.read.parquet(f"{out}/rejected").collect()
        assert {r.doc_id for r in rej} == {1}
        assert rej[0].predicted is None

    def test_batch_replay_is_idempotent(self, spark, tmp_path):
        from vectra_player_spark.streaming.nb_gate import process_nb_batch

        counts = str(tmp_path / "nb_counts")
        en_ids = _train_ids("nbtrain", 0, 200, 20)
        _mk_counts(spark, [(i, "en", "aa bb aa bb") for i in en_ids], counts)
        batch = spark.createDataFrame(
            [(1, "en", "aa bb"), (2, "fr", "aa bb")],
            "doc_id long, lang string, text string",
        )
        out = str(tmp_path / "out")
        process_nb_batch(batch, 0, counts, out)
        first = sorted(
            (r.doc_id, r.predicted)
            for r in spark.read.parquet(f"{out}/accepted").collect()
        )
        process_nb_batch(batch, 0, counts, out)  # replay
        second = sorted(
            (r.doc_id, r.predicted)
            for r in spark.read.parquet(f"{out}/accepted").collect()
        )
        assert first == second and len(first) == 1  # only the en doc

"""Persisted dedup signature store (round-7): routed arms must be
value-identical to the direct computations, discovery must refuse a store
the lake outgrew, incremental refresh must absorb the delta without
recomputing history, and mutated history must force a rebuild — the same
contract as the bucketed layouts (test_layout_incremental), applied to
the near-dup family's serving structure."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from vectra_player_spark.operators import sigstore
from vectra_player_spark.tables import invalidate_lake, t


@pytest.fixture()
def sig_lake(spark, sf_dir, tmp_path):
    """A temp lake holding the lower half of documents/embeddings by id
    (as parquet DIRECTORIES, appendable), plus the day-2 deltas."""
    docs = t(spark, sf_dir, "documents")
    emb = t(spark, sf_dir, "embeddings")
    cut_d = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    cut_e = emb.agg(F.expr("percentile_approx(vec_id, 0.5)")).collect()[0][0]
    lake = str(tmp_path / "lake")
    (tmp_path / "lake").mkdir()
    docs.where(F.col("doc_id") <= cut_d).coalesce(2).write.parquet(
        f"{lake}/documents.parquet"
    )
    emb.where(F.col("vec_id") <= cut_e).coalesce(2).write.parquet(
        f"{lake}/embeddings.parquet"
    )
    delta_docs = docs.where(F.col("doc_id") > cut_d)
    delta_emb = emb.where(F.col("vec_id") > cut_e)
    root = f"/tmp/vectra_sigstore_test_{id(spark)}"
    spark.conf.set("spark.vectra.bucketed.location", root)
    shutil.rmtree(root, ignore_errors=True)
    yield lake, delta_docs, delta_emb
    spark.conf.unset("spark.vectra.bucketed.location")
    sigstore._SIG_STORES.clear()
    sigstore._STALE_STORES.clear()
    shutil.rmtree(root, ignore_errors=True)
    invalidate_lake(lake)


ROUTED = (
    "doc_exact_dedup",
    "doc_minhash_lsh_pairs",
    "doc_simhash",
    "doc_simhash_neardup_pairs",
    "doc_simhash_neardup_stats",  # enumeration-free consumer arm (r8)
    "doc_dedup_canonical",
    "doc_simhash_neardup_canonical",
    "doc_lsh_recall_report",
    "doc_ngram_jaccard_pairs",
    "embedding_neardup_pairs",
    "embedding_neardup_lsh",
    "embedding_neardup_components",
    "bm25_topk_retrieval",
    "doc_tfidf_topterms",
    # corpus-statistic stores (deterministic quantizers): routed arms are
    # bit-equal to direct refits at ANY lake state because refresh
    # rebuilds rather than appending (sigstore module docstring)
    "knn_ivf_kmeans_recall",
    "knn_pq_adc_recall",
    "knn_ivfpq_adc_recall",  # composed IVF+PQ serving path (r8)
    # LM counts store (r8 session 3): sum-mergeable partials, so the
    # routed model is the groupBy-SUM of the store — values must equal
    # the inline-trained model's at any lake state
    "doc_lm_perplexity",
    "doc_ccnet_buckets",
    # NB counts store (r8 session 4): same sum-mergeable regime as lm
    "doc_nb_classifier",
    "doc_nb_confusion",
    # BPE tokenizer store (r9): corpus-statistic regime like ivf/pq —
    # rebuild-on-growth keeps the routed merge table bit-equal to a
    # direct re-learn at any lake state
    "doc_bpe_merges",
    "doc_bpe_vocab_stats",
    "doc_bpe_encode",
    "doc_vocab_coverage",
)


def _run(spark, lake, name):
    from vectra_player_spark.plans import QUERIES

    return sorted(map(tuple, QUERIES[name].spark_fn(spark, lake).collect()))


def _direct(spark, lake, name):
    """The unrouted arm: force discovery to see no store."""
    saved = spark.conf.get("spark.vectra.bucketed.location")
    spark.conf.set("spark.vectra.bucketed.location", "/nonexistent_sigstore")
    try:
        return _run(spark, lake, name)
    finally:
        spark.conf.set("spark.vectra.bucketed.location", saved)


def test_store_build_route_refresh_cycle(spark, sig_lake):
    lake, delta_docs, delta_emb = sig_lake

    # day 1: build; every routed query matches its direct arm
    stats = sigstore.refresh_signature_store(spark, lake)
    assert stats["doc"]["mode"] == "built" and stats["emb"]["mode"] == "built"
    assert sigstore.doc_signatures_if_available(spark, lake) is not None
    for name in ROUTED:
        assert _run(spark, lake, name) == _direct(spark, lake, name), name

    # day 2 lands in the raw lake — discovery must refuse the stale store
    delta_docs.coalesce(1).write.mode("append").parquet(f"{lake}/documents.parquet")
    delta_emb.coalesce(1).write.mode("append").parquet(f"{lake}/embeddings.parquet")
    invalidate_lake(lake)
    assert sigstore.doc_signatures_if_available(spark, lake) is None
    assert sigstore.emb_signatures_if_available(spark, lake) is None
    # unrouted arm still answers correctly on the grown lake
    assert _run(spark, lake, "doc_simhash") == _direct(spark, lake, "doc_simhash")

    # incremental refresh: delta-sized append, then routing resumes and
    # every routed query matches the direct arm on the GROWN lake
    stats = sigstore.refresh_signature_store(spark, lake)
    assert stats["doc"]["mode"] == "appended"
    assert stats["doc"]["delta_rows"] == delta_docs.count()
    assert stats["emb"]["mode"] == "appended"
    assert stats["idx"]["mode"] == "appended"
    # quantizer stores rebuild (corpus statistics — appends would diverge)
    assert stats["ivf"]["mode"] == "rebuilt"
    assert stats["pq"]["mode"] == "rebuilt"
    # LM / NB counts append partials — the reader's sum-merge absorbs them
    assert stats["lm"]["mode"] == "appended"
    assert stats["nb"]["mode"] == "appended"
    # BPE merges are a corpus statistic — growth rebuilds (ivf/pq rule)
    assert stats["bpe"]["mode"] == "rebuilt"
    assert sigstore.doc_signatures_if_available(spark, lake) is not None
    for name in ROUTED:
        assert _run(spark, lake, name) == _direct(spark, lake, name), name

    # idempotent
    stats = sigstore.refresh_signature_store(spark, lake)
    assert stats["doc"]["mode"] == "noop" and stats["emb"]["mode"] == "noop"


def test_incremental_refresh_reassigns_known_texts(spark, sig_lake):
    """A delta doc whose text already exists below the watermark must
    join the EXISTING rep group (fingerprint join), not found a new one —
    exact dedup group counts prove it."""
    lake, _, _ = sig_lake
    sigstore.refresh_signature_store(spark, lake)

    # append a copy of an existing doc's text with a new higher id
    from vectra_player_spark.tables import _read

    docs = _read(spark, lake, "documents")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    dup = docs.orderBy("doc_id").limit(1).select(
        (F.col("doc_id") + max_id + 1).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    dup.write.mode("append").parquet(f"{lake}/documents.parquet")
    invalidate_lake(lake)

    stats = sigstore.refresh_signature_store(spark, lake)
    assert stats["doc"]["mode"] == "appended" and stats["doc"]["delta_rows"] == 1

    # direct recomputes groups from scratch: if the refresh had founded a
    # NEW rep group for the already-seen text (instead of joining the
    # existing one), the routed group counts would differ
    routed = _run(spark, lake, "doc_exact_dedup")
    direct = _direct(spark, lake, "doc_exact_dedup")
    assert routed == direct
    # and the duplicated text's group really did grow to >= 2 members
    assert any(n_dups >= 2 for _, n_dups, _ in routed)


def test_mutated_history_forces_store_rebuild(spark, sig_lake):
    lake, _, _ = sig_lake
    sigstore.refresh_signature_store(spark, lake)

    from vectra_player_spark.tables import _read

    rows = _read(spark, lake, "documents").collect()
    shutil.rmtree(f"{lake}/documents.parquet")
    spark.createDataFrame(rows[:-3]).coalesce(2).write.parquet(
        f"{lake}/documents.parquet"
    )
    invalidate_lake(lake)

    assert sigstore.doc_signatures_if_available(spark, lake) is None
    stats = sigstore.refresh_signature_store(spark, lake)
    assert stats["doc"]["mode"] == "rebuilt"
    assert _run(spark, lake, "doc_minhash_lsh_pairs") == _direct(
        spark, lake, "doc_minhash_lsh_pairs"
    )


def test_stale_store_verdict_is_memoized(spark, sig_lake):
    """Same negative-memo discipline as the layouts (round-7 ADVICE):
    while the (lake, store) state is unchanged, repeat discovery skips
    the count jobs."""
    lake, delta_docs, _ = sig_lake
    sigstore.refresh_signature_store(spark, lake)
    delta_docs.coalesce(1).write.mode("append").parquet(f"{lake}/documents.parquet")
    invalidate_lake(lake)

    assert sigstore.doc_signatures_if_available(spark, lake) is None
    key = (id(spark), lake, "doc")
    assert key in sigstore._STALE_STORES

    orig = sigstore._read_store
    def _boom(*a, **k):
        raise AssertionError("stale verdict should skip the store read")
    sigstore._read_store = _boom
    try:
        assert sigstore.doc_signatures_if_available(spark, lake) is None
    finally:
        sigstore._read_store = orig

    stats = sigstore.refresh_signature_store(spark, lake)
    assert stats["doc"]["mode"] == "appended"
    assert key not in sigstore._STALE_STORES
    assert sigstore.doc_signatures_if_available(spark, lake) is not None


def test_bm25_routed_plan_prunes_partitions(spark, sig_lake):
    """The routed BM25 scan must carry directory-level PartitionFilters
    on the term bucket AND a pushed row-level term filter — the index
    read is a few partitions, never the corpus."""
    lake, _, _ = sig_lake
    sigstore.refresh_signature_store(spark, lake)
    from vectra_player_spark.plans import QUERIES

    df = QUERIES["bm25_topk_retrieval"].spark_fn(spark, lake)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan_lines = [
        line for line in plan.splitlines() if "idx_sigs" in line and "FileScan" in line
    ]
    assert scan_lines, "routed bm25 must scan the postings store"
    line = scan_lines[0]
    assert "PartitionFilters: [tb" in line.replace("#", "").replace(" ", " ") or (
        "PartitionFilters" in line and "tb" in line.split("PartitionFilters")[1]
    ), line
    assert "In(term" in line, line


def test_streaming_docs_lake_feeds_signature_store(spark, sf_dir, tmp_path):
    """Ingest-spine extension (round-7): documents arrive by STREAM into
    the lake (native parquet sink — exactly-once via its metadata log),
    the watermark refresh absorbs each ingest step delta-sized, and the
    routed dedup queries stay value-identical to direct recomputation —
    across a mid-stream stop/restart. Crash-safety needs no extra
    machinery here: the lake is the source of truth, so a store left
    stale by a crash merely unroutes until the next refresh."""
    import shutil as _sh

    docs = t(spark, sf_dir, "documents")
    emb = t(spark, sf_dir, "embeddings")
    cut = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]

    src = str(tmp_path / "src")
    lake = str(tmp_path / "stream_lake")
    ckpt = str(tmp_path / "ckpt")
    (tmp_path / "stream_lake").mkdir()
    emb.write.parquet(f"{lake}/embeddings.parquet")
    # two ingest waves, ascending doc_id (the lake's append cadence) —
    # each wave lands as new files in ONE source dir (the restart resumes
    # the same source; its checkpoint skips already-ingested files)
    import glob as _glob
    import os as _os

    (tmp_path / "src").mkdir()

    def land(wave: str, df) -> None:
        stage = str(tmp_path / f"stage_{wave}")
        df.coalesce(1).write.parquet(stage)
        for i, f in enumerate(sorted(_glob.glob(f"{stage}/part-*.parquet"))):
            _os.rename(f, f"{src}/{wave}_{i}.parquet")

    land("wave1", docs.where(F.col("doc_id") <= cut))

    root = f"/tmp/vectra_sigstream_{id(spark)}"
    spark.conf.set("spark.vectra.bucketed.location", root)
    _sh.rmtree(root, ignore_errors=True)
    try:
        schema = docs.schema

        def ingest() -> None:
            stream = spark.readStream.schema(schema).parquet(src)
            q = (
                stream.writeStream.format("parquet")
                .option("path", f"{lake}/documents.parquet")
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .start()
            )
            q.processAllAvailable()
            q.stop()  # mid-spine stop between waves = the crash point

        ingest()
        stats = sigstore.refresh_signature_store(spark, lake)
        assert stats["doc"]["mode"] == "built"
        assert _run(spark, lake, "doc_minhash_lsh_pairs") == _direct(
            spark, lake, "doc_minhash_lsh_pairs"
        )

        # second wave arrives after the restart; the store is stale until
        # the refresh catches up (unrouted reads stay correct meanwhile)
        land("wave2", docs.where(F.col("doc_id") > cut))
        ingest()
        invalidate_lake(lake)
        assert sigstore.doc_signatures_if_available(spark, lake) is None
        stats = sigstore.refresh_signature_store(spark, lake)
        assert stats["doc"]["mode"] == "appended"
        assert stats["idx"]["mode"] == "appended"
        for name in ("doc_exact_dedup", "doc_minhash_lsh_pairs", "bm25_topk_retrieval"):
            assert _run(spark, lake, name) == _direct(spark, lake, name), name
        # and the streamed lake really holds the whole corpus
        from vectra_player_spark.tables import _read

        assert _read(spark, lake, "documents").count() == docs.count()
    finally:
        spark.conf.unset("spark.vectra.bucketed.location")
        sigstore._SIG_STORES.clear()
        sigstore._STALE_STORES.clear()
        _sh.rmtree(root, ignore_errors=True)
        invalidate_lake(lake)


def test_lm_refresh_replay_after_partial_commit(spark, sig_lake):
    """Crash window: delta partial counts committed, members append lost.
    The replayed refresh must OVERWRITE the same seg partition (not
    append a second copy) — summed partials would otherwise silently
    double, with no duplicate rows to detect it by."""
    from vectra_player_spark.plans.queries_lm import lm_model_counts
    from vectra_player_spark.tables import _read

    lake, delta_docs, _ = sig_lake
    sigstore.refresh_signature_store(spark, lake)  # day-1 build
    delta_docs.coalesce(1).write.mode("append").parquet(
        f"{lake}/documents.parquet"
    )
    invalidate_lake(lake)
    counts_path, members_path = sigstore._paths(spark, lake, "lm")
    wm = (
        spark.read.parquet(members_path).agg(F.max("doc_id")).collect()[0][0]
    )
    raw = _read(spark, lake, "documents").select("doc_id", "lang", "text")
    delta = raw.where(F.col("doc_id") > wm)
    # simulate the crashed refresh's FIRST half (counts committed)
    (
        lm_model_counts(delta)
        .withColumn("seg", F.lit(wm).cast("bigint"))
        .select(*spark.read.parquet(counts_path).columns)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("seg")
        .parquet(counts_path)
    )
    # replay: must converge, not double
    stats = sigstore._refresh_lm(spark, lake)
    assert stats["mode"] == "appended"
    def _counts(df):
        rows = (
            df.groupBy("lang", "w1", "w2")
            .agg(F.sum("c").cast("bigint").alias("c"))
            .collect()
        )
        return sorted(map(tuple, rows), key=lambda r: tuple(x or "" for x in r[:3]))

    merged = _counts(spark.read.parquet(counts_path))
    truth = _counts(lm_model_counts(raw))
    assert merged == truth


def test_nb_refresh_replay_after_partial_commit(spark, sig_lake):
    """The nb store's crash window, mirroring the lm test: delta partials
    committed, members append lost; the replayed refresh must overwrite
    the same seg partition so summed counts never double."""
    from vectra_player_spark.plans.queries_classify import nb_model_counts
    from vectra_player_spark.tables import _read

    lake, delta_docs, _ = sig_lake
    sigstore.refresh_signature_store(spark, lake)  # day-1 build
    delta_docs.coalesce(1).write.mode("append").parquet(
        f"{lake}/documents.parquet"
    )
    invalidate_lake(lake)
    counts_path, members_path = sigstore._paths(spark, lake, "nb")
    wm = (
        spark.read.parquet(members_path).agg(F.max("doc_id")).collect()[0][0]
    )
    raw = _read(spark, lake, "documents").select("doc_id", "lang", "text")
    delta = raw.where(F.col("doc_id") > wm)
    (
        nb_model_counts(delta)
        .withColumn("seg", F.lit(wm).cast("bigint"))
        .select(*spark.read.parquet(counts_path).columns)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("seg")
        .parquet(counts_path)
    )
    stats = sigstore._refresh_nb(spark, lake)
    assert stats["mode"] == "appended"

    def _counts(df):
        rows = (
            df.groupBy("cand", "tok")
            .agg(F.sum("c").cast("bigint").alias("c"))
            .collect()
        )
        return sorted(map(tuple, rows), key=lambda r: tuple(x or "" for x in r[:2]))

    merged = _counts(spark.read.parquet(counts_path))
    truth = _counts(nb_model_counts(raw))
    assert merged == truth


def test_frozen_quantizer_refresh(spark, sig_lake):
    """Freeze-cadence mode (spark.vectra.quantizer.refresh=frozen): a
    grown lake refreshes the ivf/pq stores by assigning/encoding ONLY the
    delta under the byte-untouched trained model — and the frozen index
    must still search competently (recall floor vs exact brute force on
    the grown lake)."""
    from vectra_player_spark.operators.knn import (
        brute_force_topk,
        ivf_topk,
        recall_at_k,
    )

    lake, delta_docs, delta_emb = sig_lake
    sigstore.refresh_signature_store(spark, lake)
    ivf_sigs_before = sorted(
        map(tuple, sigstore._read_store(spark, lake, "ivf")[0].collect())
    )
    pq_sigs_before = sorted(
        map(tuple, sigstore._read_store(spark, lake, "pq")[0].collect())
    )

    delta_docs.coalesce(1).write.mode("append").parquet(f"{lake}/documents.parquet")
    delta_emb.coalesce(1).write.mode("append").parquet(f"{lake}/embeddings.parquet")
    invalidate_lake(lake)

    spark.conf.set(sigstore.QUANTIZER_REFRESH_CONF, "frozen")
    try:
        stats = sigstore.refresh_signature_store(spark, lake)
    finally:
        spark.conf.unset(sigstore.QUANTIZER_REFRESH_CONF)
    assert stats["ivf"]["mode"] == "frozen-append"
    assert stats["pq"]["mode"] == "frozen-append"
    assert stats["ivf"]["delta_rows"] == delta_emb.count()
    # content-pure stores keep their normal append regime under the flag
    assert stats["doc"]["mode"] == "appended"

    # the trained models are byte-untouched...
    ivf_sigs, ivf_members = sigstore._read_store(spark, lake, "ivf")
    pq_sigs, pq_members = sigstore._read_store(spark, lake, "pq")
    assert sorted(map(tuple, ivf_sigs.collect())) == ivf_sigs_before
    assert sorted(map(tuple, pq_sigs.collect())) == pq_sigs_before
    # ...and the members cover the grown lake (discovery routes again)
    emb = t(spark, lake, "embeddings")
    assert ivf_members.count() == emb.count()
    assert pq_members.count() == emb.count()
    assert sigstore.ivf_index_if_available(spark, lake) is not None

    # recall floor: the frozen index on the grown lake still finds most
    # true neighbors (the lake's delta shares the base distribution, the
    # benign end of the drift spectrum — the point is the machinery
    # serves sanely, not that frozen == retrained)
    cand = emb.where(F.col("embedding").isNotNull())
    queries = cand.orderBy("vec_id").limit(8)
    exact = brute_force_topk(queries, cand, k=10)
    approx = ivf_topk(
        queries, cand, ivf_sigs, k=10, nprobe=4,
        assignments=ivf_members,
    )
    rec = recall_at_k(exact, approx).collect()[0]
    assert rec["mean_recall"] >= 0.5, rec

    # idempotent under the flag
    spark.conf.set(sigstore.QUANTIZER_REFRESH_CONF, "frozen")
    try:
        stats = sigstore.refresh_signature_store(spark, lake)
    finally:
        spark.conf.unset(sigstore.QUANTIZER_REFRESH_CONF)
    assert stats["ivf"]["mode"] == "noop" and stats["pq"]["mode"] == "noop"

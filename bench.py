"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. Each query is fully materialized via
the noop sink (no driver collect cost, no output I/O — pure engine time).

The sf0.1 total (~6.7 s by round 3) sits near the fixed-overhead floor,
where JVM/scheduler noise can swamp real round-over-round movement — so
the line also carries a 10x row (`total_10x_sec` / `queries_10x`, single
timed pass over the /tmp/scale10 lake, built on demand from sf0.1 by
tools/make_scale10.py). Deltas at 10x are engine signal, not startup
noise. Set SPARK_GRAFT_BENCH_10X=0 to skip that section.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from vectra_player_spark import plans
    from vectra_player_spark.session import get_spark

    spark = get_spark("vectra_bench")
    # JVM/codegen warmup so the first measured query isn't paying startup.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # Host-speed probe (pure JVM compute, no I/O, no shuffle): this VM's
    # effective CPU speed drifts round-over-round (r4→r5 solo re-measure
    # showed a persistent ~1.25× slowdown on UNTOUCHED fixed-overhead
    # queries — NOTES.md "bench drift"). Recording a code-independent
    # probe alongside the query timings lets a reader normalize engine
    # signal out of host drift: query_time / cpu_probe is comparable
    # across rounds in a way raw seconds are not.
    probe_runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id*2+1)").collect()
        probe_runs.append(time.perf_counter() - t0)
    cpu_probe = round(min(probe_runs), 3)

    layout_build = {"sf": _ensure_window_layout(spark, sf_dir)}

    bench_specs = [
        (name, spec) for name, spec in sorted(plans.QUERIES.items()) if "bench" in spec.tags
    ]
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name, spec in bench_specs:
        try:
            # best-of-5 with the max-min spread recorded per query: this VM
            # shows transient multi-second scheduler / neighbor stalls
            # (NOTES.md risk #6; the r5 solo re-measure saw a 4.9 s spread
            # on a 1.4 s query at 3 reps — 5 reps makes the min robust to
            # one stall landing on each of several passes). The minimum
            # reflects the engine; the spread makes round-over-round
            # regressions attributable (a real regression moves the min; a
            # noisy neighbor moves the spread); cpu_probe_sec tracks host
            # drift.
            runs = []
            for _ in range(5):
                df = spec.spark_fn(spark, sf_dir)
                start = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - start)
            timings[name] = round(min(runs), 3)
            spreads[name] = round(max(runs) - min(runs), 3)
        except Exception as e:  # noqa: BLE001 — one bad query must not kill the run
            print(f"bench query {name} failed: {e}", file=sys.stderr)
            timings[name] = -1.0
    failed = [k for k, v in timings.items() if v < 0]
    total_ok = {k: v for k, v in timings.items() if v >= 0}

    total = round(sum(total_ok.values()), 3)
    out = {
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spreads,
        "sf": sf,
        "cpu_probe_sec": cpu_probe,
        # Warm-lake methodology disclosure (round-5 verdict item): the
        # query timings assume pre-built window layouts (an ingest-time
        # cost); this row carries what THIS run actually paid to build
        # them (0.0 when the layout was already present), so
        # round-over-round totals stay self-describing.
        "layout_build_sec": layout_build,
        # Round-over-round comparisons should lead with total_10x_sec (the
        # 1M-event/6M-lineitem lake): the sf0.1 total sits at the
        # fixed-overhead floor where host drift swamps engine signal
        # (round-4 verdict; r5 solo re-measure pinned the drift as
        # environmental — see NOTES.md "bench drift").
        "headline_for_deltas": "total_10x_sec",
    }
    if failed:
        out["failed"] = failed

    if os.environ.get("SPARK_GRAFT_BENCH_10X", "1") != "0":
        try:
            dir_10x = _ensure_scale10(sf_dir)
            layout_build["10x"] = _ensure_window_layout(spark, dir_10x)
            out["layout_build_sec"] = layout_build
            t10: dict[str, float] = {}
            for name, spec in bench_specs:
                try:
                    # best-of-2: one stall on a single pass inflated the r4
                    # 10x row by ~10%; the second pass also reads a warm
                    # page cache, which is the steady-state being measured.
                    runs10 = []
                    for _ in range(2):
                        df = spec.spark_fn(spark, dir_10x)
                        start = time.perf_counter()
                        df.write.format("noop").mode("overwrite").save()
                        runs10.append(time.perf_counter() - start)
                    t10[name] = round(min(runs10), 3)
                except Exception as e:  # noqa: BLE001 — keep the line printable
                    print(f"10x bench query {name} failed: {e}", file=sys.stderr)
                    t10[name] = -1.0
            out["total_10x_sec"] = round(sum(v for v in t10.values() if v >= 0), 3)
            out["queries_10x"] = t10
            # Serving-structure tier (round-7), reported SEPARATELY so the
            # headline stays comparable round-over-round: these queries
            # ride the persisted signature/index stores when present
            # (their direct arms cost 5-30x more; SCALE.md §round-7).
            store10: dict[str, float] = {}
            from vectra_player_spark import plans as _plans

            for name in (
                "bm25_topk_retrieval",
                "doc_tfidf_topterms",
                "knn_ivf_kmeans_recall",
                "knn_pq_adc_recall",
                "knn_ivfpq_adc_recall",
                "doc_exact_dedup",
                "doc_dedup_canonical",
                # round-8: capped-posting-list Jaccard and the
                # enumeration-free simhash stats consumer arm
                "doc_ngram_jaccard_pairs",
                "doc_simhash_neardup_stats",
            ):
                try:
                    runs10 = []
                    for _ in range(2):
                        df = _plans.QUERIES[name].spark_fn(spark, dir_10x)
                        start = time.perf_counter()
                        df.write.format("noop").mode("overwrite").save()
                        runs10.append(time.perf_counter() - start)
                    store10[name] = round(min(runs10), 3)
                except Exception as e:  # noqa: BLE001
                    print(f"store bench query {name} failed: {e}", file=sys.stderr)
                    store10[name] = -1.0
            out["store_queries_10x"] = store10

            # Curation tier (round-8 session 2): the new training-pipeline
            # operators, reported separately for the same comparability
            # reason. All sublinear 10x -> 100x (SCALE.md §round-8).
            cur10: dict[str, float] = {}
            for name in (
                "doc_dup_span_stats",
                "doc_dup_span_clean",
                "doc_semantic_dedup",
                "doc_decontamination_bloom",
                "doc_epoch_shuffle",
                "doc_dedup_method_agreement",
                "corpus_curation_pipeline_v2",
                "doc_lm_perplexity",
                "doc_ccnet_buckets",
                "doc_dsir_weights",
                "doc_dsir_resample",
                "doc_crosscorpus_neardup",
                "corpus_curation_pipeline_v3",
                # round-8 session 4: NB classifier + leakage-safe split
                "doc_nb_classifier",
                "doc_nb_confusion",
                "doc_leakage_safe_split",
                "doc_split_leakage_audit",
                "corpus_curation_pipeline_v4",
                "doc_nb_calibration",
                "doc_vocab_coverage",
                "multimodal_phash_neardup_stats",
                # round-9: hashed-bigram NB + probe, sampled agreement
                # arm, real WAV decode
                "doc_nb_bigram_confusion",
                "doc_dedup_method_agreement_sampled",
                "multimodal_wav_features",
                "multimodal_bmp_features",
                "multimodal_y4m_frame_stats",
                "doc_unicode_nfc",
                "doc_cdc_chunking_report",
            ):
                try:
                    runs10 = []
                    for _ in range(2):
                        df = _plans.QUERIES[name].spark_fn(spark, dir_10x)
                        start = time.perf_counter()
                        df.write.format("noop").mode("overwrite").save()
                        runs10.append(time.perf_counter() - start)
                    cur10[name] = round(min(runs10), 3)
                except Exception as e:  # noqa: BLE001
                    print(f"curation bench query {name} failed: {e}", file=sys.stderr)
                    cur10[name] = -1.0
            out["curation_queries_10x"] = cur10

            # BPE tier: learn_bpe runs its per-round jobs while the query
            # callable BUILDS the result (top-1 collect per merge), so the
            # timer wraps the whole call, not just the noop write.
            bpe10: dict[str, float] = {}
            for name in ("doc_bpe_merges", "doc_bpe_vocab_stats", "doc_bpe_encode"):
                try:
                    runs10 = []
                    for _ in range(2):
                        start = time.perf_counter()
                        df = _plans.QUERIES[name].spark_fn(spark, dir_10x)
                        df.write.format("noop").mode("overwrite").save()
                        runs10.append(time.perf_counter() - start)
                    bpe10[name] = round(min(runs10), 3)
                except Exception as e:  # noqa: BLE001
                    print(f"bpe bench query {name} failed: {e}", file=sys.stderr)
                    bpe10[name] = -1.0
            out["bpe_queries_10x"] = bpe10
        except Exception as e:  # noqa: BLE001 — the sf0.1 headline must survive
            print(f"10x section skipped: {e}", file=sys.stderr)

    print(json.dumps(out))
    # The driver captures a BOUNDED TAIL of stdout: for three rounds the
    # single big line above lost its head (the sf0.1 headline) to that cap
    # and BENCH_r{7,8,9}.json recorded parsed: null. Emit a compact
    # duplicate trailer LAST — headline fields plus the full sf0.1 queries
    # dict, none of the bulky 10x sections — so the retained tail always
    # ends with a complete, parseable JSON record. The full line above is
    # unchanged (same fields, same methodology; this is a reporting fix,
    # not a measurement change — OPTIMIZATION_r10.md "bench truncation").
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "queries": out["queries"],
        "sf": out["sf"],
        "cpu_probe_sec": out["cpu_probe_sec"],
        "layout_build_sec": out["layout_build_sec"],
        "headline_for_deltas": out["headline_for_deltas"],
    }
    if "total_10x_sec" in out:
        compact["total_10x_sec"] = out["total_10x_sec"]
    if failed:
        compact["failed"] = failed
    print(json.dumps(compact))
    spark.stop()


def _ensure_window_layout(spark, sf_dir: str) -> float:
    """Materialize the window-family bucketed events layout once per lake
    (ingest-time cost, OUTSIDE the query timings — the same footing as
    _ensure_scale10's lake build — but RETURNED so the JSON line carries
    it as layout_build_sec). tick_features and feature_matrix then
    self-route onto it (tables.events_for_windows): the Window's
    Exchange+Sort come off the scan, 1.9-2.6× at the 10× lake (SCALE.md
    §window-family layout). Failure falls back to plain scans — the
    bench line must survive a read-only /tmp. Returns seconds spent
    building (0.0 when already present, -1.0 on failure)."""
    import time as _time

    try:
        from vectra_player_spark.operators.skew import (
            bucketed_events_if_available,
            bucketed_facts_if_available,
            materialize_bucketed_events_lake,
            refresh_bucketed_facts_layout,
        )

        from vectra_player_spark.operators.sigstore import (
            bpe_model_if_available,
            doc_signatures_if_available,
            emb_signatures_if_available,
            ivf_index_if_available,
            lm_counts_if_available,
            nb_counts_if_available,
            pq_index_if_available,
            refresh_signature_store,
            text_index_if_available,
        )

        sec = 0.0
        if bucketed_events_if_available(spark, sf_dir) is None:
            t0 = _time.perf_counter()
            materialize_bucketed_events_lake(spark, sf_dir)
            sec += round(_time.perf_counter() - t0, 3)
            print(
                f"events window layout built for {sf_dir} in {sec:.1f}s",
                file=sys.stderr,
            )
        # orderkey-bucketed fact pair (q3/q5/q9/... route onto it): the
        # round-8 "q3 drift" was exactly this layout missing after a /tmp
        # wipe — bench rebuilt the 10x lake and the events layout but not
        # the facts pair, so the orderkey joins silently ran unrouted
        # (0.31 s -> 0.68-0.81 s at 10x; SCALE.md round-9). Ensure it on
        # the same ingest-time footing as the rest.
        if bucketed_facts_if_available(spark, sf_dir) is None:
            t0 = _time.perf_counter()
            refresh_bucketed_facts_layout(spark, sf_dir)
            s = round(_time.perf_counter() - t0, 3)
            sec += s
            print(
                f"facts layout built for {sf_dir} in {s:.1f}s",
                file=sys.stderr,
            )
        # dedup signature store + lexical index (round-7): the near-dup
        # bench queries ride precomputed minhash/simhash/hyperplane
        # signatures — same ingest-time footing as the bucketed layouts.
        # refresh (not materialize) so a present store is a noop and a
        # missing kind builds without rewriting the others.
        if (
            doc_signatures_if_available(spark, sf_dir) is None
            or emb_signatures_if_available(spark, sf_dir) is None
            or text_index_if_available(spark, sf_dir) is None
            or ivf_index_if_available(spark, sf_dir) is None
            or pq_index_if_available(spark, sf_dir) is None
            or lm_counts_if_available(spark, sf_dir) is None
            or nb_counts_if_available(spark, sf_dir) is None
            or bpe_model_if_available(spark, sf_dir) is None
        ):
            t0 = _time.perf_counter()
            refresh_signature_store(spark, sf_dir)
            s = round(_time.perf_counter() - t0, 3)
            sec += s
            print(
                f"signature store refreshed for {sf_dir} in {s:.1f}s",
                file=sys.stderr,
            )
        return round(sec, 3)
    except Exception as e:  # noqa: BLE001 — layout is an optimization only
        print(f"window layout unavailable for {sf_dir}: {e}", file=sys.stderr)
        return -1.0


def _ensure_scale10(sf_dir: str, out_dir: str = "/tmp/scale10") -> str:
    """The 10x lake (sf0.1 unioned 10x with shifted keys). /tmp may be
    wiped between rounds; rebuild on demand (~1 min, one-time)."""
    if os.path.isdir(out_dir) and os.path.exists(
        os.path.join(out_dir, "lineitem.parquet")
    ):
        return out_dir
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    subprocess.run(
        [sys.executable, os.path.join(here, "tools", "make_scale10.py"),
         sf_dir, out_dir, "10"],
        check=True,
        capture_output=True,
        timeout=600,  # a hung rebuild must not hang the whole bench line
    )
    return out_dir


if __name__ == "__main__":
    sys.exit(main())

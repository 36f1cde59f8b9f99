"""Build/refresh every self-routing layout for a lake — the ingest-time
command the read path assumes.

The engine's default query entries DISCOVER layouts but never build them
(a read must not trigger a 50 s write): q9/q18 route onto the
orderkey-bucketed fact pair, the window family (tick_features,
feature_matrix, ...) onto the episode-bucketed events table
(operators/skew.py). This tool is the other half — run it once per lake
at ingest/compaction time:

    python tools/maintain_layouts.py [--compact] [sf_dir ...]

Both layouts are maintained INCREMENTALLY (round-6): a fresh layout is
a noop, a lake that grew a day of new rows gets a delta-sized
per-bucket append (refresh_bucketed_{events,facts}_layout — history is
never rewritten; the watermark is the monotone episode/order key), and
only a mutated history forces a full rebuild. Appends fragment buckets
(>1 file per bucket drops the scan's sort claim, so windows/SMJs regain
a SortExec while staying Exchange-free); ``--compact`` rewrites
fragmented buckets back to one file each — Exchange-free per-bucket
work, run it on the compaction cadence, not per ingest.

Default lake: /root/testdata/sf0.1. Honors
spark.vectra.bucketed.location via SPARK_VECTRA_BUCKETED_LOCATION.
Prints one JSON line per layout with the action taken and seconds — the
tool is idempotent and cheap to re-run on a fresh lake.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Appends fragment buckets; past this many files in the worst bucket the
# tool compacts even without --compact (the sort-claim loss starts to
# matter and the listing itself grows). Daily 1%-delta appends hit this
# roughly weekly — the compaction cadence falls out of the data rate.
AUTO_COMPACT_FILES_PER_BUCKET = 8


def main() -> int:
    args = sys.argv[1:]
    compact = "--compact" in args
    lakes = [a for a in args if a != "--compact"] or ["/root/testdata/sf0.1"]

    from vectra_player_spark.operators.sigstore import refresh_signature_store
    from vectra_player_spark.operators.skew import (
        BUCKETED_LOCATION_CONF,
        compact_bucketed_events_layout,
        compact_bucketed_facts_layout,
        refresh_bucketed_events_layout,
        refresh_bucketed_facts_layout,
    )
    from vectra_player_spark.session import get_spark

    spark = get_spark("maintain_layouts")
    spark.sparkContext.setLogLevel("ERROR")
    loc = os.environ.get("SPARK_VECTRA_BUCKETED_LOCATION")
    if loc:
        spark.conf.set(BUCKETED_LOCATION_CONF, loc)

    jobs = (
        ("facts_by_orderkey", refresh_bucketed_facts_layout,
         compact_bucketed_facts_layout),
        ("events_by_user_window", refresh_bucketed_events_layout,
         compact_bucketed_events_layout),
    )
    for lake in lakes:
        for name, refresh, compact_fn in jobs:
            t0 = time.perf_counter()
            stats = refresh(spark, lake)
            stats.update({"lake": lake, "layout": name,
                          "sec": round(time.perf_counter() - t0, 1)})
            print(json.dumps(stats))
            frag = stats.get("max_files_per_bucket") or 0
            if compact or frag > AUTO_COMPACT_FILES_PER_BUCKET:
                t0 = time.perf_counter()
                cstats = compact_fn(spark, lake)
                cstats.update({"lake": lake, "layout": name,
                               "sec": round(time.perf_counter() - t0, 1)})
                print(json.dumps(cstats))
        # dedup signature store (round-7): minhash/simhash/embedding-LSH
        # signatures computed once per lake, ridden by the near-dup family
        t0 = time.perf_counter()
        sstats = refresh_signature_store(spark, lake)
        sstats.update({"lake": lake, "layout": "signature_store",
                       "sec": round(time.perf_counter() - t0, 1)})
        print(json.dumps(sstats))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

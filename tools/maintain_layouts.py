"""Build/refresh every self-routing layout for a lake — the ingest-time
command the read path assumes.

The engine's default query entries DISCOVER layouts but never build them
(a read must not trigger a 50 s write): q9/q18 route onto the
orderkey-bucketed fact pair, the window family (tick_features,
feature_matrix, ...) onto the episode-bucketed events table
(operators/skew.py). This tool is the other half — run it once per lake
at ingest/compaction time:

    python tools/maintain_layouts.py [sf_dir ...]

Default lake: /root/testdata/sf0.1. Honors
spark.vectra.bucketed.location via SPARK_VECTRA_BUCKETED_LOCATION.
Prints one JSON line per layout with build seconds (or 'present' when the
layout already exists and is live — the tool is idempotent and cheap to
re-run).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    lakes = sys.argv[1:] or ["/root/testdata/sf0.1"]

    from vectra_player_spark.operators.skew import (
        BUCKETED_LOCATION_CONF,
        bucketed_events_if_available,
        bucketed_facts_if_available,
        materialize_bucketed_events_lake,
        materialize_bucketed_facts,
    )
    from vectra_player_spark.session import get_spark

    spark = get_spark("maintain_layouts")
    spark.sparkContext.setLogLevel("ERROR")
    loc = os.environ.get("SPARK_VECTRA_BUCKETED_LOCATION")
    if loc:
        spark.conf.set(BUCKETED_LOCATION_CONF, loc)

    jobs = (
        ("facts_by_orderkey", bucketed_facts_if_available, materialize_bucketed_facts),
        (
            "events_by_user_window",
            bucketed_events_if_available,
            materialize_bucketed_events_lake,
        ),
    )
    for lake in lakes:
        for name, probe, build in jobs:
            if probe(spark, lake) is not None:
                print(json.dumps({"lake": lake, "layout": name, "status": "present"}))
                continue
            t0 = time.perf_counter()
            build(spark, lake)
            print(
                json.dumps(
                    {
                        "lake": lake,
                        "layout": name,
                        "status": "built",
                        "sec": round(time.perf_counter() - t0, 1),
                    }
                )
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

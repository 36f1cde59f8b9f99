"""Print the driver's cap-50 composition and which slots are never-witnessed.

The correctness driver records exactly the first 50 entries of
``__spark_entry__.queries()``; registry PRIORITY curates that order, and it
has silently drifted twice when a mid-block registration pushed a flagship
past slot 50. Run this after ANY registration change:

    python tools/show_cap.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import __spark_entry__ as e

    names = list(e.queries())
    oracles = e.oracle_sql()
    last: dict[str, int] = {}
    latest_round = 0
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(path.split("_r")[1].split(".")[0])
        latest_round = max(latest_round, rnd)
        with open(path) as f:
            for k in json.load(f):
                last[k] = max(last.get(k, 0), rnd)
    seen = set(last)
    cap = names[:50]
    print(f"registered: {len(names)}  cap: {len(cap)}  witnessed-ever: {len(seen)}")
    for i, n in enumerate(cap, 1):
        mark = "rows-only" if n not in oracles else "oracle"
        wit = (
            f"  last r{last[n]}" if n in last else "  <-- NEVER WITNESSED"
        )
        print(f"  {i:2d}. {n:40s} {mark}{wit}")
    missing = [n for n in names if n not in seen]
    out_of_cap = [n for n in missing if n not in cap]
    if out_of_cap:
        print(f"never-witnessed OUTSIDE cap ({len(out_of_cap)}): {out_of_cap}")
    else:
        print("every never-witnessed query is inside the cap")
    # Staleness ranking for the NEXT rotation: oldest-witness first among
    # out-of-cap names, so the round-N+1 backfill pool is mechanical.
    stale = sorted(
        ((last[n], n) for n in names[50:] if n in last),
        key=lambda t: (t[0], t[1]),
    )
    if stale:
        oldest = stale[0][0]
        pool = [n for r, n in stale if r <= oldest + 1]
        print(
            f"next-rotation pool (witness round <= r{oldest + 1}, "
            f"{len(pool)} names): {pool}"
        )
    return 1 if out_of_cap else 0


if __name__ == "__main__":
    raise SystemExit(main())

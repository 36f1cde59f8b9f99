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
    seen: set[str] = set()
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        with open(path) as f:
            seen.update(json.load(f).keys())
    cap = names[:50]
    print(f"registered: {len(names)}  cap: {len(cap)}  witnessed-ever: {len(seen)}")
    for i, n in enumerate(cap, 1):
        mark = "rows-only" if n not in oracles else "oracle"
        wit = "" if n in seen else "  <-- NEVER WITNESSED"
        print(f"  {i:2d}. {n:40s} {mark}{wit}")
    missing = [n for n in names if n not in seen]
    out_of_cap = [n for n in missing if n not in cap]
    if out_of_cap:
        print(f"never-witnessed OUTSIDE cap ({len(out_of_cap)}): {out_of_cap}")
    else:
        print("every never-witnessed query is inside the cap")
    return 1 if out_of_cap else 0


if __name__ == "__main__":
    raise SystemExit(main())

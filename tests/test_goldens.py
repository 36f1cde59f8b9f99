"""Golden-hash regression gate for the rows-only replay queries (M3, M17,
M18, M20) — the 'deterministic half' of the non-SQL-expressible set.

The goldens were generated on a session with different parallelism and
shuffle-partition settings than the test session uses, so a pass also
demonstrates partition-invariance of the replay outputs (each episode's
trace depends only on its own rows plus the broadcast model).

Regenerate after an INTENTIONAL semantics change with:
    python -c "from pyspark.sql import SparkSession; \
        s = SparkSession.builder.master('local[8]').getOrCreate(); \
        from tests.golden_harness import regenerate; regenerate(s)"
"""

from __future__ import annotations

import json

import pytest

from tests.golden_harness import PINNED, compute, golden_path


@pytest.mark.parametrize("name", sorted(PINNED))
def test_replay_matches_golden(spark, sf_dir, name):
    with open(golden_path(name)) as f:
        want = json.load(f)
    got = compute(spark, name, sf_dir)
    assert set(got) == set(want), (
        f"{name}: game set changed: only-new={sorted(set(got) - set(want))[:5]} "
        f"only-golden={sorted(set(want) - set(got))[:5]}"
    )
    diff = [g for g in want if got[g] != want[g]]
    assert not diff, f"{name}: trace changed for games {diff[:10]}"

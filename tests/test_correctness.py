"""t2-mirror: every registered query with an oracle must hash-match DuckDB
on sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from vectra_player_spark import plans
from tests.oracle_harness import compare, run_oracle

CASES = sorted(plans.QUERIES.keys())


@pytest.mark.parametrize("name", CASES)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = plans.QUERIES[name]
    sdf = spec.spark_fn(spark, sf_dir)
    # Regression pins are frozen VALUES literals of the engine's own
    # sf0.01 output — only comparable at that lake (the driver's scale).
    # At the test fixture's sf0.001, fall to the rows-only path; the
    # sf0.001 value pin for these queries is the per-game goldens.
    pin_off_scale = "regression-pin" in spec.tags and "sf0.01" not in sf_dir
    if spec.oracle is None or pin_off_scale:
        # rows-only check, like the driver's weaker path
        n = sdf.count()
        assert n >= 0
        return
    oracle_pdf = run_oracle(spec.oracle, sf_dir)
    problems = compare(sdf, oracle_pdf)
    assert not problems, f"{name}: " + "; ".join(problems)

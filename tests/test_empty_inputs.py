"""Empty-lake robustness gate: every registered query must EXECUTE on
0-row tables (fresh lake, empty partition, empty time-window — all normal
production states) instead of crashing in a fit/collect boundary.

This sweep found four real bugs on first run: GBT / k-means / PQ training
on zero rows, and HistoricalStats.fit calling float(None). Queries may
legitimately return 0 rows (or a single all-null/zero aggregate row) —
the assertion is only that they run.
"""

from __future__ import annotations

import duckdb
import pytest

from vectra_player_spark import plans

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory, sf_dir):
    out = tmp_path_factory.mktemp("sf_empty")
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet') LIMIT 0)"
            f" TO '{out}/{tbl}.parquet' (FORMAT PARQUET)"
        )
    return str(out)


@pytest.mark.parametrize("name", sorted(plans.QUERIES))
def test_query_runs_on_empty_lake(spark, empty_sf_dir, name):
    # collect(), not count(): count prunes the projection and would mask
    # expression-level crashes (seen with ewma's ANSI divide-by-zero).
    rows = plans.QUERIES[name].spark_fn(spark, empty_sf_dir).collect()
    assert rows is not None

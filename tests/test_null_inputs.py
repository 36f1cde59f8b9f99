"""Null-injected-lake robustness gate: every registered query must EXECUTE
when measure columns contain NULLs (failed sensor reads, late-arriving
enrichment, optional fields — all normal production states at 100 TB).

The sweep that seeded this gate found three real crashes: k-means centroid
training and PQ codebook training NPE'd on a NULL embedding, and
ewma_features divided by a zero weight-sum under ANSI mode when a row's
whole window was NULL. Queries may return fewer/different rows than on
the clean lake — the assertion is only that they run to completion
(collect(), not count(): count prunes projections and masks expression
crashes).
"""

from __future__ import annotations

import duckdb
import pytest

from vectra_player_spark import plans

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# Measure / payload columns that are realistically nullable, keyed by the
# stable id column used for the deterministic 5% null coin.
NULLABLE: dict[str, tuple[str, tuple[str, ...]]] = {
    "events": ("event_id", ("value",)),
    "embeddings": ("vec_id", ("embedding",)),
    "documents": ("doc_id", ("text",)),
    "lineitem": (
        "l_orderkey",
        ("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
    ),
    "orders": ("o_orderkey", ("o_totalprice",)),
    "customer": ("c_custkey", ("c_acctbal",)),
}


@pytest.fixture(scope="module")
def nulled_sf_dir(tmp_path_factory, sf_dir):
    out = tmp_path_factory.mktemp("sf_nulls")
    con = duckdb.connect()
    for tbl in TABLES:
        src = f"read_parquet('{sf_dir}/{tbl}.parquet')"
        if tbl in NULLABLE:
            key, cols = NULLABLE[tbl]
            # Deterministic per-(row, column) coin so reruns build the
            # identical lake: ~5% of each listed column goes NULL.
            projs = [
                (
                    f"CASE WHEN hash(CAST({key} AS VARCHAR) || '/{c}') % 20 = 3 "
                    f'THEN NULL ELSE "{c}" END AS "{c}"'
                    if c in cols
                    else f'"{c}"'
                )
                for c in con.execute(f"SELECT * FROM {src} LIMIT 0").df().columns
            ]
            sel = f"SELECT {', '.join(projs)} FROM {src}"
        else:
            sel = f"SELECT * FROM {src}"
        con.execute(f"COPY ({sel}) TO '{out}/{tbl}.parquet' (FORMAT PARQUET)")
    return str(out)


@pytest.mark.parametrize("name", sorted(plans.QUERIES))
def test_query_runs_on_nulled_lake(spark, nulled_sf_dir, name):
    rows = plans.QUERIES[name].spark_fn(spark, nulled_sf_dir).collect()
    assert rows is not None

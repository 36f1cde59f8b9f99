"""Local mirror of the driver's t2 comparison: run a registered query on
Spark and its oracle SQL on DuckDB over the same parquet tables, then
compare row count, column names and values (order-insensitive, floats
rounded)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from vectra_player_spark.tables import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    import os

    con = duckdb.connect()
    for name in TABLES:
        p = f"{sf_dir}/{name}.parquet"
        # Spark-written lakes (e.g. the /tmp/scale100 parity checks) are
        # directories of part files; driver testdata is flat files.
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{pat}')")
    return con.execute(sql).df()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64").round(6)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            # DuckDB may hand back Decimal / int / numpy-array objects;
            # normalize scalars and sequences to comparable forms.
            def norm(v):
                import numpy as np

                if v is None:
                    return None
                if isinstance(v, float):
                    return round(v, 6)
                if isinstance(v, (list, tuple, np.ndarray)):
                    return tuple(
                        round(float(x), 6) if isinstance(x, (float, np.floating)) else x
                        for x in v
                    )
                return v

            df[c] = s.map(norm)
    df = df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)
    return df


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Returns a list of problems; empty == match."""
    problems: list[str] = []
    spark_pdf = spark_df.toPandas()
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count differs: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    a = canonicalize(spark_pdf)
    b = canonicalize(oracle_pdf)
    if problems:
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = pd.to_numeric(av, errors="coerce").astype("float64")
            bv = pd.to_numeric(bv, errors="coerce").astype("float64")
            bad = ~(
                (av.isna() & bv.isna())
                | ((av - bv).abs() <= 1e-9)
                | (av.eq(bv))
            )
        else:
            bad = ~((av.isna() & bv.isna()) | (av.astype(str) == bv.astype(str)))
        if bad.any():
            i = bad.idxmax()
            problems.append(
                f"column {c!r}: {int(bad.sum())} mismatched rows; first at idx {i}: "
                f"spark={a[c][i]!r} oracle={b[c][i]!r}"
            )
    return problems

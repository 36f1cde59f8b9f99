"""Semantic-fidelity tests: the Spark operators must match the reference's
NUMPY/PANDAS semantics, not just the DuckDB oracle (both engines could be
consistently wrong). Uses hypothesis for randomized inputs.

Key check: np.convolve(h, ones(w)/w, 'same') with even w maps to
SUM OVER (ROWS BETWEEN w/2 PRECEDING AND w/2-1 FOLLOWING)/w including the
truncated-edge behavior (SURVEY §7 hard-part 3)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from vectra_player_spark.operators.asof import asof_join
from vectra_player_spark.operators.survival import hazard_rate, km_survival

DURATIONS = st.lists(st.integers(min_value=1, max_value=40), min_size=3, max_size=60)


@pytest.fixture(scope="module")
def sdf_factory(spark):
    def make(durs):
        return spark.createDataFrame([(int(d),) for d in durs], "duration long")

    return make


class TestKaplanMeierVsNumpy:
    @settings(max_examples=6, deadline=None)
    @given(durs=DURATIONS)
    def test_matches_reference_formula(self, sdf_factory, durs):
        got = {r.t: r for r in km_survival(sdf_factory(durs)).collect()}
        arr = np.sort(np.array(durs))
        times = np.unique(arr)
        s = 1.0
        for t in times:
            at_risk = int((arr >= t).sum())
            events = int((arr == t).sum())
            s *= 1.0 - events / at_risk
            row = got[int(t)]
            assert row.at_risk == at_risk
            assert row.events == events
            assert abs(row.survival - round(s, 6)) <= 1e-6

    def test_curve_hits_zero_at_max(self, sdf_factory):
        rows = km_survival(sdf_factory([3, 5, 5, 9])).orderBy("t").collect()
        assert rows[-1].survival == 0.0  # everyone dead at max duration


# Distinct duration values with multiplicities — guarantees the hazard
# signal is >= the kernel length (np.convolve swaps operands below that;
# real hazard curves, hundreds of ticks, always satisfy it).
DISTINCT_DURS = st.lists(
    st.tuples(st.integers(1, 200), st.integers(1, 5)),
    min_size=12,
    max_size=50,
    unique_by=lambda x: x[0],
)


class TestHazardSmoothingVsConvolve:
    @settings(max_examples=6, deadline=None)
    @given(spec=DISTINCT_DURS)
    def test_matches_np_convolve_same(self, sdf_factory, spec):
        durs = [d for d, mult in spec for _ in range(mult)]
        rows = hazard_rate(sdf_factory(durs), bandwidth=10).orderBy("t").collect()
        raw = np.array([r.events / r.at_risk for r in rows])
        expected = np.convolve(raw, np.ones(10) / 10.0, mode="same")
        got = np.array([r.hazard_smoothed for r in rows])
        assert np.allclose(got, np.round(expected, 6), atol=2e-6), (
            got.tolist(),
            expected.tolist(),
        )


class TestAsofVsPandasMergeAsof:
    @settings(max_examples=5, deadline=None)
    @given(
        left_keys=st.lists(st.integers(0, 100), min_size=1, max_size=25, unique=True),
        right_keys=st.lists(st.integers(0, 100), min_size=1, max_size=25, unique=True),
    )
    def test_backward_matches_pandas(self, spark, left_keys, right_keys):
        left = spark.createDataFrame([(int(k),) for k in sorted(left_keys)], "k long")
        right = spark.createDataFrame(
            [(int(k), float(k) * 2.0) for k in sorted(right_keys)], "k long, payload double"
        )
        got = (
            asof_join(left, right, on="k", right_cols=["payload"])
            .orderBy("k")
            .toPandas()
        )
        expected = pd.merge_asof(
            pd.DataFrame({"k": sorted(left_keys)}),
            pd.DataFrame({"k": sorted(right_keys), "payload": [k * 2.0 for k in sorted(right_keys)]}),
            on="k",
            direction="backward",
        )
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), expected.reset_index(drop=True), check_dtype=False
        )

    def test_forward_direction(self, spark):
        left = spark.createDataFrame([(5,), (10,)], "k long")
        right = spark.createDataFrame([(7, "a"), (12, "b")], "k long, v string")
        got = {
            r.k: r.v
            for r in asof_join(left, right, on="k", right_cols=["v"], direction="forward").collect()
        }
        assert got == {5: "a", 10: "b"}

    def test_by_key_isolation(self, spark):
        left = spark.createDataFrame([("u1", 10), ("u2", 10)], "u string, k long")
        right = spark.createDataFrame([("u1", 5, "x")], "u string, k long, v string")
        got = {
            (r.u, r.k): r.v
            for r in asof_join(left, right, on="k", by="u", right_cols=["v"]).collect()
        }
        assert got[("u1", 10)] == "x"
        assert got[("u2", 10)] is None  # u2 must not see u1's rows


class TestSketchAccuracy:
    """The sketch stand-ins (HLL++ distinct, percentile_approx) must land
    within their advertised error envelopes of the exact aggregates —
    the precondition for swapping them in at 100 TB."""

    def test_sketch_report_within_bounds(self, spark, sf_dir):
        from vectra_player_spark import plans

        rows = plans.QUERIES["sketch_accuracy_report"].spark_fn(spark, sf_dir).collect()
        assert rows
        for r in rows:
            # HLL++ with rsd=0.05: allow 3 standard errors.
            assert r["rel_err_ndv"] <= 0.15, r
            # percentile_approx at accuracy 10000 on this value range.
            assert r["abs_err_p50"] <= 0.5, r


def test_asof_join_tolerance_matches_pandas(spark):
    """tolerance nulls out matches farther than the bound — pinned against
    pandas merge_asof(tolerance=...) on both directions."""
    import pandas as pd

    lpdf = pd.DataFrame({"k": [1.0, 5.0, 9.0, 14.0, 20.0]})
    rpdf = pd.DataFrame({"k": [0.0, 4.0, 10.0, 15.0], "v": [10, 40, 100, 150]})
    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf)
    for direction in ("backward", "forward"):
        got = {
            r.k: r.v
            for r in asof_join(
                left, right, on="k", right_cols=["v"],
                direction=direction, tolerance=2.0,
            ).collect()
        }
        exp_df = pd.merge_asof(
            lpdf.sort_values("k"), rpdf.sort_values("k"),
            on="k", direction=direction, tolerance=2.0,
        )
        exp = {
            row.k: (None if pd.isna(row.v) else int(row.v))
            for row in exp_df.itertuples()
        }
        assert got == exp, (direction, got, exp)


class TestOracleHarnessSelfCheck:
    """The comparison harness must actually FAIL on defects — a harness that
    never rejects would silently green every query. Perturb each defect
    class and assert compare() reports it."""

    def test_detects_value_row_column_defects(self, spark):
        import pandas as pd

        from tests.oracle_harness import compare

        good = pd.DataFrame({"k": [1, 2, 3], "v": [1.5, 2.5, 3.5]})
        df = spark.createDataFrame(good)
        assert compare(df, good.copy()) == []
        # value defect beyond the round-6 convention every query obeys
        bad_val = good.copy(); bad_val.loc[1, "v"] = 2.50001
        assert any("mismatch" in p for p in compare(df, bad_val))
        # sub-grid float noise must NOT flag (canonicalize rounds to 6)
        noisy = good.copy(); noisy["v"] = noisy["v"] + 1e-9
        assert compare(df, noisy) == []
        # row-count defect
        assert any("row count" in p for p in compare(df, good.iloc[:2].copy()))
        # column-name defect
        renamed = good.rename(columns={"v": "value"})
        assert any("columns differ" in p for p in compare(df, renamed))
        # row-ORDER must not matter (driver canonicalizes by sorting)
        assert compare(df, good.iloc[::-1].reset_index(drop=True)) == []


class TestFixedPointExactness:
    """functions.exact.fixed(): the integer fixed-point money path must be
    value-identical to the DECIMAL(18,6) path it replaced (SCALE.md
    'Integer fixed-point aggregation'). Hypothesis drives random 2-decimal
    money grids through both; any divergence is a parity regression."""

    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=10_000_000),  # price cents
                st.integers(min_value=0, max_value=10),          # discount %
                st.integers(min_value=0, max_value=8),           # tax %
            ),
            min_size=1,
            max_size=60,
        )
    )
    @settings(max_examples=20, deadline=None)
    def test_fixed_sum_equals_decimal_sum(self, spark, rows):
        import pyspark.sql.functions as F

        from vectra_player_spark.functions.exact import dec, fixed

        pdf = [
            {
                "price": c / 100.0,
                "disc": d / 100.0,
                "tax": x / 100.0,
            }
            for c, d, x in rows
        ]
        df = spark.createDataFrame(pdf)
        disc_f = fixed("price") * fixed(F.lit(1.0) - F.col("disc"))
        charge_f = disc_f * fixed(F.lit(1.0) + F.col("tax"))
        disc_d = dec("price") * (F.lit(1).cast("decimal(18,6)") - dec("disc"))
        charge_d = disc_d * (F.lit(1).cast("decimal(18,6)") + dec("tax"))
        row = df.agg(
            (F.sum(disc_f) / F.lit(10000.0)).alias("f_disc"),
            (F.sum(charge_f) / F.lit(1000000.0)).alias("f_charge"),
            F.sum(disc_d).cast("double").alias("d_disc"),
            F.sum(charge_d).cast("double").alias("d_charge"),
        ).first()
        assert row["f_disc"] == row["d_disc"]
        assert row["f_charge"] == row["d_charge"]

"""Property tests for the training-pipeline operators: invariants that
hold for ANY input, complementing the fixed-corpus oracle checks."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from vectra_player_spark.operators.skew import salted_aggregate

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # key id
        st.integers(min_value=0, max_value=20),     # user id (hot: few values)
        st.floats(min_value=-100, max_value=100, allow_nan=False, allow_infinity=False),
    ),
    min_size=1,
    max_size=60,
)


class TestSaltedAggregate:
    @given(rows=ROWS)
    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    def test_equals_plain_groupby(self, spark, rows):
        df = spark.createDataFrame(
            [(f"k{k}", u, float(v)) for k, u, v in rows],
            "event_type string, user_id long, value double",
        )
        salted = {
            r["event_type"]: r.asDict()
            for r in salted_aggregate(df, "event_type", "user_id", salt_factor=4).collect()
        }
        plain = {
            r["event_type"]: r.asDict()
            for r in df.groupBy("event_type")
            .agg(
                F.count("*").cast("bigint").alias("n_events"),
                # same exact-decimal accumulation as the operator: the
                # equality below is then BIT-equality, the property the
                # 100× sweep showed plain double sums cannot give
                F.sum(F.col("value").cast("decimal(18,6)"))
                .cast("double")
                .alias("sum_value"),
                (F.round(F.max("value"), 6) + 0.0).alias("max_value"),
                F.count_distinct("user_id").cast("bigint").alias("n_users"),
            )
            .collect()
        }
        assert salted.keys() == plain.keys()
        for k in plain:
            for col in ("n_events", "n_users", "max_value", "sum_value"):
                assert salted[k][col] == plain[k][col], (k, col, salted[k], plain[k])


class TestSequencePacking:
    """Invariants of the cumsum-window packing (plans/queries_pipeline.py):
    token totals are conserved, pack ids are dense from 0 per source, and
    every pack except possibly each source's last holds >= budget tokens
    once its boundary doc lands (the floor((cum-tok)/budget) form)."""

    @pytest.fixture(scope="class")
    def packed(self, spark, sf_dir):
        from vectra_player_spark import plans

        df = plans.QUERIES["doc_sequence_packing"].spark_fn(spark, sf_dir)
        return df.orderBy("source", "pack_id").collect()

    def test_token_totals_conserved(self, spark, sf_dir, packed):
        from vectra_player_spark.tables import t

        total = sum(r["pack_tokens"] for r in packed)
        expected = (
            t(spark, sf_dir, "documents")
            .select(F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
            .agg(F.sum("n"))
            .collect()[0][0]
        )
        assert total == expected

    def test_pack_ids_dense_per_source(self, packed):
        by_source: dict[str, list[int]] = {}
        for r in packed:
            by_source.setdefault(r["source"], []).append(r["pack_id"])
        for source, ids in by_source.items():
            assert ids == list(range(len(ids))), (source, ids)

    def test_full_packs_reach_budget(self, packed):
        # every pack that is not its source's last spans the 256 boundary:
        # its cumulative token count reaches the next pack's start
        by_source: dict[str, list] = {}
        for r in packed:
            by_source.setdefault(r["source"], []).append(r)
        for source, rs in by_source.items():
            cum = 0
            for r in rs[:-1]:
                cum += r["pack_tokens"]
                assert cum >= (r["pack_id"] + 1) * 256, (source, r, cum)


class TestIncrementalRollup:
    def test_batch_order_invariant(self, spark, sf_dir):
        from vectra_player_spark.operators.incremental import (
            finalize_rollup,
            merge_rollup,
            rollup_partial,
        )
        from vectra_player_spark.tables import t

        ev = t(spark, sf_dir, "events")

        def fold(order):
            state = None
            for i in order:
                batch = ev.where(F.pmod("event_id", F.lit(3)) == i)
                state = merge_rollup(state, rollup_partial(batch))
            return {
                (r["user_id"], str(r["day"])): r.asDict()
                for r in finalize_rollup(state).collect()
            }

        assert fold([0, 1, 2]) == fold([2, 0, 1])


class TestScd2History:
    """scd2_history vs a pandas reference on arbitrary feeds: versions
    reproduce the (ts, id)-ordered run-length encoding exactly — dense ids,
    abutting validity, one open version per key, conserved event counts."""

    EVENTS = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),            # user
            st.integers(min_value=0, max_value=5),            # ts second offset (dups likely)
            st.sampled_from(["click", "view", "error"]),      # attr
        ),
        min_size=1,
        max_size=40,
    )

    @given(rows=EVENTS)
    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    def test_matches_pandas_rle(self, spark, rows):
        import pandas as pd

        from vectra_player_spark.operators.windows import scd2_history

        data = [
            (i, u, pd.Timestamp("2024-01-01").value // 1000 + s * 1_000_000, a)
            for i, (u, s, a) in enumerate(rows)
        ]
        df = spark.createDataFrame(
            [(i, u, us, a) for i, u, us, a in data],
            "event_id long, user_id long, us long, event_type string",
        ).select("event_id", "user_id", F.timestamp_micros(F.col("us")).alias("ts"), "event_type")
        got = sorted(
            (r.user_id, r.version_id, r.event_type, r.valid_from_us, r.valid_to_us,
             r.is_current, r.n_events)
            for r in scd2_history(df).collect()
        )

        # pandas reference: sort by (ts, id) per user, run-length encode
        pdf = pd.DataFrame(data, columns=["event_id", "user_id", "us", "event_type"])
        want = []
        for uid, g in pdf.groupby("user_id"):
            g = g.sort_values(["us", "event_id"])
            runs = []
            for _, row in g.iterrows():
                if not runs or runs[-1]["attr"] != row.event_type:
                    runs.append({"attr": row.event_type, "from": int(row.us), "n": 0})
                runs[-1]["n"] += 1
                runs[-1]["from"] = min(runs[-1]["from"], int(row.us))
            for i, r in enumerate(runs):
                nxt = runs[i + 1]["from"] if i + 1 < len(runs) else None
                want.append((uid, i + 1, r["attr"], r["from"], nxt, nxt is None, r["n"]))
        assert got == sorted(want)


class TestEpochShuffle:
    def test_each_epoch_is_a_full_permutation(self, spark):
        from vectra_player_spark.plans.queries_pipeline import (
            _SHUFFLE_EPOCHS,
            _SHUFFLE_SHARDS,
            doc_epoch_shuffle,
        )

        out = doc_epoch_shuffle(spark, "/root/testdata/sf0.001").toPandas()
        n_docs = out.doc_id.nunique()
        for e in range(_SHUFFLE_EPOCHS):
            ep = out[out.epoch == e]
            # every doc exactly once per epoch
            assert len(ep) == n_docs and ep.doc_id.nunique() == n_docs
            # shard_pos is 1..len(shard) within each shard
            for _, g in ep.groupby("shard"):
                assert sorted(g.shard_pos) == list(range(1, len(g) + 1))
            assert ep.shard.between(0, _SHUFFLE_SHARDS - 1).all()

    def test_epochs_produce_different_orders(self, spark):
        from vectra_player_spark.plans.queries_pipeline import doc_epoch_shuffle

        out = doc_epoch_shuffle(spark, "/root/testdata/sf0.001").toPandas()
        orders = {
            e: list(g.sort_values(["shard", "shard_pos"]).doc_id)
            for e, g in out.groupby("epoch")
        }
        assert orders[0] != orders[1]  # md5 keyed on epoch -> new permutation


class TestMixtureTemperature:
    def test_tempered_shares_flatten_toward_uniform(self, spark):
        from vectra_player_spark.plans.queries_pipeline import doc_mixture_temperature

        out = doc_mixture_temperature(spark, "/root/testdata/sf0.001").toPandas()
        assert abs(out.p_raw.sum() - 1.0) < 1e-4
        assert abs(out.q_temp.sum() - 1.0) < 1e-4
        # τ<1 compresses the spread: tempered max/min ratio strictly
        # below the natural one (unless already uniform)
        nat = out.p_raw.max() / out.p_raw.min()
        temp = out.q_temp.max() / out.q_temp.min()
        assert temp <= nat
        # sampling rate equalizes token budgets: rate > 1 exactly for
        # sources whose natural share is below the tempered share
        above = out[out.q_temp > out.p_raw]
        assert (above.sample_rate > 1.0 - 1e-9).all()


class TestBloomDecontamination:
    def test_bloom_candidates_superset_and_exact_agreement(self, spark):
        from vectra_player_spark.plans.queries_text import (
            doc_decontamination,
            doc_decontamination_bloom,
        )

        sf = "/root/testdata/sf0.001"
        bloom = doc_decontamination_bloom(spark, sf).toPandas().set_index("doc_id")
        exact = doc_decontamination(spark, sf).toPandas().set_index("doc_id")
        # Bloom never misses (no false negatives): candidates >= confirmed,
        # and confirmed equals the exact check's shared-shingle verdict
        assert (bloom.n_candidates >= bloom.n_confirmed).all()
        assert (bloom.bloom_false_positives >= 0).all()
        joined = bloom.join(exact, lsuffix="_b")
        assert (joined.contaminated_b == joined.contaminated).all()

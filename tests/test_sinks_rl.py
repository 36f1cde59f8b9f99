"""S9 upsert sink and M20 RL observation builder tests."""

from __future__ import annotations

import sqlite3

from pyspark.sql import functions as F

from vectra_player_spark.operators.rl_dataset import build_rl_observations
from vectra_player_spark.sources.upsert_sink import upsert_games_batch, write_upsert


class TestUpsertSink:
    def test_monotone_and_coalesce_semantics(self, tmp_path):
        db = str(tmp_path / "games.db")
        upsert_games_batch(
            db,
            [
                {"game_id": "g1", "peak_multiplier": 1.5, "rugged": False, "n_ticks": 10},
                {"game_id": "g2", "peak_multiplier": 2.0, "rugged": True,
                 "server_seed": "s2", "n_ticks": 5},
            ],
        )
        # re-broadcast with lower peak, rug flag set, seed revealed
        upsert_games_batch(
            db,
            [
                {"game_id": "g1", "peak_multiplier": 1.2, "rugged": True,
                 "server_seed": "s1", "n_ticks": 12},
                {"game_id": "g2", "peak_multiplier": 1.0, "rugged": False,
                 "server_seed": "OTHER", "n_ticks": 3},
            ],
        )
        con = sqlite3.connect(db)
        rows = {
            r[0]: r
            for r in con.execute(
                "SELECT game_id, peak_multiplier, rugged, server_seed, n_ticks FROM games"
            )
        }
        con.close()
        assert rows["g1"] == ("g1", 1.5, 1, "s1", 12)  # MAX peak, monotone rug
        assert rows["g2"] == ("g2", 2.0, 1, "s2", 5)  # rug never un-sets; seed keeps first

    def test_write_upsert_from_dataframe(self, spark, tmp_path):
        db = str(tmp_path / "games2.db")
        df = spark.createDataFrame(
            [("g1", 3.0, True, "seed", 7)],
            "game_id string, peak_multiplier double, rugged boolean, server_seed string, n_ticks long",
        )
        write_upsert(df, db)
        con = sqlite3.connect(db)
        assert con.execute("SELECT COUNT(*) FROM games").fetchone()[0] == 1
        con.close()

    def test_distributed_merge_matches_driver_merge(self, spark, tmp_path):
        """Partition-parallel foreachPartition merge produces the exact
        same table as applying the merge rules in one driver-side batch —
        and the handler contains no .collect()."""
        import inspect

        from vectra_player_spark.sources import upsert_sink

        # One distinct non-null seed per game — the feed invariant (a game
        # reveals its seed once); under it the per-key fold is fully
        # order-independent, so driver-order and distributed application
        # must agree exactly.
        rows = [
            ("g1", 1.5, False, None, 10),
            ("g2", 2.0, True, "s2", 5),
            ("g1", 1.2, True, "s1", 12),  # re-broadcast: lower peak, rug set
            ("g2", 1.0, False, None, 3),
            ("g3", 9.9, False, None, 1),
        ]
        schema = (
            "game_id string, peak_multiplier double, rugged boolean, "
            "server_seed string, n_ticks long"
        )

        db_driver = str(tmp_path / "driver.db")
        upsert_games_batch(
            db_driver,
            [
                dict(zip(["game_id", "peak_multiplier", "rugged", "server_seed", "n_ticks"], r))
                for r in rows
            ],
        )

        db_dist = str(tmp_path / "dist.db")
        write_upsert(
            spark.createDataFrame(rows, schema).repartition(8), db_dist,
            num_partitions=4,
        )

        def table(db):
            con = sqlite3.connect(db)
            got = sorted(
                con.execute(
                    "SELECT game_id, peak_multiplier, rugged, server_seed, n_ticks FROM games"
                )
            )
            con.close()
            return got

        assert table(db_dist) == table(db_driver)
        assert ".collect()" not in inspect.getsource(upsert_sink.write_upsert)
        assert ".collect()" not in inspect.getsource(upsert_sink._partition_merger)


class TestRLObservations:
    def test_obs_shape_and_values(self, spark):
        eps = spark.createDataFrame(
            [("g1", s, 1.0 + 0.1 * s) for s in range(12)],
            "game_id string, seq long, value double",
        )
        obs = build_rl_observations(eps, {0: 0.1, 5: 0.4}).collect()
        assert len(obs) == 12
        by_tick = {r.tick: r.obs for r in obs}
        assert all(len(v) == 15 for v in by_tick.values())
        assert by_tick[0][0] == 0.0 and by_tick[11][0] == 11.0  # tick feature
        assert by_tick[5][10] == 0.4 and by_tick[3][10] == 0.0  # p_rug lookup
        assert by_tick[0][14] == 1.0  # bias term
        assert by_tick[0][2] == 0.0  # lag null -> 0 fill on first tick

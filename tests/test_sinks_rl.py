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

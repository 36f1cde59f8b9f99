"""EventStore query API — the engine's equivalent of the reference's
EventStoreQuery (src/services/event_store/duckdb.py:82-458).

Same call surface, Spark semantics underneath. Where the reference runs one
DuckDB query per game (the N+1 pattern, duckdb.py:155-238), the engine
returns episode-keyed DataFrames — one shuffle on game_id replaces N
scans, which is the shape that survives 100 TB.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vectra_player_spark.operators.windows import tick_features as _tick_features
from vectra_player_spark.schema import COMPLETE_GAME_SCHEMA


class EventStore:
    """Query layer over an envelope lake DataFrame (see sources.event_lake).

    Method-for-method coverage of the reference's EventStoreQuery
    (duckdb.py:48-458): query/query_arrow, episode fetchers, player
    queries, listings and counts — with the N+1 patterns replaced by
    episode-keyed DataFrames.
    """

    VIEW_NAME = "events_lake"

    def __init__(self, envelope: DataFrame):
        self.envelope = envelope

    # -- ad-hoc SQL (duckdb.py:82-123) --------------------------------------

    def query(self, sql: str, params: dict | None = None) -> DataFrame:
        """§3.1 ad-hoc SQL entry point: the envelope is exposed as the
        `events_lake` view; Catalyst replaces DuckDB's parse/bind/optimize.

        `params` mirrors the reference's `$named` parameter binding
        (duckdb.py:82-123): `store.query("... WHERE doc_type = :dt",
        {"dt": "game_tick"})` — values bind as literals in the analyzed
        plan (never string-spliced), so pushdown still sees constants."""
        self.envelope.createOrReplaceTempView(self.VIEW_NAME)
        return self.envelope.sparkSession.sql(sql, args=params or {})

    def query_arrow(self, sql: str, params: dict | None = None):
        """S13: zero-copy-ish Arrow exchange (duckdb.py:104-123)."""
        return self.query(sql, params).toArrow()

    # -- episodes (duckdb.py:129-184) --------------------------------------

    def game_episode(self, game_id: str) -> DataFrame:
        """All events of one game, episode-ordered (P2, O1)."""
        return (
            self.envelope.where(F.col("game_id") == game_id)
            .orderBy("seq")
        )

    def episodes_batch(self, game_ids: list[str]) -> DataFrame:
        """J3: IN-list batch fetch — one scan, all requested episodes."""
        return self.envelope.where(F.col("game_id").isin(game_ids))

    def qualifying_games(self, min_ticks: int = 10) -> DataFrame:
        """J1: games with at least min_ticks ticks (duckdb.py:208-224)."""
        return (
            self.envelope.where(
                (F.col("doc_type") == "game_tick") & F.col("game_id").isNotNull()
            )
            .groupBy("game_id")
            .agg(F.count(F.lit(1)).alias("tick_count"))
            .where(F.col("tick_count") >= min_ticks)
        )

    def iter_episodes(self, min_ticks: int = 10, limit: int | None = None):
        """duckdb.py:155-238 without the N+1 pattern: ONE qualifying-games
        scan + ONE episode-keyed fetch; yields (game_id, pandas) pairs at
        the driver edge like the reference's generator. For distributed
        per-episode compute use applyInPandas instead — this iterator is
        the drop-in for the reference's driver-side consumers.

        Driver memory is bounded per-episode, not per-result-set: the
        sorted frame is consumed incrementally via toLocalIterator() (one
        partition in flight at a time), so only the episode currently
        being assembled is resident — the reference generator's memory
        profile, regardless of how many games qualify."""
        qualifying = self.qualifying_games(min_ticks).select("game_id")
        if limit is not None:
            # A limited id set is small by construction — broadcast it.
            qualifying = F.broadcast(qualifying.orderBy("game_id").limit(limit))
        sorted_rows = (
            self.envelope.join(qualifying, "game_id", "left_semi")
            .orderBy("game_id", "seq")
        )
        columns = sorted_rows.columns
        gid_idx = columns.index("game_id")
        current_gid, buf = None, []
        for row in sorted_rows.toLocalIterator(prefetchPartitions=True):
            gid = row[gid_idx]
            if gid != current_gid and buf:
                yield current_gid, pd.DataFrame(buf, columns=columns)
                buf = []
            current_gid = gid
            buf.append(tuple(row))
        if buf:
            yield current_gid, pd.DataFrame(buf, columns=columns)

    def player_events(self, player_id: str) -> DataFrame:
        """J2: all events of every game the player touched — semi-join on
        the player's games then re-fetch rows (duckdb.py:296-310)."""
        player_games = (
            self.envelope.where(F.col("player_id") == player_id)
            .select("game_id")
            .where(F.col("game_id").isNotNull())
            .distinct()
        )
        return self.envelope.join(F.broadcast(player_games), "game_id", "left_semi")

    # -- features (duckdb.py:408-458) ---------------------------------------

    def tick_features(self) -> DataFrame:
        """W1-W4 feature block over game_tick rows, cast-at-read from the
        Decimal-as-string price column (the reference's CAST(price AS
        DOUBLE) read-time discipline)."""
        ticks = self.envelope.where(
            (F.col("doc_type") == "game_tick") & F.col("game_id").isNotNull()
        ).select("game_id", "seq", F.col("price").cast("double").alias("price"))
        return _tick_features(ticks, "game_id", "seq", "price")

    # -- listings (duckdb.py:340-402, data_service.py) ----------------------

    def list_games(self, limit: int = 1000) -> DataFrame:
        return (
            self.envelope.where(F.col("game_id").isNotNull())
            .groupBy("game_id")
            .agg(F.count(F.lit(1)).alias("n_events"), F.min("ts").alias("first_ts"))
            .orderBy("first_ts")
            .limit(limit)
        )

    def doc_type_counts(self) -> DataFrame:
        return self.envelope.groupBy("doc_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )

    def get_player_games(self, player_id: str, limit: int = 100) -> DataFrame:
        """duckdb.py:279-310: games a player participated in, with bounds."""
        return (
            self.envelope.where(
                (F.col("player_id") == player_id) & F.col("game_id").isNotNull()
            )
            .groupBy("game_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.min("ts").alias("first_ts"),
                F.max("ts").alias("last_ts"),
            )
            .orderBy("first_ts")
            .limit(limit)
        )

    def get_player_actions(self, player_id: str, limit: int = 100) -> DataFrame:
        """duckdb.py:312-338: a player's action rows, episode-ordered."""
        return (
            self.envelope.where(
                (F.col("player_id") == player_id)
                & (F.col("doc_type") == "player_action")
            )
            .orderBy("seq")
            .limit(limit)
        )

    def list_players(self, limit: int = 100) -> DataFrame:
        """duckdb.py:363-384: distinct players with activity bounds."""
        return (
            self.envelope.where(F.col("player_id").isNotNull())
            .groupBy("player_id")
            .agg(F.count(F.lit(1)).alias("n_events"), F.min("ts").alias("first_ts"))
            .orderBy("first_ts")
            .limit(limit)
        )

    def count_events(self, doc_type: str | None = None) -> int:
        """duckdb.py:386-402 — partition-pruned when doc_type is given."""
        df = self.envelope
        if doc_type is not None:
            df = df.where(F.col("doc_type") == doc_type)
        return df.count()


def load_games(envelope: DataFrame, min_prices: int = 2) -> DataFrame:
    """complete_game loader ≙ load_game_data
    (notebooks/bayesian_sidebet_analysis.py:34-87):

    JSON-extract the game document, best-row dedup per game_id preferring
    the longest price array then newest row (the deterministic ROW_NUMBER
    form of drop_duplicates keep-first, build_scalping_dataset.py:60-73),
    then derive duration / peak / rug tick columns.
    """
    games = (
        envelope.where(F.col("doc_type") == "complete_game")
        .select(
            "ts",
            F.coalesce(
                F.get_json_object("raw_json", "$.id"),
                F.get_json_object("raw_json", "$.gameId"),
            ).alias("game_id"),
            F.from_json("raw_json", COMPLETE_GAME_SCHEMA).alias("g"),
        )
        .where(F.col("game_id").isNotNull())
        .select(
            "game_id",
            "ts",
            F.col("g.prices").alias("prices"),
            F.col("g.peakMultiplier").alias("peak_multiplier"),
            F.col("g.rugged").alias("rugged"),
            F.col("g.timestamp").alias("timestamp_ms"),
            F.col("g.gameVersion").alias("game_version"),
            F.col("g.provablyFair.serverSeedHash").alias("server_seed_hash"),
            F.col("g.globalSidebets").alias("sidebets"),
        )
        .where(F.size("prices") >= min_prices)
    )
    w = Window.partitionBy("game_id").orderBy(
        F.desc(F.size("prices")), F.desc("ts")
    )
    deduped = games.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")

    # rug tick = argmax single-tick drop (M1); computed with one array pass:
    # drops[i] = prices[i-1] - prices[i]; array_position of the max drop.
    drops = F.expr(
        "transform(sequence(1, size(prices) - 1), i -> prices[i - 1] - prices[i])"
    )
    return deduped.select(
        "*",
        F.size("prices").alias("duration_ticks"),
        F.element_at("prices", -1).alias("final_price"),
        (F.size("prices") < 40).alias("is_unplayable"),
        F.when(
            F.size("prices") >= 2,
            F.expr(
                "array_position("
                "transform(sequence(1, size(prices) - 1), i -> prices[i - 1] - prices[i]),"
                "array_max(transform(sequence(1, size(prices) - 1), i -> prices[i - 1] - prices[i]))"
                ")"
            ),
        ).alias("rug_tick"),
    )


def explode_sidebets(games: DataFrame) -> DataFrame:
    """J4: parent→child enrichment without a join — explode keeps the game
    context columns on every sidebet row (export_for_julius.py:63-105).
    Adds the derived labels of sidebets_deduplicated.parquet (FIXTURES §4)."""
    sb = games.select(
        "game_id",
        "duration_ticks",
        F.explode("sidebets").alias("b"),
    )
    start = F.col("b.startedAtTick")
    end = F.coalesce(F.col("b.end"), start + 40)
    return sb.select(
        "game_id",
        "duration_ticks",
        F.col("b.playerId").alias("player_id"),
        F.col("b.username").alias("username"),
        F.col("b.betAmount").alias("bet_amount"),
        F.col("b.xPayout").alias("x_payout"),
        start.alias("start_tick"),
        end.alias("end_tick"),
        ((F.col("duration_ticks") > start) & (F.col("duration_ticks") <= end)).alias("bet_won"),
        (F.col("duration_ticks") - start).alias("ticks_to_rug"),
        (start >= 200).alias("bet_in_optimal_zone"),
    )

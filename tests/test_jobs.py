"""Script-parity batch jobs over the integration lake fixture."""

from __future__ import annotations

import glob

from vectra_player_spark.jobs import (
    build_scalping_dataset,
    export_games_julius,
    export_lake_jsonl,
)
from tests.test_integration import pipeline_lake  # fixture reuse  # noqa: F401


def test_build_scalping_dataset(spark, pipeline_lake, tmp_path):  # noqa: F811
    out = str(tmp_path / "scalp")
    df = build_scalping_dataset(spark, pipeline_lake, out, min_price_len=15)
    rows = df.collect()
    assert 0 < len(rows) < 12  # the min-length predicate filters some games
    assert all(r.duration_ticks >= 15 for r in rows)
    assert all(all(p > 0 for p in r.prices) for r in rows)
    assert glob.glob(f"{out}/*.json")  # JSONL written


def test_export_games_julius(spark, pipeline_lake, tmp_path):  # noqa: F811
    out = str(tmp_path / "julius")
    summary, sidebets = export_games_julius(spark, pipeline_lake, out)
    assert summary.count() == 12
    assert sidebets.count() == 12
    for sub in ("games_summary", "sidebets_flat"):
        files = glob.glob(f"{out}/{sub}/*.csv")
        assert files
        header = open(files[0]).readline()
        assert "game_id" in header


def test_export_lake_jsonl(spark, pipeline_lake, tmp_path):  # noqa: F811
    out = str(tmp_path / "jsonl")
    export_lake_jsonl(spark, pipeline_lake, out)
    assert glob.glob(f"{out}/doc_type=game_tick/*.json")
    assert glob.glob(f"{out}/doc_type=complete_game/*.json")

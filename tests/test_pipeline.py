"""End-to-end game ETL: raw PGN + JSON fixture rows -> all seven
reference tables in one lazy plan, then materialized via the upsert
sink and re-read (the reference's full docker_entrypoint DAG,
SURVEY §3.1, compressed into one function call)."""

from __future__ import annotations

import pyspark.sql.functions as F

from chess_pipeline_spark.pipeline import materialize, run_game_etl
from chess_pipeline_spark.schemas import POSITION_EVALS, RAW_JSON, RAW_PGN
from tests.test_chess_domain import PLAYER, _json_row, _pgn_row


def _inputs(spark):
    pgn_rows = [
        _pgn_row(),
        _pgn_row(Site="https://lichess.org/game0002", Result="1/2-1/2"),
        _pgn_row(
            Site="https://lichess.org/game0003",
            White="SomeoneElse",
            Black=PLAYER,
            evaluations=[0.0, 0.0],  # no embedded evals
        ),
    ]
    json_rows = [
        _json_row(),
        _json_row(id="game0002"),
        _json_row(
            id="game0003",
            players_white_user_name="SomeoneElse",
            players_black_user_name=PLAYER,
        ),
    ]
    pgn = spark.createDataFrame([tuple(r.values()) for r in pgn_rows], RAW_PGN)
    js = spark.createDataFrame([tuple(r.values()) for r in json_rows], RAW_JSON)
    return pgn, js


def test_full_etl_shapes_and_keys(spark):
    pgn, js = _inputs(spark)
    cache = spark.createDataFrame([], POSITION_EVALS)
    out = run_game_etl(pgn, js, PLAYER, cache)

    assert out.chess_games.count() == 3
    assert {"player", "game_link", "player_color", "player_result"} <= set(
        out.chess_games.columns
    )
    # 2 half-moves per fixture game
    for t in (out.game_moves, out.game_clocks, out.game_positions, out.game_materials):
        assert t.count() == 6
        assert t.select("game_link", "half_move").distinct().count() == 6
    # eval cache: embedded evals from 2 games, deduped by fen (the
    # two games share identical position lists in the fixture)
    evals = out.position_evals
    assert evals.count() == evals.select("fen").distinct().count()
    # win probabilities on every half-move, probabilities sum to 1
    wp = out.win_probabilities
    assert wp.count() == 6
    s = wp.withColumn(
        "s",
        F.col("win_probability_white")
        + F.col("draw_probability")
        + F.col("win_probability_black"),
    )
    assert s.filter(F.abs(F.col("s") - 1.0) > 5e-6).count() == 0


def test_full_etl_materialize_roundtrip(spark, tmp_path):
    pgn, js = _inputs(spark)
    cache = spark.createDataFrame([], POSITION_EVALS)
    out = run_game_etl(pgn, js, PLAYER, cache)
    base = str(tmp_path / "wh")
    materialize(out, base)
    # idempotent: second run rewrites, no dupes
    materialize(out, base)
    for name, df in out.tables().items():
        got = spark.read.parquet(f"{base}/{name}")
        assert got.count() == df.count(), name
        assert set(got.columns) == set(df.columns), name

"""PGN parser tests against literal games — mirrors the reference's
visitor tests (tests/test_visitors.py:9-215 scenario shapes: evals
incl. mate fill, clocks + berserk, castling, promotions, queen
exchange)."""

from __future__ import annotations

import pyspark.sql.functions as F

from chess_pipeline_spark.parse import parse_pgn_dataframe, parse_pgn_game

PGN_FULL = """[Event "Rated Blitz game"]
[Site "https://lichess.org/abcd1234"]
[Date "2024.01.29"]
[White "PlayerOne"]
[Black "PlayerTwo"]
[Result "1-0"]
[UTCDate "2024.01.29"]
[UTCTime "02:34:14"]
[WhiteElo "1800"]
[BlackElo "1750"]
[WhiteRatingDiff "+8"]
[BlackRatingDiff "-7"]
[TimeControl "300+3"]
[ECO "B30"]
[Opening "Sicilian Defense"]
[Termination "Normal"]

1. e4 { [%eval 0.3] [%clk 0:05:00] } 1... c5 { [%eval -0.1] [%clk 0:05:00] }
2. Nf3 { [%eval 0.25] [%clk 0:04:58] } 2... d6 { [%eval 0.2] [%clk 0:04:57] } 1-0
"""

PGN_MATE = """[Event "Game"]
[Site "https://lichess.org/mate0001"]
[Result "1-0"]
[TimeControl "60+0"]

1. e4 { [%eval 0.3] [%clk 0:01:00] } 1... g5 { [%eval 0.9] [%clk 0:01:00] } 2. Nc3 { [%eval 0.6] [%clk 0:00:59] } 2... f5 { [%eval #2 ] [%clk 0:00:58] } 3. Qh5# 1-0
"""

PGN_FEATURES = """[Event "Arena"]
[Site "https://lichess.org/feat0001"]
[Result "0-1"]
[TimeControl "120+1"]

1. d4 { [%clk 0:01:00] } 1... d5 { [%clk 0:02:00] } 2. e4 { [%clk 0:00:58] } 2... dxe4 { [%clk 0:01:59] } 3. Qxd8+ { [%clk 0:00:55] } 3... Kxd8 { [%clk 0:01:58] } 4. O-O-O { [%clk 0:00:52] } 4... e1=Q { [%clk 0:01:55] } 0-1
"""


def test_headers_moves_clocks_evals():
    g = parse_pgn_game(PGN_FULL)
    assert g["White"] == "PlayerOne" and g["Black"] == "PlayerTwo"
    assert g["Variant"] == "Standard"  # default, transforms.py:216-217
    assert g["moves"] == ["e4", "c5", "Nf3", "d6"]
    assert g["clocks"] == ["0:05:00", "0:05:00", "0:04:58", "0:04:57"]
    assert g["evaluations"] == [0.3, -0.1, 0.25, 0.2]
    assert g["eval_depths"] == [20, 20, 20, 20]
    assert not g["white_berserked"] and not g["black_berserked"]
    assert not g["queen_exchange"] and not g["has_promotion"]


def test_mate_eval_and_checkmate_fill():
    g = parse_pgn_game(PGN_MATE)
    # '#2' annotation -> 9999; the final mating move has NO comment,
    # so like the reference's per-comment visitor nothing is
    # appended — the list is ragged (4 entries for 5 moves)
    assert g["evaluations"] == [0.3, 0.9, 0.6, 9999.0]
    assert g["moves"][-1] == "Qh5#"
    # with a clk-only comment on the mating move, the visitor's
    # elif fires: result-based fill at depth 20 (visitors.py:33-47)
    pgn2 = PGN_MATE.replace("3. Qh5# 1-0", "3. Qh5# { [%clk 0:00:57] } 1-0")
    g2 = parse_pgn_game(pgn2)
    assert g2["evaluations"] == [0.3, 0.9, 0.6, 9999.0, 9999.0]
    assert g2["eval_depths"][-1] == 20


def test_no_eval_game_has_empty_evals():
    g = parse_pgn_game(PGN_FEATURES)
    assert g["evaluations"] == [] and g["eval_depths"] == []


def test_berserk_detection():
    g = parse_pgn_game(PGN_FEATURES)
    # white first clock 60s == half of 120 -> berserked; black 120 -> not
    assert g["white_berserked"] is True
    assert g["black_berserked"] is False


def test_castling_promotions_queen_exchange():
    g = parse_pgn_game(PGN_FEATURES)
    assert g["castling_sides"] == {"white": "queenside", "black": None}
    assert g["queen_exchange"] is True  # Qxd8+ then Kxd8
    assert g["has_promotion"] is True
    assert g["promotion_count_black"] == 1 and g["promotions_black"] == "q"
    assert g["promotion_count_white"] == 0 and g["promotions_white"] == ""


def test_parse_dataframe_roundtrip(spark):
    df = spark.createDataFrame([(PGN_FULL,), (PGN_FEATURES,)], "pgn string")
    out = parse_pgn_dataframe(df)
    rows = {r.Site: r for r in out.collect()}
    assert len(rows) == 2
    full = rows["https://lichess.org/abcd1234"]
    assert full.moves == ["e4", "c5", "Nf3", "d6"]
    assert full.castling_sides.white is None
    feat = rows["https://lichess.org/feat0001"]
    assert feat.castling_sides.white == "queenside"
    assert feat.promotion_count_black == 1
    # board-tier columns are always populated by the self-contained
    # SAN replay (board.py); PGN_FEATURES is a synthetic ILLEGAL game
    # (Qxd8+ through a blocked file), so — like python-chess, which
    # truncates the mainline at the first illegal SAN — the replay
    # keeps only the legal prefix (d4 d5 e4 dxe4)
    assert full.positions is not None and len(full.positions) == 4
    assert feat.positions is not None and len(feat.positions) == 4
    assert len(feat.material_by_move) == 5


def test_evals_cache_dance(spark):
    """The stockfish.py cache composition: split -> anti-join ->
    fetch -> union -> dedup (J7+U1+A8) with a fixture engine."""
    from chess_pipeline_spark.operators.evals import (
        attach_evals,
        fetch_missing,
        missing_fens,
        resolve_evals,
        split_by_has_evals,
    )
    from chess_pipeline_spark.schemas import POSITION_EVALS

    games = spark.createDataFrame(
        [
            ("g1", [0.5, -0.5], [20, 20], ["fenA 0 1", "fenB 0 2"]),
            ("g2", [0.0, 0.0], [0, 0], ["fenC 0 1", "fenD 0 2"]),
        ],
        "game_link string, evaluations array<double>, eval_depths array<int>, positions array<string>",
    )
    with_evals, without = split_by_has_evals(games)
    assert [r.game_link for r in with_evals.collect()] == ["g1"]
    assert [r.game_link for r in without.collect()] == ["g2"]

    cache = spark.createDataFrame([("fenC 0", 1.25, 18)], POSITION_EVALS)
    from chess_pipeline_spark.operators.chess_transforms import explode_positions

    cand = explode_positions(without.withColumnRenamed("positions", "positions_raw")
                             .withColumnRenamed("positions_raw", "positions"))
    missing = missing_fens(cand, cache)
    assert sorted(r.fen for r in missing.collect()) == ["fenD 0"]  # fenC cached

    fetched = fetch_missing(missing, fetch_fn=lambda f: (0.75, 12))
    new_cache = resolve_evals(with_evals, fetched, cache)
    got = {r.fen: (r.evaluation, r.eval_depth) for r in new_cache.collect()}
    assert got == {
        "fenA 0": (0.5, 20),
        "fenB 0": (-0.5, 20),
        "fenC 0": (1.25, 18),
        "fenD 0": (0.75, 12),
    }

    positions = spark.createDataFrame(
        [("g9", 1, "fenA 0"), ("g9", 2, "fenZ 0")],
        "game_link string, half_move int, fen string",
    )
    joined = attach_evals(positions, new_cache)
    vals = {r.half_move: r.evaluation for r in joined.collect()}
    assert vals == {1: 0.5, 2: 0.0}  # missing -> 0 (inference.py:45)


def test_board_tier_fen_and_material_fixtures(spark):
    """Board tier vs reference visitor semantics
    (visitors.py:130-143 PositionsVisitor: FEN after each move,
    starting position skipped; visitors.py:182-196 MaterialVisitor:
    piece-symbol counter per position INCLUDING the start, kings in).
    The tier runs on the self-contained SAN replay engine
    (chess_pipeline_spark/board.py) — no python-chess gate."""
    g = parse_pgn_game(PGN_FULL)
    assert g["positions"] is not None and g["material_by_move"] is not None
    # PositionsVisitor: one FEN per move (no starting position)
    placements = [f.split(" ")[0] for f in g["positions"]]
    assert placements == [
        "rnbqkbnr/pppppppp/8/8/4P3/8/PPPP1PPP/RNBQKBNR",       # 1. e4
        "rnbqkbnr/pp1ppppp/8/2p5/4P3/8/PPPP1PPP/RNBQKBNR",     # 1... c5
        "rnbqkbnr/pp1ppppp/8/2p5/4P3/5N2/PPPP1PPP/RNBQKB1R",   # 2. Nf3
        "rnbqkbnr/pp2pppp/3p4/2p5/4P3/5N2/PPPP1PPP/RNBQKB1R",  # 2... d6
    ]
    # MaterialVisitor: n_moves+1 entries, entry 0 = full starting set;
    # no captures in this game so every entry is the full 32 pieces
    start = {"P": 8, "p": 8, "N": 2, "n": 2, "B": 2, "b": 2,
             "R": 2, "r": 2, "Q": 1, "q": 1, "K": 1, "k": 1}
    assert len(g["material_by_move"]) == len(g["positions"]) + 1
    for entry in g["material_by_move"]:
        assert entry == start

    # and the same non-nulls must survive the executor-side
    # mapInPandas path (the import gate runs on executors too)
    df = spark.createDataFrame([(PGN_FULL,)], "pgn string")
    row = parse_pgn_dataframe(df).select("positions", "material_by_move").first()
    assert row["positions"] is not None and len(row["positions"]) == 4
    assert row["material_by_move"] is not None and len(row["material_by_move"]) == 5

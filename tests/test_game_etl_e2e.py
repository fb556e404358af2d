"""Board-tier PGN e2e over the reference's own visitor-fixture games:
raw multi-game PGN text + raw JSON -> CLI -> seven materialized
tables, with game_positions and game_materials checked value-for-value
against /root/reference/tests/test_visitors.py expectations
(PositionsVisitor fixture game `1. e4 c5 2. f4 d6`, MaterialVisitor
fixture game `1. d4 e5 2. dxe5`). Closes the SURVEY §3.1 loop: the
same corpus the reference's visitors are tested on flows through the
full composed DAG here."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import run_etl  # noqa: E402

from tests.test_chess_domain import PLAYER, _json_row  # noqa: E402

# PositionsVisitor fixture moves (reference tests/test_visitors.py:141-157)
_PGN_POSITIONS = f"""[Event "Rated Blitz game"]
[Site "https://lichess.org/TTYLmSUX"]
[White "{PLAYER}"]
[Black "Opponent"]
[Result "1-0"]
[WhiteElo "1800"]
[BlackElo "1750"]
[TimeControl "300+3"]

1. e4 {{ [%eval 0.3] [%clk 0:05:00] }} 1... c5 {{ [%eval -0.1] [%clk 0:05:00] }} 2. f4 {{ [%eval 0.2] [%clk 0:04:58] }} 2... d6 {{ [%eval 0.3] [%clk 0:04:57] }} 1-0
"""

# MaterialVisitor fixture moves (reference tests/test_visitors.py:197-215);
# no eval comments — exercises the empty-evaluations path end-to-end
_PGN_MATERIALS = f"""[Event "Rated Blitz game"]
[Site "https://lichess.org/matfix01"]
[White "{PLAYER}"]
[Black "Opponent"]
[Result "1-0"]
[WhiteElo "1800"]
[BlackElo "1750"]
[TimeControl "300+3"]

1. d4 {{ [%clk 0:05:00] }} 1... e5 {{ [%clk 0:05:00] }} 2. dxe5 {{ [%clk 0:04:58] }} 1-0
"""

# PositionsVisitor expected FENs, after the pipeline's
# strip_fen_move_counter (reference transforms.py:246-248 drops the
# trailing fullmove number)
_EXPECTED_FENS = [
    "rnbqkbnr/pppppppp/8/8/4P3/8/PPPP1PPP/RNBQKBNR b KQkq - 0",
    "rnbqkbnr/pp1ppppp/8/2p5/4P3/8/PPPP1PPP/RNBQKBNR w KQkq - 0",
    "rnbqkbnr/pp1ppppp/8/2p5/4PP2/8/PPPP2PP/RNBQKBNR b KQkq - 0",
    "rnbqkbnr/pp2pppp/3p4/2p5/4PP2/8/PPPP2PP/RNBQKBNR w KQkq - 0",
]


def test_visitor_fixture_corpus_through_full_dag(spark, tmp_path):
    pgn_file = tmp_path / "corpus.pgn"
    pgn_file.write_text(_PGN_POSITIONS + "\n\n" + _PGN_MATERIALS)
    json_file = tmp_path / "corpus.ndjson"
    json_file.write_text(
        "\n".join(
            json.dumps(r)
            for r in (_json_row(id="TTYLmSUX"), _json_row(id="matfix01"))
        )
    )
    out = tmp_path / "wh"
    rc = run_etl.main(
        [
            "games",
            "--pgn", str(pgn_file),
            "--json", str(json_file),
            "--player", PLAYER,
            "--out", str(out),
        ],
        spark=spark,
    )
    assert rc == 0

    t = {
        name: spark.read.parquet(str(out / name))
        for name in (
            "chess_games",
            "game_moves",
            "game_clocks",
            "game_positions",
            "game_materials",
            "position_evals",
            "win_probabilities",
        )
    }

    # --- row counts for all seven tables ---
    assert t["chess_games"].count() == 2
    assert t["game_moves"].count() == 4 + 3
    assert t["game_clocks"].count() == 4 + 3
    # PositionsVisitor: one FEN per half-move, starting position skipped
    assert t["game_positions"].count() == 4 + 3
    # MaterialVisitor: one entry per half-move PLUS the starting position
    assert t["game_materials"].count() == 5 + 4
    # embedded evals exist only in the positions-fixture game
    assert t["position_evals"].count() == 4

    # --- game_positions vs the PositionsVisitor fixture, in order ---
    got_fens = [
        r.fen
        for r in t["game_positions"]
        .filter("game_link LIKE '%TTYLmSUX'")
        .orderBy("half_move")
        .collect()
    ]
    assert got_fens == _EXPECTED_FENS

    # --- game_materials vs the MaterialVisitor fixture ---
    # [start, after d4, after e5, after dxe5]: full 32-piece material
    # everywhere except one black pawn off after the final capture
    mat = (
        t["game_materials"]
        .filter("game_link LIKE '%matfix01'")
        .orderBy("half_move")
        .collect()
    )
    assert [r.pawns_black for r in mat] == [8, 8, 8, 7]
    assert [r.pawns_white for r in mat] == [8, 8, 8, 8]
    for r in mat:
        assert (
            r.knights_white, r.knights_black, r.bishops_white, r.bishops_black,
            r.rooks_white, r.rooks_black, r.queens_white, r.queens_black,
        ) == (2, 2, 2, 2, 2, 2, 1, 1)

    # --- clocks decode to seconds ---
    clk = [
        r.clock
        for r in t["game_clocks"]
        .filter("game_link LIKE '%TTYLmSUX'")
        .orderBy("half_move")
        .collect()
    ]
    assert clk == [300, 300, 298, 297]

    # --- win probabilities: rows for the eval-bearing game, each a
    # proper distribution ---
    wp = t["win_probabilities"]
    wp_a = wp.filter("game_link LIKE '%TTYLmSUX'").collect()
    assert len(wp_a) == 4
    for r in wp_a:
        s = r.win_probability_white + r.draw_probability + r.win_probability_black
        assert abs(s - 1.0) < 5e-6

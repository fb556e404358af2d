"""SAN replay engine (chess_pipeline_spark/board.py) correctness.

FEN anchors are hand-verified against python-chess ``Board.fen()``
semantics (the reference's PositionsVisitor records exactly those,
visitors.py:130-143), including its 'legal' en-passant convention:
the ep field shows a square only when a fully legal en passant
capture exists for the side to move. When python-chess IS importable
the whole suite is additionally cross-checked move-for-move.
"""

from __future__ import annotations

import pytest

from chess_pipeline_spark.board import Board, IllegalSanError
from chess_pipeline_spark.parse import HAS_PYTHON_CHESS


def _replay(moves: list[str]) -> list[str]:
    b = Board()
    out = []
    for m in moves:
        b.apply_san(m)
        out.append(b.fen())
    return out


def test_start_position_fen():
    assert Board().fen() == (
        "rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR w KQkq - 0 1"
    )


def test_open_game_fens():
    fens = _replay(["e4", "c5", "Nf3", "d6"])
    assert fens == [
        # python-chess 'legal' ep: no black pawn can take on e3 -> '-'
        "rnbqkbnr/pppppppp/8/8/4P3/8/PPPP1PPP/RNBQKBNR b KQkq - 0 1",
        "rnbqkbnr/pp1ppppp/8/2p5/4P3/8/PPPP1PPP/RNBQKBNR w KQkq - 0 2",
        "rnbqkbnr/pp1ppppp/8/2p5/4P3/5N2/PPPP1PPP/RNBQKB1R b KQkq - 1 2",
        "rnbqkbnr/pp2pppp/3p4/2p5/4P3/5N2/PPPP1PPP/RNBQKB1R w KQkq - 0 3",
    ]


def test_scholars_mate_capture_and_material():
    b = Board()
    for m in ["e4", "e5", "Bc4", "Nc6", "Qh5", "Nf6", "Qxf7#"]:
        b.apply_san(m)
    assert b.fen() == (
        "r1bqkb1r/pppp1Qpp/2n2n2/4p3/2B1P3/8/PPPP1PPP/RNB1K1NR b KQkq - 0 4"
    )
    counts = b.piece_counts()
    assert counts["p"] == 7 and counts["P"] == 8  # f7 pawn captured
    assert sum(counts.values()) == 31


def test_castling_both_sides_and_rights():
    fens = _replay(
        ["e4", "e5", "Nf3", "Nc6", "Bc4", "Bc5", "O-O", "d6", "d3", "Bg4"]
    )
    assert fens[6] == (
        "r1bqk1nr/pppp1ppp/2n5/2b1p3/2B1P3/5N2/PPPP1PPP/RNBQ1RK1 b kq - 5 4"
    )
    b = Board()
    for m in ["d4", "d5", "Nc3", "Nc6", "Bf4", "Bf5", "Qd2", "Qd7", "O-O-O", "O-O-O"]:
        b.apply_san(m)
    assert b.fen() == (
        "2kr1bnr/pppqpppp/2n5/3p1b2/3P1B2/2N5/PPPQPPPP/2KR1BNR w - - 8 6"
    )


def test_rook_move_drops_one_castling_right():
    b = Board()
    for m in ["h4", "h5", "Rh3", "Rh6"]:
        b.apply_san(m)
    assert b.fen().split(" ")[2] == "Qq"


def test_rook_capture_drops_opponent_right():
    # white bishop captures the a8 rook: black loses queenside rights
    b = Board()
    for m in ["b3", "Nf6", "Bb2", "e6", "Bxf6", "Qxf6", "Nc3", "Qxc3"]:
        b.apply_san(m)
    # ... and the queen capture on c3 doesn't touch rook squares
    assert b.fen().split(" ")[2] == "KQkq"


def test_en_passant_legal_convention():
    # after e5 then d5, white's e-pawn CAN legally take d6 ep -> shown
    b = Board()
    for m in ["e4", "Nf6", "e5", "d5"]:
        b.apply_san(m)
    assert b.fen() == (
        "rnbqkb1r/ppp1pppp/5n2/3pP3/8/8/PPPP1PPP/RNBQKBNR w KQkq d6 0 3"
    )
    b.apply_san("exd6")
    assert b.fen() == (
        "rnbqkb1r/ppp1pppp/3P1n2/8/8/8/PPPP1PPP/RNBQKBNR b KQkq - 0 3"
    )
    counts = b.piece_counts()
    assert counts["p"] == 7  # the d5 pawn is gone (captured en passant)


def test_double_push_without_capturer_hides_ep_square():
    # 1. e4: black has no pawn on d4/f4, so 'legal' ep field is '-'
    b = Board()
    b.apply_san("e4")
    assert b.fen().split(" ")[3] == "-"


def test_promotion_with_capture():
    # white's h-pawn marches via g6/g7 and promotes by capturing the
    # h8 rook (the g8 knight left via f6-d5-b6)
    b = Board()
    for m in ["h4", "g5", "hxg5", "Nf6", "g6", "Nd5", "g7", "Nb6", "gxh8=Q"]:
        b.apply_san(m)
    placement = b.fen().split(" ")[0]
    assert placement.startswith("rnbqkb1Q/")
    counts = b.piece_counts()
    assert counts["Q"] == 2 and counts["r"] == 1
    # capturing the h8 rook also kills black's kingside castling right
    assert b.fen().split(" ")[2] == "KQq"


def test_knight_disambiguation_by_file():
    # knights on b1 and f3 both reach the (now empty) d2 square;
    # Nbd2 must move the b1 knight
    b = Board()
    for m in ["d4", "d5", "Nf3", "Nf6", "Nbd2"]:
        b.apply_san(m)
    assert b.fen().split(" ")[0] == (
        "rnbqkb1r/ppp1pppp/5n2/3p4/3P4/5N2/PPPNPPPP/R1BQKB1R"
    )


def test_pinned_piece_resolves_ambiguity():
    # knights on c3 and g1 both pseudo-reach the (empty) e2 square,
    # but c3 is pinned by the b4 bishop through the (empty) d2 — bare
    # 'Ne2' is legal SAN and must move the g1 knight
    b = Board()
    for m in ["Nc3", "e6", "e4", "Bb4", "d4", "a6", "Ne2"]:
        b.apply_san(m)
    assert b.fen().split(" ")[0] == (
        "rnbqk1nr/1ppp1ppp/p3p3/8/1b1PP3/2N5/PPP1NPPP/R1BQKB1R"
    )


def test_illegal_san_raises():
    b = Board()
    with pytest.raises(IllegalSanError):
        b.apply_san("e5")  # no white pawn can push there
    with pytest.raises(IllegalSanError):
        b.apply_san("Nd4")  # no knight reaches d4 from the start


def test_halfmove_clock_and_fullmove():
    fens = _replay(["Nf3", "Nf6", "Ng1", "Ng8", "e4"])
    assert fens[3].split(" ")[4:] == ["4", "3"]  # 4 quiet plies
    assert fens[4].split(" ")[4:] == ["0", "3"]  # pawn push resets


@pytest.mark.skipif(not HAS_PYTHON_CHESS, reason="python-chess cross-check")
def test_cross_check_against_python_chess():
    import io

    import chess.pgn

    movetexts = [
        "1. e4 c5 2. Nf3 d6 3. d4 cxd4 4. Nxd4 Nf6 5. Nc3 a6 6. Be2 e5 "
        "7. Nb3 Be7 8. O-O O-O 9. Be3 Be6 1/2-1/2",
        "1. d4 d5 2. c4 dxc4 3. e3 b5 4. a4 c6 5. axb5 cxb5 6. Qf3 1-0",
        "1. e4 Nf6 2. e5 d5 3. exd6 exd6 4. d4 Be7 5. Bd3 O-O 1-0",
    ]
    for mt in movetexts:
        game = chess.pgn.read_game(io.StringIO(mt))
        ref = game.board()
        mine = Board()
        for mv in game.mainline_moves():
            san = ref.san(mv)
            ref.push(mv)
            mine.apply_san(san)
            assert mine.fen() == ref.fen(), (mt, san)

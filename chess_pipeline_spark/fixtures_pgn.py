"""Fixture PGN games for the U1 (PGN parse UDTF) oracle contract.

Three literal games covering the reference visitor scenarios
(reference tests/test_visitors.py:9-215): a fully-annotated blitz
game (evals + clocks), a mate game with a `[%eval #2]` mate score and
a comment-less final move (the ragged-eval tail), and a features game
(berserk clocks, castling, promotion, queen exchange, no evals).
The `pgn_moves_table` catalog query parses these through the REAL
mapInPandas UDTF and explodes the derived per-ply table; its oracle
is the precomputed golden rows — the same goldens-as-oracle strategy
the reference's own visitor tests use. tests/test_parse.py keeps its
richer per-visitor assertions on the same shapes.
"""

from __future__ import annotations

PGN_ORACLE_FULL = """[Event "Rated Blitz game"]
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

PGN_ORACLE_MATE = """[Event "Game"]
[Site "https://lichess.org/mate0001"]
[Result "1-0"]
[TimeControl "60+0"]

1. e4 { [%eval 0.3] [%clk 0:01:00] } 1... g5 { [%eval 0.9] [%clk 0:01:00] } 2. Nc3 { [%eval 0.6] [%clk 0:00:59] } 2... f5 { [%eval #2 ] [%clk 0:00:58] } 3. Qh5# 1-0
"""

PGN_ORACLE_FEATURES = """[Event "Arena"]
[Site "https://lichess.org/feat0001"]
[Result "0-1"]
[TimeControl "120+1"]

1. d4 { [%clk 0:01:00] } 1... d5 { [%clk 0:02:00] } 2. e4 { [%clk 0:00:58] } 2... dxe4 { [%clk 0:01:59] } 3. Qxd8+ { [%clk 0:00:55] } 3... Kxd8 { [%clk 0:01:58] } 4. O-O-O { [%clk 0:00:52] } 4... e1=Q { [%clk 0:01:55] } 0-1
"""

ORACLE_GAMES: tuple[str, ...] = (
    PGN_ORACLE_FULL,
    PGN_ORACLE_MATE,
    PGN_ORACLE_FEATURES,
)

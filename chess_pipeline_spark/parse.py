"""PGN game parsing as an Arrow-batched Spark operator (SURVEY §2.10 U1).

The reference parses each PGN with python-chess plus 7 visitor passes
(src/pipeline_import/visitors.py:1-196, orchestrated by parse_headers
transforms.py:215-223). Here a single-pass pure-Python parser runs
inside ``mapInPandas`` — one parse per game, all visitor outputs at
once, executor-parallel, no driver loop.

Two tiers:

- **text tier (always available)**: headers, SAN move list, per-move
  [%clk]/[%eval] comment extraction (visitors.py:19,60), mate-marker
  eval fill (visitors.py:26-28,44-48), berserk detection from the
  first clock of each side (visitors.py:51-79), castling sides from
  O-O/O-O-O SAN (equivalent to the king-destination rule
  visitors.py:104-127), promotion counts/pieces (visitors.py:146-179,
  sorted-join F19), queen-exchange from consecutive captures on the
  same square (visitors.py:82-101; text-level approximation — exact
  when the capturing piece letter identifies the queen).
- **board tier (self-contained)**: per-move FEN list
  (visitors.py:130-143) and material Counters (visitors.py:182-196)
  via the pure-Python SAN replay in chess_pipeline_spark/board.py —
  no python-chess dependency (when importable it serves as a test
  cross-check). Corrupt SAN nulls the board columns instead of
  failing the task; the rest of the engine treats them as optional.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from typing import Any

try:  # only used as a cross-check oracle in tests, never required
    import chess  # type: ignore
    import chess.pgn  # type: ignore

    HAS_PYTHON_CHESS = True
except Exception:  # pragma: no cover
    HAS_PYTHON_CHESS = False

_HEADER_RE = re.compile(r'^\[(\w+)\s+"(.*)"\]\s*$')
_CLK_RE = re.compile(r"\[%clk\s+([\d:.]+)\]")
_EVAL_RE = re.compile(r"\[%eval\s+(#?-?[\d.]+)\s*\]")
_MOVENUM_RE = re.compile(r"^\d+\.(\.\.)?$")
_PROMO_RE = re.compile(r"=([QRBN])")
_DEST_SQ_RE = re.compile(r"([a-h][1-8])(?:=[QRBN])?[+#]?$")
_RESULTS = {"1-0", "0-1", "1/2-1/2", "*"}

# mate-on-the-board eval magnitude (visitors.py:26-28; ±999900/100)
MATE_EVAL = 9999.0


def _parse_eval_token(tok: str) -> float:
    if tok.startswith("#"):
        return MATE_EVAL if float(tok[1:]) > 0 else -MATE_EVAL
    return float(tok)


def _tokenize_movetext(movetext: str) -> list[tuple[str, str]]:
    """-> [(san, comment)] skipping variations, NAGs, move numbers."""
    out: list[tuple[str, str]] = []
    i, n = 0, len(movetext)
    depth = 0
    pending_comment: list[str] = []
    while i < n:
        c = movetext[i]
        if c == "(":
            depth += 1
            i += 1
        elif c == ")":
            depth -= 1
            i += 1
        elif c == "{":
            # tolerate an unterminated comment (truncated PGN): take
            # the rest of the text rather than crashing the task
            j = movetext.find("}", i)
            if j == -1:
                j = n
            if depth == 0 and out:
                pending_comment.append(movetext[i + 1 : j])
            i = j + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not movetext[j].isspace() and movetext[j] not in "(){}":
                j += 1
            tok = movetext[i:j]
            i = j
            if depth > 0 or not tok:
                continue
            if pending_comment and out:
                out[-1] = (out[-1][0], out[-1][1] + " ".join(pending_comment))
                pending_comment = []
            if tok in _RESULTS or tok.startswith("$") or _MOVENUM_RE.match(tok):
                continue
            # glued move numbers ('1.e4', '5...Nf6') are legal PGN:
            # strip the numeric prefix, keep the SAN remainder
            gm = re.match(r"^\d+\.+", tok)
            if gm:
                tok = tok[gm.end():]
                if not tok:
                    continue
            out.append((tok, ""))
    if pending_comment and out:
        out[-1] = (out[-1][0], out[-1][1] + " ".join(pending_comment))
    return out


def _clock_to_tuple(clock_str: str) -> float | None:
    try:
        h, m, s = clock_str.split(":")
        return int(h) * 3600 + int(m) * 60 + float(s)
    except Exception:
        return None


def parse_pgn_game(pgn: str) -> dict[str, Any]:
    """One PGN string -> all visitor outputs (text tier + board tier
    when python-chess is importable)."""
    headers: dict[str, str] = {}
    lines = pgn.strip().splitlines()
    body_start = 0
    for idx, line in enumerate(lines):
        m = _HEADER_RE.match(line.strip())
        if m:
            headers[m.group(1)] = m.group(2)
            body_start = idx + 1
        elif line.strip():
            break
    movetext = " ".join(lines[body_start:])
    moves_comments = _tokenize_movetext(movetext)

    moves = [san for san, _ in moves_comments]
    clocks: list[str] = []
    evaluations: list[float] = []
    eval_depths: list[int] = []
    result_header = headers.get("Result", "")
    # EvalsVisitor (visitors.py:33-47): a comment-bearing move with
    # no [%eval], once evals have started, is (usually) the final
    # checkmate position — filled by game RESULT at depth 20. Moves
    # with no comment at all append nothing (ragged list, exactly
    # like the reference's per-comment visitor). Draws fall back to
    # 0.0 (the reference's result map omits them and would crash).
    _RESULT_FILL = {"1-0": MATE_EVAL, "0-1": -MATE_EVAL}
    for ply, (san, comment) in enumerate(moves_comments):
        cm = _CLK_RE.search(comment)
        clocks.append(cm.group(1) if cm else "")
        em = _EVAL_RE.search(comment)
        if em:
            evaluations.append(_parse_eval_token(em.group(1)))
            eval_depths.append(20)  # lichess server analysis depth (README.md:62)
        elif comment and evaluations:
            evaluations.append(_RESULT_FILL.get(result_header, 0.0))
            eval_depths.append(20)

    # berserk: a side's first clock at most half the starting time
    # (ClocksVisitor, visitors.py:51-79)
    start_s = None
    tc = headers.get("TimeControl", "")
    m = re.match(r"(\d+)\+", tc)
    if m:
        start_s = int(m.group(1))
    white_berserked = black_berserked = False
    if start_s:
        first_white = _clock_to_tuple(clocks[0]) if len(clocks) >= 1 and clocks[0] else None
        first_black = _clock_to_tuple(clocks[1]) if len(clocks) >= 2 and clocks[1] else None
        if first_white is not None:
            white_berserked = first_white <= start_s / 2
        if first_black is not None:
            black_berserked = first_black <= start_s / 2

    # castling sides from SAN (CastlingVisitor, visitors.py:104-127)
    castling = {"white": None, "black": None}
    for ply, san in enumerate(moves):
        side = "white" if ply % 2 == 0 else "black"
        base = san.rstrip("+#")
        if base == "O-O":
            castling[side] = "kingside"
        elif base == "O-O-O":
            castling[side] = "queenside"

    # promotions (PromotionsVisitor, visitors.py:146-179)
    promo: dict[str, list[str]] = {"white": [], "black": []}
    for ply, san in enumerate(moves):
        pm = _PROMO_RE.search(san)
        if pm:
            promo["white" if ply % 2 == 0 else "black"].append(pm.group(1).lower())
    has_promotion = bool(promo["white"] or promo["black"])

    # queen exchange (QueenExchangeVisitor, visitors.py:82-101): a
    # QUEEN captured on two CONSECUTIVE plies. Text tier tracks each
    # side's queen squares from SAN (start squares, Q-moves,
    # promotions) so 'queen takes pawn, gets recaptured' is NOT
    # flagged; the board tier below recomputes it exactly.
    queen_exchange = False
    qsq = {0: {"d1"}, 1: {"d8"}}  # by mover parity: white, black
    last_q_capture_ply = -2
    for ply, san in enumerate(moves):
        mover, opp = ply % 2, 1 - (ply % 2)
        dm = _DEST_SQ_RE.search(san)
        dest = dm.group(1) if dm else None
        if "x" in san and dest and dest in qsq[opp]:
            if last_q_capture_ply == ply - 1:
                queen_exchange = True
            last_q_capture_ply = ply
            qsq[opp].discard(dest)
        if dest and san.startswith("Q"):
            # queen move: single-queen case relocates; with several
            # queens the origin is ambiguous, keep a candidate set
            if len(qsq[mover]) == 1:
                qsq[mover] = {dest}
            else:
                qsq[mover].add(dest)
        elif dest and _PROMO_RE.search(san) and san.rstrip("+#").endswith("=Q"):
            qsq[mover].add(dest)

    # board tier: self-contained SAN replay (chess_pipeline_spark/
    # board.py) — per-move FEN (visitors.py:130-143, starting position
    # skipped) and material counters (visitors.py:182-196,
    # MaterialVisitor has no first-move skip: entry 0 is the START and
    # the list has n_moves+1 entries, kings included). No python-chess
    # needed; tests cross-check against it when importable. On an
    # illegal/corrupt SAN token the replay keeps the LEGAL PREFIX —
    # exactly what the reference sees: python-chess read_game records
    # the error and truncates the mainline there (never kills the
    # task). The full prefix case replaces the text tier's
    # queen-exchange approximation with the exact captured-piece test.
    from chess_pipeline_spark.board import Board

    board = Board()
    positions: list[str] = []
    material_by_move: list[dict[str, int]] = [board.piece_counts()]
    board_qe = False
    last_cap = -2
    replay_complete = True
    for ply, san in enumerate(moves):
        try:
            captured = board.apply_san(san)
        except Exception:
            replay_complete = False
            break
        if captured in ("Q", "q"):
            if last_cap == ply - 1:
                board_qe = True
            last_cap = ply
        positions.append(board.fen())
        material_by_move.append(board.piece_counts())
    if replay_complete:
        queen_exchange = board_qe  # exact, replaces the text-tier guess

    return {
        "Event": headers.get("Event"),
        "Site": headers.get("Site"),
        "Date": headers.get("Date"),
        "Round": headers.get("Round", "?"),
        "White": headers.get("White"),
        "Black": headers.get("Black"),
        "Result": headers.get("Result"),
        "UTCDate": headers.get("UTCDate"),
        "UTCTime": headers.get("UTCTime"),
        "WhiteElo": headers.get("WhiteElo"),
        "BlackElo": headers.get("BlackElo"),
        "WhiteRatingDiff": headers.get("WhiteRatingDiff"),
        "BlackRatingDiff": headers.get("BlackRatingDiff"),
        # Variant normalize (transforms.py:216-217): missing, empty,
        # and 'From Position' all become 'Standard'
        "Variant": (
            "Standard"
            if headers.get("Variant", "") in ("", "From Position")
            else headers["Variant"]
        ),
        "TimeControl": headers.get("TimeControl"),
        "ECO": headers.get("ECO"),
        "Opening": headers.get("Opening"),
        "Termination": headers.get("Termination"),
        "evaluations": evaluations,
        "eval_depths": eval_depths,
        "clocks": clocks,
        "white_berserked": white_berserked,
        "black_berserked": black_berserked,
        "queen_exchange": queen_exchange,
        "castling_sides": castling,
        "has_promotion": has_promotion,
        "promotion_count_white": len(promo["white"]),
        "promotion_count_black": len(promo["black"]),
        "promotions_white": "".join(sorted(promo["white"])),
        "promotions_black": "".join(sorted(promo["black"])),
        "positions": positions,
        "material_by_move": material_by_move,
        "moves": moves,
    }


def parse_pgn_dataframe(pgn_df):
    """DataFrame['pgn' string] -> RAW_PGN-shaped DataFrame via
    mapInPandas (one Arrow batch per partition, python-chess runs on
    executors when available)."""
    import pandas as pd

    from chess_pipeline_spark.deploy import ensure_package_on_executors
    from chess_pipeline_spark.schemas import RAW_PGN

    ensure_package_on_executors(pgn_df.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [parse_pgn_game(p) for p in pdf["pgn"]]
            for r in rows:
                # struct column arrives as a python dict; keep order
                cs = r.pop("castling_sides")
                r["castling_sides"] = {"black": cs["black"], "white": cs["white"]}
            yield pd.DataFrame(rows)

    return pgn_df.mapInPandas(run, RAW_PGN)

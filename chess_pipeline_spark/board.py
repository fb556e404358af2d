"""Pure-Python chess board: SAN replay + FEN + material counts.

Unlocks the board tier of the PGN parser (per-move FEN,
/root/reference/src/pipeline_import/visitors.py:130-143, and material
counters, visitors.py:182-196) WITHOUT the python-chess dependency —
the engine ships self-contained on any executor image. When
python-chess happens to be importable, tests cross-check both
implementations move-for-move.

FEN output matches python-chess ``Board.fen()`` defaults, which the
reference's visitors record: in particular the en-passant field uses
the 'legal' convention — the square appears only when a fully legal
en passant capture exists for the side to move (NOT the raw
double-push square the FEN spec's X-FEN variant would always show).

Scope: legal-move disambiguation for SAN application (including pin
legality — 'Nd2' is unambiguous when the other knight is pinned),
castling rights tracking, en passant, promotion, halfmove clock and
fullmove number. Not a move *generator* for engines — only what SAN
replay needs.
"""

from __future__ import annotations

_FILES = "abcdefgh"
_KNIGHT = ((1, 2), (2, 1), (2, -1), (1, -2), (-1, -2), (-2, -1), (-2, 1), (-1, 2))
_KING = ((1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1))
_ROOK_RAYS = ((1, 0), (-1, 0), (0, 1), (0, -1))
_BISHOP_RAYS = ((1, 1), (1, -1), (-1, 1), (-1, -1))


def _sq(file: int, rank: int) -> int:
    return rank * 8 + file


def _name(sq: int) -> str:
    return _FILES[sq % 8] + str(sq // 8 + 1)


def _parse_sq(name: str) -> int:
    return _sq(_FILES.index(name[0]), int(name[1]) - 1)


class IllegalSanError(ValueError):
    pass


class Board:
    """Standard-start board; apply SAN moves, read FEN/material."""

    def __init__(self) -> None:
        self.sq: list[str] = [""] * 64
        for f, p in enumerate("RNBQKBNR"):
            self.sq[_sq(f, 0)] = p
            self.sq[_sq(f, 7)] = p.lower()
        for f in range(8):
            self.sq[_sq(f, 1)] = "P"
            self.sq[_sq(f, 6)] = "p"
        self.white_to_move = True
        self.castling = {"K": True, "Q": True, "k": True, "q": True}
        self.ep_square: int | None = None  # square behind a double push
        self.halfmove = 0
        self.fullmove = 1

    # -- attack / legality ------------------------------------------

    def _attacked(self, sq: int, by_white: bool) -> bool:
        f, r = sq % 8, sq // 8
        pawn_dr = -1 if by_white else 1  # attacker sits behind its push
        for df in (-1, 1):
            nf, nr = f + df, r + pawn_dr
            if 0 <= nf < 8 and 0 <= nr < 8:
                p = self.sq[_sq(nf, nr)]
                if p == ("P" if by_white else "p"):
                    return True
        for df, dr in _KNIGHT:
            nf, nr = f + df, r + dr
            if 0 <= nf < 8 and 0 <= nr < 8:
                p = self.sq[_sq(nf, nr)]
                if p == ("N" if by_white else "n"):
                    return True
        for df, dr in _KING:
            nf, nr = f + df, r + dr
            if 0 <= nf < 8 and 0 <= nr < 8:
                p = self.sq[_sq(nf, nr)]
                if p == ("K" if by_white else "k"):
                    return True
        for rays, syms in (
            (_ROOK_RAYS, "RQ" if by_white else "rq"),
            (_BISHOP_RAYS, "BQ" if by_white else "bq"),
        ):
            for df, dr in rays:
                nf, nr = f + df, r + dr
                while 0 <= nf < 8 and 0 <= nr < 8:
                    p = self.sq[_sq(nf, nr)]
                    if p:
                        if p in syms:
                            return True
                        break
                    nf, nr = nf + df, nr + dr
        return False

    def _king_sq(self, white: bool) -> int:
        return self.sq.index("K" if white else "k")

    def _leaves_king_safe(self, frm: int, to: int, ep_capture_sq: int | None) -> bool:
        saved_frm, saved_to = self.sq[frm], self.sq[to]
        saved_ep = self.sq[ep_capture_sq] if ep_capture_sq is not None else None
        self.sq[to] = self.sq[frm]
        self.sq[frm] = ""
        if ep_capture_sq is not None:
            self.sq[ep_capture_sq] = ""
        safe = not self._attacked(
            self._king_sq(self.white_to_move), by_white=not self.white_to_move
        )
        self.sq[frm] = saved_frm
        self.sq[to] = saved_to
        if ep_capture_sq is not None:
            self.sq[ep_capture_sq] = saved_ep  # type: ignore[assignment]
        return safe

    # -- candidate origins for SAN ----------------------------------

    def _slider_reaches(self, frm: int, to: int, rays) -> bool:
        ff, fr = frm % 8, frm // 8
        tf, tr = to % 8, to // 8
        for df, dr in rays:
            nf, nr = ff + df, fr + dr
            while 0 <= nf < 8 and 0 <= nr < 8:
                cur = _sq(nf, nr)
                if cur == to:
                    return True
                if self.sq[cur]:
                    break
                nf, nr = nf + df, nr + dr
        return False

    def _piece_reaches(self, piece: str, frm: int, to: int) -> bool:
        ff, fr = frm % 8, frm // 8
        tf, tr = to % 8, to // 8
        u = piece.upper()
        if u == "N":
            return (abs(ff - tf), abs(fr - tr)) in ((1, 2), (2, 1))
        if u == "K":
            return max(abs(ff - tf), abs(fr - tr)) == 1
        if u == "R":
            return (ff == tf or fr == tr) and self._slider_reaches(frm, to, _ROOK_RAYS)
        if u == "B":
            return abs(ff - tf) == abs(fr - tr) and self._slider_reaches(
                frm, to, _BISHOP_RAYS
            )
        if u == "Q":
            return (
                ff == tf or fr == tr or abs(ff - tf) == abs(fr - tr)
            ) and self._slider_reaches(frm, to, _ROOK_RAYS + _BISHOP_RAYS)
        raise IllegalSanError(f"unknown piece {piece!r}")

    # -- SAN application --------------------------------------------

    def apply_san(self, san: str) -> str | None:
        """Apply one SAN move; returns the captured piece symbol (or
        None). Raises IllegalSanError on unparseable/illegal SAN."""
        white = self.white_to_move
        mv = san.rstrip("+#!?").replace("e.p.", "")
        captured: str | None = None

        if mv in ("O-O", "0-0", "O-O-O", "0-0-0"):
            rank = 0 if white else 7
            king_from = _sq(4, rank)
            long = mv in ("O-O-O", "0-0-0")
            king_to = _sq(2 if long else 6, rank)
            rook_from = _sq(0 if long else 7, rank)
            rook_to = _sq(3 if long else 5, rank)
            self.sq[king_to] = self.sq[king_from]
            self.sq[king_from] = ""
            self.sq[rook_to] = self.sq[rook_from]
            self.sq[rook_from] = ""
            for side in ("KQ" if white else "kq"):
                self.castling[side] = False
            self.ep_square = None
            self.halfmove += 1
            if not white:
                self.fullmove += 1
            self.white_to_move = not white
            return None

        promo: str | None = None
        if "=" in mv:
            mv, promo_ch = mv.split("=")
            promo = promo_ch[0]
        dest = _parse_sq(mv[-2:])
        body = mv[:-2]
        is_capture = "x" in body
        body = body.replace("x", "")

        if body and body[0] in "KQRBN":
            piece = body[0] if white else body[0].lower()
            disambig = body[1:]
            cand = [
                i
                for i, p in enumerate(self.sq)
                if p == piece and self._piece_reaches(p, i, dest)
            ]
            if disambig:
                for ch in disambig:
                    if ch in _FILES:
                        cand = [i for i in cand if i % 8 == _FILES.index(ch)]
                    else:
                        cand = [i for i in cand if i // 8 == int(ch) - 1]
            # target square occupancy must agree with the capture flag
            # (SAN from clean sources is consistent; be permissive on
            # a missing 'x' but never capture own piece)
            cand = [
                i
                for i in cand
                if not (self.sq[dest] and self.sq[dest].isupper() == white)
            ]
            cand = [i for i in cand if self._leaves_king_safe(i, dest, None)]
            if len(cand) != 1:
                raise IllegalSanError(f"ambiguous/illegal SAN {san!r}: {cand}")
            frm = cand[0]
            captured = self.sq[dest] or None
            self.sq[dest] = self.sq[frm]
            self.sq[frm] = ""
            if piece.upper() == "K":
                for side in ("KQ" if white else "kq"):
                    self.castling[side] = False
            if piece.upper() == "R":
                self._rook_moved(frm, white)
            self._rook_captured_on(dest, captured)
            self.ep_square = None
            self.halfmove = 0 if captured else self.halfmove + 1
        else:
            # pawn move: body is '' (push) or the origin file (capture)
            pawn = "P" if white else "p"
            dr = 1 if white else -1
            tf, tr = dest % 8, dest // 8
            ep_cap: int | None = None
            if is_capture:
                of = _FILES.index(body[0])
                frm = _sq(of, tr - dr)
                if self.sq[frm] != pawn or abs(of - tf) != 1:
                    raise IllegalSanError(f"bad pawn capture {san!r}")
                if self.sq[dest]:
                    captured = self.sq[dest]
                elif dest == self.ep_square:
                    ep_cap = _sq(tf, tr - dr)
                    captured = self.sq[ep_cap]
                else:
                    raise IllegalSanError(f"pawn capture to empty square {san!r}")
                if not self._leaves_king_safe(frm, dest, ep_cap):
                    raise IllegalSanError(f"illegal (king in check) {san!r}")
                if ep_cap is not None:
                    self.sq[ep_cap] = ""
            else:
                if self.sq[dest]:
                    raise IllegalSanError(f"pawn push to occupied square {san!r}")
                one = _sq(tf, tr - dr)
                two = _sq(tf, tr - 2 * dr)
                if self.sq[one] == pawn:
                    frm = one
                elif (
                    not self.sq[one]
                    and 0 <= tr - 2 * dr < 8
                    and self.sq[two] == pawn
                    and tr - 2 * dr == (1 if white else 6)
                ):
                    frm = two
                else:
                    raise IllegalSanError(f"no pawn can push {san!r}")
                if not self._leaves_king_safe(frm, dest, None):
                    raise IllegalSanError(f"illegal (king in check) {san!r}")
            moved_two = abs(dest // 8 - frm // 8) == 2
            self.sq[dest] = (
                (promo if white else promo.lower()) if promo else self.sq[frm]
            )
            self.sq[frm] = ""
            self._rook_captured_on(dest, captured)
            self.ep_square = _sq(tf, (frm // 8 + dest // 8) // 2) if moved_two else None
            self.halfmove = 0

        if not white:
            self.fullmove += 1
        self.white_to_move = not white
        return captured

    def _rook_moved(self, frm: int, white: bool) -> None:
        if white and frm == _sq(0, 0):
            self.castling["Q"] = False
        elif white and frm == _sq(7, 0):
            self.castling["K"] = False
        elif not white and frm == _sq(0, 7):
            self.castling["q"] = False
        elif not white and frm == _sq(7, 7):
            self.castling["k"] = False

    def _rook_captured_on(self, sq: int, captured: str | None) -> None:
        if captured not in ("R", "r"):
            return
        if sq == _sq(0, 0):
            self.castling["Q"] = False
        elif sq == _sq(7, 0):
            self.castling["K"] = False
        elif sq == _sq(0, 7):
            self.castling["q"] = False
        elif sq == _sq(7, 7):
            self.castling["k"] = False

    # -- output -----------------------------------------------------

    def _legal_ep_exists(self) -> bool:
        """python-chess fen() 'legal' convention: the ep field shows
        only when the side to move has a fully legal ep capture."""
        if self.ep_square is None:
            return False
        white = self.white_to_move
        pawn = "P" if white else "p"
        tf, tr = self.ep_square % 8, self.ep_square // 8
        dr = 1 if white else -1
        for df in (-1, 1):
            of = tf + df
            if not 0 <= of < 8:
                continue
            frm = _sq(of, tr - dr)
            if self.sq[frm] == pawn and self._leaves_king_safe(
                frm, self.ep_square, _sq(tf, tr - dr)
            ):
                return True
        return False

    def fen(self) -> str:
        rows = []
        for r in range(7, -1, -1):
            row = ""
            empty = 0
            for f in range(8):
                p = self.sq[_sq(f, r)]
                if p:
                    if empty:
                        row += str(empty)
                        empty = 0
                    row += p
                else:
                    empty += 1
            if empty:
                row += str(empty)
            rows.append(row)
        castle = "".join(s for s in "KQkq" if self.castling[s]) or "-"
        ep = _name(self.ep_square) if self._legal_ep_exists() else "-"
        return (
            f"{'/'.join(rows)} {'w' if self.white_to_move else 'b'} "
            f"{castle} {ep} {self.halfmove} {self.fullmove}"
        )

    def piece_counts(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for p in self.sq:
            if p:
                out[p] = out.get(p, 0) + 1
        return out

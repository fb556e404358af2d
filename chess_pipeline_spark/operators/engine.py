"""Local UCI engine adapter — the reference's eval of last resort
(`_get_local_eval` + `_parse_uci_result`, reference
transforms.py:93-99,186-212) as a pluggable `fetch_fn` for
operators.evals.fetch_missing.

This container ships no stockfish binary, so tests drive the adapter
with a fake UCI process speaking the same protocol; production
points it at a real binary (e.g. via SPARK_GRAFT_STOCKFISH). The
factory opens ONE engine process lazily per Python worker and reuses
it across the partition's rows — the mapInPandas batching in
fetch_missing means engine start-up amortizes over the batch, which
is the whole point of evaluating on executors instead of the
reference's driver-side per-position loop (stockfish.py:91-109).
"""

from __future__ import annotations

import re
import subprocess
from collections.abc import Callable

_SCORE_RE = re.compile(r"score (cp|mate) (-?\d+)")


class UciEngine:
    """Minimal UCI client: handshake, position/go, last info line."""

    def __init__(self, binary: str, depth: int = 20):
        self._depth = depth
        self._p = subprocess.Popen(
            [binary],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            text=True,
            bufsize=1,
        )
        self._send("uci", until="uciok")
        self._send("isready", until="readyok")

    def _send(self, line: str, until: str | None = None) -> list[str]:
        assert self._p.stdin is not None and self._p.stdout is not None
        self._p.stdin.write(line + "\n")
        self._p.stdin.flush()
        out: list[str] = []
        if until is not None:
            while True:
                ln = self._p.stdout.readline()
                if not ln:
                    raise RuntimeError(
                        f"engine closed stdout waiting for {until!r}"
                    )
                out.append(ln.rstrip("\n"))
                if ln.startswith(until):
                    break
        return out

    def last_info(self, fen: str) -> str:
        """`position fen` + `go depth N` -> the final info line (the
        one carrying the settled score, per the reference's use of
        stockfish.info)."""
        self._send(f"position fen {fen}")
        lines = self._send(f"go depth {self._depth}", until="bestmove")
        infos = [ln for ln in lines if ln.startswith("info")]
        return infos[-1] if infos else ""

    def close(self) -> None:
        try:
            if self._p.stdin is not None:
                self._p.stdin.write("quit\n")
                self._p.stdin.flush()
        except OSError:
            pass
        self._p.terminate()


def parse_uci_score(info: str, fen: str) -> float:
    """Reference _parse_uci_result (transforms.py:186-212): cp -> the
    centipawn value, mate -> ±999900 by mate sign (side-to-move from
    the FEN when the distance is 0), negated for black to move, /100
    into pawns."""
    m = _SCORE_RE.search(info)
    if m is None:
        raise ValueError(f"no engine score in info string: {info!r}")
    if m.group(1) == "mate":
        n = int(m.group(2))
        if n:
            rating = 999900 if n > 0 else -999900
        else:
            rating = 999900 if " w " in fen else -999900
    else:
        rating = int(m.group(2))
    if " b " in fen:
        rating *= -1
    return rating / 100


def uci_fetch_fn(
    binary: str, depth: int = 20
) -> Callable[[str], tuple[float, int]]:
    """A fetch_fn for evals.fetch_missing backed by a UCI engine.

    The engine process opens lazily on first use INSIDE the worker
    (the closure ships pickled to executors; a Popen handle would
    not) and is reused for every subsequent FEN the worker sees.
    """
    state: dict[str, UciEngine] = {}

    def fetch(fen: str) -> tuple[float, int]:
        if "engine" not in state:
            state["engine"] = UciEngine(binary, depth)
        return parse_uci_score(state["engine"].last_info(fen), fen), depth

    return fetch

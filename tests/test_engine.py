"""UCI engine adapter against a fake engine speaking the real
protocol (uci/isready handshake, position/go, info score lines,
bestmove). Scoring semantics pinned to the reference's
_parse_uci_result: cp vs mate, black-to-move sign flip, /100."""

from __future__ import annotations

import os
import stat
import textwrap

import pytest

from chess_pipeline_spark.operators.engine import (
    parse_uci_score,
    uci_fetch_fn,
)

_FAKE_ENGINE = textwrap.dedent(
    """\
    #!/usr/bin/env python3
    import sys

    fen = ""
    for line in sys.stdin:
        line = line.strip()
        if line == "uci":
            print("id name FakeFish")
            print("uciok", flush=True)
        elif line == "isready":
            print("readyok", flush=True)
        elif line.startswith("position fen "):
            fen = line[len("position fen "):]
        elif line.startswith("go"):
            if fen.split(" ")[0].startswith("8/8/8"):
                print("info depth 20 score mate 3 pv e2e4", flush=True)
            else:
                cp = sum(ord(c) for c in fen) % 200 - 100
                print(f"info depth 19 score cp 0 pv e2e4", flush=True)
                print(f"info depth 20 score cp {cp} pv e2e4", flush=True)
            print("bestmove e2e4", flush=True)
        elif line == "quit":
            break
    """
)


@pytest.fixture()
def fake_engine(tmp_path):
    p = tmp_path / "fakefish"
    p.write_text(_FAKE_ENGINE)
    p.chmod(p.stat().st_mode | stat.S_IEXEC)
    return str(p)


def _expected_cp(fen: str) -> float:
    cp = sum(ord(c) for c in fen) % 200 - 100
    if " b " in fen:
        cp = -cp
    return cp / 100


def test_parse_uci_score_reference_semantics():
    w = "rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR w KQkq - 0"
    b = "rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR b KQkq - 0"
    assert parse_uci_score("info depth 20 score cp 37 pv e2e4", w) == 0.37
    assert parse_uci_score("info depth 20 score cp 37 pv e2e4", b) == -0.37
    assert parse_uci_score("info score mate 3", w) == 9999.0
    assert parse_uci_score("info score mate -2", w) == -9999.0
    assert parse_uci_score("info score mate 3", b) == -9999.0
    assert parse_uci_score("info score mate 0", b) == 9999.0  # b fen, -(-999900)
    with pytest.raises(ValueError):
        parse_uci_score("info depth 20 pv e2e4", w)


def test_uci_fetch_fn_against_fake_engine(fake_engine):
    fetch = uci_fetch_fn(fake_engine, depth=20)
    w = "rnbqkbnr/pppppppp/8/8/4P3/8/PPPP1PPP/RNBQKBNR w KQkq - 0"
    b = "rnbqkbnr/pp1ppppp/8/2p5/4P3/8/PPPP1PPP/RNBQKBNR b KQkq - 0"
    mate = "8/8/8/8/8/5K2/6Q1/7k w - - 0"
    assert fetch(w) == (_expected_cp(w), 20)
    assert fetch(b) == (_expected_cp(b), 20)  # sign flipped
    assert fetch(mate) == (9999.0, 20)
    # takes the LAST info line (depth 20), not the depth-19 one
    assert fetch(w)[0] == _expected_cp(w)


def test_fetch_missing_with_uci_engine(spark, fake_engine):
    # the production wiring: FEN frame -> mapInPandas -> one engine
    # per worker, reused across the partition's rows
    from chess_pipeline_spark.operators.evals import fetch_missing

    fens = [
        "rnbqkbnr/pppppppp/8/8/4P3/8/PPPP1PPP/RNBQKBNR w KQkq - 0",
        "rnbqkbnr/pp1ppppp/8/2p5/4P3/8/PPPP1PPP/RNBQKBNR b KQkq - 0",
        "8/8/8/8/8/5K2/6Q1/7k w - - 0",
    ]
    df = spark.createDataFrame([(f,) for f in fens], "fen string")
    got = {
        r.fen: (r.evaluation, r.eval_depth)
        for r in fetch_missing(df, fetch_fn=uci_fetch_fn(fake_engine)).collect()
    }
    assert got[fens[0]] == (_expected_cp(fens[0]), 20)
    assert got[fens[1]] == (_expected_cp(fens[1]), 20)
    assert got[fens[2]] == (9999.0, 20)


def test_engine_binary_from_env(fake_engine, monkeypatch):
    # the documented production hook
    monkeypatch.setenv("SPARK_GRAFT_STOCKFISH", fake_engine)
    binary = os.environ["SPARK_GRAFT_STOCKFISH"]
    fetch = uci_fetch_fn(binary, depth=20)
    w = "rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR w KQkq - 0"
    assert fetch(w) == (_expected_cp(w), 20)


def test_fetch_missing_with_quota_respects_and_persists_budget(spark, tmp_path):
    """Mirror of the reference's daily cloud-eval quota (Valkey INCR
    counters, transforms.py:134-151): with budget 5, the first call
    evaluates only the 5 lowest FENs, the second call the remaining
    3, the third nothing; the counter survives across calls, is
    keyed by period, and a fresh period starts a fresh budget."""
    from chess_pipeline_spark.operators.evals import fetch_missing_with_quota

    fens = spark.createDataFrame(
        [(f"fen{i:02d}",) for i in range(8)], "fen string"
    )
    counter = str(tmp_path / "quota")
    fake = lambda fen: (float(int(fen[3:])), 20)  # noqa: E731

    first = fetch_missing_with_quota(fens, fake, counter, "2026-08-15", budget=5)
    got1 = sorted(r["fen"] for r in first.collect())
    assert got1 == [f"fen{i:02d}" for i in range(5)]

    leftovers = fens.join(first.select("fen"), "fen", "left_anti")
    second = fetch_missing_with_quota(leftovers, fake, counter, "2026-08-15", budget=5)
    assert second.count() == 0  # budget exhausted

    # bump the budget (the monthly tier): only the remaining headroom
    third = fetch_missing_with_quota(leftovers, fake, counter, "2026-08-15", budget=7)
    assert sorted(r["fen"] for r in third.collect()) == ["fen05", "fen06"]

    # a new period resets the spend; old period's count is retained
    fourth = fetch_missing_with_quota(fens, fake, counter, "2026-08-16", budget=2)
    assert fourth.count() == 2
    led = {r["period_key"]: r["used"] for r in spark.read.parquet(counter).collect()}
    assert led == {"2026-08-15": 7, "2026-08-16": 2}
    # eval payloads flow through the normal fetch path
    assert {r["eval_depth"] for r in fourth.collect()} == {20}


def test_quota_counts_equal_executed_fetches(spark, tmp_path):
    """The r8 ADVICE defect pair: the returned frame was lazy, so (a)
    every caller action re-ran fetch_fn with the ledger counting it
    once (actual external calls ~2x the recorded budget), and (b) a
    caller that never materialized the frame consumed budget without
    fetching. fetch_missing_with_quota now localCheckpoints the fetch
    before writing the ledger: fetch_fn executes exactly once per
    position no matter how many actions follow. The fetch_fn logs
    each call to a shared file (closures don't propagate back from
    Python workers; the filesystem does)."""
    from chess_pipeline_spark.operators.evals import fetch_missing_with_quota

    calls = tmp_path / "calls.log"

    def logging_fetch(fen):
        with open(calls, "a") as fh:
            fh.write(fen + "\n")
        return (float(int(fen[3:])), 20)

    fens = spark.createDataFrame(
        [(f"fen{i:02d}",) for i in range(6)], "fen string"
    )
    counter = str(tmp_path / "quota")
    fresh = fetch_missing_with_quota(
        fens, logging_fetch, counter, "2026-08-15", budget=4
    )
    # the ledger is already written and counts the executed fetches
    led = {r["period_key"]: r["used"] for r in spark.read.parquet(counter).collect()}
    assert led == {"2026-08-15": 4}
    # multiple downstream actions do NOT re-run the fetch
    assert fresh.count() == 4
    assert len(fresh.collect()) == 4
    assert fresh.filter("evaluation >= 0").count() == 4
    executed = sorted(calls.read_text().splitlines())
    assert executed == [f"fen{i:02d}" for i in range(4)]  # exactly once each


def test_quota_crash_over_counts_never_over_fetches(spark, tmp_path):
    """The r9 ADVICE ordering law: the ledger is written from the pick
    count BEFORE any external call executes, so a crash mid-fetch
    leaves the budget already debited — the retry under-fetches
    (safe side of the API limit) instead of re-spending calls the
    ledger never saw. Across crash + retry: executed <= budget and
    ledger used >= executed."""
    from chess_pipeline_spark.operators.evals import fetch_missing_with_quota

    calls = tmp_path / "calls.log"

    def crashing_fetch(fen):
        raise RuntimeError("simulated API outage mid-batch")

    def logging_fetch(fen):
        with open(calls, "a") as fh:
            fh.write(fen + "\n")
        return (float(int(fen[3:])), 20)

    fens = spark.createDataFrame(
        [(f"fen{i:02d}",) for i in range(8)], "fen string"
    )
    counter = str(tmp_path / "quota")
    try:
        fetch_missing_with_quota(fens, crashing_fetch, counter, "d1", budget=5)
        raise AssertionError("crash fetch should have raised")
    except Exception:
        pass
    # the ledger already holds the debit for the crashed batch
    led = {r["period_key"]: r["used"] for r in spark.read.parquet(counter).collect()}
    assert led == {"d1": 5}
    # retry: remaining headroom is 0, so no external call executes
    retry = fetch_missing_with_quota(fens, logging_fetch, counter, "d1", budget=5)
    assert retry.count() == 0
    executed = calls.read_text().splitlines() if calls.exists() else []
    assert executed == []  # never over-fetches past the budget
    assert led["d1"] >= len(executed)

"""Property-based parity: the Spark window realization of the
reference's subtle pandas shift/fillna chains must agree with a
direct pandas re-implementation on arbitrary inputs (SURVEY §7.3
hard-parts: 'property-test against pandas on fixture games').

Covers W2/W3 (opponent-clock coalesce chain, models.py:25-30) and
W4 (initial clock per parity partition, models.py:37-48), including
the degenerate 1- and 2-move games the fillna chain exists for.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from chess_pipeline_spark.operators.winprob_pipeline import (
    add_initial_clocks,
    add_opponent_clock,
)

# games: list of per-game clock sequences (length 1..8, seconds 0..600)
games_strategy = st.lists(
    st.lists(st.integers(min_value=0, max_value=600), min_size=1, max_size=8),
    min_size=1,
    max_size=6,
)


def _pandas_reference(df: pd.DataFrame) -> pd.DataFrame:
    """The reference's exact chain (models.py:21-60), verbatim pandas:
    shift/fillna opponent clock, per-parity initial clocks, and the
    flipped-bit INNER merge for the opponent's initial clock (which
    drops rows whose opposite parity never moved)."""
    df = df.sort_values(["game_link", "half_move"]).reset_index(drop=True)
    oc = df.groupby("game_link")["clock"].shift(-1)
    oc = oc.fillna(oc.groupby(df["game_link"]).shift(2))
    oc = oc.fillna(df["clock"])
    df["opponent_clock"] = oc
    df["player_to_move"] = df["half_move"] % 2
    grp = df.groupby(["game_link", "player_to_move"])
    df["initial_clock"] = grp["clock"].transform("first")
    firsts = (
        df.groupby(["game_link", "player_to_move"], as_index=False)["clock"]
        .first()
        .rename(columns={"clock": "initial_clock_opponent"})
    )
    firsts["player_to_move"] = (firsts["player_to_move"] + 1) % 2
    df = df.merge(firsts, on=["game_link", "player_to_move"], how="inner")
    return df.sort_values(["game_link", "half_move"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@given(games=games_strategy)
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_opponent_and_initial_clock_match_pandas(_spark, games):
    rows = [
        (f"g{gi}", hm + 1, clock)
        for gi, clocks in enumerate(games)
        for hm, clock in enumerate(clocks)
    ]
    sdf = _spark.createDataFrame(rows, "game_link string, half_move int, clock int")
    got = (
        add_initial_clocks(add_opponent_clock(sdf))
        .toPandas()
        .sort_values(["game_link", "half_move"])
        .reset_index(drop=True)
    )
    exp = _pandas_reference(pd.DataFrame(rows, columns=["game_link", "half_move", "clock"]))
    for col in ("opponent_clock", "initial_clock", "initial_clock_opponent"):
        assert got[col].astype(float).tolist() == exp[col].astype(float).tolist(), (
            col,
            got[["game_link", "half_move", "clock", col]].to_dict("records"),
            exp[["game_link", "half_move", "clock", col]].to_dict("records"),
        )


def test_concurrency_sweepline_matches_bruteforce(spark, sf_dir):
    """The two-level prefix-sum sweep must equal the naive global
    sweep: rebuild sessions in pandas, walk every delta in one
    global (t, d, user, session) order, track the running count, and
    compare per-day peaks and session starts exactly."""
    import collections

    from chess_pipeline_spark.plans import catalog

    sess = {
        (r["user_id"], r["session_id"]): (r["session_start"], r["session_end"])
        for r in catalog()["events_sessionized"].spark(spark, sf_dir).collect()
    }
    deltas = []
    for (uid, sid), (s, e) in sess.items():
        deltas.append((s, 1, uid, sid))
        deltas.append((e + 1, -1, uid, sid))
    deltas.sort()
    conc = 0
    peak = collections.defaultdict(int)
    started = collections.Counter()
    for t, d, uid, sid in deltas:
        conc += d
        day = t // 86400
        peak[day] = max(peak[day], conc)
        if d == 1:
            started[day] += 1
    got = {
        r["day"]: (r["peak_concurrency"], r["sessions_started"])
        for r in catalog()["concurrency_peak_daily"].spark(spark, sf_dir).collect()
    }
    want = {day: (peak[day], started[day]) for day in peak}
    assert got == want

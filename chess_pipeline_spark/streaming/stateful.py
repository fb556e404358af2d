"""Custom stateful streaming operator via applyInPandasWithState.

The reference's only 'state' is batch-side (the FEN eval cache and
date-keyed upserts); Spark's arbitrary stateful processing is the
streaming-native generalization. This module implements a running
per-key accumulator — count / sum / min / max / last event time per
user — maintained across micro-batches with a processing-time
timeout, the pattern behind streaming feature stores and
session-state trackers.

Scale notes: state lives in the state store partitioned by the
group key (one shuffle on user_id per micro-batch, same as a
streaming agg); per-key state is O(1) — counters only, never raw
events — so the state store size is bounded by key cardinality.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n long, sum_value double, min_value double, max_value double, last_ts_sec long"
OUTPUT_SCHEMA = (
    "user_id long, n long, sum_value double, min_value double, "
    "max_value double, last_ts_sec long"
)


def _update_user_stats(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    timeout_ms: int = 0,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        # emit final state on timeout, then drop it
        n, s, mn, mx, last = state.get
        state.remove()
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "n": n,
                    "sum_value": s,
                    "min_value": mn,
                    "max_value": mx,
                    "last_ts_sec": last,
                }
            ]
        )
        return
    n, s, mn, mx, last = state.get if state.exists else (0, 0.0, None, None, None)
    for pdf in pdfs:
        # rows with NULL value/ts_sec are skipped (NaN would poison
        # min/max state permanently and int(NaN) would kill the task)
        pdf = pdf.dropna(subset=["value", "ts_sec"])
        if pdf.empty:
            continue
        n += len(pdf)
        s += float(pdf["value"].sum())
        bmn = float(pdf["value"].min())
        bmx = float(pdf["value"].max())
        bts = int(pdf["ts_sec"].max())
        mn = bmn if mn is None else min(mn, bmn)
        mx = bmx if mx is None else max(mx, bmx)
        last = bts if last is None else max(last, bts)
    state.update((n, s, mn, mx, last))
    if timeout_ms:
        state.setTimeoutDuration(timeout_ms)  # processing-time state GC
    yield pd.DataFrame(
        [
            {
                "user_id": user_id,
                "n": n,
                "sum_value": s,
                "min_value": mn,
                "max_value": mx,
                "last_ts_sec": last,
            }
        ]
    )


def stream_user_running_stats(
    events: DataFrame, timeout_ms: int = 0
) -> DataFrame:
    """Running per-user stats across micro-batches (custom stateful
    operator — applyInPandasWithState). Each micro-batch emits the
    updated totals for the users it touched; state is O(1) per user.

    ``timeout_ms > 0`` enables processing-time state GC (idle keys
    emit a final row and free their state) — the long-running-
    production setting. Note an enabled timeout keeps an
    availableNow/bounded query alive until the timeouts fire, so
    bounded replays (and the tests) default to no timeout.
    """
    from functools import partial

    from chess_pipeline_spark.deploy import ensure_package_on_executors

    ensure_package_on_executors(events.sparkSession)
    return (
        events.select("user_id", "value", "ts_sec")
        .groupBy("user_id")
        .applyInPandasWithState(
            partial(_update_user_stats, timeout_ms=timeout_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if timeout_ms
                else GroupStateTimeout.NoTimeout
            ),
        )
    )

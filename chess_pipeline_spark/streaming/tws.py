"""Custom stateful operator on the transformWithStateInPandas API.

Spark 4's second-generation arbitrary-state API: typed state
variables (ValueState / ListState / MapState) managed by the state
store instead of one opaque tuple, timers as first-class objects,
and RocksDB-backed state. This module implements the same running
per-user accumulator as streaming/stateful.py so the two APIs are
directly comparable (and tested equal against the batch groupBy).

Requires the RocksDB state store provider
(spark.sql.streaming.stateStore.providerClass) — applied by the
caller/test on the streaming query's session; the operator itself is
provider-agnostic.

ENVIRONMENT GATE: the transformWithState Python runner depends on
google.protobuf, which is absent/broken in this container (verified:
the streaming runner crashes with "cannot import name 'descriptor'
from 'google.protobuf'"). The operator therefore raises a clear
RuntimeError up front when protobuf is unavailable, and its test
skips; on a normal cluster image (protobuf ships with pyspark's
connect extras) it runs as-is. The applyInPandasWithState twin in
streaming/stateful.py is the fully-supported path here.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = (
    "user_id long, n long, sum_value double, min_value double, "
    "max_value double, last_ts_sec long"
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("min_value", DoubleType()),
        StructField("max_value", DoubleType()),
        StructField("last_ts_sec", LongType()),
    ]
)


class UserStatsProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("stats", _STATE_SCHEMA)

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timerValues) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if self._state.exists():
            n, s, mn, mx, last = self._state.get()
        else:
            n, s, mn, mx, last = 0, None, None, None, None
        for pdf in rows:
            if pdf.empty:
                continue
            # per-column NULL semantics, mirroring the batch twin and
            # streaming/stateful.py's r6 fix: count(*) counts every
            # row; sum/min/max(value) and max(ts_sec) skip only their
            # own column's NULLs
            n += len(pdf)
            vals = pdf["value"].dropna()
            if len(vals):
                bs = float(vals.sum())
                bmn, bmx = float(vals.min()), float(vals.max())
                s = bs if s is None else s + bs
                mn = bmn if mn is None else min(mn, bmn)
                mx = bmx if mx is None else max(mx, bmx)
            ts = pdf["ts_sec"].dropna()
            if len(ts):
                bts = int(ts.max())
                last = bts if last is None else max(last, bts)
        self._state.update((n, s, mn, mx, last))
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

    def close(self) -> None:
        pass


def tws_runtime_available() -> bool:
    """True when the transformWithState Python runner's protobuf
    dependency is importable (see module docstring)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


def stream_user_running_stats_tws(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas realization of the running
    per-user stats operator (compare streaming/stateful.py)."""
    from chess_pipeline_spark.deploy import ensure_package_on_executors

    if not tws_runtime_available():
        raise RuntimeError(
            "transformWithStateInPandas needs google.protobuf, which is "
            "not available in this environment; use "
            "streaming.stateful.stream_user_running_stats instead"
        )
    ensure_package_on_executors(events.sparkSession)
    return (
        events.select("user_id", "value", "ts_sec")
        .groupBy("user_id")
        .transformWithStateInPandas(
            UserStatsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )

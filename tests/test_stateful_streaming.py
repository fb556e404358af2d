"""applyInPandasWithState custom stateful operator: the final emitted
state per user must equal the batch groupBy over the same bounded
input (update mode → keep each user's LAST emitted row)."""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F

from chess_pipeline_spark.sources import load_table
from chess_pipeline_spark.streaming.jobs import read_events_stream
from chess_pipeline_spark.streaming.stateful import (
    stream_rolling_zscore,
    stream_user_running_stats,
)


def test_stateful_running_stats_match_batch(spark, sf_dir, tmp_path):
    # subset of users: per-key Python invocations dominate test
    # wall-clock; 50 keys exercise the state machinery fully
    ev = read_events_stream(spark, sf_dir).filter(F.col("user_id") < 50)
    out = stream_user_running_stats(ev)
    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table(name).toPandas()
    # update mode can emit a user several times (once per batch that
    # touched it); the last emission carries the running totals
    got = got.groupby("user_id").last()

    batch = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 50)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.max("ts_sec").alias("last_ts_sec"),
        )
        .toPandas()
        .set_index("user_id")
    )
    assert len(got) == len(batch)
    merged = got.join(batch, lsuffix="_s", rsuffix="_b")
    assert (merged["n_s"] == merged["n_b"]).all()
    assert (abs(merged["sum_value_s"] - merged["sum_value_b"]) < 1e-6).all()
    assert (merged["min_value_s"] == merged["min_value_b"]).all()
    assert (merged["max_value_s"] == merged["max_value_b"]).all()
    assert (merged["last_ts_sec_s"] == merged["last_ts_sec_b"]).all()


def test_stateful_running_stats_null_rows_match_batch(spark, tmp_path):
    # the r5 advice finding, one op over from the z-score fix: the
    # running-stats stream kept dropna(subset=[value, ts_sec]) while
    # the batch twin counts every row in count(*) and skips NULLs
    # per-column in sum/min/max(value) / max(ts_sec). This fixture has
    # value-only NULLs, ts-only NULLs, and one all-NULL user; the
    # twins must agree per column.
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = dt.datetime(2024, 1, 1)
    rows = []
    n = 0
    for u in range(4):
        for i in range(12):
            n += 1
            ts = (
                None
                if (u == 3 or i % 5 == 2)  # user 3: all ts NULL
                else base + dt.timedelta(minutes=10 * i + u)
            )
            val = (
                None
                if (u == 3 or i % 4 == 1)  # user 3: all values NULL too
                else float((i * 13 + u * 7) % 50) / 2.0
            )
            rows.append((n, u, ts, val))
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "value": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
    d = tmp_path / "data_rs"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))

    out = stream_user_running_stats(read_events_stream(spark, str(d)))
    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_rsn"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table(name).toPandas().groupby("user_id").last()

    batch = (
        spark.read.parquet(str(d / "events.parquet"))
        .withColumn("ts_sec", F.unix_timestamp("ts"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.max("ts_sec").alias("last_ts_sec"),
        )
        .toPandas()
        .set_index("user_id")
    )
    assert len(got) == len(batch) == 4  # the all-NULL user is emitted too
    merged = got.join(batch, lsuffix="_s", rsuffix="_b")
    assert (merged["n_s"] == merged["n_b"]).all()
    for col in ("sum_value", "min_value", "max_value", "last_ts_sec"):
        g, b = merged[f"{col}_s"], merged[f"{col}_b"]
        assert (g.isna() == b.isna()).all(), col
        assert ((g - b).abs().fillna(0.0) <= 1e-6).all(), col


def test_stateful_rolling_zscore_null_rows_match_batch(spark, tmp_path):
    # the r4 advice finding: the stream used dropna() while the batch
    # twin emits NULL-value rows and lets the ROWS frame count them as
    # slots — on NULL-bearing input the twins diverged. This fixture
    # has NULL values (every 7th-ish row) and one NULL timestamp; the
    # twins must now agree row-for-row.
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from chess_pipeline_spark.plans.timeseries import events_rolling_zscore

    base = dt.datetime(2024, 1, 1)
    rows = []
    n = 0
    for u in range(3):
        for i in range(25):
            n += 1
            ts = (
                None
                if (u == 1 and i == 12)
                else base + dt.timedelta(minutes=10 * i + u)
            )
            val = None if i % 7 == 3 else float((i * 37 + u * 11) % 100) / 4.0
            rows.append((n, u, ts, val))
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "value": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
    d = tmp_path / "data"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))

    out = stream_rolling_zscore(read_events_stream(spark, str(d)))
    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_zn"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table(name).toPandas().set_index("event_id").sort_index()
    batch = (
        events_rolling_zscore(spark, str(d))
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    assert len(got) == len(batch) == len(rows)
    assert (got["user_id"] == batch["user_id"]).all()
    assert (got["ts_sec"].isna() == batch["ts_sec"].isna()).all()
    for col in ("value", "roll_mean", "roll_std", "zscore"):
        g, b = got[col], batch[col]
        assert (g.isna() == b.isna()).all(), col
        diff = (g - b).abs().fillna(0.0)
        assert (diff <= 1e-6).all(), (col, float(diff.max()))


def test_stateful_rolling_zscore_matches_batch(spark, sf_dir, tmp_path):
    from chess_pipeline_spark.plans.timeseries import events_rolling_zscore

    ev = read_events_stream(spark, sf_dir).filter(F.col("user_id") < 50)
    out = stream_rolling_zscore(ev)
    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_z"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table(name).toPandas().set_index("event_id").sort_index()

    batch = (
        events_rolling_zscore(spark, sf_dir)
        .filter(F.col("user_id") < 50)
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    assert len(got) == len(batch) > 0
    assert (got["user_id"] == batch["user_id"]).all()
    assert (got["ts_sec"] == batch["ts_sec"]).all()
    # float columns: the stream computes mean/std in Python, the batch
    # in the JVM — identical frames and rounding, but allow last-ulp
    # differences that survive the 1e-6 floor grid
    for col in ("value", "roll_mean", "roll_std", "zscore"):
        g, b = got[col], batch[col]
        assert (g.isna() == b.isna()).all(), col
        diff = (g - b).abs().fillna(0.0)
        assert (diff <= 1e-6).all(), (col, float(diff.max()))


def test_stateful_decayed_engagement_matches_python_replay(spark, sf_dir, tmp_path):
    """The decayed counter's final per-user state must equal an
    ordered Python replay of the same events (same float ops in the
    same (ts_sec, event_id) order)."""
    from chess_pipeline_spark.streaming.stateful import (
        stream_decayed_engagement,
    )

    HL = 21600
    ev = read_events_stream(spark, sf_dir).filter(F.col("user_id") < 50)
    out = stream_decayed_engagement(ev, half_life_s=HL)
    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_decay"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table(name).toPandas().groupby("user_id").last()

    rows = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 50)
        .select("user_id", "ts_sec", "event_id", "value")
        .filter("value IS NOT NULL AND ts_sec IS NOT NULL")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for uid, evs in by_user.items():
        evs.sort(key=lambda r: (r.ts_sec, r.event_id))
        score, last = 0.0, None
        for r in evs:
            ts = int(r.ts_sec)
            if last is not None and ts > last:
                score *= 0.5 ** ((ts - last) / HL)
            score += float(r.value)
            last = ts if last is None else max(last, ts)
        g = got.loc[uid]
        assert int(g["n"]) == len(evs)
        assert int(g["last_ts_sec"]) == last
        assert abs(float(g["decay_score"]) - score) < 1e-9 * max(1.0, abs(score))


def test_stateful_decayed_engagement_state_carries_across_batches(spark, tmp_path):
    """Two time-ordered micro-batches must produce the same final
    score as one batch over the full stream (state carries the
    anchor and score across the boundary)."""
    import os
    import time

    import pandas as pd

    from chess_pipeline_spark.streaming.stateful import (
        stream_decayed_engagement,
    )

    HL = 3600
    base = 1_700_000_000
    all_events = [
        (0, 7, base + i * 1800, 10.0 + i) for i in range(8)
    ]  # one user, 30-min spacing

    def run(split_at, tag):
        src = tmp_path / f"src_{tag}"
        src.mkdir()
        frames = [all_events[:split_at], all_events[split_at:]]
        now = time.time()
        for i, chunk in enumerate(frames):
            if not chunk:
                continue
            pd.DataFrame(
                {
                    "event_id": [e[0] * 100 + j for j, e in enumerate(chunk)],
                    "user_id": [e[1] for e in chunk],
                    "ts": pd.to_datetime([e[2] for e in chunk], unit="s"),
                    "event_type": ["click"] * len(chunk),
                    "value": [e[3] for e in chunk],
                    "props": ["{}"] * len(chunk),
                }
            ).to_parquet(str(src / f"b{i}.parquet"))
            os.utime(src / f"b{i}.parquet", (now - 60 + i * 30, now - 60 + i * 30))
        ev = read_events_stream(spark, str(src), glob="*.parquet", max_files_per_trigger=1)
        out = stream_decayed_engagement(ev, half_life_s=HL)
        name = f"mem_{uuid.uuid4().hex[:8]}"
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{tag}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return spark.table(name).toPandas().groupby("user_id").last()

    split = run(4, "split")
    whole = run(8, "whole")
    assert int(split.loc[7, "n"]) == int(whole.loc[7, "n"]) == 8
    assert abs(float(split.loc[7, "decay_score"]) - float(whole.loc[7, "decay_score"])) < 1e-9

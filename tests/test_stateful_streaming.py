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

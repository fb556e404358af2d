"""transformWithStateInPandas operator: runs (and must equal the
batch groupBy) where the protobuf-backed runner exists; cleanly
gated where it does not (this container — see streaming/tws.py)."""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F
import pytest

from chess_pipeline_spark.streaming.tws import (
    stream_user_running_stats_tws,
    tws_runtime_available,
)


def test_gate_raises_clearly_when_runtime_missing(spark, sf_dir):
    from chess_pipeline_spark.streaming.jobs import read_events_stream

    ev = read_events_stream(spark, sf_dir)
    if tws_runtime_available():
        pytest.skip("runtime available; covered by the full test below")
    with pytest.raises(RuntimeError, match="google.protobuf"):
        stream_user_running_stats_tws(ev)


@pytest.mark.skipif(
    not tws_runtime_available(), reason="google.protobuf missing in this container"
)
def test_tws_matches_batch(spark, sf_dir, tmp_path):
    from chess_pipeline_spark.sources import load_table
    from chess_pipeline_spark.streaming.jobs import read_events_stream

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    ev = read_events_stream(spark, sf_dir).filter(F.col("user_id") < 50)
    out = stream_user_running_stats_tws(ev)
    name = f"tws_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table(name).toPandas().groupby("user_id").last()
    batch = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 50)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .toPandas()
        .set_index("user_id")
    )
    merged = got.join(batch, lsuffix="_s", rsuffix="_b")
    assert (merged["n_s"] == merged["n_b"]).all()
    assert (abs(merged["sum_value_s"] - merged["sum_value_b"]) < 1e-6).all()

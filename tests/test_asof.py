"""as-of join unit semantics: inclusive <=, null before first match,
per-key isolation. (Cross-engine parity vs DuckDB's native ASOF JOIN
is covered by the events_asof_last_purchase oracle test.)"""

from __future__ import annotations

from chess_pipeline_spark.operators.asof import asof_join


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [("a", 5), ("a", 10), ("a", 15), ("b", 10), ("c", 10)],
        "k string, ts int",
    )
    right = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 12, 2.0), ("b", 1, 9.0)],
        "k string, ts int, v double",
    )
    out = asof_join(left, right, on=["k"], ts="ts", payload=["v"])
    got = {(r["k"], r["ts"]): r["v"] for r in out.collect()}
    assert got == {
        ("a", 5): None,      # no right row at or before ts=5
        ("a", 10): 1.0,      # inclusive: right ts=10 matches left ts=10
        ("a", 15): 2.0,      # latest preceding (ts=12), not first
        ("b", 10): 9.0,      # per-key isolation
        ("c", 10): None,     # key with no right rows at all
    }


def test_asof_null_payload_and_multi_column_atomicity(spark):
    # the latest right ROW wins atomically: its genuine NULL fields
    # stay NULL (no stale fill from an earlier row), and multi-column
    # payloads never mix values from different right rows
    left = spark.createDataFrame([("k", 3)], "k string, ts int")
    right = spark.createDataFrame(
        [("k", 1, 5.0, 1.0), ("k", 2, None, 2.0)],
        "k string, ts int, a double, b double",
    )
    r = asof_join(left, right, on=["k"], ts="ts", payload=["a", "b"]).first()
    assert r["a"] is None and r["b"] == 2.0


def test_asof_rejects_payload_collision(spark):
    import pytest

    left = spark.createDataFrame([("k", 1, 0.0)], "k string, ts int, v double")
    right = spark.createDataFrame([("k", 1, 1.0)], "k string, ts int, v double")
    with pytest.raises(ValueError, match="already exist"):
        asof_join(left, right, on=["k"], ts="ts", payload=["v"])


def test_asof_preserves_left_row_count(spark, sf_dir):
    from chess_pipeline_spark.plans.timeseries import events_asof_last_purchase
    from chess_pipeline_spark.sources import load_table

    n = load_table(spark, sf_dir, "events").count()
    assert events_asof_last_purchase(spark, sf_dir).count() == n

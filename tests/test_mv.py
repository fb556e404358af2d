"""Incremental MV maintenance == full recompute, bit-exactly."""

from __future__ import annotations

import pyspark.sql.functions as F

from chess_pipeline_spark.operators.mv import (
    aggregate_sum_count,
    maintain_sum_count,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_equals_recompute(spark):
    base = spark.createDataFrame(
        [
            (1, "A", 1000),
            (2, "A", 2500),
            (3, "B", 700),
            (4, "B", 300),
            (5, "C", 99),
        ],
        "id long, grp string, cents long",
    )
    prev = aggregate_sum_count(base, "grp", "cents")

    # CDC batch: update id2 (A), delete id3 (B), insert id6 (B),
    # delete id5 (C — group C empties), unchanged id1 (zero delta)
    changes = spark.createDataFrame(
        [
            ("A", 2500, 2600),   # update
            ("B", 700, None),    # delete
            ("B", None, 450),    # insert
            ("C", 99, None),     # delete -> group gone
            ("A", 1000, 1000),   # unchanged (zero delta)
        ],
        "grp string, old_cents long, new_cents long",
    )
    incr = maintain_sum_count(prev, changes, "grp")

    after = spark.createDataFrame(
        [
            (1, "A", 1000),
            (2, "A", 2600),
            (4, "B", 300),
            (6, "B", 450),
        ],
        "id long, grp string, cents long",
    )
    recomputed = aggregate_sum_count(after, "grp", "cents")
    assert _rows(incr) == _rows(recomputed)
    # group born purely from inserts
    born = spark.createDataFrame(
        [("D", None, 5000)], "grp string, old_cents long, new_cents long"
    )
    incr2 = maintain_sum_count(incr, born, "grp")
    assert ("D", 5000, 1) in _rows(incr2)


def test_maintenance_composes_with_snapshot_diff_output(spark, sf_dir):
    """End-to-end over real data: aggregate the 'old' orders
    snapshot, apply the snapshot diff as the CDC batch, and land
    exactly on the 'new' snapshot's recomputed aggregate. One global
    group keeps the diff's own columns usable as the change feed."""
    from chess_pipeline_spark.plans import catalog
    from chess_pipeline_spark.plans.relational import (
        _SNAP_NEW_SINCE,
        _SNAP_OLD_BEFORE,
    )
    from chess_pipeline_spark.sources import load_table

    o = load_table(spark, sf_dir, "orders")
    cents_old = F.expr("CAST(floor(o_totalprice) AS BIGINT) * 100")
    cents_new = F.expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)")
    old = o.filter(F.col("o_orderdate") < _SNAP_OLD_BEFORE).select(
        F.lit("all").alias("grp"), cents_old.alias("cents")
    )
    new = o.filter(F.col("o_orderdate") >= _SNAP_NEW_SINCE).select(
        F.lit("all").alias("grp"), cents_new.alias("cents")
    )
    prev = aggregate_sum_count(old, "grp", "cents")
    diff = (
        catalog()["orders_snapshot_diff"].spark(spark, sf_dir)
        .select(F.lit("all").alias("grp"), "old_cents", "new_cents")
    )
    incr = maintain_sum_count(prev, diff, "grp")
    recomputed = aggregate_sum_count(new, "grp", "cents")
    assert _rows(incr) == _rows(recomputed)


def test_min_is_not_self_maintainable(spark):
    """The boundary claim: min/max cannot be folded from deltas alone
    — deleting the current minimum forces a rescan. Demonstrate the
    naive fold (min of prev_min and surviving values' min) diverging
    from recompute, which is WHY maintain_sum_count only offers
    additive aggregates."""
    base = spark.createDataFrame(
        [(1, "A", 10), (2, "A", 50)], "id long, grp string, cents long"
    )
    prev_min = base.groupBy("grp").agg(F.min("cents").alias("mn"))
    # delete id1 (the minimum). Naive delta fold has no way to learn
    # the new min (50) from (prev_min=10, deleted=10) alone:
    naive = prev_min.select("grp", "mn")  # no information to update
    after = spark.createDataFrame([(2, "A", 50)], "id long, grp string, cents long")
    recomputed = after.groupBy("grp").agg(F.min("cents").alias("mn"))
    assert _rows(naive) != _rows(recomputed)

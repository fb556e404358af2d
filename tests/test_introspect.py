"""plan_metrics mirrors what the plan gates assert — pin it on known
catalog plans so the utility can't silently drift from the plans."""

from __future__ import annotations

from chess_pipeline_spark.introspect import plan_metrics
from chess_pipeline_spark.plans import catalog

_CATALOG = catalog()


def test_metrics_on_known_plans(spark, sf_dir):
    m = plan_metrics(_CATALOG["pricing_summary"].spark(spark, sf_dir))
    assert m["scans"] == 1 and m["cartesian"] == 0
    assert m["keyed_exchanges"] == 1  # one agg shuffle, nothing else
    # site counts, not substring counts: one real shuffle exchange
    # (formatted explain lists each operator twice; the old substring
    # count reported 2 here) and no BroadcastExchange folded in
    assert m["exchanges"] == 1
    assert m["broadcast_exchanges"] == 0

    m = plan_metrics(_CATALOG["top_customer_revenue"].spark(spark, sf_dir))
    # broadcast exchanges are segregated from shuffle exchanges
    assert m["broadcast_exchanges"] >= 1

    m = plan_metrics(_CATALOG["returned_items_report"].spark(spark, sf_dir))
    assert m["pushed_filters"] >= 1  # returnflag filter reaches the scan

    m = plan_metrics(_CATALOG["top_customer_revenue"].spark(spark, sf_dir))
    assert m["broadcast_joins"] >= 1 and m["sort_merge_joins"] == 0

    m = plan_metrics(_CATALOG["pii_redact_stats"].spark(spark, sf_dir))
    assert m["keyed_exchanges"] == 0  # row-local scrub never shuffles

    m = plan_metrics(_CATALOG["multimodal_features"].spark(spark, sf_dir))
    assert m["arrow_udf"] >= 1 and m["python_eval"] == 0


def test_pin_snapshot_reports_measured_pin_bytes(spark):
    # the memory side of the plan-gate story (r13): a materialized
    # localCheckpoint must appear in the snapshot with nonzero
    # measured bytes, keyed by an id absent from the pre-pin baseline
    from chess_pipeline_spark.checkpoints import persistent_rdd_ids
    from chess_pipeline_spark.introspect import pin_snapshot

    before = persistent_rdd_ids(spark)
    df = spark.range(200_000).localCheckpoint()
    df.count()
    try:
        new = {
            i: v for i, v in pin_snapshot(spark).items() if i not in before
        }
        assert new, "materialized checkpoint missing from snapshot"
        total = sum(v["mem_bytes"] + v["disk_bytes"] for v in new.values())
        assert total > 0
        assert all(v["cached_partitions"] > 0 for v in new.values())
    finally:
        df.unpersist(True)

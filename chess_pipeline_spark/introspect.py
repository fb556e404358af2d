"""Plan introspection: the quality metrics the plan-gates assert,
exposed as a utility so users can audit THEIR queries the same way
the test suite audits the catalog (scan/exchange/broadcast counts,
Python-eval detection, pushed filters)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_text(df: DataFrame, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def plan_metrics(df: DataFrame) -> dict:
    """Counts of the plan features that matter at scale. Keys:

    scans              parquet/file scans (InMemoryFileIndex sites)
    exchanges          shuffle exchanges of any kind
    keyed_exchanges    hash-partition exchanges the plan REQUIRES
    broadcast_joins    BroadcastHashJoin sites
    sort_merge_joins   SortMergeJoin sites (often a missed broadcast)
    cartesian          CartesianProduct sites (almost always a bug)
    windows            window operator sites
    python_eval        row-at-a-time Python evaluation (the slow path)
    arrow_udf          Arrow-batched pandas-UDF / mapInPandas sites
    pushed_filters     scans with at least one pushed-down filter
    """
    plan = explain_text(df)
    lines = plan.splitlines()
    return {
        "scans": sum("Location: InMemoryFileIndex" in ln for ln in lines),
        "exchanges": plan.count("Exchange"),
        "keyed_exchanges": sum(
            "hashpartitioning" in ln and "ENSURE_REQUIREMENTS" in ln
            for ln in lines
        ),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "windows": plan.count("Window"),
        "python_eval": plan.count("BatchEvalPython"),
        "arrow_udf": plan.count("ArrowEvalPython") + plan.count("MapInPandas"),
        "pushed_filters": sum(
            "PushedFilters: [" in ln and "PushedFilters: []" not in ln
            for ln in lines
        ),
    }

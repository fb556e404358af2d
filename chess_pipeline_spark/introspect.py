"""Plan introspection: the quality metrics the plan-gates assert,
exposed as a utility so users can audit THEIR queries the same way
the test suite audits the catalog (scan/exchange/broadcast counts,
Python-eval detection, pushed filters)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_text(df: DataFrame, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def _op_sites(lines: list[str], op: str) -> int:
    """Count physical-operator SITES in a formatted explain.

    Formatted mode lists every operator twice — once in the tree
    ('+- Exchange (3)') and once as a numbered detail header
    ('(3) Exchange'). Counting raw substrings therefore reports 2x
    the true site count; we count only the detail headers, anchored
    so 'Exchange' does not also match 'BroadcastExchange'.
    """
    pat = re.compile(rf"^\(\d+\)\s+{re.escape(op)}\b")
    return sum(bool(pat.match(ln)) for ln in lines)


def plan_metrics(df: DataFrame) -> dict:
    """Counts of the plan features that matter at scale. Keys:

    scans                parquet/file scans (InMemoryFileIndex sites)
    exchanges            SHUFFLE exchange sites (broadcast excluded)
    broadcast_exchanges  BroadcastExchange sites
    keyed_exchanges      hash-partition exchanges the plan REQUIRES
    broadcast_joins      BroadcastHashJoin sites
    sort_merge_joins     SortMergeJoin sites (often a missed broadcast)
    cartesian            CartesianProduct sites (almost always a bug)
    windows              window operator sites
    python_eval          row-at-a-time Python evaluation (the slow path)
    arrow_udf            Arrow-batched pandas-UDF / mapInPandas sites
    pushed_filters       scans with at least one pushed-down filter

    Site counts come from the numbered detail headers only (formatted
    explain prints each operator in the tree AND as a '(n) Op' detail
    block; raw substring counts double every metric and fold
    BroadcastExchange into 'Exchange').
    """
    plan = explain_text(df)
    lines = plan.splitlines()
    return {
        "scans": sum("Location: InMemoryFileIndex" in ln for ln in lines),
        "exchanges": _op_sites(lines, "Exchange"),
        "broadcast_exchanges": _op_sites(lines, "BroadcastExchange"),
        "keyed_exchanges": sum(
            "hashpartitioning" in ln and "ENSURE_REQUIREMENTS" in ln
            for ln in lines
        ),
        "broadcast_joins": _op_sites(lines, "BroadcastHashJoin"),
        "sort_merge_joins": _op_sites(lines, "SortMergeJoin"),
        "cartesian": _op_sites(lines, "CartesianProduct"),
        "windows": _op_sites(lines, "Window"),
        "python_eval": _op_sites(lines, "BatchEvalPython"),
        "arrow_udf": _op_sites(lines, "ArrowEvalPython")
        + _op_sites(lines, "MapInPandas"),
        "pushed_filters": sum(
            "PushedFilters: [" in ln and "PushedFilters: []" not in ln
            for ln in lines
        ),
    }

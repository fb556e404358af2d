"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in chess_pipeline_spark/; this module only
adapts the catalog to the driver's calling convention.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# make the repo importable no matter where the driver launches from
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from chess_pipeline_spark.checkpoints import release_between_queries  # noqa: E402
from chess_pipeline_spark.plans import catalog  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's headline aggregate — the
    win-ratio-by-color pivot (transforms.py:396-417) re-keyed onto the
    synthetic orders table (groupBy + pivot countDistinct +
    row-normalize).
    """
    return catalog()["win_ratio_by_status"].spark(spark, SMOKE_SF_DIR)


def _with_checkpoint_release(
    build: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    """Free the PREVIOUS query's localCheckpoint blocks before building
    the next plan. The driver runs the window sequentially (build →
    collect → compare → next), so by the time query N builds, query
    N-1's result is consumed and its pins are dead weight; without
    this, a 50-query run in one JVM accumulates every query's pinned
    blocks until driver-side GC happens to run (the r11 soak measured
    a heap death from exactly this pattern — SCALING.md r11 §5)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        release_between_queries(spark)
        return build(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {
        name: _with_checkpoint_release(spec.spark)
        for name, spec in catalog().items()
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted where not
    SQL-expressible → driver records a rows-only check)."""
    return {
        name: spec.oracle for name, spec in catalog().items() if spec.oracle is not None
    }

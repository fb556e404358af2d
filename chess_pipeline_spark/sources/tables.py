"""Parquet source adapters for the driver's synthetic tables.

Covers SURVEY §2.1 S3 (parquet scan as the inter-step IR). The scan
stays fully declarative — `spark.read.parquet` — so Catalyst keeps
predicate pushdown, column pruning and partition pruning. The only
special case is `events`, whose parquet stores TIMESTAMP(NANOS):
Spark cannot decode it natively, so we read it as long
(`spark.sql.legacy.parquet.nanosAsLong`) and derive
microsecond-precision `ts` plus exact `ts_sec` columns. The ns->us
conversion is a pure projection (`ts div 1000` on the raw long), so
pushdown on every other column is preserved.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from chess_pipeline_spark.session import RUNTIME_CONFS

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def ensure_session_confs(spark: SparkSession) -> None:
    """Apply runtime-settable confs the engine depends on.

    The verification driver builds its own SparkSession, so these are
    applied defensively on every load rather than assumed at build
    time. All keys in RUNTIME_CONFS are dynamic SQL confs.
    """
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # a static conf on this build — builder path already set it


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table; normalizes the events timestamp.

    events gains:
      ts      TIMESTAMP  (microsecond truncation of the stored nanos)
      ts_sec  LONG       (exact epoch seconds — safe for cross-engine
                          comparison, no float rounding involved)
    and keeps the raw nanosecond long as ts_ns.
    """
    ensure_session_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events" and "ts" in df.columns:
        # integer division on the raw long => exact truncation,
        # matching DuckDB's epoch_us()//1000000 semantics
        df = (
            df.withColumnRenamed("ts", "ts_ns")
            .withColumn("ts", F.timestamp_micros(F.expr("ts_ns div 1000")))
            .withColumn("ts_sec", F.expr("ts_ns div 1000000000"))
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Ensure enough partitions for compute-heavy per-row work.

    A small parquet file scans as ONE split, serializing all
    downstream expression work onto one core — the local-mode analog
    of a skewed/under-split input. If the scan already has >= cores
    partitions (the 100 TB case: thousands of splits), this is a
    no-op and costs nothing; otherwise one narrow-ish shuffle buys
    full parallelism for the expensive projection that follows.
    Hash-partitioning on `cols` (when given) keeps downstream
    key-joins co-partitioned.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)

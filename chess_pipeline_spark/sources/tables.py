"""Parquet source adapters for the driver's synthetic tables.

Covers SURVEY §2.1 S3 (parquet scan as the inter-step IR). The scan
stays fully declarative — `spark.read.parquet` — so Catalyst keeps
predicate pushdown, column pruning and partition pruning. The only
special case is `events`, whose on-disk `ts` column has shipped in two
physical layouts across driver testdata generations:

  * TIMESTAMP(NANOS) — Spark cannot decode it natively, so it is read
    as a raw ns long (`spark.sql.legacy.parquet.nanosAsLong`);
  * TIMESTAMP(MICROS) without UTC adjustment — Spark reads it as
    TIMESTAMP_NTZ directly.

`_normalize_events` maps either layout onto one logical schema:
`ts` TIMESTAMP (µs, UTC session tz), `ts_sec` LONG exact epoch
seconds, `ts_ns` LONG epoch nanoseconds. All derivations are pure
projections on the scanned column, so pushdown on every other column
is preserved. DuckDB oracles stay layout-independent the same way:
`epoch_ns(ts)` accepts both TIMESTAMP_NS and TIMESTAMP.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

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


def _normalize_events(df: DataFrame) -> DataFrame:
    """Map either physical events layout onto the logical schema
    (ts TIMESTAMP, ts_sec LONG, ts_ns LONG) — see module docstring.

    All arithmetic is exact integer truncation, matching the DuckDB
    oracle's ``epoch_ns(ts) // 1000000000``.
    """
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        # nanosAsLong layout: raw epoch-ns long
        return (
            df.withColumnRenamed("ts", "ts_ns")
            .withColumn("ts", F.timestamp_micros(F.expr("ts_ns div 1000")))
            .withColumn("ts_sec", F.expr("ts_ns div 1000000000"))
        )
    # µs layout (TIMESTAMP or TIMESTAMP_NTZ): with the UTC session tz
    # the NTZ→TZ cast preserves the wall clock, so unix_micros is the
    # exact stored epoch.
    return (
        df.withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("ts_ns", F.expr("unix_micros(ts) * 1000"))
        .withColumn("ts_sec", F.expr("unix_micros(ts) div 1000000"))
    )


# One scanned DataFrame per (SparkContext, parquet path), reused for
# the lifetime of that context (r13, guide §6 file-listing-cache
# lesson applied at the adapter): `spark.read.parquet` re-reads
# footers and re-lists files on EVERY call — measured 160 ms of pure
# driver time per call on this box — and the catalog's 74 spread()
# sites plus every query's 1-4 table loads each paid it. The test
# tables are immutable for a session's lifetime (the driver generates
# them before any query runs), DataFrames are immutable values, and
# the key carries (applicationId, startTime) so a stopped-and-
# recreated context (pytest fixtures) can never see a stale entry
# (the checkpoints-baseline discipline).
_SCAN_CACHE: dict[tuple[str, int, str], DataFrame] = {}


def clear_scan_cache() -> None:
    """Drop every memoized scan (r14 ADVICE): the explicit escape
    hatch for a caller that rewrites a table file at a previously
    loaded path within one SparkContext lifetime — the one situation
    the memo's path-immutability contract (load_table docstring)
    does not cover."""
    _SCAN_CACHE.clear()


def load_table(
    spark: SparkSession, sf_dir: str, name: str, refresh: bool = False
) -> DataFrame:
    """Load one synthetic table; normalizes the events timestamp.

    CONTRACT (r14 ADVICE, explicit): the parquet at each loaded path
    is treated as IMMUTABLE for the lifetime of the SparkContext —
    the scan is memoized per (applicationId, startTime, path), so a
    caller that rewrites a loaded table file in-place within one
    context would silently read the stale plan (or fail on deleted
    files). The driver generates all tables before any query runs,
    and every property test writes into a fresh mktemp dir, so the
    contract holds everywhere today; a caller that must re-read a
    mutated path passes ``refresh=True`` (re-scans and replaces the
    memo entry) or calls :func:`clear_scan_cache`.

    events gains:
      ts      TIMESTAMP  (microsecond precision)
      ts_sec  LONG       (exact epoch seconds — safe for cross-engine
                          comparison, no float rounding involved)
      ts_ns   LONG       (epoch nanoseconds; ns-exact only under the
                          TIMESTAMP(NANOS) layout, µs-truncated otherwise
                          — a total tiebreak order either way)
    """
    ensure_session_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    sc = spark.sparkContext
    key = (sc.applicationId, int(sc.startTime), path)
    if not refresh:
        cached = _SCAN_CACHE.get(key)
        if cached is not None:
            return cached
    # only one SparkContext can be live per process: entries under any
    # other (appId, startTime) belong to a stopped context — evict so
    # long pytest processes that cycle sessions don't accumulate
    # DataFrames pinned to dead JVMs
    for k in [k for k in _SCAN_CACHE if k[:2] != key[:2]]:
        del _SCAN_CACHE[k]
    df = spark.read.parquet(path)
    if name == "events" and "ts" in df.columns:
        df = _normalize_events(df)
    _SCAN_CACHE[key] = df
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

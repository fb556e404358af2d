"""SparkSession construction with scale-ready defaults.

Used by tests and bench; the driver supplies its own session to
``__spark_entry__`` entrypoints, so anything the engine *requires* at
runtime (e.g. the ns-timestamp parquet fix) is also applied lazily in
``sources.ensure_session_confs``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs every session needs. Kept separate from
# builder-only confs so they can be applied to an externally-created
# session too (see sources.ensure_session_confs).
RUNTIME_CONFS: dict[str, str] = {
    # older driver testdata stored events.ts as TIMESTAMP(NANOS);
    # Spark only reads that layout as long with this legacy flag
    # (normalized in sources.py — a no-op for µs-layout files)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # deterministic oracle comparison vs DuckDB (UTC-naive timestamps)
    "spark.sql.session.timeZone": "UTC",
    # Arrow for any pandas-UDF exchange
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # runtime re-planning: partition coalescing, skew-join splitting
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
}


def get_spark(
    app_name: str = "chess-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    local[$SPARK_GRAFT_CPUS] by default; shuffle partitions sized to
    cores for local mode (at cluster scale this is overridden by AQE
    coalescing anyway).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if str(cpus).isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark

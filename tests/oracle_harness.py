"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a catalog query's Spark plan and its oracle SQL on the same
parquet tables and asserts exact (stricter-than-driver) equality:
same column names, same row count, same canonicalized row multiset.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

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

_NULL = "<NULL>"


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_cell(v) -> str:
    if v is None:
        return _NULL
    if isinstance(v, float):
        if math.isnan(v):
            return _NULL
        if v == int(v) and abs(v) < 1e15:
            return repr(int(v))  # 3.0 == 3 across int/float column types
        return repr(round(v, 9))
    if isinstance(v, bool):
        return repr(v)
    if hasattr(v, "item"):  # numpy scalar
        return _canon_cell(v.item())
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    df = df[sorted(df.columns)]
    rows = [tuple(_canon_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> None:
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch spark={sorted(spark_df.columns)} "
        f"oracle={sorted(oracle_df.columns)}"
    )
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count spark={len(spark_df)} oracle={len(oracle_df)}"
    )
    s_rows = canonical_rows(spark_df)
    o_rows = canonical_rows(oracle_df)
    if s_rows != o_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, o_rows) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs (spark, oracle): {diffs}")


def run_and_compare(spark, sf_dir: str, name: str, spec) -> None:
    from chess_pipeline_spark.checkpoints import scoped_checkpoints

    # the full-catalog oracle run executes 170+ plans in one JVM —
    # release each query's localCheckpoint pins deterministically
    # (SCALING.md r11 §5: un-GC'd pins accumulated to a heap death)
    with scoped_checkpoints(spark):
        sdf = spec.spark(spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        odf = con.sql(spec.oracle).df()
    finally:
        con.close()
    compare(name, sdf, odf)

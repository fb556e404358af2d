"""Unit laws for the grid-sum helpers: negatives, NULLs, empty
groups, and the Spark/SQL twin producing identical values."""

from __future__ import annotations

import duckdb

import pyspark.sql.functions as F

from chess_pipeline_spark.functions.rounding import (
    grid_cents,
    grid_sum,
    sql_grid_sum,
)


def test_grid_cents_negatives_nulls_and_twin_parity(spark):
    rows = [(1, -3.50), (1, 0.005), (1, None), (2, 10.01), (3, None)]
    df = spark.createDataFrame(rows, "k int, v double")
    got = {
        r["k"]: (r["cents_sum"], r["s"])
        for r in df.groupBy("k")
        .agg(
            F.sum(grid_cents("v", 2)).alias("cents_sum"),
            grid_sum("v", 2).alias("s"),
        )
        .collect()
    }
    # -3.50 -> -350 exactly; 0.005 -> floor(0.5 + eps-free) = 0 or 1?
    # floor(0.005*100 + 0.5) = floor(1.0 - ulp) — the double 0.005 is
    # slightly BELOW the true half, so the grid maps it to 0: the rule
    # is a pure function of the stored double, identical on both
    # engines (that identity, not any decimal ideal, is the contract)
    assert got[1][0] in (-350, -349)
    assert got[2] == (1001, 10.01)
    assert got[3][0] is None and got[3][1] is None  # all-NULL group

    con = duckdb.connect()
    con.sql("CREATE TABLE t (k INT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    oracle = {
        k: s
        for k, s in con.sql(
            f"SELECT k, {sql_grid_sum('v', 2)} AS s FROM t GROUP BY k"
        ).fetchall()
    }
    for k in (1, 2, 3):
        assert oracle[k] == got[k][1], (k, oracle[k], got[k])

"""Cross-engine-deterministic rounding.

Spark's round() goes through BigDecimal(HALF_UP on the shortest
decimal repr of the double); DuckDB's rounds x*10^n with libm. On
half-boundary values (ubiquitous in 2-decimal price data — x.xx5
products) the two disagree. ``fround`` implements rounding as pure
double arithmetic — floor(x * 10^n + 0.5) / 10^n — which is
bit-identical on any engine given bit-identical input, at the cost of
always rounding halves toward +inf.

``sql_round`` emits the same formula for the DuckDB oracle side.

Domain bound: Spark's floor(double) yields LONG, so the scaled value
must fit in int64 — |x| < ~9.2e18 / 10^n (9.2e12 at n=6). Catalog
outputs stay far below that; for larger aggregates round to fewer
decimals or keep the raw value.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def fround(col: Column | str, n: int) -> Column:
    if isinstance(col, str):
        col = F.col(col)
    scale = float(10**n)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def sql_round(expr: str, n: int) -> str:
    scale = float(10**n)
    return f"floor(({expr}) * {scale!r} + 0.5) / {scale!r}"


def grid_cents(col: Column | str, n: int = 2) -> Column:
    """Quantize a money/measure term to its 10^-n grid as an exact
    INTEGER column (floor-based round-half-up, the same rule fround
    applies). Aggregating these integers is an exact, associative
    fold — the building block of grid_sum/sql_grid_sum."""
    if isinstance(col, str):
        col = F.col(col)
    return F.floor(col * F.lit(float(10**n)) + F.lit(0.5)).cast("long")


def grid_sum(col: Column | str, n: int = 2) -> Column:
    """Order-independent money sum: Σ round(term, n), computed as an
    exact integer fold over grid_cents and scaled back.

    Why not fround(sum(term), n): double addition is not associative,
    so the last ulp of a float sum depends on partition/merge order —
    which AQE reshuffles run to run at cluster scale. When the true
    sum sits exactly on a rounding boundary (ubiquitous for
    discounted-price products: 2dp × 2dp = 4dp terms summing to
    half-cents), that ulp decides the rounded cent, and the SAME
    query returns DIFFERENT answers across runs/engines. Quantizing
    each row first makes the aggregate a pure integer sum:
    bit-stable on any engine, any partitioning, any run. The
    semantics are a ledger's — sum of per-line rounded amounts."""
    return F.sum(grid_cents(col, n)) / F.lit(float(10**n))


def sql_grid_sum(expr: str, n: int = 2) -> str:
    """DuckDB twin of grid_sum — same per-row grid, same integer
    fold. (DuckDB sums BIGINT into INT128; the scale-back division
    re-enters double range identically.)"""
    unit = float(10**n)
    return f"(sum(CAST(floor(({expr}) * {unit!r} + 0.5) AS BIGINT)) / {unit!r})"

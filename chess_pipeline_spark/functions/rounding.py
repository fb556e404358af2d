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

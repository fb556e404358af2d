from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

# A plan builder: (spark, sf_dir) -> lazy DataFrame. Must alias every
# computed column to match the oracle's column names exactly — the
# driver sorts columns by name before value-hashing.
PlanFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    """One catalog entry.

    oracle: ANSI/DuckDB SQL over the pre-registered views (region,
    nation, customer, supplier, part, orders, lineitem, events,
    documents, embeddings), or None for non-SQL-expressible operators
    (the driver then records a weaker rows-only check).
    """

    spark: PlanFn
    oracle: str | None
    survey: str = ""  # SURVEY §2 operator ids this query exercises

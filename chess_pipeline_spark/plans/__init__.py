"""The query catalog.

Every implemented operator from SURVEY §2 is exposed as a named
QuerySpec: an idiomatic-Spark plan builder plus (where SQL can express
the semantics) a DuckDB oracle SQL string the driver hash-compares
against. Names are stable across rounds; the driver's
CORRECTNESS_r{N}.json keys on them.
"""

from __future__ import annotations

from chess_pipeline_spark.plans.spec import QuerySpec

__all__ = ["QuerySpec", "catalog"]


def catalog() -> dict[str, QuerySpec]:
    """Assemble the full registry (import-late so a syntax error in one
    themed module is easy to localize in tests)."""
    from chess_pipeline_spark.plans import llm, relational, timeseries, winprob

    out: dict[str, QuerySpec] = {}
    for mod in (relational, timeseries, winprob, llm):
        for name, spec in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name: {name}")
            out[name] = spec
    return out

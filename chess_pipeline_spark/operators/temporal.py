"""Point-in-time (temporal-validity) join over an SCD2 dimension.

The feature-store lookup: each fact row is enriched with the
dimension attributes that were valid AT THE FACT'S OWN TIMESTAMP, so
training features never leak values that postdate the label event.
Consumes exactly the versioned-dimension shape `sinks.scd2_apply`
maintains (valid_from / valid_to / is_current), closing the loop:
the sink builds the history, this operator reads it correctly.

Plan shape (the reason this is NOT a range join): the SCD2 invariant
bounds versions-per-key by a small constant and makes validity
intervals per key disjoint, so joining on the KEY alone fans out by
at most that constant, and the interval predicate
(valid_from <= ts < valid_to) rides the hash join as its non-equi
join condition — Catalyst plans a BroadcastHashJoin/SortMergeJoin
with a post-condition, never a BroadcastNestedLoopJoin. Output is
exactly |facts| rows for an inner join against a well-formed
dimension (each ts falls in at most one version's window).

Reference anchor: the reference pipeline's keyed upsert sink
(src/pipeline_import/postgres_templates.py copy/update flow) keeps
only current rows; SCD2 + point-in-time is the standard extension
when history must stay queryable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: list[str],
    fact_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """Attach to every fact row the dimension version whose validity
    window contains `fact_ts` (NULL `valid_to` = still open, i.e.
    ts >= valid_from matches). `how='left'` keeps facts that predate
    every version (dimension columns NULL), the backfill-safe form.

    The validity columns are consumed by the join and dropped from
    the output; callers needing them can select them off `dim`
    beforehand under different names.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"point_in_time_join: how must be inner|left, got {how!r}")
    clash = (set(dim.columns) - set(keys) - {valid_from, valid_to}) & set(
        facts.columns
    )
    if clash:
        raise ValueError(
            f"point_in_time_join: dimension column(s) {sorted(clash)} already "
            "exist on the fact side — rename one side before joining"
        )
    cond = F.lit(True)
    for k in keys:
        cond = cond & (facts[k] == dim[k])
    cond = (
        cond
        & (dim[valid_from] <= facts[fact_ts])
        & (dim[valid_to].isNull() | (facts[fact_ts] < dim[valid_to]))
    )
    joined = facts.join(dim, cond, how)
    keep = [facts[c] for c in facts.columns] + [
        dim[c]
        for c in dim.columns
        if c not in keys and c not in (valid_from, valid_to)
    ]
    return joined.select(*keep)

"""Incremental materialized-aggregate maintenance.

A warehouse keeps `SELECT key, sum(x), count(*)` materialized and
applies CDC deltas instead of recomputing — sum/count are
self-maintainable aggregates (additive groups: apply +new and -old).
`maintain_sum_count` folds a batch of keyed changes (insert / delete
/ update rows, the exact classes orders_snapshot_diff emits) into the
previous aggregate state with ONE outer merge — no rescans of
history, cost proportional to the delta, not the table.

Not every aggregate maintains this way (min/max need deletion
reprocessing); that boundary is the test's negative case and the
standard MV-maintenance result (self-maintainable = sum/count/avg).

100 TB shape: delta aggregates reduce map-side to |changed keys|
rows; the merge joins aggregate-cardinality frames co-partitioned on
the group key. The aggregate value is kept in exact integer units
(cents) so incremental == recompute BIT-EXACTLY, not approximately —
float sums would drift between the two paths by summation order.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def aggregate_sum_count(rows: DataFrame, key: str, cents_col: str) -> DataFrame:
    """The base aggregate: (key, total_cents, n_rows). Integer cents."""
    return rows.groupBy(key).agg(
        F.sum(cents_col).cast("long").alias("total_cents"),
        F.count("*").cast("long").alias("n_rows"),
    )


def maintain_sum_count(
    prev: DataFrame, changes: DataFrame, key: str
) -> DataFrame:
    """Fold CDC changes into (key, total_cents, n_rows).

    changes: (key, old_cents, new_cents) where old NULL = insert,
    new NULL = delete, both present = update (unchanged rows may be
    present — they contribute zero delta). Groups that reach
    n_rows = 0 drop out, matching a recompute.
    """
    delta = changes.groupBy(key).agg(
        F.sum(
            F.coalesce(F.col("new_cents"), F.lit(0))
            - F.coalesce(F.col("old_cents"), F.lit(0))
        )
        .cast("long")
        .alias("d_cents"),
        F.sum(
            F.when(F.col("old_cents").isNull() & F.col("new_cents").isNotNull(), 1)
            .when(F.col("new_cents").isNull() & F.col("old_cents").isNotNull(), -1)
            .otherwise(0)
        )
        .cast("long")
        .alias("d_rows"),
    )
    merged = prev.join(delta, key, "full_outer").select(
        key,
        (F.coalesce("total_cents", F.lit(0)) + F.coalesce("d_cents", F.lit(0)))
        .cast("long")
        .alias("total_cents"),
        (F.coalesce("n_rows", F.lit(0)) + F.coalesce("d_rows", F.lit(0)))
        .cast("long")
        .alias("n_rows"),
    )
    return merged.filter(F.col("n_rows") > 0)

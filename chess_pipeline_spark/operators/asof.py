"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the latest right row whose timestamp is <=
the left row's timestamp, per key. Realized as the union+window
composition (SURVEY brief: custom operators as compositions of
existing DataFrame ops where semantics allow):

  1. tag both sides, union by name (right carries its payload,
     left carries nulls for it),
  2. one window per key ordered by (ts, side) with
     last_value(..., ignorenulls) over an unbounded-preceding frame
     — each left row picks up the most recent right payload,
  3. keep the left rows.

Cost at scale: ONE hash-partition shuffle on the key (same as any
keyed window), no join explosion, no range-condition nested loop —
this is the plan a dedicated as-of operator would produce. Right
rows sort BEFORE left rows at equal timestamps, giving `<=`
(inclusive) semantics, matching DuckDB's ASOF JOIN `ON l.ts >= r.ts`
which the oracle uses.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str,
    payload: list[str],
) -> DataFrame:
    """Left as-of join: latest right `payload` columns with
    right.ts <= left.ts per `on` key; nulls where no right row
    precedes. `right` must be unique per (on, ts) — pre-aggregate if
    not (ambiguous as-of matches are a semantics error, not a
    tie to break silently).

    The payload travels as ONE struct: `last(ignorenulls)` then
    skips left rows' placeholder (whole-struct NULL) but always
    takes the latest right ROW atomically — individual payload
    fields that are genuinely NULL in that row stay NULL, and
    multi-column payloads can never mix values from different right
    rows (per-column ignorenulls fills would do both wrong).
    """
    clash = set(left.columns) & set(payload)
    if clash:
        raise ValueError(
            f"asof_join payload column(s) {sorted(clash)} already exist on the "
            "left side — rename one side before joining"
        )
    payload_struct = F.struct(*[F.col(c) for c in payload])
    l_tagged = left.withColumn("__side", F.lit(1))
    r_tagged = (
        right.select(*on, ts, payload_struct.alias("__payload"))
        .withColumn("__side", F.lit(0))
    )
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn("__payload", F.last("__payload", ignorenulls=True).over(w))
    out = u.filter(F.col("__side") == 1)
    for c in payload:
        out = out.withColumn(c, F.col(f"__payload.{c}"))
    return out.drop("__side", "__payload")

"""Skew- and shuffle-management operators (100 TB toolbox).

The reference never needs these (its keys are naturally balanced —
SURVEY §4 skew note), but a 100 TB engine does:

- ``salted_join``: explicit key-salting for a join whose left side
  has pathological key skew AQE can't fully split (e.g. one
  giant key receiving >> maxPartitionBytes). The small/right side is
  replicated n_salt times; the left side's rows are deterministically
  sprayed across the salt space, so the hot key's rows land on
  n_salt reducers instead of one.
- ``write_bucketed`` / ``read_bucketed``: persist a table bucketed by
  its join key so repeated joins/aggregations on that key run with
  ZERO exchanges (bucket-local). This is the lakehouse co-location
  strategy for fact-to-fact joins (game_positions ⋈ game_clocks ⋈
  game_moves on (game_link, half_move)) where broadcasting is
  impossible and re-shuffling 100 TB per query is the bottleneck.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin.enabled, on
by default in session.RUNTIME_CONFS) remains the first line of
defense; salting is the explicit fallback that also works for
aggregations.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot side salted across ``n_salt`` buckets.

    ``large`` rows get a deterministic salt derived from the full row
    hash (stable across retries — no rand(), which would break
    speculative execution / task retry idempotency); ``small`` is
    exploded n_salt times. The join key becomes (keys…, salt), so a
    single hot key fans out over n_salt reducers. Output equals the
    plain join exactly.
    """
    out_cols = [c for c in large.columns] + [
        c for c in small.columns if c not in on
    ]
    salt = F.pmod(F.hash(*[F.col(c) for c in large.columns]), F.lit(n_salt))
    large_s = large.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    joined = large_s.join(small_s, [*on, "__salt"], how)
    return joined.select(*out_cols)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (+ optionally sorted) table: joins and
    groupBys on the bucket key become exchange-free, and sorted
    buckets let sort-merge join skip its sort. The write pays one
    shuffle ONCE; every downstream query on the key pays none."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a crashed previous write can leave the managed location behind
    # with no catalog entry; saveAsTable refuses to reuse it
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
    if os.path.exists(loc):
        shutil.rmtree(loc)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)

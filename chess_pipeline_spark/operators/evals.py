"""Position-evaluation resolution as relational operators.

The reference's 3-tier eval fetch (cloud API -> serverless -> local
stockfish, transforms.py:118-183) is a side-effecting enrichment; the
*engine* semantics are the cache dance around it
(src/vendors/stockfish.py:13-111):

  1. games with embedded evals -> explode (E3) -> union into cache
  2. games without evals -> distinct FENs -> anti-join against cache
     (J7) -> fetch missing -> union (U1)
  3. downstream: positions LEFT JOIN cache on fen, nulls -> 0 (J3)

At 100 TB the cache probe is a broadcast/shuffled left_anti on `fen`
and the fetch is a mapInPandas batch adapter — here represented by a
pluggable `fetch_fn` (fixture-backed in tests; never in the oracle
path).
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def split_by_has_evals(games: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Partition games into (has embedded evals, needs fetch) — P5's
    predicate-on-array (stockfish.py:33-34 `evaluations.map(any)`:
    true iff any nonzero entry)."""
    # coalesce to false: exists() over a NULL array yields NULL,
    # which would fail BOTH p and ~p — silently dropping the game
    # from the cache fold AND the fetch queue
    p = F.coalesce(F.exists("evaluations", lambda x: x != 0), F.lit(False))
    return games.filter(p), games.filter(~p)


def missing_fens(candidates: DataFrame, cache: DataFrame) -> DataFrame:
    """Distinct candidate FENs not yet evaluated: dropDuplicates +
    LEFT ANTI against the fen-keyed cache (stockfish.py:44-51,96 —
    J7/P6/P9)."""
    fens = candidates.select("fen").dropDuplicates(["fen"])
    return fens.join(cache, "fen", "left_anti")


def resolve_evals(
    games_with_evals: DataFrame,
    new_evals: DataFrame,
    cache: DataFrame,
) -> DataFrame:
    """Updated cache = embedded evals ∪ freshly fetched ∪ existing,
    deduped by fen keeping the deepest eval (stockfish.py:94,109 —
    U1 union; dedup A8)."""
    from chess_pipeline_spark.operators.chess_transforms import explode_evals

    embedded = (
        explode_evals(games_with_evals)
        .select("fen", "evaluation", "eval_depth")
        .withColumn("_src", F.lit(2))
    )
    unioned = (
        embedded.unionByName(new_evals.withColumn("_src", F.lit(1)), allowMissingColumns=True)
        .unionByName(cache.withColumn("_src", F.lit(0)), allowMissingColumns=True)
    )
    # keep one row per fen: deepest evaluation first, then a fixed
    # source precedence (embedded > fresh > cache) so full-row ties
    # resolve deterministically even when the cache carries extra
    # columns that differ between sources
    from pyspark.sql import Window

    w = Window.partitionBy("fen").orderBy(
        F.desc_nulls_last("eval_depth"),
        F.desc_nulls_last("evaluation"),
        F.desc("_src"),
    )
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def attach_evals(positions: DataFrame, cache: DataFrame, fill_zero: bool = True) -> DataFrame:
    """positions LEFT JOIN evals on fen; missing -> 0 unless the
    caller wants true nulls (src/inference.py:41-50 — J3 + P7)."""
    out = positions.join(cache.select("fen", "evaluation"), "fen", "left")
    if fill_zero:
        out = out.withColumn("evaluation", F.coalesce(F.col("evaluation"), F.lit(0.0)))
    return out


def fetch_missing(
    fens: DataFrame,
    fetch_fn: Callable[[str], tuple[float, int]] | None = None,
) -> DataFrame:
    """Batch-evaluate FENs via a pluggable engine adapter.

    The production shape is mapInPandas (one engine client per
    partition — S7/U2); tests inject a deterministic fixture fn. With
    no adapter, returns an empty eval frame (the engine treats evals
    as join-only data, SURVEY §3.3).
    """
    if fetch_fn is None:
        return fens.select(
            "fen",
            F.lit(None).cast("double").alias("evaluation"),
            F.lit(None).cast("int").alias("eval_depth"),
        ).limit(0)

    import pandas as pd

    from chess_pipeline_spark.deploy import ensure_package_on_executors

    ensure_package_on_executors(fens.sparkSession)

    def batch(iterator):
        for pdf in iterator:
            evals, depths = zip(*(fetch_fn(f) for f in pdf["fen"])) if len(pdf) else ((), ())
            yield pd.DataFrame(
                {"fen": pdf["fen"], "evaluation": evals, "eval_depth": depths}
            )

    return fens.mapInPandas(batch, "fen string, evaluation double, eval_depth int")


def fetch_missing_with_quota(
    fens: DataFrame,
    fetch_fn: Callable[[str], tuple[float, int]],
    counter_path: str,
    period_key: str,
    budget: int = 3000,
) -> DataFrame:
    """Quota-gated batch evaluation, mirroring the reference's Valkey
    daily/monthly API counters (src/pipeline_import/transforms.py:
    30-31,134-151: 3,000 cloud-eval calls/day, 900,000 remote
    calls/month; positions beyond the quota stay un-evaluated and are
    picked up by a later run's cache anti-join).

    The counter is a tiny parquet ledger keyed by period_key (the
    caller passes the day/month string — the reference's Valkey key
    expiry, made explicit). remaining = budget - used; the FENs
    actually sent are the first `remaining` in fen order, so a retry
    of the same batch selects the same positions. The ledger is
    written from the PICK count BEFORE any external call executes
    (bak-swap crash-safe): a crash between the ledger write and the
    fetch over-counts rather than over-fetches, so the quota always
    errs on the safe side of the API limit. The fetch itself is then
    localCheckpointed so every external call executes exactly once
    regardless of how many actions the caller later runs on the
    returned frame — in steady state counted == executed, since the
    mapInPandas fetch is 1:1 with the counted picks.
    """
    spark = fens.sparkSession
    from chess_pipeline_spark.sinks import bak_swap_write, read_bounded_ledger

    prior = read_bounded_ledger(spark, counter_path, "period_key string, used long")
    used_row = prior.filter(F.col("period_key") == period_key).collect()
    used = int(used_row[0]["used"]) if used_row else 0
    remaining = max(0, budget - used)
    # pick runs no external calls: select/distinct/limit over fens only
    pick = (
        fens.select("fen").distinct().orderBy("fen").limit(remaining).localCheckpoint()
    )
    n_sent = pick.count()
    merged = prior.filter(F.col("period_key") != period_key).unionByName(
        spark.createDataFrame(
            [(period_key, used + n_sent)], "period_key string, used long"
        )
    )
    bak_swap_write(spark, merged, counter_path)
    return fetch_missing(pick, fetch_fn).localCheckpoint()

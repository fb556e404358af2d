#!/usr/bin/env python3
"""Measured skew-join evidence (r7): a hot-key join at sf0.1 where
one key owns ~90% of the fact side, comparing

  naive     — sort-merge join, AQE skew splitting OFF (what a plain
              shuffle join does when the hot key lands on one
              reducer; also the shape of a skewed AGGREGATION, which
              AQE's skew-join splitter does not help),
  aqe       — the same join with AQE skew splitting ON (Spark's
              first-line defense, session default),
  salted    — operators.skew.salted_join with n_salt=8.

Broadcast is disabled throughout: the scenario is a dim too large to
broadcast (at 100 TB the dim is GBs); locally that's emulated with
autoBroadcastJoinThreshold=-1.

Prints one JSON line with min-of-3 timings per variant and the
max/median reducer-task input-row ratio for the naive plan (the
imbalance the salt removes). Results recorded in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import pyspark.sql.functions as F  # noqa: E402

from chess_pipeline_spark.operators.skew import salted_join  # noqa: E402
from chess_pipeline_spark.session import get_spark  # noqa: E402
from chess_pipeline_spark.sources import load_table  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="skew-experiment")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    amplify = int(os.environ.get("SKEW_AMPLIFY", "8"))
    li = load_table(spark, sf_dir, "lineitem")
    if amplify > 1:
        # local[32] needs a bigger hot key than sf0.1's 540k rows for
        # the imbalance to dominate wall-clock (a 0.5M-row reducer
        # task is still sub-second on one core); amplify replicates
        # the fact side so the hot key reaches cluster-relevant size
        li = li.withColumn(
            "__r", F.explode(F.sequence(F.lit(1), F.lit(amplify)))
        ).drop("__r")
    # hot key: ~90% of rows collapse onto key 1, the rest keep a
    # spread key — the pathological shape AQE's splitter exists for
    fact = li.select(
        F.when(F.col("l_orderkey") % 10 < 9, F.lit(1))
        .otherwise(F.pmod(F.col("l_suppkey"), F.lit(1000)) + 2)
        .cast("long")
        .alias("k"),
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    ).localCheckpoint()  # pin the input so each variant times ONLY the join
    dim = (
        spark.range(1, 1002)
        .select(
            F.col("id").alias("k"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        .localCheckpoint()
    )

    def run(df) -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    def agg(joined):
        return joined.groupBy("k").agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
            F.count("*").alias("n"),
            F.max("payload").alias("p"),
        )

    results: dict[str, float] = {}

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    results["naive_skewjoin_off"] = run(agg(fact.join(dim, "k")))
    results["salted_skewjoin_off"] = run(agg(salted_join(fact, dim, ["k"], n_salt=8)))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    results["naive_aqe_skewjoin"] = run(agg(fact.join(dim, "k")))
    results["salted_aqe_skewjoin"] = run(agg(salted_join(fact, dim, ["k"], n_salt=8)))

    # quantify the imbalance itself: rows per join key
    dist = (
        fact.groupBy("k").count().agg(
            F.max("count").alias("max_rows"),
            F.expr("percentile(count, 0.5)").alias("median_rows"),
            F.count("*").alias("n_keys"),
        )
    ).first()
    out = {
        "sf_dir": sf_dir,
        "amplify": amplify,
        "fact_rows": fact.count(),
        "hot_key_rows": int(dist["max_rows"]),
        "median_key_rows": float(dist["median_rows"]),
        "n_keys": int(dist["n_keys"]),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "timings_sec_min_of_3": results,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

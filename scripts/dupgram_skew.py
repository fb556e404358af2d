#!/usr/bin/env python3
"""Measured hot-gram evidence for dup_ngram_fraction (r9).

The query joins corpus-scale postings back onto a gram-df frame keyed
on the 8-byte digest; a boilerplate gram with df ~= corpus size puts
all its postings in ONE join task unless something intervenes. This
script measures what actually intervenes on Spark 4.1:

1. AQE's skew-join splitter does NOT cover the natural plan
   (verified here): OptimizeSkewedJoin pattern-matches
   Sort-over-ShuffleRead with ENSURE_REQUIREMENTS origin on BOTH
   children; the df side's final HashAggregate sits between its sort
   and its shuffle, and rewriting it with repartition() is rejected
   for its REPARTITION_BY_COL origin. (A control fact-dim join with
   the matchable shape DOES show `skew=true` under the same confs —
   the detector works; the pattern is what excludes this query.)
2. The production fix is STRUCTURAL (plans/corpus.py::
   dup_exposure_skew_safe): grams whose df >= threshold join via
   broadcast in the scan stage; only the skew-free cold remainder
   shuffles; the df exchange is computed once and reused.

Builds a synthetic corpus (default 500k docs, ~90% sharing one
boilerplate 5-gram), forces non-broadcastable df
(autoBroadcastJoinThreshold=-1 for the PLAIN variant's join), and
times plain vs split, min-of-3, byte-identical output asserted.
At local scale tokenize dominates and the deltas are small — the
plan-shape facts above are the load-bearing result; the timing shows
the split costs nothing when skew is benign.

Prints one JSON line. Results recorded in SCALING.md.
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

from chess_pipeline_spark.plans.corpus import (  # noqa: E402
    dup_exposure_skew_safe,
    exposure_fold,
    word_gram_postings,
)
from chess_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_docs = int(os.environ.get("DUPGRAM_DOCS", "500000"))
    hot_df = int(os.environ.get("DUPGRAM_HOT_DF", "1000"))
    spark = get_spark(app_name="dupgram-skew")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.lit("synthetic").alias("source"),
        F.concat(
            F.when(
                F.col("id") % 10 < 9,
                F.lit("subscribe to our newsletter for updates "),
            ).otherwise(F.lit("")),
            F.format_string(
                "alpha%d bravo%d charlie%d delta%d echo%d foxtrot%d golf%d",
                *([F.col("id")] * 7),
            ),
        ).alias("text"),
    ).repartition(32)

    def grams():
        return word_gram_postings(docs).select(
            "doc_id", "source", F.xxhash64("g").alias("gd")
        )

    def plain():
        g = grams()
        dfreq = g.groupBy("gd").agg(F.count("*").cast("long").alias("df"))
        return exposure_fold(g.join(dfreq, "gd"))

    def split():
        # the production structure: tokenize once into a lazy local
        # checkpoint (digest-only spill), then hot/cold split-join
        return dup_exposure_skew_safe(
            grams().localCheckpoint(eager=False), hot_df=hot_df
        )

    def run(fn) -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    def checksum(fn):
        r = fn().agg(
            F.count("*").alias("n"),
            F.sum(F.col("dup_bp") * F.col("doc_id")).alias("chk"),
        ).first()
        return (r["n"], int(r["chk"]))

    plain().write.format("noop").mode("overwrite").save()  # codegen warm-up

    # does AQE's splitter engage on the plain shape? (expected: no)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "128k")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128k")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    probe = plain()
    probe.rdd.count()
    final_plan = probe._sc._jvm.PythonSQLUtils.explainString(
        probe._jdf.queryExecution(), "simple"
    ).split("Initial Plan")[0]
    aqe_split_engaged = "skew=true" in final_plan
    for k in (
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    ):
        spark.conf.unset(k)

    t_plain = run(plain)
    t_split = run(split)
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "hot_doc_fraction": 0.9,
                "hot_df_threshold": hot_df,
                "aqe_skew_split_engaged_on_plain_plan": aqe_split_engaged,
                "plain_join_sec": t_plain,
                "hot_cold_split_sec": t_split,
                "results_identical": checksum(plain) == checksum(split),
            }
        )
    )


if __name__ == "__main__":
    raise SystemExit(main())

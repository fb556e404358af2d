#!/usr/bin/env python3
"""Per-query profile: build-time vs execute-time, Spark job count,
and the physical plan's Exchange count — the §1 "measure first"
harness for the r13 optimization round.

For each query named on the command line (or a default target set):
  * build_s    — wall time of spec.spark(spark, sf_dir) (driver-side
                 plan construction INCLUDING any eager actions the
                 builder runs: localCheckpoints, .first()/.count()
                 calls, index builds);
  * exec_s     — wall time of the noop-sink write of the built plan;
  * jobs       — Spark jobs launched across build+exec (statusTracker
                 via job group);
  * exchanges  — Exchange nodes in the final plan's formatted explain.

Usage:
  python scripts/profile_queries.py [--sf-dir D] [name ...]
Prints one JSON line per query plus a total.
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

from chess_pipeline_spark.checkpoints import scoped_checkpoints  # noqa: E402
from chess_pipeline_spark.plans import catalog  # noqa: E402
from chess_pipeline_spark.session import get_spark  # noqa: E402

DEFAULT_TARGETS = [
    "ivf_ingest_audit",
    "ivf_adc_recall",
    "bm25_index_probe",
    "cms_join_size_estimate",
    "dedup_keep_best",
    "dedup_groups_logstep",
    "ngram_jaccard_near_dup",
    "hll_set_algebra",
    "containment_near_dup",
    "media_phash_near_dup",
    "knn_cosine_ivf",
    "bpe_encode_tokens",
    "pca_top_component",
    "zorder_layout_audit",
    "cms_heavy_hitters",
    "hll_cumulative_daily",
    "knn_pq_adc",
    "dup_ngram_fraction",
    "dsir_importance_weights",
    "exact_substring_spans",
]


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args or DEFAULT_TARGETS

    spark = get_spark(app_name="profile-queries")
    sc = spark.sparkContext
    cat = catalog()

    # warm up codegen/readers like bench.py does
    spark.range(1000).count()
    from chess_pipeline_spark.sources import load_table

    load_table(spark, sf_dir, "region").groupBy("r_name").count().collect()

    rows = []
    for name in names:
        spec = cat[name]
        # run twice; report the second (steady-state, post-codegen)
        for attempt in range(2):
            group = f"prof_{name}_{attempt}"
            sc.setJobGroup(group, name)
            with scoped_checkpoints(spark):
                t0 = time.perf_counter()
                df = spec.spark(spark, sf_dir)
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            exchanges = plan.count("Exchange")
            sc.setJobGroup(None, None)
        r = {
            "name": name,
            "build_s": round(t1 - t0, 3),
            "exec_s": round(t2 - t1, 3),
            "total_s": round(t2 - t0, 3),
            "jobs": jobs,
            "exchanges": exchanges,
        }
        rows.append(r)
        print(json.dumps(r), flush=True)
    total = round(sum(r["total_s"] for r in rows), 3)
    print(json.dumps({"total_s": total, "n": len(rows)}))
    spark.stop()


if __name__ == "__main__":
    main()

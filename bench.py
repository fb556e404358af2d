#!/usr/bin/env python3
"""Headline benchmark: runs representative catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "loadavg": [...],
   "runs_per_query": 3}

Each query is forced end-to-end with the noop sink (full plan
execution, no driver collect cost).

Provenance: a contended box inflates timings 3-9x on the long-tail
queries (a recorded 59s round was really 25s idle), so each query
reports min-of-3 runs and the 1/5/15-min load averages are emitted
alongside — a result with loadavg >> 1 at start should be re-run
before it drives decisions.

The full result JSON is ALSO written to BENCHLOCAL_r{ROUND}.json in
the repo (committed per round): the driver's BENCH_r{N}.json records
only a 2000-char tail of stdout, which clipped r5's headline total —
round-over-round comparison must never depend on that window. Scalar
totals are ordered LAST in the stdout JSON so a tail-truncated
capture still shows them.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

import pandas as pd  # module-level: the warm-up UDF's postponed
                     # annotations resolve against module globals

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from chess_pipeline_spark.checkpoints import scoped_checkpoints  # noqa: E402
from chess_pipeline_spark.plans import catalog  # noqa: E402
from chess_pipeline_spark.session import get_spark  # noqa: E402

# perf-representative subset: scan+agg, join+topk, pivot, windows,
# explode-shuffle, sessionization, dedup, near-dup self-join, knn,
# expression-ML inference
HEADLINE = [
    "pricing_summary",
    "top_customer_revenue",
    "revenue_by_nation",
    "events_asof_last_purchase",
    "win_ratio_by_status",
    "clock_lead_fill",
    "explode_quantities",
    "events_sessionized",
    "events_tumbling_1h",
    "dedup_exact",
    "near_dup_pairs_jaccard",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "simhash_near_dup",
    "knn_cosine_topk",
    "knn_cosine_ivf",
    "knn_cosine_lsh",
    "win_prob_lr",
    "multimodal_features",
    # r5: the two heaviest plans per SCALING.md, added so regressions
    # in them are visible round-over-round (they were in neither set);
    # subtract ADDED_IN_R5 from the total when comparing to BENCH_r04
    "dedup_keep_best",
    "ngram_jaccard_near_dup",
]

ADDED_IN_R5 = ["dedup_keep_best", "ngram_jaccard_near_dup"]

# round-4 additions, timed separately so the headline total stays
# comparable across rounds: range join, corpus curation + ranking,
# TSDB rollups, JL projection, incremental dedup
EXTENDED = [
    "events_interval_join",
    "events_rolling_zscore",
    "events_ohlc_hourly",
    "events_time_weighted_avg",
    "decontaminate_ngram_overlap",
    "bm25_top_terms",
    "quality_filter_verdicts",
    "repetition_stats",
    "mixture_sample",
    "dedup_incremental_simhash",
    "embedding_random_projection",
    # round-5 additions: sub-document dedup, per-item semantic dedup,
    # row-local PII scrub, TSDB gap detection, retention cohorts
    "paragraph_dedup",
    "semdedup_embedding",
    "pii_redact_stats",
    "events_gap_detection",
    "orders_retention_cohort",
    "oov_rate_top1k",
    "cross_source_leakage",
    "boilerplate_chunk_removal",
    "corpus_composition",
    "events_decay_score",
    "orders_rfm_segments",
    "orders_snapshot_diff",
    # profiling/sketch tier (late r5)
    "hll_distinct_users",
    "data_profile_orders",
    "mad_outlier_bounds",
    "seq_length_histogram",
    "returned_items_report",
    "dup_cluster_size_hist",
    "unigram_logprob_score",
    "cms_heavy_hitters",
    "value_quantiles_binned",
    "order_priority_pending",
    "returnflag_priority_casesum",
    "cust_order_count_dist",
    "small_qty_revenue",
    "waiting_supplier_orders",
    "customer_value_deciles",
    "hll_cumulative_daily",
    "bm25_doc_search",
    "hybrid_search_rrf",
    "attribution_last_touch",
    "funnel_latency_percentiles",
    "large_quantity_orders",
    "idle_customer_balance",
    "session_path_trigrams",
    "referential_integrity_audit",
    "dedup_embedding_agreement",
    "event_transition_matrix",
    # round-6 additions: pointer-jumping CC, sketch-cut deciles,
    # BPE merge counting, PQ codes + ADC search, Q19/Q15/Q7 shapes
    "dedup_groups_logstep",
    "customer_value_deciles_sketch",
    "bpe_merge_candidates",
    "embedding_pq_codes",
    "knn_pq_adc",
    "disjunctive_brand_revenue",
    "top_supplier_revenue",
    "nation_trade_volume",
    "shipping_priority_topk",
    "forecast_revenue_change",
    "promo_revenue_share",
    "local_supplier_volume",
    "nation_market_share",
    "cube_status_priority",
    "segment_top_value_orders",
    "scd2_customer_snapshot",
    # round-7 additions: the persisted-IVFADC serving path. Their
    # local time is dominated by the per-run index BUILD + ingest +
    # compaction (dozens of tiny maintenance jobs at toy scale); in
    # production those amortize across query batches — see SCALING.md
    "ivf_adc_recall",
    "ivf_ingest_audit",
    "pgn_moves_table",
    "hll_set_algebra",
    "fuzzy_part_matches",
    "bpe_train_merges",
    "cms_join_size_estimate",
    "join_key_skew_profile",
    "sliding_window_chunks",
    "bpe_encode_tokens",
    # late-r7 additions: asymmetric containment, source KL drift,
    # zone-map layout audit, bloom pruning, media phash dedup,
    # ES weighted sampling, PSI drift, PCA power iteration
    "containment_near_dup",
    "source_kl_divergence",
    "zorder_layout_audit",
    "bloom_join_prune",
    "media_phash_near_dup",
    "weighted_sample_es",
    "psi_value_drift",
    "pca_top_component",
    "concurrency_peak_daily",
    "bm25_index_probe",
    "temperature_mixture_sample",
    "weighted_sample_per_source",
    # late-r7 DSS shapes: Q2 argmin, Q11 global-scalar HAVING,
    # Q9 profit rollup, Q20 two-level agg, Q16 not-in anti
    "cheapest_supplier_per_part",
    "above_share_nations",
    "profit_by_nation_year",
    "dominant_supplier_parts",
    "brand_supplier_counts",
    # late-r7 training-pipeline ops: point-in-time feature lookup,
    # deterministic contrastive negatives
    "scd2_point_in_time_join",
    "negative_sample_pairs",
    "leakage_safe_split",
    "oversample_balance_sources",
    "token_balanced_shards",
    "span_corruption_plan",
    "hard_negative_mining",
    "label_centroids",
    "dup_ngram_fraction",
    "embedding_diversity",
    # r9: the grouped-map Weiszfeld golden row (fixture-scale by
    # design — tracked so the grouped-map path stays timed)
    "robust_centroid_goldens",
    # r12: the ExactSubstr pair (previously soak-only — now visible
    # round-over-round) and the staged DSIR importance weights
    "exact_substring_spans",
    "exact_substring_rewrite",
    "dsir_importance_weights",
    # r14: the Gumbel-top-k selection step over the DSIR weights
    # (first bench row, alongside its first driver-window contact)
    "dsir_resample_topk",
]

ROUND = 14  # bump per round; names the committed BENCHLOCAL file


def time_index_phases(spark, sf_dir: str) -> dict[str, float]:
    """Phase-split timings for the persisted-index families.

    The catalog bench rows for ivf_adc_recall / ivf_ingest_audit /
    bm25_index_probe are ~80% per-run index (re)build by construction
    (catalog queries must be self-contained), so a regression in the
    SERVING path — the latency the plan gates actually protect —
    could hide under build noise. This times each phase alone:
    build (90% of the corpus), ingest (the remaining 10% as a delta
    batch), compact (both families since r9), and probe (min-of-3,
    noop sink — the steady-state serving number). Same parameters as
    the catalog queries (_IVF_NLISTS/_RECALL_* and _BM25_QUERY_TERMS)."""
    import shutil

    from pyspark.sql import functions as F

    from chess_pipeline_spark.ann_index import (
        build_ivf_index,
        compact_ivf_index,
        ingest_ivf_batch,
        probe_ivf_adc,
    )
    from chess_pipeline_spark.plans.corpus import _BM25_QUERY_TERMS
    from chess_pipeline_spark.plans.llm import (
        _IVF_NLISTS,
        _RECALL_K,
        _RECALL_NPROBE,
        _RECALL_NQ,
        _scratch_index_dir,
    )
    from chess_pipeline_spark.sources import load_table
    from chess_pipeline_spark.text_index import (
        build_text_index,
        compact_text_index,
        ingest_text_delta,
        probe_bm25,
    )

    phases: dict[str, float] = {}

    def timed(key: str, fn) -> None:
        t0 = time.perf_counter()
        fn()
        phases[key] = round(time.perf_counter() - t0, 3)

    def timed_min3(key: str, fn) -> None:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        phases[key] = round(best, 3)

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    mid = e.agg(F.expr("percentile(vec_id, 0.9)")).first()[0]
    idx = _scratch_index_dir("bench_phases_ivf")
    timed(
        "ivf_build",
        lambda: build_ivf_index(
            e.filter(F.col("vec_id") <= mid), idx, n_lists=_IVF_NLISTS
        ),
    )
    timed(
        "ivf_ingest",
        lambda: ingest_ivf_batch(e.filter(F.col("vec_id") > mid), 0, idx),
    )
    timed("ivf_compact", lambda: compact_ivf_index(spark, idx))
    queries = e.filter(F.col("vec_id") < _RECALL_NQ).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    timed_min3(
        "ivf_probe",
        lambda: probe_ivf_adc(
            spark, idx, queries, k=_RECALL_K, nprobe=_RECALL_NPROBE, id_col="qid"
        )
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    shutil.rmtree(idx, ignore_errors=True)

    docs = load_table(spark, sf_dir, "documents")
    dmid = docs.agg(F.expr("percentile(doc_id, 0.9)")).first()[0]
    tidx = _scratch_index_dir("bench_phases_bm25")
    timed(
        "bm25_build",
        lambda: build_text_index(docs.filter(F.col("doc_id") <= dmid), tidx),
    )
    timed(
        "bm25_ingest",
        lambda: ingest_text_delta(docs.filter(F.col("doc_id") > dmid), tidx, 1),
    )
    timed("bm25_compact", lambda: compact_text_index(spark, tidx))
    timed_min3(
        "bm25_probe",
        lambda: probe_bm25(spark, tidx, _BM25_QUERY_TERMS)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    shutil.rmtree(tidx, ignore_errors=True)
    return phases


def platform_calibration(spark) -> dict[str, float]:
    """Code-independent runner-VM probes, recorded in every BENCHLOCAL
    from r10 on so cross-round deltas can separate PLATFORM shifts
    from plan changes — the r9→r10 canonical pair moved a uniform
    ~1.3x median across 124 queries whose code was SHA-identical
    (only rotation bookkeeping differed between the bench SHAs), and
    without an anchor that shift was indistinguishable from a broad
    regression until hand-adjudicated (SCALING.md r10 platform-shift
    section). Three probes, none touching repo code or testdata:

    - pyloop_sec: single-thread Python arithmetic (interpreter + CPU
      clock anchor).
    - smalljob_ms: mean latency of a trivial 2-stage Spark job — the
      scheduling overhead that dominates the many-small-stage query
      regime (the regime that moves most under platform shifts).
    - shuffle_probe_sec: min-of-3 of a mid-size synthesized
      hash-aggregate (codegen + exchange + agg throughput).
    """
    import time as _t

    from pyspark.sql import functions as F

    t0 = _t.perf_counter()
    s = 0
    for i in range(8_000_000):
        s += i * i
    pyloop = _t.perf_counter() - t0

    for _ in range(5):
        spark.range(100).count()
    t0 = _t.perf_counter()
    for _ in range(60):
        spark.range(100).count()
    smalljob_ms = (_t.perf_counter() - t0) / 60 * 1000

    def one() -> float:
        t0 = _t.perf_counter()
        (
            spark.range(30_000_000)
            .withColumn("k", F.col("id") % 10_000)
            .groupBy("k")
            .agg(F.sum("id").alias("s"), F.count("*").alias("c"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return _t.perf_counter() - t0

    one()
    shuffle = min(one() for _ in range(3))
    return {
        "pyloop_sec": round(pyloop, 3),
        "smalljob_ms": round(smalljob_ms, 1),
        "shuffle_probe_sec": round(shuffle, 3),
    }


def _git_sha() -> str:
    try:
        return (
            subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                cwd=_REPO,
                capture_output=True,
                text=True,
                timeout=10,
            ).stdout.strip()
            or "unknown"
        )
    except Exception:
        return "unknown"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    # capture ambient load BEFORE the JVM/session spin-up: the guard
    # must gate on the BOX's state, not on bench's own warmup load
    loadavg_start = [round(x, 2) for x in os.getloadavg()]

    spark = get_spark(app_name="chess-pipeline-spark-bench")
    cat = catalog()

    # warm up JVM/codegen, the parquet reader + shuffle paths, AND
    # the Python UDF workers so the first measured query isn't
    # charged one-time init cost (worker fork + package zip shipping
    # alone is ~4s; steady-state mapInPandas throughput is the
    # meaningful number)
    spark.range(1000).count()
    from chess_pipeline_spark.sources import load_table

    load_table(spark, sf_dir, "region").groupBy("r_name").count().collect()

    from pyspark.sql import functions as F

    from chess_pipeline_spark.multimodal import (
        attach_binary_payload,
        extract_media_features,
    )

    tiny = spark.range(64).repartition(32).select(
        F.col("id").alias("doc_id"), F.lit("warmup").alias("text")
    )
    extract_media_features(attach_binary_payload(tiny)).count()

    # min-of-3: the first execution of each query pays whole-stage
    # codegen compilation (measured 3.8s -> 0.5s steady-state on the
    # minhash signature expressions), so min-of-2 can still record a
    # compile-tainted number; the third run pins steady state
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

    def time_set(names: list[str]) -> dict[str, float]:
        out: dict[str, float] = {}
        for name in names:
            spec = cat[name]
            best = float("inf")
            for _ in range(runs):
                # checkpoint creation is part of the query's cost and
                # stays inside the timer; the release is consumer-side
                # bookkeeping and stays outside it
                with scoped_checkpoints(spark):
                    t0 = time.perf_counter()
                    spec.spark(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    elapsed = time.perf_counter() - t0
                best = min(best, elapsed)
            out[name] = round(best, 3)
        return out

    calibration = platform_calibration(spark)

    # --calibrate-only: measure the platform probes and merge them
    # into the existing canonical BENCHLOCAL artifact (for patching a
    # run that predates the calibration block, without re-paying the
    # full bench)
    if "--calibrate-only" in sys.argv:
        local = Path(_REPO) / f"BENCHLOCAL_r{ROUND:02d}.json"
        if not local.exists():
            spark.stop()
            sys.exit(
                f"--calibrate-only: {local} does not exist — run the full "
                f"bench first (the probes patch an EXISTING canonical "
                f"artifact; there is nothing to merge into)"
            )
        art = json.loads(local.read_text())
        art["calibration"] = calibration
        art["calibration_loadavg"] = loadavg_start
        # the probes were measured NOW, not when the artifact's query
        # timings ran — possibly under different load or VM state.
        # Mark the merge so bench_delta/SCALING.md readers know the
        # calibration is not contemporaneous with the timings.
        art["calibration_patched_unix"] = int(time.time())
        local.write_text(json.dumps(art, indent=1) + "\n")
        print(json.dumps({"calibration": calibration, "merged_into": str(local)}))
        spark.stop()
        return

    timings = time_set(HEADLINE)
    extended = time_set(EXTENDED)
    # the phase harness pins seeds/codebook frames internally; release
    # them with the block (the on-disk index is the cross-phase state)
    with scoped_checkpoints(spark):
        index_phases = time_index_phases(spark, sf_dir)

    total = round(sum(timings.values()), 3)
    # bulky per-query maps FIRST, scalar totals LAST: the driver keeps
    # only a 2000-char stdout tail, so the tail must carry the numbers
    # that drive round-over-round comparison
    result = {
        "queries": timings,
        "extended_queries": extended,
        "index_phases": index_phases,
        "calibration": calibration,
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "added_in_r5": ADDED_IN_R5,
        "comparable_total_r4": round(
            sum(v for k, v in timings.items() if k not in ADDED_IN_R5), 3
        ),
        "extended_total": round(sum(extended.values()), 3),
        "sf": sf,
        "git": _git_sha(),
        "loadavg": loadavg_start,
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "runs_per_query": runs,
    }
    # committed full-fidelity copy (survives any stdout truncation).
    # Provenance guard (r7, after the r6 canonical run was silently
    # clobbered first by a loadavg-5.7 re-run and then by an sf0.01
    # smoke run): the canonical per-round file only ever holds runs
    # started at loadavg < 1.5 AT THE DEFAULT SCALE FACTOR; anything
    # else lands in a stamped sibling that can't shadow it.
    # the 15-min average is the better contention predictor: today's
    # same-SHA spread (10.99 idle vs 13.5 at loadavg15=2.6) was
    # entirely ambient — require BOTH windows quiet for the canonical
    # artifact
    if loadavg_start[0] < 1.5 and loadavg_start[2] < 2.0 and sf == 0.1:
        local = Path(_REPO) / f"BENCHLOCAL_r{ROUND:02d}.json"
    else:
        local = Path(_REPO) / (
            f"BENCHLOCAL_r{ROUND:02d}.sf{sf}-load{loadavg_start[0]:.1f}"
            f"-{int(time.time())}.json"
        )
    local.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()

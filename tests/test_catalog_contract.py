"""Catalog ↔ driver contract guards.

The external verifier hash-checks the first DRIVER_WINDOW catalog
entries per round, and its canonicalizer (pandas sort_values across
all columns) dies on array/map cells. Two classes of regression have
actually burned rounds:

1. a silent catalog reorder rotating a never-verified query out of
   the window (r2 → r3 was an intentional reorder; the r2+r3 union of
   green rows is the proof of 58/60, so the order is now frozen);
2. a query emitting array-typed columns (dedup_groups and
   multimodal_features crashed the r3 canonicalizer with
   "unhashable type: 'numpy.ndarray'").

These tests make both breakages loud at pytest time.
"""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from chess_pipeline_spark.plans import (
    DEMOTION_COVERAGE,
    DRIVER_WINDOW,
    _DEMOTED,
    catalog,
)

# The byte-stable order for the round-5 driver run: the deliberate
# r4→r5 rotation promotes the eleven never-driver-verified round-4
# queries into the window and demotes eleven doubly-proven (r4 AND
# r2-or-r3 green) queries whose operators stay covered in-window (the
# subsumption table is DEMOTION_COVERAGE in plans/__init__.py,
# machine-validated below). Any edit here is a deliberate contract
# change and must re-justify the window contents.
FROZEN_ORDER: tuple[str, ...] = (
    "win_ratio_by_status",
    "pricing_summary",
    "top_customer_revenue",
    "order_priority_clean",
    "parts_never_ordered",
    "customers_with_orders",
    "orders_fulfillment",
    "order_lines_enriched",
    "clock_lead_fill",
    "zip_explode_lockstep",
    "material_map_expand",
    "union_by_name",
    "scalar_feature_sampler",
    "array_predicate_filter",
    "rollup_priority_status",
    "price_percentiles",
    "events_tumbling_1h",
    "events_sessionized",
    "events_dedup_latest",
    "json_props_extract",
    "events_asof_last_purchase",
    "event_funnel",
    "events_interval_join",
    "events_rolling_zscore",
    "events_ohlc_hourly",
    "events_time_weighted_avg",
    "win_prob_lr",
    "lang_id_heuristic",
    "ngram_jaccard_near_dup",
    "dedup_incremental_simhash",
    "semdedup_embedding",
    "knn_cosine_ivf",
    "knn_cosine_lsh",
    "embedding_quantize_int8",
    "embedding_random_projection",
    "multimodal_features",
    "frame_sample_features",
    "dedup_normalized",
    "dedup_groups",
    "dedup_keep_best",
    "stratified_sample",
    "mixture_sample",
    "pack_sequences",
    "tfidf_top_terms",
    "decontaminate_ngram_overlap",
    "bm25_top_terms",
    "repetition_stats",
    "quality_filter_verdicts",
    "paragraph_dedup",
    "pii_redact_stats",
    # --- past the driver window (demoted; every demoted query except
    # the brand-new r5 ones has two rounds of green driver history
    # plus a local oracle row) ---
    "distinct_flag_status",
    "global_minmax",
    "weekday_recode",
    "binned_mean",
    "value_stats_by_weekday",
    "sql_view_game_evals",
    "explode_quantities",
    "near_dup_pairs_jaccard_prefix",
    "events_sliding_1h_30m",
    "minhash_signatures",
    "orders_per_priority",
    "clock_seconds_parse",
    "initial_clock_per_group",
    "lineitem_filter_isin",
    "empty_relation_guard",
    "struct_pack_fields",
    "token_count",
    "dedup_exact",
    "text_quality_stats",
    "doc_fingerprint",
    "near_dup_pairs_jaccard",
    "minhash_lsh_candidates",
    "simhash_near_dup",
    "knn_cosine_topk",
    "embedding_stats",
    "top_terms_per_source",
    "running_revenue",
    "revenue_by_nation",
    "embedding_near_dup_cosine",
    "eval_comment_parse",
    "top3_orders_per_customer",
    "events_gap_detection",
    "orders_retention_cohort",
    "oov_rate_top1k",
    "cross_source_leakage",
    "boilerplate_chunk_removal",
    "corpus_composition",
    "events_decay_score",
    "orders_rfm_segments",
    "orders_snapshot_diff",
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
)


def test_catalog_order_frozen():
    assert tuple(catalog()) == FROZEN_ORDER


def test_driver_window_r5_rotation():
    # round 5's window: the eleven never-driver-verified round-4
    # additions are IN, as are the three operators built new in r5;
    # everything rotated out is r4 AND r2-or-r3 green (verified
    # against the CORRECTNESS files at rotation time)
    assert len(FROZEN_ORDER) - DRIVER_WINDOW == 66
    in_window = set(FROZEN_ORDER[:DRIVER_WINDOW])
    for newcomer in (
        "decontaminate_ngram_overlap",
        "events_interval_join",
        "repetition_stats",
        "quality_filter_verdicts",
        "bm25_top_terms",
        "events_rolling_zscore",
        "mixture_sample",
        "dedup_incremental_simhash",
        "events_ohlc_hourly",
        "events_time_weighted_avg",
        "embedding_random_projection",
        "semdedup_embedding",
        "paragraph_dedup",
        "pii_redact_stats",
    ):
        assert newcomer in in_window


def test_demotion_coverage_citations_valid():
    # the r4 verdict found a dangling claim (`global_minmax ⊂
    # newsletter_summary`, a query that never existed). The ledger is
    # now structured data; this pins: every demoted query has a
    # coverage entry, every cited coverer is a real catalog query, and
    # every coverer actually sits INSIDE the driver window (a claim
    # pointing at another demoted query proves nothing).
    cat = catalog()
    in_window = set(list(cat)[:DRIVER_WINDOW])
    assert set(DEMOTION_COVERAGE) == set(_DEMOTED)
    for demoted, coverers in DEMOTION_COVERAGE.items():
        assert coverers, f"{demoted}: empty coverage claim"
        for c in coverers:
            assert c in cat, f"{demoted}: cites nonexistent query {c!r}"
            assert c in in_window, f"{demoted}: coverer {c!r} is itself demoted"


# The driver's canonicalizer sorts a pandas frame across all columns:
# array/map cells become ndarrays/dicts and raise
# "unhashable type" — so no catalog query may emit them top-level.
# (Structs survive: Spark → pandas yields Row tuples, which sort.)
_FORBIDDEN = (T.ArrayType, T.MapType)


@pytest.mark.parametrize("name", list(FROZEN_ORDER))
def test_output_schema_is_canonicalizable(spark, sf_dir, name):
    spec = catalog()[name]
    df = spec.spark(spark, sf_dir)
    bad = [
        f.name for f in df.schema.fields if isinstance(f.dataType, _FORBIDDEN)
    ]
    assert not bad, (
        f"{name} emits non-canonicalizable column(s) {bad}; serialize to "
        f"scalars at the catalog boundary (concat_ws / to_json)"
    )


@pytest.mark.parametrize("name", list(FROZEN_ORDER))
def test_driver_canonicalization_does_not_crash(spark, sf_dir, name):
    # the r3 failure class, reproduced byte-for-byte: the driver does
    # a pandas sort_values across ALL columns of the collected frame.
    # The type check above catches declared array/map columns; this
    # runs the actual driver code path, so anything else pandas can't
    # factorize (ndarray cells from structs-of-arrays, unhashable
    # objects) fails HERE instead of burning a driver round.
    pdf = catalog()[name].spark(spark, sf_dir).toPandas()
    pdf = pdf[sorted(pdf.columns)]
    pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)

#!/usr/bin/env python3
"""Regenerate PLANS.md: flagship physical-plan evidence.

Each section shows the formatted plan tree plus the scan-node detail
lines (PushedFilters / ReadSchema / PartitionFilters) that witness
the claimed property. Run from the repo root:

    python scripts/gen_plans_md.py
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SECTIONS = {
    "pricing_summary": (
        "Column pruning: ReadSchema carries 5 of lineitem's 16 columns — "
        "the projection reached the parquet scan, free from a declarative "
        "plan."
    ),
    "sql_view_game_evals": (
        "Predicate pushdown: the view's p_size > 25 filter lands in the "
        "part scan's PushedFilters — the scan skips row groups whose "
        "stats exclude the range."
    ),
    "bloom_join_prune": (
        "No probe-side shuffle: every join on the orders stream is a "
        "BroadcastHashJoin against the <=128-row bitmap or key set; the "
        "only keyed exchange is the final <=5-key rollup. (The Exchange "
        "directly above the orders scan is sources.spread()'s local-mode "
        "round-robin — single-file toy inputs scan as 1 split; it "
        "disappears on real multi-file data, see SCALING.md 'Known "
        "local-mode artifacts'.)"
    ),
    "pca_top_component": (
        "The visible tail rides a pre-executed localCheckpoint (the Gram "
        "pass ran once); the corpus-scale stage — partial_sum over d^2 "
        "integer cells before its exchange — is gated in "
        "tests/test_plan_quality.py::test_pca_gram_map_side_combined_single_pass."
    ),
    "media_phash_near_dup": (
        "Dedup over binary media: one Arrow decode pass is pinned by "
        "localCheckpoint; no exchange carries payload or text — only "
        "doc_id plus 8 band integers move between stages."
    ),
    "concurrency_peak_daily": (
        "The parallel-scan decomposition: the single SinglePartition "
        "window runs over the aggregated hour-bucket frame; the delta "
        "stream's running sums are windows partitioned by bucket."
    ),
    "bm25_index_probe": (
        "Serving off the persisted index: the postings scan's "
        "PartitionFilters prune on the term-hash bucket — "
        "directory-level skipping, 2 of 16 buckets read for the fixed "
        "query."
    ),
    "scd2_point_in_time_join": (
        "Point-in-time lookup as a keyed EQUI-join: the validity "
        "interval (valid_from <= ts < valid_to) rides the custkey hash "
        "join as its non-equi condition — no BroadcastNestedLoopJoin, no "
        "range-join explosion; the SCD2 invariant bounds fan-out by the "
        "versions-per-key constant."
    ),
    "negative_sample_pairs": (
        "The corpus side never shuffles for the pair join: one "
        "bucket-keyed exchange builds the representative frame, which "
        "collapses to B rows and BROADCASTS onto the anchors; ReadSchema "
        "shows the documents scan reads doc_id only — text never moves."
    ),
    "token_balanced_shards": (
        "Global length rank without a global window: per-bin keyed "
        "windows (hashpartitioning on bin_idx) plus bin offsets from the "
        "bounded bin-count frame, broadcast back — the SinglePartition "
        "exchange carries aggregated bin counts, never document rows."
    ),
    "dup_ngram_fraction": (
        "Linear duplication-exposure signal: the gram df count and the "
        "postings join-back are both HashAggregate-partial before their "
        "gram-keyed exchanges; no pair join exists anywhere in the plan "
        "(nothing squares in df), and ReadSchema shows the documents "
        "scan reads doc_id/text/source only."
    ),
    "embedding_diversity": (
        "n^2 pairwise semantics with zero pairwise plan: no join, no "
        "window — two keyed HashAggregates (label,dim then label) with "
        "map-side partials over integer micro-units; the mean-pairwise-"
        "dot collapses into the centroid-energy closed form."
    ),
}

DETAIL_KEYS = ("PushedFilters", "ReadSchema", "PartitionFilters", "Location")


def main() -> None:
    from pyspark.sql import SparkSession

    from chess_pipeline_spark.plans import catalog

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cat = catalog()
    sf = "/root/testdata/sf0.001"

    out = [
        f"""# PLANS — flagship physical-plan evidence

`explain("formatted")` extracts (sf0.001, vanilla session) for {len(SECTIONS)}
queries chosen to witness one scale property each, with the
scan-node detail lines (PushedFilters / ReadSchema /
PartitionFilters) that carry the evidence. The same properties are
enforced as pytest plan gates (tests/test_plan_quality.py) so they
cannot silently regress; this file exists so a reviewer can SEE
them without running anything. Regenerate with
scripts/gen_plans_md.py.
"""
    ]
    for name, blurb in SECTIONS.items():
        df = cat[name].spark(spark, sf)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        lines = plan.splitlines()
        tree_end = next(
            (i for i, line in enumerate(lines) if not line.strip() and i > 3),
            len(lines),
        )
        tree = "\n".join(lines[: min(tree_end, 34)])
        details = [
            line.strip()
            for line in lines[tree_end:]
            if any(k in line for k in DETAIL_KEYS) and "file:" not in line
        ]
        seen: list[str] = []
        for d in details:
            if d not in seen:
                seen.append(d)
        detail_txt = "\n".join(seen[:10])
        out.append(
            f"## {name}\n\n{blurb}\n\n```\n{tree}\n```\n\n"
            f"Scan details:\n\n```\n{detail_txt}\n```\n"
        )
    Path(_REPO, "PLANS.md").write_text("\n".join(out))
    print("PLANS.md written")


if __name__ == "__main__":
    main()

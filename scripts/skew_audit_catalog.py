#!/usr/bin/env python3
"""Catalog-wide AQE skew-rescue audit (r10).

`introspect.skew_rescue_audit` (the generalized r9 dupgram finding)
classifies every SortMergeJoin in a plan by whether AQE's
OptimizeSkewedJoin could split it at runtime: the rule
pattern-matches ONLY SMJ -> Sort -> shuffle(ENSURE_REQUIREMENTS) on
BOTH children, so an aggregate/window between a child's Sort and its
shuffle silently excludes the join from runtime skew rescue. A query
that "leaves skew to AQE" on such a shape is unprotected at 100 TB.

This script runs that audit over EVERY catalog query's physical plan
at the bench scale factor and reports, per query:
  - n_smj: SortMergeJoin sites in the plan
  - n_unsplittable: SMJs AQE cannot split (with per-child reasons)

Exit codes: 0 when every unsplittable SMJ belongs to a query in the
STRUCTURALLY_DESKEWED allowlist below (each entry cites the mechanism
that makes the join skew-free without AQE); 1 when a query outside
the allowlist carries an unsplittable SMJ — a new operator silently
assuming AQE rescue, exactly the class the r9 measurement showed does
not exist for these shapes.

Writes SKEWAUDIT_r{N}.json at the repo root and prints one JSON line.
Plan-only (df.explain text): no query executes beyond what its
builder materializes while constructing the plan (index builds,
checkpoints), so the whole catalog audits in minutes.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from chess_pipeline_spark.introspect import skew_rescue_audit  # noqa: E402
from chess_pipeline_spark.plans import catalog  # noqa: E402
from chess_pipeline_spark.session import get_spark  # noqa: E402

# Queries whose unsplittable SortMergeJoins are skew-free by
# STRUCTURE, not by AQE — each entry cites the mechanism (the audit
# refuses any unsplittable SMJ not justified here).
STRUCTURALLY_DESKEWED: dict[str, str] = {
    # hot grams (df >= threshold) broadcast in the scan stage; only
    # the bounded-df cold remainder reaches the SMJ (plans/corpus.py::
    # dup_exposure_skew_safe; measured in scripts/dupgram_skew.py)
    "dup_ngram_fraction": "hot/cold structural split, cold side df-bounded",
    # both sides pre-aggregated to key cardinality (exactly one row
    # per key per side) before the full-outer join — a 1x1-match join
    # cannot be row-skewed (plans/profiling.py docstring)
    "referential_integrity_audit": "both sides aggregated to 1 row/key",
    # the SMJ joins register-algebra frames: m=256 registers per set
    # pair, KB-scale by construction at ANY corpus size
    "hll_set_algebra": "register frames bounded at m=256 rows/set",
    # the fused frames are the two retrievers' top-20 outputs — k-row
    # inputs, bounded regardless of corpus size
    "hybrid_search_rrf": "joins two top-k (20-row) retriever frames",
    # audit frames bounded at _RECALL_NQ=8 query keys; candidate
    # sides capped by nprobe list sizes and the exact_sample_bp
    # shrink lever (plans/llm.py recall-audit docstring)
    "ivf_adc_recall": "bounded at 8 query keys + capped candidates",
    # pair space bounded by the largest cluster (label = IVF centroid
    # at scale, capped at the assigner); the unsplittable verdict at
    # test scale is additionally an artifact of spread()'s
    # REPARTITION origin on one child — at scale both self-join
    # children are Sort-over-ENSURE_REQUIREMENTS (AQE-splittable)
    "semdedup_embedding": "cluster-blocked pair space; spread() artifact",
    # production posture broadcasts the (tiny) ingest batch against
    # the persisted corpus band index, removing the shuffle join
    # entirely; the SMJ only appears at test scale where batch and
    # corpus both derive from one local table (docstring, streaming
    # twin stream_ingest_dedup broadcasts by construction)
    "dedup_incremental_simhash": "batch side broadcasts in production",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    round_no = int(os.environ.get("SKEWAUDIT_ROUND", "10"))
    spark = get_spark(app_name="skew-audit-catalog")
    t0 = time.time()
    cat = catalog()
    per_query: dict[str, dict] = {}
    errors: dict[str, str] = {}
    violations: list[str] = []
    for name, spec in cat.items():
        try:
            df = spec.spark(spark, sf_dir)
            audit = skew_rescue_audit(df)
        except Exception:
            errors[name] = traceback.format_exc(limit=2)
            continue
        bad = [a for a in audit if not a["aqe_splittable"]]
        per_query[name] = {
            "n_smj": len(audit),
            "n_unsplittable": len(bad),
            "unsplittable": [
                {"op_id": a["op_id"], "children": a["children"]} for a in bad
            ],
        }
        if bad and name not in STRUCTURALLY_DESKEWED:
            violations.append(name)
    out = {
        "sf_dir": sf_dir,
        "elapsed_sec": round(time.time() - t0, 1),
        "n_queries": len(cat),
        "n_audited": len(per_query),
        "n_with_smj": sum(1 for v in per_query.values() if v["n_smj"]),
        "total_smj": sum(v["n_smj"] for v in per_query.values()),
        "total_unsplittable": sum(
            v["n_unsplittable"] for v in per_query.values()
        ),
        "allowlisted": {
            k: v
            for k, v in STRUCTURALLY_DESKEWED.items()
            if per_query.get(k, {}).get("n_unsplittable")
        },
        "violations": violations,
        "errors": errors,
        "queries": {
            k: v for k, v in sorted(per_query.items()) if v["n_smj"]
        },
    }
    path = Path(_REPO) / f"SKEWAUDIT_r{round_no:02d}.json"
    path.write_text(json.dumps(out, indent=1, sort_keys=True))
    print(
        json.dumps(
            {
                "queries_with_smj": out["n_with_smj"],
                "total_smj": out["total_smj"],
                "unsplittable": out["total_unsplittable"],
                "violations": violations,
                "errors": sorted(errors),
                "artifact": str(path),
            }
        )
    )
    if violations or errors:
        sys.exit(1)


if __name__ == "__main__":
    main()

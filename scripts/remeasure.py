#!/usr/bin/env python3
"""Min-of-N idle interleaved re-measure — the adjudication procedure
SCALING.md's ambient band prescribes when bench_delta's query gate
fires (r8 temperature_mixture_sample precedent, r10 three-mover
attribution, mechanized here instead of re-written ad hoc each time).

Runs the named catalog queries ROUND-INTERLEAVED (round 1 runs every
query once, then round 2, ...) so no query owns a warm or loaded
stretch of the run, reports each query's minimum across rounds, and
compares against the rows of a committed BENCHLOCAL artifact.

  python scripts/remeasure.py mixture_sample hll_set_algebra \
      --baseline 9 --rounds 5

Prints one JSON line: {query: {min_sec, baseline_sec, ratio}} plus
start/end loadavg (a re-measure that did not start idle adjudicates
nothing — rerun it).
"""

from __future__ import annotations

import argparse
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "queries",
        nargs="*",
        help="catalog query names, and/or 'index_phases' to remeasure "
        "the 8 bench index phases (r14: the VERDICT item-2 gap — the "
        "r13 ivf_build phase regression slipped through because the "
        "A/B instruments covered queries only)",
    )
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument(
        "--baseline",
        type=int,
        default=None,
        help="BENCHLOCAL round number to ratio against",
    )
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    do_phases = "index_phases" in args.queries
    args.queries = [q for q in args.queries if q != "index_phases"]
    if not args.queries and not do_phases:
        sys.exit("nothing to remeasure")

    base_rows: dict[str, float] = {}
    base_phases: dict[str, float] = {}
    if args.baseline is not None:
        art = json.loads(
            (Path(_REPO) / f"BENCHLOCAL_r{args.baseline:02d}.json").read_text()
        )
        base_rows = dict(art.get("queries", {})) | dict(
            art.get("extended_queries", {})
        )
        base_phases = dict(art.get("index_phases", {}))

    cat = catalog()
    missing = [q for q in args.queries if q not in cat]
    if missing:
        sys.exit(f"not in catalog: {missing}")

    spark = get_spark(app_name="remeasure")
    load0 = os.getloadavg()
    # one untimed warm-up pass (JVM/codegen/page cache)
    for q in args.queries:
        cat[q].spark(spark, args.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    best: dict[str, float] = {q: float("inf") for q in args.queries}
    for _ in range(args.rounds):
        for q in args.queries:
            # release each run's checkpoint pins outside the timer
            with scoped_checkpoints(spark):
                t0 = time.perf_counter()
                cat[q].spark(spark, args.sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                elapsed = time.perf_counter() - t0
            best[q] = min(best[q], elapsed)

    out = {
        q: {
            "min_sec": round(t, 3),
            "baseline_sec": base_rows.get(q),
            "ratio": round(t / base_rows[q], 2) if base_rows.get(q) else None,
        }
        for q, t in best.items()
    }

    phase_out: dict[str, dict] = {}
    if do_phases:
        # each "round" is one full lifecycle (build→ingest→compact→
        # probe have hard data dependencies, so interleaving happens
        # at lifecycle granularity); per-phase min across rounds, same
        # min-of-N discipline as the query rows
        import bench

        best_ph: dict[str, float] = {}
        for _ in range(args.rounds):
            with scoped_checkpoints(spark):
                ph = bench.time_index_phases(spark, args.sf_dir)
            for k, v in ph.items():
                best_ph[k] = min(best_ph.get(k, float("inf")), v)
        phase_out = {
            k: {
                "min_sec": round(v, 3),
                "baseline_sec": base_phases.get(k),
                "ratio": round(v / base_phases[k], 2) if base_phases.get(k) else None,
            }
            for k, v in best_ph.items()
        }

    print(
        json.dumps(
            {
                "rounds": args.rounds,
                "loadavg_start": list(load0),
                "loadavg_end": list(os.getloadavg()),
                "queries": out,
                **({"index_phases": phase_out} if phase_out else {}),
            }
        )
    )


if __name__ == "__main__":
    main()

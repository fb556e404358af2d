#!/usr/bin/env python3
"""Rotation planner/validator for the driver-window checklist.

The external verifier hash-checks only the first DRIVER_WINDOW
catalog entries per round, so each round rotates never-yet-verified
queries in and doubly-proven ones out (plans/__init__.py documents
the discipline). This tool makes the bookkeeping mechanical:

  python scripts/check_rotation.py            # report
  python scripts/check_rotation.py --plan     # propose the next swap

Report: per catalog query, its driver green history across every
CORRECTNESS_r*.json; the staged set (demoted, never driver-green);
window members eligible for demotion (>=2 green rounds, not a family
anchor); and whether the staged set fits the eligible slots.
"""

from __future__ import annotations

import argparse
import json
import sys
from glob import glob
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# family anchors the checklist keeps in-window regardless of history
# (r9 adds cube_status_priority: the only grouping-sets CUBE/ROLLUP
# driver anchor after the r9 freshness demotions)
ANCHORS = ("mixture_sample", "multimodal_features", "cube_status_priority")


def green_history() -> dict[str, list[int]]:
    """query name -> rounds where it was triple-green."""
    out: dict[str, list[int]] = {}
    # historical rounds (<= r10) live under artifacts/ (r12 verdict
    # stretch task: root-listing readability); the history is the
    # union of both locations
    for path in sorted(
        glob(f"{_REPO}/CORRECTNESS_r*.json")
        + glob(f"{_REPO}/artifacts/CORRECTNESS_r*.json")
    ):
        rnd = int(Path(path).stem.split("_r")[1])
        data = json.loads(Path(path).read_text())
        for name, row in data.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                out.setdefault(name, []).append(rnd)
    return out


def write_freshness_report(round_no: int) -> str:
    """Emit ROTATION_r{N}.json: per-query green-round history and the
    last-green histogram — the table the r10 judge recomputed by hand
    from ten CORRECTNESS files, as one committed artifact per round
    (r10 verdict task 8). Window membership is included so the reader
    can verify the freshness bound (in-window names are being
    re-verified in the CURRENT round by construction; the bound
    applies to the demoted set)."""
    from collections import Counter

    from chess_pipeline_spark.plans import DRIVER_WINDOW, _DEMOTED, catalog

    cat = list(catalog())
    window = set(cat[:DRIVER_WINDOW])
    hist = green_history()
    rows = {
        n: {
            "green_rounds": sorted(hist.get(n, [])),
            "last_green": max(hist.get(n, [0])) or None,
            "in_window": n in window,
        }
        for n in cat
    }
    # Freshness bound over the demoted-WITH-history set only: a staged
    # never-green name is surfaced under never_driver_green, not folded
    # in as 0 (r11 ADVICE: the 0 made oldest_demoted_last_green
    # meaningless in ROTATION_r11.json the one round a staged query
    # existed).
    demoted_last = [
        rows[n]["last_green"] for n in _DEMOTED if rows[n]["last_green"]
    ]
    out = {
        "round": round_no,
        "window": DRIVER_WINDOW,
        "catalog": len(cat),
        "demoted_last_green_histogram": dict(
            sorted(Counter(demoted_last).items())
        ),
        "oldest_demoted_last_green": min(demoted_last) if demoted_last else None,
        "never_driver_green": sorted(n for n in cat if not hist.get(n)),
        "queries": rows,
    }
    path = Path(_REPO) / f"ROTATION_r{round_no:02d}.json"
    path.write_text(json.dumps(out, indent=1, sort_keys=False) + "\n")
    return str(path)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plan", action="store_true", help="propose the next rotation")
    ap.add_argument(
        "--report",
        type=int,
        metavar="ROUND",
        help="write ROTATION_r{N}.json (per-query green history + "
        "last-green histogram) and exit",
    )
    args = ap.parse_args(argv)

    if args.report is not None:
        print(write_freshness_report(args.report))
        return 0

    from chess_pipeline_spark.plans import DRIVER_WINDOW, _DEMOTED, catalog

    cat = list(catalog())
    window = cat[:DRIVER_WINDOW]
    hist = green_history()

    staged = [n for n in _DEMOTED if n not in hist]
    eligible = [n for n in window if len(hist.get(n, [])) >= 2 and n not in ANCHORS]
    single_green = [
        n for n in window if len(hist.get(n, [])) == 1 and n not in ANCHORS
    ]

    print(f"window: {len(window)}  catalog: {len(cat)}  demoted: {len(_DEMOTED)}")
    print(f"staged (demoted, never driver-green): {len(staged)}")
    for n in staged:
        print(f"  stage   {n}")
    print(f"eligible demotions (>=2 green rounds, non-anchor): {len(eligible)}")
    print(f"single-green window members (demote only with family coverage): "
          f"{len(single_green)}")
    deficit = len(staged) - len(eligible)
    if deficit > 0:
        print(
            f"DEFICIT {deficit}: promoting all staged names also requires "
            f"demoting {deficit} single-green member(s) whose families are "
            "redundantly covered in-window (cite them in DEMOTION_COVERAGE)."
        )
    if args.plan:
        print("\n-- proposed swap --")
        if staged:
            for n in staged:
                print(f"promote {n}")
            for n in eligible[: len(staged)]:
                print(f"demote  {n}  (green rounds: {hist.get(n)})")
            for n in single_green[: max(0, deficit)]:
                print(f"demote  {n}  (SINGLE-green: needs redundancy citation)")
        else:
            # FRESHNESS mode (post-r8: every query has driver history):
            # swap the longest-unverified demoted names in against the
            # window members whose evidence is freshest — maximizes the
            # recency of driver contact across the whole catalog. Pair
            # count = however many eligible (>=2 green) members exist.
            demoted = [n for n in cat if n in set(_DEMOTED)]
            stalest = sorted(demoted, key=lambda n: max(hist.get(n, [0])))
            freshest = sorted(
                eligible, key=lambda n: (max(hist[n]), len(hist[n])), reverse=True
            )
            k = min(len(freshest), len(stalest))
            print(f"(freshness mode: no staged backlog; {k} swaps)")
            for n in stalest[:k]:
                print(f"promote {n}  (last green: r{max(hist.get(n, [0]))})")
            for n in freshest[:k]:
                print(f"demote  {n}  (green rounds: {hist.get(n)})")
    # invariants the checklist relies on
    missing_history = [
        n for n in window if n not in hist and n not in staged
    ]
    if missing_history:
        print(
            "\nwindow members with no driver greens YET (mid-round this is "
            "exactly the set promoted for the CURRENT round's pending "
            f"CORRECTNESS run): {missing_history}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

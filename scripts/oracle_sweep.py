#!/usr/bin/env python3
"""Full-catalog driver-style oracle sweep — the repeatable round-close
gate the r8 verdict asked for (its one-off sf0.1 sweep, 167/167, was
that round's strongest scale evidence; this scripts it).

Runs EVERY catalog query against its DuckDB oracle at the driver's own
scale factor (sf0.01 by default — 10x the pytest fixtures) with the
stricter-than-driver comparison from tests/oracle_harness.py (same
column names, same row count, same canonicalized row multiset), and
writes a committed JSON artifact:

  python scripts/oracle_sweep.py                    # sf0.01 -> ORACLESWEEP_r{N}.json
  python scripts/oracle_sweep.py --sf-dir /root/testdata/sf0.1
  python scripts/oracle_sweep.py --round 9          # pin the artifact name
  python scripts/oracle_sweep.py --only name1,name2 # subset (no artifact)

Artifact shape: {"sf_dir": ..., "git": ..., "n_queries": N,
"n_match": M, "results": {name: {"match": bool, "rows": n,
"error": str|None}}, "no_oracle": [names...]}. Queries without an
oracle (non-SQL-expressible) are listed, not counted as failures.

tests/test_catalog_contract.py pins that the committed artifact for
the current round covers every oracle-carrying catalog query, so a
staged query cannot reach promotion without sweep evidence at the
driver's scale factor.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from glob import glob
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
sys.path.insert(0, str(Path(_REPO) / "tests"))


def infer_round() -> int:
    """Next round number = max committed CORRECTNESS round + 1 (the
    sweep for round N lands before the driver's CORRECTNESS_rN)."""
    rounds = [
        int(Path(p).stem.split("_r")[1])
        for p in glob(f"{_REPO}/CORRECTNESS_r*.json")
    ]
    return (max(rounds) + 1) if rounds else 1


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--round", type=int, default=None)
    ap.add_argument("--only", default=None, help="comma-separated subset")
    ap.add_argument(
        "--no-artifact", action="store_true", help="print only, write nothing"
    )
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from chess_pipeline_spark.checkpoints import scoped_checkpoints
    from chess_pipeline_spark.plans import catalog
    from oracle_harness import compare, duckdb_connection

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    cat = catalog()
    names = list(cat)
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]

    results: dict[str, dict] = {}
    no_oracle: list[str] = []
    t0 = time.time()
    for i, name in enumerate(names, 1):
        spec = cat[name]
        if not spec.oracle:
            no_oracle.append(name)
            continue
        try:
            with scoped_checkpoints(spark):
                sdf = spec.spark(spark, args.sf_dir).toPandas()
            con = duckdb_connection(args.sf_dir)
            try:
                odf = con.sql(spec.oracle).df()
            finally:
                con.close()
            compare(name, sdf, odf)
            results[name] = {"match": True, "rows": len(sdf), "error": None}
        except Exception as e:  # noqa: BLE001 — recorded, not swallowed
            results[name] = {
                "match": False,
                "rows": None,
                "error": f"{type(e).__name__}: {e}"[:400],
            }
        tag = "ok " if results[name]["match"] else "FAIL"
        print(f"[{i}/{len(names)}] {tag} {name}", flush=True)

    git = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True,
        text=True,
        cwd=_REPO,
    ).stdout.strip()
    n_match = sum(1 for r in results.values() if r["match"])
    out = {
        "sf_dir": args.sf_dir,
        "git": git,
        "elapsed_sec": round(time.time() - t0, 1),
        "n_queries": len(results),
        "n_match": n_match,
        "results": results,
        "no_oracle": no_oracle,
    }
    print(
        f"\nsweep: {n_match}/{len(results)} oracle matches at {args.sf_dir} "
        f"({out['elapsed_sec']}s); {len(no_oracle)} queries carry no oracle"
    )
    if not args.no_artifact and not args.only:
        rnd = args.round if args.round is not None else infer_round()
        # non-default scale factors get their own artifact name so the
        # per-round sf0.01 gate file is never clobbered
        import re

        m = re.search(r"sf([0-9.]+)", args.sf_dir)
        suffix = "" if (m and m.group(1) == "0.01") else f".sf{m.group(1) if m else 'x'}"
        path = Path(_REPO) / f"ORACLESWEEP_r{rnd:02d}{suffix}.json"
        path.write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
        print(f"wrote {path}")
    return 0 if n_match == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())

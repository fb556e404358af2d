#!/usr/bin/env python3
"""Soak the r14 move-based index compactions (IVF minor fold + BM25
marker-first fold) under continuous ingest with injected crash
states — the dedicated soak the r14 first-session residue note said
the move design needed before shipping.

IVF half: build on the lowest-id half of the embeddings (so the
coarse seeds and PQ codebook equal a one-shot full build's — the
test_ann_index trick), then stream the rest in N batches. Every
COMPACT_EVERY batches run the MINOR fold; before two of those folds,
inject the mid-fold crash end-state (in-flight marker written, a
strict subset of delta files renamed into the base — exactly what a
kill -9 between renames leaves) and assert (a) _read_lists sees every
row exactly once through the window, (b) an ingest replay of the
mid-fold batch id raises, (c) the next compaction heals. After the
last batch run one MAJOR (rewrite=True) compaction. Throughout,
probe_ivf_adc / probe_ivf_index rows must equal the one-shot index's.

BM25 half: same shape over documents with ingest_text_delta /
compact_text_index (crash injection: folded marker advanced + one
bucket moved), probe_bm25 equality against a one-shot build.

Prints one JSON line; committed as COMPACTSOAK_r{N}.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import pyspark.sql.functions as F  # noqa: E402

from chess_pipeline_spark.ann_index import (  # noqa: E402
    _read_lists,
    _write_json_atomic,
    build_ivf_index,
    compact_ivf_index,
    ingest_ivf_batch,
    probe_ivf_adc,
    probe_ivf_index,
)
from chess_pipeline_spark.session import get_spark  # noqa: E402
from chess_pipeline_spark.sources import load_table  # noqa: E402
from chess_pipeline_spark.text_index import (  # noqa: E402
    _move_data_files,
    build_text_index,
    compact_text_index,
    ingest_text_delta,
    probe_bm25,
)

N_BATCHES = int(os.environ.get("SOAK_BATCHES", "12"))
COMPACT_EVERY = 3
TERMS = ("merge", "hash", "dup")


def count_files(p: str) -> int:
    return sum(
        1
        for _root, _d, fs in os.walk(p)
        for f in fs
        if not f.startswith(("_", "."))
    )


def rows(df) -> list:
    return sorted(map(tuple, df.collect()))


def inject_ivf_midfold_crash(idx: str, batch_id: int) -> bool:
    """Reproduce the kill-between-renames end-state: in-flight marker
    written, files of the batch moved for HALF the list dirs."""
    lists_p = os.path.join(idx, "lists")
    delta_p = os.path.join(idx, "lists_delta")
    if not os.path.exists(delta_p):
        return False
    _write_json_atomic(
        os.path.join(lists_p, "_folding_batches.json"), [batch_id]
    )
    lids = sorted(
        e.name for e in os.scandir(delta_p) if e.name.startswith("list_id=")
    )
    moved = False
    for lid in lids[: max(1, len(lids) // 2)]:
        bdir = os.path.join(delta_p, lid, f"ingest_batch={batch_id}")
        if not os.path.isdir(bdir):
            continue
        dest = os.path.join(lists_p, lid)
        os.makedirs(dest, exist_ok=True)
        for f in os.scandir(bdir):
            if f.is_file() and not f.name.startswith(("_", ".")):
                os.rename(f.path, os.path.join(dest, f"b{batch_id}-{f.name}"))
                moved = True
    return moved


def main() -> None:
    out: dict = {"loadavg": list(os.getloadavg()), "n_batches": N_BATCHES}
    spark = get_spark(app_name="index-compaction-soak")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base_dir = "/tmp/compact_soak"
    shutil.rmtree(base_dir, ignore_errors=True)
    os.makedirs(base_dir)

    # ---------------- IVF ----------------
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    mid = e.agg(F.expr("percentile(vec_id, 0.5)")).first()[0]
    full_idx = os.path.join(base_dir, "ivf_full")
    build_ivf_index(e, full_idx, n_lists=8)
    inc_idx = os.path.join(base_dir, "ivf_inc")
    build_ivf_index(e.filter(F.col("vec_id") <= mid), inc_idx, n_lists=8)

    rest = e.filter(F.col("vec_id") > mid)
    hi = rest.agg(F.max("vec_id")).first()[0]
    lo = int(mid)
    step = max(1, (int(hi) - lo) // N_BATCHES + 1)
    queries = e.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    crash_injections = 0
    replay_refusals = 0
    compactions = 0
    exactly_once_checks = 0
    t0 = time.perf_counter()
    for b in range(N_BATCHES):
        sl = rest.filter(
            (F.col("vec_id") > lo + b * step)
            & (F.col("vec_id") <= lo + (b + 1) * step)
        )
        ingest_ivf_batch(sl, b, inc_idx)
        if (b + 1) % COMPACT_EVERY == 0:
            if compactions in (0, 2):  # inject before the 1st and 3rd fold
                want = rows(
                    _read_lists(spark, inc_idx).select("vec_id", "list_id")
                )
                if inject_ivf_midfold_crash(inc_idx, b):
                    crash_injections += 1
                    got = rows(
                        _read_lists(spark, inc_idx).select("vec_id", "list_id")
                    )
                    assert got == want, "exactly-once violated mid-fold"
                    exactly_once_checks += 1
                    try:
                        ingest_ivf_batch(sl, b, inc_idx)
                    except ValueError:
                        replay_refusals += 1
            compact_ivf_index(spark, inc_idx)
            compactions += 1
    out["ivf_files_after_minor"] = count_files(os.path.join(inc_idx, "lists"))
    # final major compaction: consolidates the minor folds' file count
    compact_ivf_index(spark, inc_idx, rewrite=True)
    out["ivf_ingest_compact_s"] = round(time.perf_counter() - t0, 3)
    out["ivf_crash_injections"] = crash_injections
    out["ivf_replay_refusals"] = replay_refusals
    out["ivf_exactly_once_checks"] = exactly_once_checks
    out["ivf_compactions"] = compactions
    out["ivf_files_final"] = count_files(os.path.join(inc_idx, "lists"))
    ok = True
    for probe, kw in (
        (probe_ivf_index, {"nprobe": 2}),
        (probe_ivf_adc, {"nprobe": 2}),
    ):
        got = rows(probe(spark, inc_idx, queries, k=5, **kw))
        want = rows(probe(spark, full_idx, queries, k=5, **kw))
        ok = ok and got == want
    out["ivf_probe_equal_one_shot"] = ok

    # ---------------- BM25 ----------------
    docs = load_table(spark, sf_dir, "documents")
    dmid = docs.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
    full_tix = os.path.join(base_dir, "bm25_full")
    build_text_index(docs, full_tix)
    inc_tix = os.path.join(base_dir, "bm25_inc")
    build_text_index(docs.filter(F.col("doc_id") <= dmid), inc_tix)
    drest = docs.filter(F.col("doc_id") > dmid)
    dhi = drest.agg(F.max("doc_id")).first()[0]
    dlo = int(dmid)
    dstep = max(1, (int(dhi) - dlo) // N_BATCHES + 1)
    t0 = time.perf_counter()
    bm_crash = bm_refused = bm_compactions = 0
    for b in range(N_BATCHES):
        sl = drest.filter(
            (F.col("doc_id") > dlo + b * dstep)
            & (F.col("doc_id") <= dlo + (b + 1) * dstep)
        )
        bid = b + 1  # 0 is the build batch
        ingest_text_delta(sl, inc_tix, bid)
        if (b + 1) % COMPACT_EVERY == 0:
            if bm_compactions == 0:
                # crash end-state: marker advanced, one bucket moved
                pp = os.path.join(inc_tix, "postings")
                marker = sorted(
                    set(
                        json.load(
                            open(os.path.join(pp, "_folded_batches.json"))
                        )
                    )
                    | {bid}
                )
                _write_json_atomic(
                    os.path.join(pp, "_folded_batches.json"), marker
                )
                bsrc = os.path.join(pp, f"batch_id={bid}")
                buckets = sorted(
                    x.name for x in os.scandir(bsrc) if x.is_dir()
                )
                if buckets:
                    _move_data_files(
                        os.path.join(bsrc, buckets[0]),
                        os.path.join(pp, "batch_id=0", buckets[0]),
                        f"b{bid}-",
                    )
                    bm_crash += 1
                try:
                    ingest_text_delta(sl, inc_tix, bid)
                except ValueError:
                    bm_refused += 1
            compact_text_index(spark, inc_tix)
            bm_compactions += 1
    out["bm25_ingest_compact_s"] = round(time.perf_counter() - t0, 3)
    out["bm25_files_after_minor"] = count_files(
        os.path.join(inc_tix, "postings")
    )
    compact_text_index(spark, inc_tix, rewrite=True)
    out["bm25_crash_injections"] = bm_crash
    out["bm25_replay_refusals"] = bm_refused
    out["bm25_compactions"] = bm_compactions
    out["bm25_files_final"] = count_files(os.path.join(inc_tix, "postings"))
    out["bm25_probe_equal_one_shot"] = rows(
        probe_bm25(spark, inc_tix, TERMS)
    ) == rows(probe_bm25(spark, full_tix, TERMS))

    out["loadavg_end"] = list(os.getloadavg())
    shutil.rmtree(base_dir, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    raise SystemExit(main())

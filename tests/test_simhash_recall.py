"""SimHash banding recall property: 4 bands x 7 bits guarantees any
pair at hamming <= 3 shares at least one identical band (pigeonhole:
3 differing bits can touch at most 3 of the 4 bands), so banded
candidate generation has recall EXACTLY 1.0 against the brute-force
all-pairs definition. The r4 verdict asked for this as a structural
guard: a band-width or band-count edit that silently breaks the
guarantee must fail here at pytest time, not burn a driver round.

Brute force runs driver-side over the sf0.001 corpus signatures —
that is the point (an independent O(n^2) reference), not the scale
path."""

from __future__ import annotations

import itertools
from collections import defaultdict

import pyspark.sql.functions as F

from chess_pipeline_spark.plans.llm import (
    _BASE_HASH,
    _INCR_SPLIT,
    _MIX,
    _SIMHASH_BAND_BITS,
    _SIMHASH_BANDS,
    _simhash_expr_spark,
    dedup_incremental_simhash,
    simhash_near_dup,
)
from chess_pipeline_spark.sources import load_table

_MASK64 = (1 << 64) - 1


def _hamming(a: int, b: int) -> int:
    return ((a ^ b) & _MASK64).bit_count()


def _signatures(spark, sf_dir):
    hm = _MIX.format(h=_BASE_HASH.format(s="w"))
    rows = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.expr(f"transform(split(text, ' '), w -> {hm})").alias("hw"),
        )
        .select("doc_id", "source", F.expr(_simhash_expr_spark()).alias("simhash"))
        .collect()
    )
    return [(r.doc_id, r.source, r.simhash) for r in rows if r.simhash is not None]


def test_band_geometry_pigeonhole():
    # the guarantee itself, as arithmetic: the bands tile the used
    # signature bits, and the hamming threshold is strictly below the
    # band count, so <=3 flipped bits always leave one band untouched
    assert _SIMHASH_BANDS * _SIMHASH_BAND_BITS == 28
    assert _SIMHASH_BANDS > 3


def test_simhash_banding_recall_exact(spark, sf_dir):
    sigs = _signatures(spark, sf_dir)
    by_source: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for d, s, h in sigs:
        by_source[s].append((d, h))
    expected: dict[tuple[int, int], int] = {}
    for xs in by_source.values():
        xs.sort()
        for (da, ha), (db, hb) in itertools.combinations(xs, 2):
            hd = _hamming(ha, hb)
            if hd <= 3:
                expected[(da, db)] = hd
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_near_dup(spark, sf_dir).collect()
    }
    # exact equality, both directions: recall 1.0 (nothing brute force
    # finds is missed by banding) AND precision 1.0 (banding's
    # post-filter emits nothing extra)
    assert got == expected
    assert expected, "fixture has no near-dup pairs; recall untestable"


def test_incremental_simhash_recall_exact(spark, sf_dir):
    sigs = _signatures(spark, sf_dir)
    cache = [(d, s, h) for d, s, h in sigs if d < _INCR_SPLIT]
    batch = [(d, s, h) for d, s, h in sigs if d >= _INCR_SPLIT]
    best: dict[int, tuple[int, int]] = {}
    for db, sb, hb in batch:
        cands = sorted(
            (_hamming(hb, hc), dc) for dc, sc, hc in cache if sc == sb
        )
        cands = [(hd, dc) for hd, dc in cands if hd <= 3]
        if cands:
            best[db] = cands[0]  # min (hamming, then cache id)
    out = dedup_incremental_simhash(spark, sf_dir).collect()
    got = {r.doc_id: (r.hamming, r.dup_of) for r in out if r.is_dup}
    assert got == best
    assert best, "fixture has no batch-vs-corpus dup; recall untestable"
    # non-dup batch rows still present, flagged false with NULL fields
    not_dup = [r for r in out if not r.is_dup]
    assert all(r.dup_of is None and r.hamming is None for r in not_dup)


def test_cross_source_leakage_recall_exact(spark, sf_dir):
    # the leakage flavor bands WITHOUT the source key; pigeonhole
    # recall must still be exact against cross-source all-pairs
    from chess_pipeline_spark.plans.llm import cross_source_leakage

    sigs = _signatures(spark, sf_dir)
    expected = {}
    xs = sorted(sigs)
    for i, (da, sa, ha) in enumerate(xs):
        for db, sb, hb in xs[i + 1 :]:
            if sa == sb:
                continue
            hd = _hamming(ha, hb)
            if hd <= 3:
                expected[(da, db)] = hd
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in cross_source_leakage(spark, sf_dir).collect()
    }
    assert got == expected
    assert expected, "no cross-source near-dups in fixture"

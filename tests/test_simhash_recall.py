"""SimHash banding recall property: 4 bands x 14 bits guarantees any
pair at hamming <= _SIMHASH_MAX_HAMMING (3) shares at least one
identical band (pigeonhole: 3 differing bits can touch at most 3 of
the 4 bands), so banded candidate generation has recall EXACTLY 1.0
against the brute-force all-pairs definition. The r4 verdict asked
for this as a structural guard: a band-width or band-count edit that
silently breaks the guarantee must fail here at pytest time, not
burn a driver round.

r11 (56-bit widening): at 56 bits the synthetic fixture corpus has
NO within-source pairs at hamming <= 3 (its near-dups sit at 5+ — the
wider signature separates them, which is the point of widening), so
the within-source recall laws run on a PLANTED corpus written to a
tmp sf-dir: identical twins (hamming 0 guaranteed), light one-word
edits (small hamming), and unrelated docs (hamming ~ bits/2). The
brute force stays driver-side over the planted signatures — an
independent O(n^2) reference, not the scale path. The cross-source
law still runs on the real fixture (which DOES have cross-source
pairs at <= 3), and a pure-Python md5 reimplementation pins the
Catalyst expression bit-for-bit, including the low-28-bits == old
28-bit-signature layout claim.
"""

from __future__ import annotations

import hashlib
import itertools
from collections import defaultdict

import pytest

from chess_pipeline_spark.plans.llm import (
    _INCR_SPLIT,
    _SIMHASH_BAND_BITS,
    _SIMHASH_BANDS,
    _SIMHASH_BITS,
    _SIMHASH_MAX_HAMMING,
    cross_source_leakage,
    dedup_incremental_simhash,
    simhash_near_dup,
    simhash_signatures_for,
)
from chess_pipeline_spark.sources import load_table

_MASK64 = (1 << 64) - 1


def _hamming(a: int, b: int) -> int:
    return ((a ^ b) & _MASK64).bit_count()


# ------------------------------------------------------------------
# pure-Python reference implementation (independent of Catalyst AND
# of the DuckDB oracle — a third voter)
# ------------------------------------------------------------------


def _py_word_hash56(word: str) -> int:
    hx = hashlib.md5(word.encode()).hexdigest()
    lo = int(hx[0:8], 16)
    hi = int(hx[8:16], 16)
    mix = lambda h: ((h % 2**31) * 2654435761) % 2**31  # noqa: E731
    return (mix(lo) % 2**28) + (mix(hi) % 2**28) * 2**28


def _py_simhash(text: str) -> int:
    votes = [0] * _SIMHASH_BITS
    for w in text.split(" "):
        h = _py_word_hash56(w)
        for j in range(_SIMHASH_BITS):
            votes[j] += 1 if (h >> j) & 1 else -1
    sig = 0
    for j, v in enumerate(votes):
        if v > 0:
            sig |= 1 << j
    return sig


def _signatures(spark, src_dir):
    rows = simhash_signatures_for(
        load_table(spark, src_dir, "documents").select("doc_id", "source", "text")
    ).collect()
    return [(r.doc_id, r.source, r.simhash) for r in rows if r.simhash is not None]


# ------------------------------------------------------------------
# planted corpus: controlled near-dup geometry at 56 bits
# ------------------------------------------------------------------

_WORDS = (
    "key agg row scan slow fast table value part hash merge batch "
    "spark order data column join small line customer query big "
    "vector stream group window sort filter the a"
).split()


def _planted_rows():
    """(doc_id, source, text) rows with guaranteed <=3-hamming pairs
    on BOTH sides of the _INCR_SPLIT batch/cache cut and in both the
    within-source and cross-source regimes. Texts are deterministic;
    the tests recompute expected pairs brute-force rather than
    pinning hash-dependent distances."""
    rows = []

    def base_text(seed: int, n: int = 40) -> str:
        return " ".join(_WORDS[(seed * 7 + i * 3) % len(_WORDS)] for i in range(n))

    def far_text(seed: int, n: int = 40) -> str:
        # seed-specific vocabulary: every token is unique to the seed,
        # so word hashes across two far docs are independent and the
        # expected hamming is ~ bits/2 (base_text with different seeds
        # would share the whole 31-word vocabulary — near-identical
        # multisets, i.e. accidental near-dups)
        return " ".join(f"{_WORDS[i % len(_WORDS)]}x{seed}" for i in range(n))

    # within-source twins below the split (cache side)
    for k in range(6):
        t = base_text(k)
        rows.append((10 + 2 * k, "alpha", t))                 # original
        rows.append((11 + 2 * k, "alpha", t))                 # identical twin: hd 0
    # light edits (one word appended / swapped): small hamming, found
    # iff <= threshold — the brute force decides, no pinning
    for k in range(6):
        t = base_text(k)
        rows.append((40 + k, "alpha", t + " extra"))
    # batch-side (>= _INCR_SPLIT) twins of cache docs, same source:
    # guarantees the incremental query has is_dup rows
    for k in range(4):
        rows.append((_INCR_SPLIT + 10 + k, "alpha", base_text(k)))
    # cross-source twins: guarantees leakage pairs
    for k in range(3):
        rows.append((60 + k, "beta", base_text(k)))
    # unrelated far docs in both sources and both split sides
    for k in range(8):
        rows.append((80 + k, "alpha" if k % 2 else "beta", far_text(100 + 13 * k)))
        rows.append((_INCR_SPLIT + 40 + k, "alpha", far_text(200 + 17 * k)))
    return rows


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("simhash_planted")
    df = spark.createDataFrame(
        [(d, t, "en", s, len(t)) for d, s, t in _planted_rows()],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(out / "documents.parquet"))
    return str(out)


def test_band_geometry_pigeonhole():
    # the guarantee itself, as arithmetic: the bands tile the used
    # signature bits, and the hamming threshold is strictly below the
    # band count, so <= threshold flipped bits always leave one band
    # untouched
    assert _SIMHASH_BANDS * _SIMHASH_BAND_BITS == _SIMHASH_BITS == 56
    assert _SIMHASH_BANDS > _SIMHASH_MAX_HAMMING


def test_python_reference_matches_catalyst(spark, sf_dir):
    # third-voter law: the pure-Python md5 simhash equals the Catalyst
    # expression on real fixture docs (the DuckDB oracle is voter two,
    # exercised by the sweep) — including the bit layout, so the
    # "low 28 bits == the old 28-bit signature" claim is pinned by the
    # lo/hi split inside _py_word_hash56
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").limit(20).collect()
    }
    got = {
        d: h for d, _, h in _signatures(spark, sf_dir) if d in docs
    }
    for doc_id, text in docs.items():
        assert got[doc_id] == _py_simhash(text), doc_id
        assert 0 <= got[doc_id] < (1 << _SIMHASH_BITS)


def test_simhash_banding_recall_exact_planted(spark, planted_dir):
    sigs = _signatures(spark, planted_dir)
    by_source: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for d, s, h in sigs:
        by_source[s].append((d, h))
    expected: dict[tuple[int, int], int] = {}
    for xs in by_source.values():
        xs.sort()
        for (da, ha), (db, hb) in itertools.combinations(xs, 2):
            hd = _hamming(ha, hb)
            if hd <= _SIMHASH_MAX_HAMMING:
                expected[(da, db)] = hd
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_near_dup(spark, planted_dir).collect()
    }
    # exact equality, both directions: recall 1.0 (nothing brute force
    # finds is missed by banding) AND precision 1.0 (banding's
    # post-filter emits nothing extra)
    assert got == expected
    # the identical twins guarantee pairs exist; the planted light
    # edits make sure NON-ZERO hamming pairs are exercised too if any
    # land inside the threshold
    assert sum(1 for hd in expected.values() if hd == 0) >= 6
    assert expected, "planted corpus has no near-dup pairs; recall untestable"


def test_incremental_simhash_recall_exact_planted(spark, planted_dir):
    sigs = _signatures(spark, planted_dir)
    cache = [(d, s, h) for d, s, h in sigs if d < _INCR_SPLIT]
    batch = [(d, s, h) for d, s, h in sigs if d >= _INCR_SPLIT]
    best: dict[int, tuple[int, int]] = {}
    for db, sb, hb in batch:
        cands = sorted(
            (_hamming(hb, hc), dc) for dc, sc, hc in cache if sc == sb
        )
        cands = [(hd, dc) for hd, dc in cands if hd <= _SIMHASH_MAX_HAMMING]
        if cands:
            best[db] = cands[0]  # min (hamming, then cache id)
    out = dedup_incremental_simhash(spark, planted_dir).collect()
    got = {r.doc_id: (r.hamming, r.dup_of) for r in out if r.is_dup}
    assert got == best
    assert best, "planted corpus has no batch-vs-cache dup; recall untestable"
    # non-dup batch rows still present, flagged false with NULL fields
    not_dup = [r for r in out if not r.is_dup]
    assert not_dup, "planted corpus has no non-dup batch rows"
    assert all(r.dup_of is None and r.hamming is None for r in not_dup)


def test_cross_source_leakage_recall_exact(spark, sf_dir):
    # the leakage flavor bands WITHOUT the source key; pigeonhole
    # recall must still be exact against cross-source all-pairs. The
    # REAL fixture corpus keeps cross-source pairs at <= 3 even at 56
    # bits (its replicated docs straddle sources), so this law stays
    # on the fixture — the planted corpus covers the within-source
    # regimes above.
    sigs = _signatures(spark, sf_dir)
    expected = {}
    xs = sorted(sigs)
    for i, (da, sa, ha) in enumerate(xs):
        for db, sb, hb in xs[i + 1 :]:
            if sa == sb:
                continue
            hd = _hamming(ha, hb)
            if hd <= _SIMHASH_MAX_HAMMING:
                expected[(da, db)] = hd
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in cross_source_leakage(spark, sf_dir).collect()
    }
    assert got == expected
    assert expected, "no cross-source near-dups in fixture"


def test_cross_source_leakage_recall_exact_planted(spark, planted_dir):
    # same law on the planted geometry (guaranteed cross-source twins)
    sigs = _signatures(spark, planted_dir)
    expected = {}
    xs = sorted(sigs)
    for i, (da, sa, ha) in enumerate(xs):
        for db, sb, hb in xs[i + 1 :]:
            if sa == sb:
                continue
            hd = _hamming(ha, hb)
            if hd <= _SIMHASH_MAX_HAMMING:
                expected[(da, db)] = hd
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in cross_source_leakage(spark, planted_dir).collect()
    }
    assert got == expected
    assert sum(1 for hd in expected.values() if hd == 0) >= 3

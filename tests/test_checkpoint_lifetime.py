"""Checkpoint lifetime discipline (r11 verdict "What's wrong #1").

The r11 soak measured a real heap death: running the two ExactSubstr
queries back-to-back at two scales in ONE JVM accumulated lazily-GC'd
``localCheckpoint`` blocks until the executor storage filled. The fix
is consumer-side deterministic release
(chess_pipeline_spark/checkpoints.py); these tests pin the mechanism
at fixture scale, and the per-round SCALESOAK artifact (whose harness
now runs every timing inside ``scoped_checkpoints``) is the
at-soak-scale evidence.

The queries exercised are exactly the three the verdict names as
leak sites: ``exact_substring_spans`` + ``exact_substring_rewrite``
(plans/corpus.py span-position pins) and
``dedup_incremental_simhash`` (plans/llm.py signature-frame pin).
``ivf_ingest_audit``'s count pins ride the same release path via
bench/soak harness wiring.
"""

from __future__ import annotations

import pytest

from chess_pipeline_spark.checkpoints import (
    persistent_rdd_ids,
    release_between_queries,
    reset_query_baseline,
    scoped_checkpoints,
)
from chess_pipeline_spark.plans import catalog

LEAK_SITES = (
    "exact_substring_spans",
    "exact_substring_rewrite",
    "dedup_incremental_simhash",
)


def _storage_rdd_count(spark) -> int:
    """RDDs holding ANY cached/checkpointed blocks right now — the
    direct 'blocks freed' probe (getRDDStorageInfo only lists RDDs
    with live storage)."""
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def _run(spark, sf_dir: str, name: str) -> int:
    df = catalog()[name].spark(spark, sf_dir)
    return df.count()


def test_scoped_release_returns_storage_to_baseline(spark, sf_dir):
    # other session-scoped tests may legitimately hold pins; assert a
    # RETURN TO the pre-test baseline, not global emptiness
    base_ids = persistent_rdd_ids(spark)
    base_storage = _storage_rdd_count(spark)
    for name in LEAK_SITES:
        with scoped_checkpoints(spark):
            rows = _run(spark, sf_dir, name)
            assert rows >= 0
            # the plans really do pin inside the scope — otherwise
            # this test would pass vacuously against a refactor that
            # dropped the checkpoints (and the release discipline
            # would be dead code, not verified code)
            assert persistent_rdd_ids(spark) - base_ids, (
                f"{name} no longer takes a localCheckpoint — update "
                "LEAK_SITES to the current pinning queries"
            )
        assert persistent_rdd_ids(spark) == base_ids, name
        assert _storage_rdd_count(spark) == base_storage, name


def test_repeat_runs_in_one_jvm_do_not_accumulate(spark, sf_dir):
    # the r11 failure shape: the same pair, twice each, one JVM. With
    # scoped release the pin count after every iteration is flat at
    # the baseline instead of monotonically growing.
    base_ids = persistent_rdd_ids(spark)
    for _ in range(2):
        for name in LEAK_SITES:
            with scoped_checkpoints(spark):
                _run(spark, sf_dir, name)
            leaked = persistent_rdd_ids(spark) - base_ids
            assert not leaked, f"{name} leaked pins across runs: {leaked}"


def test_release_between_queries_bounds_driver_run(spark, sf_dir):
    # __spark_entry__.queries() wraps every catalog build with
    # release_between_queries: the driver's sequential window run must
    # hold at most ONE query's pins at any time.
    reset_query_baseline(spark)
    try:
        release_between_queries(spark)  # establishes the baseline
        base_ids = persistent_rdd_ids(spark)
        high_water = 0
        for name in LEAK_SITES * 2:
            release_between_queries(spark)
            # after release, the previous query's pins are gone
            assert persistent_rdd_ids(spark) == base_ids, name
            _run(spark, sf_dir, name)
            high_water = max(
                high_water, len(persistent_rdd_ids(spark) - base_ids)
            )
        # every query pinned something, and nothing accumulated beyond
        # a single query's worth
        assert high_water >= 1
        release_between_queries(spark)
        assert persistent_rdd_ids(spark) == base_ids
    finally:
        reset_query_baseline(spark)


def test_entry_module_wraps_catalog_with_release(spark, sf_dir):
    # the actual driver surface: __spark_entry__.queries() callables
    # free the previous query's pins on the next build
    import importlib

    from chess_pipeline_spark.checkpoints import release_checkpoints

    entry_mod = importlib.import_module("__spark_entry__")
    reset_query_baseline(spark)
    base_ids = persistent_rdd_ids(spark)
    try:
        qs = entry_mod.queries()
        qs["exact_substring_spans"](spark, sf_dir).count()
        first_pins = persistent_rdd_ids(spark) - base_ids
        assert first_pins, "spans query expected to pin"
        qs["exact_substring_rewrite"](spark, sf_dir).count()
        # the spans pins were released when the rewrite built
        assert not (persistent_rdd_ids(spark) & first_pins)
    finally:
        reset_query_baseline(spark)
        # leave no pins behind for the rest of the session
        release_checkpoints(spark, keep=base_ids)


def test_query_baseline_keyed_by_context_identity(spark):
    """r12 ADVICE: the sequential-consumer baseline must key on a
    context-unique value — (applicationId, startTime) — not
    id(sparkContext): CPython reuses object ids after the old wrapper
    is garbage-collected, so an id-keyed baseline from a dead context
    could silently exempt a new context's pins from release when RDD
    ids collide."""
    from chess_pipeline_spark.checkpoints import (
        _BASELINES,
        _context_key,
        release_between_queries,
        reset_query_baseline,
    )

    reset_query_baseline(spark)
    release_between_queries(spark)  # establishes the baseline
    key = _context_key(spark)
    assert key in _BASELINES
    # the key is derived from the live context's own identity fields,
    # which a stopped-and-recreated context can never reproduce
    sc = spark.sparkContext
    assert key == (sc.applicationId, int(sc.startTime))
    assert not any(isinstance(k, int) for k in _BASELINES)
    reset_query_baseline(spark)
    assert key not in _BASELINES

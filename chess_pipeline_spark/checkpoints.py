"""Deterministic release of ``localCheckpoint``/``persist`` blocks.

Several catalog plans pin small frames with
``DataFrame.localCheckpoint(...)`` (span positions in
plans/corpus.py, the incremental-dedup signature frame and the IVF
audit count pins in plans/llm.py, the BPE vocab ladder, ...). The
pinned blocks live in executor storage until the backing RDD is
garbage-collected on the DRIVER — which is lazy: a long-lived JVM
that keeps building these plans accumulates un-GC'd blocks. The r11
soak measured the failure for real — running the two ExactSubstr
queries back-to-back at two scales in one JVM died on heap once
(SCALING.md r11 §5).

A local checkpoint is NOT recomputable once unpersisted, so the
pinned frame must outlive the consumption of the query result — the
release point belongs to the *consumer*, not the plan. This module
gives every consumer the same two disciplines:

- :func:`scoped_checkpoints`: context manager — snapshot the
  persistent-RDD ids on entry, blocking-unpersist everything NEW on
  exit. Wrap one "build plan → consume result" unit (a bench timing,
  a sweep row, a soak phase, a test body). Pre-existing pins are
  never touched.
- :func:`release_between_queries`: the sequential-consumer form — the
  first call per SparkContext snapshots a baseline; each later call
  releases every persistent RDD created since that baseline (i.e. the
  PREVIOUS query's pins, which have been fully consumed by then).
  ``__spark_entry__.queries()`` wraps the catalog with this so the
  external driver's sequential window run holds at most ONE query's
  checkpoint blocks at a time instead of fifty.

Both use blocking unpersist: the pinned frames are KB-to-MB scale by
design (plan gates assert that), so the synchronous block removal is
cheap and the release is deterministic rather than
eventually-after-GC.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession

__all__ = [
    "persistent_rdd_ids",
    "release_checkpoints",
    "scoped_checkpoints",
    "release_between_queries",
    "reset_query_baseline",
    "pin_corpus_frame",
]


def persistent_rdd_ids(spark: SparkSession) -> frozenset[int]:
    """Ids of every RDD currently pinned in the context's storage
    (localCheckpoint backs onto the same persistence registry as
    cache/persist, so this sees checkpoint blocks too)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return frozenset(int(k) for k in jmap.keySet().toArray())


def release_checkpoints(
    spark: SparkSession,
    *,
    keep: frozenset[int] = frozenset(),
    blocking: bool = True,
) -> int:
    """Unpersist every persistent RDD except ``keep``; returns the
    number released. Blocking by default — see module docstring."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    released = 0
    for k in list(jmap.keySet().toArray()):
        if int(k) in keep:
            continue
        rdd = jmap.get(k)
        if rdd is None:  # raced with a concurrent GC-driven release
            continue
        rdd.unpersist(blocking)
        released += 1
    return released


@contextmanager
def scoped_checkpoints(spark: SparkSession) -> Iterator[None]:
    """Release every checkpoint/persist taken inside the scope on
    exit; never touches pins that predate the scope."""
    before = persistent_rdd_ids(spark)
    try:
        yield
    finally:
        release_checkpoints(spark, keep=before)


# one baseline per SparkContext, keyed by (applicationId, startTime)
# so a stopped and restarted session — pytest fixtures do this — gets
# a fresh baseline instead of inheriting stale ids from the dead
# context. NOT id(sc): CPython reuses object ids once the old wrapper
# is garbage-collected, so an id-keyed baseline from a dead context
# could silently exempt the new context's pins from release when its
# RDD ids collide with the stale baseline's (r12 ADVICE).
_BASELINES: dict[tuple[str, int], frozenset[int]] = {}


def _context_key(spark: SparkSession) -> tuple[str, int]:
    sc = spark.sparkContext
    return (sc.applicationId, int(sc.startTime))


def reset_query_baseline(spark: SparkSession) -> None:
    """Forget the sequential-consumer baseline (tests)."""
    _BASELINES.pop(_context_key(spark), None)


def release_between_queries(spark: SparkSession) -> int:
    """Sequential-consumer release: free every pin created since the
    first call on this SparkContext. Call at the START of building
    each query so the previous query's already-consumed pins are
    freed; the current query's pins survive until the next call."""
    key = _context_key(spark)
    baseline = _BASELINES.get(key)
    if baseline is None:
        _BASELINES[key] = persistent_rdd_ids(spark)
        return 0
    return release_checkpoints(spark, keep=baseline)


def pin_corpus_frame(df, mode: str | None = None, eager: bool = False):
    """Pin (or deliberately NOT pin) a corpus-SCALE intermediate — the
    shared memory knob behind every pin PINAUDIT flags as growing
    with the data rather than with a model/band/bin bound (the DSIR
    postings frame, the dup-gram postings, the ExactSubstr span
    positions, the simhash band self-join input).

    ``mode`` (or env ``SPARK_GRAFT_CORPUS_PINS``; default
    ``checkpoint``) picks the heap-vs-recompute trade, with output
    bytes identical across modes (tests pin the equality):

    * ``checkpoint`` — localCheckpoint at the default MEMORY_AND_DISK
      level; fastest, but the pin competes with execution memory
      (the DSIRSOAK_r12 8 g OOM class).
    * ``disk`` — localCheckpoint at DISK_ONLY: same one-computation
      plan and the same consumer release discipline, zero storage
      heap.
    * ``recompute`` — no pin: the subtree recomputes per consumer
      branch. Right when a second scan is cheaper than the pin
      footprint (heavily filtered inputs, memory-tight executors).
    """
    import os

    mode = mode or os.environ.get("SPARK_GRAFT_CORPUS_PINS", "checkpoint")
    if mode == "checkpoint":
        return df.localCheckpoint(eager=eager)
    if mode == "disk":
        from pyspark import StorageLevel

        return df.localCheckpoint(
            eager=eager, storageLevel=StorageLevel.DISK_ONLY
        )
    if mode == "recompute":
        return df
    raise ValueError(
        f"pin_corpus_frame: unknown corpus-pin mode {mode!r} "
        "(expected 'checkpoint', 'disk', or 'recompute')"
    )

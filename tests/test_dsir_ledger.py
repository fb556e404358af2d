"""Stream==batch laws for the DSIR bucket-count ledger (r12)."""

from __future__ import annotations

import os
import time

import pytest

import pyspark.sql.functions as F

from chess_pipeline_spark.plans.corpus import dsir_importance_weights
from chess_pipeline_spark.sources import load_table
from chess_pipeline_spark.streaming.jobs import (
    compact_dsir_ledger,
    dsir_from_ledger,
    ingest_dsir_delta,
    stream_dsir_ledger,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_dsir_ledger_stream_equals_batch(spark, sf_dir, tmp_path):
    """Two doc-id-ordered micro-batches through the bucket-count
    ledger reproduce the batch dsir_importance_weights exactly when
    the pinned target equals the corpus min(source) — INCLUDING
    cross-batch model mass (a bucket seen in both batches must sum
    its counts); an at-least-once replayed batch is a byte-identical
    partition rewrite and changes nothing."""
    docs = load_table(spark, sf_dir, "documents")
    target = docs.agg(F.min("source")).first()[0]
    src = tmp_path / "arrivals"
    src.mkdir()
    mid = docs.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
    lo = docs.filter(F.col("doc_id") <= mid)
    hi = docs.filter(F.col("doc_id") > mid)
    lo.toPandas().to_parquet(str(src / "b0.parquet"))
    hi.toPandas().to_parquet(str(src / "b1.parquet"))
    now = time.time()
    os.utime(src / "b0.parquet", (now - 60, now - 60))
    os.utime(src / "b1.parquet", (now, now))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    led = str(tmp_path / "dsir_ledger")
    q = (
        stream_dsir_ledger(stream, led, target)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    want = _rows(dsir_importance_weights(spark, sf_dir))
    got = _rows(dsir_from_ledger(spark, led, docs))
    assert got == want
    assert any(r[2] for r in want), "no target docs; law untestable"

    # at-least-once replay: re-ingesting batch 1 rewrites its own
    # partition with identical bytes — the served weights are stable
    ingest_dsir_delta(hi, led, 1, target)
    assert _rows(dsir_from_ledger(spark, led, docs)) == want

    # compaction is probe-invariant
    compact_dsir_ledger(spark, led)
    assert _rows(dsir_from_ledger(spark, led, docs)) == want

    # a different pinned target refuses instead of silently folding
    # counts under a redefined p-model
    with pytest.raises(ValueError, match="target"):
        ingest_dsir_delta(hi, led, 2, "some_other_source")


def test_dsir_weights_rank_target_like_docs_higher(spark, tmp_path):
    """Planted-signal law: documents written in the TARGET domain's
    vocabulary must score strictly higher mean importance weight than
    documents from a disjoint vocabulary — the selection property the
    operator exists for (oracle parity alone only proves both engines
    compute the same numbers)."""
    import pandas as pd

    from chess_pipeline_spark.plans.corpus import dsir_importance_weights

    # target domain 'aaa_target' (min source) writes vocab A; raw pool
    # writes vocab B; two raw docs are target-like plants
    vocab_a = "alpha beta gamma delta epsilon zeta"
    vocab_b = "omega psi chi phi upsilon tau"
    rows = []
    for i in range(10):
        rows.append((i, "aaa_target", vocab_a))
    for i in range(10, 40):
        rows.append((i, "zz_raw", vocab_b))
    plants = [40, 41]
    for i in plants:
        rows.append((i, "zz_raw", vocab_a))
    pd.DataFrame(rows, columns=["doc_id", "source", "text"]).to_parquet(
        str(tmp_path / "documents.parquet")
    )

    got = {
        r.doc_id: r.logweight_unats
        for r in dsir_importance_weights(spark, str(tmp_path)).collect()
    }
    plant_scores = [got[i] for i in plants]
    raw_scores = [got[i] for i in range(10, 40)]
    assert min(plant_scores) > max(raw_scores), (
        "target-vocabulary plants must outscore every raw-vocabulary doc"
    )

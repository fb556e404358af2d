"""Persisted inverted text index: parity with the catalog BM25 query,
bucket pruning in the plan, exact incremental ingest."""

from __future__ import annotations

import pyspark.sql.functions as F

from chess_pipeline_spark.plans.corpus import _BM25_QUERY_TERMS
from chess_pipeline_spark.sources import load_table
from chess_pipeline_spark.text_index import (
    _TI_BUCKETS,
    build_text_index,
    ingest_text_delta,
    probe_bm25,
)


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_probe_matches_catalog_bm25_bit_exactly(spark, sf_dir, tmp_path):
    from chess_pipeline_spark.plans import catalog

    docs = load_table(spark, sf_dir, "documents")
    idx = str(tmp_path / "tix")
    build_text_index(docs, idx)
    got = _rows(probe_bm25(spark, idx, _BM25_QUERY_TERMS))
    want = _rows(catalog()["bm25_doc_search"].spark(spark, sf_dir))
    assert got == want  # same fround grid, same tie order -> identical


def test_probe_prunes_to_query_buckets(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    idx = str(tmp_path / "tix")
    build_text_index(docs, idx)
    df = probe_bm25(spark, idx, _BM25_QUERY_TERMS)
    jvm = df.sparkSession._jvm
    plan = jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # the bucket filter must reach the partition level of the
    # postings scan, not run as a post-scan row filter
    assert "PartitionFilters" in plan
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("bucket" in ln and "bucket#" in ln for ln in pf), pf
    assert df.count() >= 0


def test_incremental_ingest_equals_full_rebuild(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    mid = docs.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
    d0 = docs.filter(F.col("doc_id") <= mid)
    d1 = docs.filter(F.col("doc_id") > mid)

    inc = str(tmp_path / "tix_inc")
    build_text_index(d0, inc)
    ingest_text_delta(d1, inc, batch_id=1)
    ingest_text_delta(d1, inc, batch_id=1)  # at-least-once replay: no-op

    full = str(tmp_path / "tix_full")
    build_text_index(docs, full)

    assert _rows(probe_bm25(spark, inc, _BM25_QUERY_TERMS)) == _rows(
        probe_bm25(spark, full, _BM25_QUERY_TERMS)
    )
    # per-batch stats rows sum to the full-build totals
    import os

    def totals(p):
        r = (
            spark.read.parquet(os.path.join(p, "stats"))
            .agg(F.sum("n_docs"), F.sum("total_len"))
            .first()
        )
        return (r[0], r[1])

    assert totals(inc) == totals(full)


def test_streamed_index_equals_batch_build(spark, sf_dir, tmp_path):
    """Drive documents through stream_text_index_ingest in two
    micro-batches via a real file-source stream: the streamed index
    must answer the fixed BM25 query bit-identically to a one-shot
    batch build over the same documents."""
    import os
    import time

    from chess_pipeline_spark.streaming.jobs import stream_text_index_ingest

    docs = load_table(spark, sf_dir, "documents")
    src = tmp_path / "doc_arrivals"
    src.mkdir()
    mid = docs.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
    docs.filter(F.col("doc_id") <= mid).toPandas().to_parquet(
        str(src / "b0.parquet")
    )
    docs.filter(F.col("doc_id") > mid).toPandas().to_parquet(
        str(src / "b1.parquet")
    )
    now = time.time()
    os.utime(src / "b0.parquet", (now - 60, now - 60))
    os.utime(src / "b1.parquet", (now, now))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    idx = str(tmp_path / "tix_stream")
    q = (
        stream_text_index_ingest(stream, idx)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    full = str(tmp_path / "tix_batch")
    build_text_index(docs, full)
    assert _rows(probe_bm25(spark, idx, _BM25_QUERY_TERMS)) == _rows(
        probe_bm25(spark, full, _BM25_QUERY_TERMS)
    )

"""Multimodal binary-column plumbing (north-star extension surface).

The decode libraries are absent in this container by design; the
deterministic fake decoder exercises the full Spark path — binary
payload ingest, Arrow batching, mapInPandas schema, feature output —
and real media kinds raise NotImplementedError (documented stub).
"""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from chess_pipeline_spark.multimodal import (
    _fake_decode,
    attach_binary_payload,
    extract_media_features,
    frame_features,
    resize_payload,
    sample_frames,
)
from chess_pipeline_spark.sources import load_table


def test_attach_binary_payload_schema_and_meta(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = attach_binary_payload(docs)
    row = media.filter(F.col("payload").isNotNull()).first()
    assert row["kind"] == "fake-text"
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["meta"]["n_bytes"] == len(row["payload"])
    assert row["meta"]["mime"] == "text/plain"


def test_extract_media_features_matches_local_decode(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = attach_binary_payload(docs)
    feats = extract_media_features(media)
    local = {
        r["doc_id"]: bytes(r["payload"]) for r in media.collect()
    }
    for r in feats.collect():
        hist, checksum, vec = _fake_decode(local[r["doc_id"]])
        assert list(r["byte_hist"]) == hist
        assert r["checksum"] == checksum
        assert r["n_bytes"] == len(local[r["doc_id"]])
        assert [round(x, 9) for x in r["feature_vec"]] == [round(x, 9) for x in vec]


def test_resize_payload_exact_bytes(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = attach_binary_payload(docs)
    local = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}
    for r in resize_payload(media, target_bytes=16).collect():
        src = local[r["doc_id"]]
        got = bytes(r["payload"])
        if not src:
            assert got == b""
            continue
        # nearest-neighbor law: out[i] = in[(i*n)//target]
        assert got == bytes(src[(i * len(src)) // 16] for i in range(16))
        assert r["meta"]["n_bytes"] == 16
        assert r["meta"]["mime"] == "text/plain"


def test_sample_frames_chunks_and_stride(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(10)
    media = attach_binary_payload(docs)
    local = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}
    rows = sample_frames(media, frame_bytes=32, every_n=2).collect()
    by_doc: dict[int, dict[int, bytes]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["frame_idx"]] = bytes(r["payload"])
    for doc_id, src in local.items():
        n_frames = (len(src) + 31) // 32
        expected = {k: src[k * 32 : (k + 1) * 32] for k in range(0, n_frames, 2)}
        assert by_doc.get(doc_id, {}) == expected


def test_frame_features_equal_sample_then_decode(spark, sf_dir):
    # the fused pass must equal the two-stage composition exactly
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = attach_binary_payload(docs)
    fused = {
        (r["doc_id"], r["frame_idx"]): (r["n_bytes"], r["checksum"])
        for r in frame_features(media).collect()
    }
    staged = {}
    for r in sample_frames(media).collect():
        _, checksum, _ = _fake_decode(bytes(r["payload"]))
        staged[(r["doc_id"], r["frame_idx"])] = (len(r["payload"]), checksum)
    assert fused == staged


def test_frame_stages_unsupported_kind_raises(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(1)
    media = attach_binary_payload(docs, kind="video")
    for stage in (resize_payload, sample_frames, frame_features):
        with pytest.raises(Exception) as ei:
            stage(media).collect()
        assert "NotImplementedError" in str(ei.value) or isinstance(
            ei.value, NotImplementedError
        )


def test_extract_media_features_unsupported_kind_raises(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(1)
    media = attach_binary_payload(docs, kind="image")
    with pytest.raises(Exception) as ei:
        extract_media_features(media).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )

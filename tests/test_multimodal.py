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


def test_extract_media_features_unsupported_kind_raises(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(1)
    media = attach_binary_payload(docs, kind="image")
    with pytest.raises(Exception) as ei:
        extract_media_features(media).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )

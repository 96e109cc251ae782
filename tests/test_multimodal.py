"""Multimodal binary-column operators (operators/multimodal.py): genuine
BinaryType payloads, magic sniffing, digest dedup, and the mapInPandas
byte-feature plumbing with exact expected values."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import types as T

from copenhagen_traffic_and_weather_etl_pipeline_spark.operators.multimodal import (
    binary_dedup,
    binary_metadata,
    byte_features,
    decode_image_batch,
    frame_sample,
    synthesize_binary_docs,
)

DOCS_SCHEMA = "doc_id long, text string"


def test_synthesize_and_sniff(spark):
    docs = spark.createDataFrame(
        [(0, "alpha"), (1, "bravo"), (2, "charlie"), (3, "alpha")], DOCS_SCHEMA
    )
    syn = synthesize_binary_docs(docs)
    assert isinstance(syn.schema["payload"].dataType, T.BinaryType)
    meta = {r["doc_id"]: r for r in binary_metadata(syn).collect()}
    assert meta[0]["format"] == "png" and meta[0]["magic_hex"] == "89504E47"
    assert meta[1]["format"] == "jpeg"
    assert meta[2]["format"] == "riff"
    assert meta[3]["format"] == "png"
    assert meta[0]["n_bytes"] == 4 + len("alpha")
    # Digest = md5 of the uppercase hex of the bytes (oracle-reproducible).
    expected = hashlib.md5(
        (bytes.fromhex("89504E47") + b"alpha").hex().upper().encode()
    ).hexdigest()
    assert meta[0]["content_digest"] == expected


def test_binary_dedup_groups_identical_payloads(spark):
    # doc_ids 0 and 3 share format (0%3 == 3%3) and text -> same digest.
    docs = spark.createDataFrame(
        [(0, "alpha"), (1, "bravo"), (2, "charlie"), (3, "alpha")], DOCS_SCHEMA
    )
    groups = binary_dedup(synthesize_binary_docs(docs)).collect()
    by_keep = {r["keep_doc_id"]: r["n_copies"] for r in groups}
    assert by_keep == {0: 2, 1: 1, 2: 1}


def test_byte_features_exact_values(spark):
    docs = spark.createDataFrame([(1, "AB")], DOCS_SCHEMA)  # 1 -> jpeg magic
    row = byte_features(synthesize_binary_docs(docs)).collect()[0]
    payload = bytes.fromhex("FFD8FFE0") + b"AB"
    assert row["n_bytes"] == 6
    assert row["max_byte"] == 0xFF
    assert abs(row["mean_byte"] - sum(payload) / len(payload)) < 1e-12
    assert row["header_hex"] == "FFD8FFE0"


def test_frame_sample_exact_frames(spark):
    # 9 full 16-byte frames after the 4-byte header; stride 4 keeps 0, 4, 8.
    text = "x" * (16 * 9 + 7)  # +7 trailing partial frame, dropped
    docs = spark.createDataFrame([(0, text)], DOCS_SCHEMA)  # 0 -> png magic
    rows = frame_sample(synthesize_binary_docs(docs)).collect()
    assert sorted(r["frame_idx"] for r in rows) == [0, 4, 8]
    assert all(r["n_frames"] == 9 for r in rows)
    payload = bytes.fromhex("89504E47") + text.encode()
    for r in rows:
        frame = payload[4 + r["frame_idx"] * 16 : 4 + r["frame_idx"] * 16 + 16]
        assert r["frame_digest"] == hashlib.md5(
            frame.hex().upper().encode()
        ).hexdigest()


def test_frame_sample_drops_short_payloads(spark):
    docs = spark.createDataFrame([(0, "tiny")], DOCS_SCHEMA)  # < 1 frame
    assert frame_sample(synthesize_binary_docs(docs)).count() == 0


def test_decode_stub_contract():
    with pytest.raises(NotImplementedError):
        next(decode_image_batch(iter([])))

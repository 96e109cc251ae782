"""Multimodal binary-column operators (operators/multimodal.py): genuine
BinaryType payloads, magic sniffing, digest dedup, and the mapInPandas
byte-feature plumbing with exact expected values."""

from __future__ import annotations

import hashlib
import random

from hypothesis import given, settings
from hypothesis import strategies as st
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


def _ppm_bytes(px: bytes, w: int, h: int) -> bytes:
    assert len(px) == w * h * 3
    return f"P6\n{w} {h}\n255\n".encode() + px


def _bmp_bytes(px_rows: list[bytes], w: int) -> bytes:
    """24bpp bottom-up BMP with 4-byte row padding."""
    stride = (w * 3 + 3) // 4 * 4
    body = b"".join(r + b"\x00" * (stride - len(r)) for r in px_rows)
    h = len(px_rows)
    file_size = 54 + len(body)
    header = (
        b"BM"
        + file_size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + b"\x00" * 24
    )
    return header + body


def _decode_pdf(payloads: dict[int, bytes]):
    import pandas as pd

    pdf = pd.DataFrame(
        {"doc_id": list(payloads), "payload": list(payloads.values())}
    )
    out = pd.concat(decode_image_batch(iter([pdf])))
    return {int(r.doc_id): r for r in out.itertuples(index=False)}


def test_decode_ppm_exact():
    px = bytes(range(24))  # 4x2 RGB ramp: 0..23
    rows = _decode_pdf({1: _ppm_bytes(px, 4, 2)})
    r = rows[1]
    assert (r.format, r.width, r.height, r.n_channels) == ("ppm", 4, 2, 3)
    assert r.n_px_bytes == 24
    assert r.mean_px_micro == sum(px) * 1_000_000 // 24
    assert r.max_px == 23
    assert r.error is None


def test_decode_ppm_comment_header():
    px = bytes([7] * 3)
    b = b"P6\n# a comment\n1 1\n255\n" + px
    r = _decode_pdf({1: b})[1]
    assert (r.format, r.width, r.height) == ("ppm", 1, 1)
    assert r.max_px == 7


def test_decode_bmp_excludes_row_padding():
    # 2x2: bottom row then top row in file order; stride pads 6 -> 8
    # bytes per row with 0xFF-free zeros that must NOT enter the stats.
    bottom, top = bytes([10, 20, 30, 40, 50, 60]), bytes([1, 2, 3, 4, 5, 6])
    r = _decode_pdf({5: _bmp_bytes([bottom, top], 2)})[5]
    px = bottom + top
    assert (r.format, r.width, r.height, r.n_channels) == ("bmp", 2, 2, 3)
    assert r.n_px_bytes == 12
    assert r.mean_px_micro == sum(px) * 1_000_000 // 12
    assert r.max_px == 60
    assert r.error is None


def test_decode_unsupported_and_truncated_are_row_errors():
    rows = _decode_pdf(
        {
            1: bytes.fromhex("89504E47") + b"not a real png",
            2: b"P6\n4 2\n255\n" + b"\x00" * 5,  # truncated pixel data
            3: _ppm_bytes(bytes(3), 1, 1),  # valid row rides along
        }
    )
    assert rows[1].error is not None and "unsupported" in rows[1].error
    assert rows[2].error is not None and "truncated" in rows[2].error
    assert rows[3].error is None and rows[3].format == "ppm"


def _px_stats(px: bytes):
    return (len(px), sum(px) * 1_000_000 // len(px), max(px))


@given(
    w=st.integers(1, 8),
    h=st.integers(1, 6),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=40, deadline=None)
def test_decode_ppm_property_roundtrip(w, h, seed):
    rnd = random.Random(seed)
    px = bytes(rnd.randrange(256) for _ in range(w * h * 3))
    r = _decode_pdf({1: _ppm_bytes(px, w, h)})[1]
    assert (r.format, r.width, r.height, r.error) == ("ppm", w, h, None)
    assert (r.n_px_bytes, r.mean_px_micro, r.max_px) == _px_stats(px)


@given(
    w=st.integers(1, 8),
    h=st.integers(1, 6),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=40, deadline=None)
def test_decode_bmp_property_roundtrip(w, h, seed):
    # Covers all stride paddings (w mod 4) since w ranges over 1..8.
    rnd = random.Random(seed)
    rows = [bytes(rnd.randrange(256) for _ in range(w * 3)) for _ in range(h)]
    r = _decode_pdf({1: _bmp_bytes(rows, w)})[1]
    px = b"".join(rows)
    assert (r.format, r.width, r.height, r.error) == ("bmp", w, h, None)
    assert (r.n_px_bytes, r.mean_px_micro, r.max_px) == _px_stats(px)


def test_decode_bmp_top_down_negative_height():
    # Negative height = top-down row order; stats must be identical to
    # the bottom-up layout of the same rows.
    rows = [bytes([9, 8, 7, 6, 5, 4]), bytes([1, 2, 3, 4, 5, 6])]
    up = _bmp_bytes(rows, 2)
    # Rewrite the height field (offset 22) to -2 little-endian signed.
    down = up[:22] + (-2).to_bytes(4, "little", signed=True) + up[26:]
    r_up = _decode_pdf({1: up})[1]
    r_down = _decode_pdf({1: down})[1]
    assert r_down.error is None and r_down.height == 2
    assert (r_down.n_px_bytes, r_down.mean_px_micro, r_down.max_px) == (
        r_up.n_px_bytes,
        r_up.mean_px_micro,
        r_up.max_px,
    )


def test_decode_null_payload_is_row_error_not_crash():
    rows = _decode_pdf({7: None, 8: _ppm_bytes(bytes(3), 1, 1)})
    assert rows[7].error is not None and "null payload" in rows[7].error
    assert rows[8].error is None


def test_decode_images_dataframe(spark):
    docs = spark.createDataFrame(
        [(1, bytearray(_ppm_bytes(bytes(range(12)), 2, 2)))],
        "doc_id long, payload binary",
    )
    from copenhagen_traffic_and_weather_etl_pipeline_spark.operators.multimodal import (
        decode_images,
    )

    r = decode_images(docs).collect()[0]
    assert r["format"] == "ppm" and r["n_px_bytes"] == 12
    assert r["mean_px_micro"] == sum(range(12)) * 1_000_000 // 12


def test_decode_nan_doc_id_does_not_fail_the_batch():
    # A null in a nullable int64 doc_id column surfaces as float NaN
    # through Arrow/pandas; int(NaN) outside the per-row try would fail
    # the whole batch (ADVICE r4). The NaN row must come back with a
    # null doc_id and the good row must still decode.
    import numpy as np
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": np.array([np.nan, 8.0], dtype="float64"),
            "payload": [_ppm_bytes(bytes(3), 1, 1)] * 2,
        }
    )
    out = pd.concat(decode_image_batch(iter([pdf])))
    assert out["doc_id"].isna().iloc[0]
    assert out["doc_id"].iloc[1] == 8
    assert out["error"].isna().all() or (out["error"].iloc[1] is None)


def test_decode_negative_dimensions_are_row_errors():
    # Negative width/height would make the truncation check vacuous and
    # hand np.frombuffer a negative count (ADVICE r4): both parsers must
    # reject non-positive dimensions as per-row errors.
    bad_ppm = b"P6\n-4 2\n255\n" + b"\x00" * 24
    bmp = _bmp_bytes([bytes(9)], 3)
    bad_bmp = bmp[:18] + (-3).to_bytes(4, "little", signed=True) + bmp[22:]
    rows = _decode_pdf({1: bad_ppm, 2: bad_bmp, 3: _ppm_bytes(bytes(3), 1, 1)})
    assert rows[1].error is not None and "non-positive" in rows[1].error
    assert rows[2].error is not None and "non-positive" in rows[2].error
    assert rows[3].error is None

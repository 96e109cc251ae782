"""Multimodal column support: opaque ``BinaryType`` payloads with typed
metadata (SURVEY north-star extension; no analogue in the reference —
the closest is its semi-structured JSON-in-flight handling,
deployment_function.py:83).

Design for 100 TB of images/audio/video:

- the payload is an opaque ``binary`` column next to typed metadata
  (length, format, digest) so scans prune to metadata-only whenever the
  query doesn't touch bytes;
- format detection, digesting, and dedup are JVM-side built-ins
  (``substring``/``hex``/``md5`` work on binary) — no Python in the hot
  path;
- decode / feature-extraction runs as Arrow-batched ``mapInPandas`` so
  each Python worker sees a columnar batch of payloads, not a row at a
  time. :func:`decode_images` decodes the two header+raw-bytes formats
  that need no codec library (PPM P6, 24-bit BMP) for real; compressed
  formats (JPEG/PNG/WAV) surface a per-row ``error`` value — swap
  ``_decode_one`` for ``PIL.Image.open`` where codecs exist.
  :func:`byte_features` exercises the identical plumbing with
  format-agnostic byte statistics.

The test tables carry no real binary column, so
:func:`synthesize_binary_docs` derives a deterministic one from
``documents.text`` — a real format magic number (PNG/JPEG/RIFF chosen by
``doc_id % 3``) prepended to the UTF-8 bytes. Everything downstream of it
treats the column as genuinely opaque bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# (format label, magic bytes as uppercase hex). Real file signatures.
MAGIC_FORMATS: list[tuple[str, str]] = [
    ("png", "89504E47"),
    ("jpeg", "FFD8FFE0"),
    ("riff", "52494646"),  # WAV/AVI container
]


def synthesize_binary_docs(docs: DataFrame) -> DataFrame:
    """Deterministic fake payloads: magic(doc_id % 3) ++ utf8(text) as a
    genuine ``BinaryType`` column. Narrow, JVM-side, reproducible in any
    engine (the oracle mirrors it over hex strings)."""
    magic = F.when(
        F.col("doc_id") % 3 == 0, F.unhex(F.lit(MAGIC_FORMATS[0][1]))
    ).when(
        F.col("doc_id") % 3 == 1, F.unhex(F.lit(MAGIC_FORMATS[1][1]))
    ).otherwise(F.unhex(F.lit(MAGIC_FORMATS[2][1])))
    # A NULL-text row has no payload to synthesize: drop it here (a NULL
    # BinaryType cell would reach the Arrow batch as None and crash
    # np.frombuffer in the byte-features worker). The SQL oracle CTE
    # filters identically.
    return docs.filter(F.col("text").isNotNull()).select(
        "doc_id", F.concat(magic, F.col("text").cast("binary")).alias("payload")
    )


def binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata for an opaque binary column: byte length, sniffed
    format (magic-number dispatch on the first 4 bytes), content digest.
    All JVM built-ins — at scale this is a narrow, codegen'd projection.

    The digest is md5 over the UPPERCASE HEX of the bytes (not the raw
    bytes) so SQL oracles without blob-md5 support can reproduce it.
    """
    bin_c = F.col(payload_col)
    magic_hex = F.hex(F.substring(bin_c, 1, 4))
    fmt = F.lit("unknown")
    for label, hexmagic in reversed(MAGIC_FORMATS):
        fmt = F.when(magic_hex == hexmagic, label).otherwise(fmt)
    return df.select(
        *[c for c in df.columns if c != payload_col],
        F.length(bin_c).cast("bigint").alias("n_bytes"),
        magic_hex.alias("magic_hex"),
        fmt.alias("format"),
        F.md5(F.hex(bin_c).cast("binary")).alias("content_digest"),
    )


def binary_dedup(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Exact binary dedup: hash-groupBy on the content digest (same
    shape as text dedup_exact — partial agg, no self-join)."""
    return (
        df.select(
            "doc_id", F.md5(F.hex(F.col(payload_col)).cast("binary")).alias("content_digest")
        )
        .groupBy("content_digest")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


BYTE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("max_byte", T.LongType()),
        T.StructField("header_hex", T.StringType()),
    ]
)


def byte_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Feature extraction over binary payloads via Arrow-batched
    ``mapInPandas`` — the exact plumbing a real image/audio featurizer
    uses (replace the numpy byte stats with a model or codec call).

    Deterministic and dependency-free, so it runs (and is tested) in this
    container; at scale the per-batch loop is the decode hot path and the
    schema/batch shape here is what keeps it Arrow-columnar end to end.
    """
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            arrs = [np.frombuffer(p, dtype=np.uint8) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [len(a) for a in arrs],
                    "mean_byte": [float(a.mean()) if len(a) else 0.0 for a in arrs],
                    "max_byte": [int(a.max()) if len(a) else 0 for a in arrs],
                    "header_hex": [a[:4].tobytes().hex().upper() for a in arrs],
                }
            )

    return df.select("doc_id", payload_col).mapInPandas(extract, BYTE_FEATURES_SCHEMA)


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    header_bytes: int = 4,
    frame_bytes: int = 16,
    stride: int = 4,
) -> DataFrame:
    """Frame sampling for video-like payloads: treat the bytes after the
    container header as fixed-size frames and keep every ``stride``-th
    one. The fan-out is ``explode(sequence(...))`` + a dynamic
    ``substr`` — entirely JVM-side, no Python worker, so at 100 TB the
    sampling stage is a narrow codegen'd projection whose output is
    ``1/stride`` of the input bytes *before* any decoder runs.

    Emits (doc_id, frame_idx, frame_digest, n_frames); the digest is md5
    over the frame's uppercase hex (same oracle-friendly convention as
    :func:`binary_metadata`). Trailing partial frames are dropped.
    """
    bin_c = F.col(payload_col)
    n_frames = F.floor((F.length(bin_c) - header_bytes) / F.lit(frame_bytes)).cast(
        "bigint"
    )
    with_n = df.select("doc_id", payload_col).withColumn("n_frames", n_frames)
    idx = F.explode(
        F.sequence(F.lit(0).cast("bigint"), F.col("n_frames") - 1, F.lit(stride).cast("bigint"))
    )
    frame = bin_c.substr(
        (F.col("frame_idx") * frame_bytes + header_bytes + 1).cast("int"),
        F.lit(frame_bytes),
    )
    return (
        with_n.filter(F.col("n_frames") > 0)
        .withColumn("frame_idx", idx)
        .select(
            "doc_id",
            "frame_idx",
            F.md5(F.hex(frame).cast("binary")).alias("frame_digest"),
            "n_frames",
        )
    )


# ---------------------------------------------------------------------------
# Image decode. Two dependency-free formats are decoded for real — PPM
# (P6, the Netpbm binary RGB format) and BMP (24-bit uncompressed) —
# because both are header + raw pixel bytes, parseable without a codec
# library. Compressed formats (JPEG/PNG/...) surface a per-row error
# value instead of failing the job (the O2 fault-isolation posture);
# swap ``_decode_one`` for ``PIL.Image.open`` in an environment that
# ships codecs.
# ---------------------------------------------------------------------------

DECODE_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_channels", T.LongType()),
        T.StructField("n_px_bytes", T.LongType()),
        # exact integer micro-units: sum(px)*1_000_000 // n — no float,
        # so SQL oracles reproduce it bit-for-bit.
        T.StructField("mean_px_micro", T.LongType()),
        T.StructField("max_px", T.LongType()),
        T.StructField("error", T.StringType()),
    ]
)


def _parse_ppm(b: bytes):
    """PPM P6: ``P6 <w> <h> <maxval>`` (whitespace/#-comment separated)
    followed by one whitespace byte, then w*h*3 raw RGB bytes."""
    import numpy as np

    if not b.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if pos < len(b) and b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        vals.append(int(b[start:pos]))
    pos += 1  # the single whitespace byte that terminates the header
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    if w <= 0 or h <= 0:
        # A negative dimension would make `need` negative: the
        # truncation check below passes vacuously and np.frombuffer
        # would see a negative count.
        raise ValueError("non-positive PPM dimensions")
    need = w * h * 3
    if len(b) - pos < need:
        raise ValueError("truncated PPM pixel data")
    px = np.frombuffer(b, dtype=np.uint8, count=need, offset=pos)
    return "ppm", w, h, 3, px


def _parse_bmp(b: bytes):
    """BMP (BITMAPINFOHEADER, 24 bpp, BI_RGB): rows are 4-byte aligned
    and stored bottom-up (top-down when height < 0). Row order doesn't
    affect the emitted stats, but padding bytes must be excluded."""
    import numpy as np

    if b[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24bpp uncompressed BMP supported (bpp={bpp})")
    h_abs = abs(h)
    if w <= 0 or h_abs <= 0:
        # Negative width flips the stride/truncation arithmetic the
        # same way as in _parse_ppm (height may legitimately be
        # negative = top-down, hence the abs above).
        raise ValueError("non-positive BMP dimensions")
    row_bytes = w * 3
    stride = (row_bytes + 3) // 4 * 4
    if len(b) < data_off + stride * h_abs - (stride - row_bytes):
        raise ValueError("truncated BMP pixel data")
    rows = [
        np.frombuffer(b, np.uint8, row_bytes, data_off + r * stride)
        for r in range(h_abs)
    ]
    px = np.concatenate(rows) if rows else np.zeros(0, np.uint8)
    return "bmp", w, h_abs, 3, px


def _decode_one(b: bytes):
    if b[:2] == b"P6":
        return _parse_ppm(b)
    if b[:2] == b"BM":
        return _parse_bmp(b)
    raise ValueError(
        "unsupported image format (compressed formats need a codec "
        "library this environment does not ship)"
    )


def decode_image_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched image decode: PPM/BMP parsed for real; rows in any
    other format get a per-row ``error`` value (the job never fails —
    same fault isolation as the REST source's error channel). Pixel mean
    is emitted in exact integer micro-units so downstream checks are
    float-free."""
    for pdf in batches:
        out = {k: [] for k in (
            "doc_id", "format", "width", "height", "n_channels",
            "n_px_bytes", "mean_px_micro", "max_px", "error",
        )}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            # pd.isna, not `is None`: a null in a nullable int64 column
            # surfaces as float NaN through Arrow, and int(NaN) here —
            # outside the per-row try — would fail the whole batch.
            out["doc_id"].append(None if pd.isna(doc_id) else int(doc_id))
            try:
                if payload is None:
                    raise ValueError("null payload")
                fmt, w, h, nch, px = _decode_one(bytes(payload))
                out["format"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["n_channels"].append(nch)
                out["n_px_bytes"].append(len(px))
                out["mean_px_micro"].append(
                    int(px.sum(dtype="int64")) * 1_000_000 // len(px)
                    if len(px)
                    else 0
                )
                out["max_px"].append(int(px.max()) if len(px) else 0)
                out["error"].append(None)
            except (ValueError, IndexError, TypeError) as e:
                out["format"].append(None)
                out["width"].append(None)
                out["height"].append(None)
                out["n_channels"].append(None)
                out["n_px_bytes"].append(None)
                out["mean_px_micro"].append(None)
                out["max_px"].append(None)
                out["error"].append(str(e))
        yield pd.DataFrame(out)


def decode_images(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode an opaque image column to per-image stats via Arrow-batched
    ``mapInPandas`` — the same plumbing a PIL/opencv featurizer would
    mount; only (doc_id, payload) crosses into Python."""
    sel = df.select("doc_id", F.col(payload_col).alias("payload"))
    return sel.mapInPandas(decode_image_batch, DECODE_IMAGE_SCHEMA)


__all__ = [
    "MAGIC_FORMATS",
    "synthesize_binary_docs",
    "binary_metadata",
    "binary_dedup",
    "byte_features",
    "frame_sample",
    "decode_image_batch",
    "decode_images",
    "BYTE_FEATURES_SCHEMA",
    "DECODE_IMAGE_SCHEMA",
]

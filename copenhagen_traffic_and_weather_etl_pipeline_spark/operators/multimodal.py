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
  time. The *decode* step itself (JPEG/PNG/WAV decoding) requires codec
  libraries this container doesn't ship, so :func:`decode_image_batch`
  is an explicit ``NotImplementedError`` stub — but the schema,
  partitioning, UDF signature and batch shape are real and exercised by
  :func:`byte_features`, which computes deterministic byte-level
  statistics through the identical plumbing.

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
    return docs.select(
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


def decode_image_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Decode stub — the real implementation needs an image codec (PIL /
    opencv), which this container does not ship. The signature and batch
    contract match :func:`byte_features`; swap the body for
    ``PIL.Image.open(io.BytesIO(p))`` + resize/normalize in production.
    """
    raise NotImplementedError(
        "image decode requires a codec library (PIL/opencv) not available "
        "in this environment; use byte_features for the tested plumbing"
    )


__all__ = [
    "MAGIC_FORMATS",
    "synthesize_binary_docs",
    "binary_metadata",
    "binary_dedup",
    "byte_features",
    "frame_sample",
    "decode_image_batch",
    "BYTE_FEATURES_SCHEMA",
]

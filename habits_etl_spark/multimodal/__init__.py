"""Multimodal columns (BASELINE north-star 'multimodal columns').

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata, processed with Arrow-batched pandas UDFs over ``mapInPandas`` —
the Spark-side plumbing (schema, partitioning, UDF signature, batch shape)
is real and tested; the actual codec step is stubbed because the
image/audio libraries aren't in this container (clearly marked below).

At 100 TB the shape that matters:
- media bytes never pass through Python row-at-a-time — Arrow batches only;
- decode/feature stages are ``mapInPandas`` (pure map; scales with input
  splits, no shuffle);
- metadata filters (kind, size) are ordinary columns, pushed down to the
  scan before any Python runs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
    ]
)

DECODED_SCHEMA = (
    "media_id long, kind string, n_bytes long, width int, height int, "
    "duration_ms long, checksum string"
)

FEATURE_DIM = 16
FEATURE_SCHEMA = "media_id long, feature array<float>"


def synthetic_media(spark: SparkSession, n: int = 100) -> DataFrame:
    """Deterministic fake media table: payload = repeated md5 bytes keyed by
    media_id, with a 16-byte header encoding fake dimensions."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.to_binary(
            F.concat(
                F.lpad(F.hex((F.col("id") * 7) % 256), 8, "0"),      # "width" byte
                F.lpad(F.hex((F.col("id") * 13) % 256), 8, "0"),     # "height" byte
                F.repeat(F.md5(F.col("id").cast("string")), 4),
            ),
            F.lit("hex"),
        ).alias("content"),
    ).withColumn("n_bytes", F.length("content").cast("long")).withColumn(
        "mime",
        F.concat(F.col("kind"), F.lit("/x-fake")),
    )


def _decode_stub(header: bytes) -> tuple[int, int, int]:
    """STUB — real decode would use PIL/ffmpeg/soundfile (not installed in
    this container). The fake reads the synthetic 8-byte header fields so
    the pipeline has real, assertable data flow."""
    width = int.from_bytes(header[0:4], "big")
    height = int.from_bytes(header[4:8], "big")
    duration_ms = (width * 100 + height) % 10_000
    return width, height, duration_ms


def decode_media(df: DataFrame) -> DataFrame:
    """Decode stage: mapInPandas over Arrow batches of binary payloads."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            meta = pdf["content"].map(lambda b: _decode_stub(bytes(b[:8])))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"],
                    "width": meta.map(lambda m: m[0]).astype("int32"),
                    "height": meta.map(lambda m: m[1]).astype("int32"),
                    "duration_ms": meta.map(lambda m: m[2]).astype("int64"),
                    "checksum": pdf["content"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return df.mapInPandas(batches, DECODED_SCHEMA)


def extract_features(df: DataFrame) -> DataFrame:
    """Feature-extraction stage (the embedding-model stand-in): a
    deterministic hash-derived float vector per payload, Arrow-batched.
    A real model swap-in changes ONLY the inner function."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        def feat(b: bytes) -> list[float]:
            h = hashlib.sha256(bytes(b)).digest()
            v = np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
            return (v / 65535.0).tolist()

        for pdf in it:
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": pdf["content"].map(feat)}
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 32) -> DataFrame:
    """Frame-sampling stage for 'video' payloads: split the byte stream into
    fixed-size 'frames' and explode — pure Spark expressions, no Python.
    (Real frame extraction would be an ffmpeg call in the decode stub.)"""
    n_frames = F.floor(F.col("n_bytes") / every_n_bytes).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.posexplode(
                F.transform(
                    idx,
                    lambda i: F.substring(
                        F.col("content"), (i * every_n_bytes + 1).cast("int"), every_n_bytes
                    ),
                )
            ).alias("frame_no", "frame_bytes"),
        )
    )


# Magic-byte signatures at offset 0 (hex, uppercase) -> MIME type. The
# container-format cases (RIFF, ISO-BMFF) need a second probe at a fixed
# offset and are handled explicitly in sniff_mime.
_MAGIC_PREFIX = [
    ("89504E47", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("474946383761", "image/gif"),
    ("474946383961", "image/gif"),
    ("25504446", "application/pdf"),
    ("494433", "audio/mpeg"),  # ID3-tagged MP3
    ("4F676753", "audio/ogg"),
    ("664C6143", "audio/flac"),
    ("1A45DFA3", "video/webm"),  # EBML (webm/mkv)
]


def sniff_mime(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Content-sniffed MIME type from magic bytes — metadata WITHOUT a
    decode: pure JVM-side hex/substring expressions inside whole-stage
    codegen, so classifying 100 TB of payloads costs one scan and zero
    Python. The declared ``mime`` column (untrusted, upload-supplied in
    real pipelines) can then be cross-checked against ``sniffed_mime``.

    Handles prefix signatures plus the two probe-at-offset container
    formats: RIFF (bytes 8-11 distinguish WAVE vs AVI) and ISO-BMFF
    (bytes 4-7 'ftyp' => MP4 family). Unknown payloads fall back to
    application/octet-stream."""
    h = F.hex(F.col(content_col))
    expr = None
    riff = F.substring(h, 1, 8) == "52494646"
    cases = [
        (riff & (F.substring(h, 17, 8) == "57415645"), "audio/wav"),
        (riff & (F.substring(h, 17, 8) == "41564920"), "video/avi"),
        (F.substring(h, 9, 8) == "66747970", "video/mp4"),
    ] + [
        (F.substring(h, 1, len(sig)) == sig, mime) for sig, mime in _MAGIC_PREFIX
    ]
    for cond, mime in cases:
        expr = F.when(cond, mime) if expr is None else expr.when(cond, mime)
    return df.withColumn(
        "sniffed_mime", expr.otherwise("application/octet-stream")
    )

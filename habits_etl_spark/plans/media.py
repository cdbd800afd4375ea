"""Registered multimodal pipeline query: binary payloads fabricated
deterministically from the documents table drive the REAL decode /
feature-extract plumbing (multimodal/__init__.py) — Arrow-batched
mapInPandas stages, metadata filters ahead of any Python.

Rows-only by design: the pipeline's value is the mapInPandas batch shape,
which has no SQL twin; determinism (same inputs -> same features), the
REAL BMP/PNG/JPEG pixel decode (image payloads), the REAL WAV decode
(audio payloads), and the REAL MJPEG-AVI frame decode (video payloads)
are asserted in tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from habits_etl_spark.multimodal import (
    decode_media,
    extract_features,
    with_real_audio,
    with_real_images,
    with_real_video,
)
from habits_etl_spark.plans.common import query, t


@query("ext_multimodal_features")  # rows-only: mapInPandas stages, no SQL twin
def ext_multimodal_features(spark, sf_dir):
    """End-to-end multimodal pass over table input: wrap each document's
    text bytes as an opaque binary payload with typed metadata (kind,
    n_bytes, mime), swap image-kind payloads for REAL generated images —
    the container rotating 24-bit BMP / filtered+zlib PNG / baseline
    JPEG per image (multimodal.with_real_images) — audio-kind payloads
    for REAL 16-bit PCM WAVs (multimodal.with_real_audio), and
    video-kind payloads for REAL MJPEG AVIs (multimodal.with_real_video,
    frames encoded by the baseline JPEG codec), run the Arrow-batched
    decode stage — true pixel dimensions via the pure-stdlib BMP, PNG
    and JPEG parsers, true sample counts/rates via the pure-stdlib WAV
    parser, true frame dims/durations via the pure-stdlib AVI walk —
    then the feature extractor (real pixel features for images, real
    RMS/zero-crossing/energy-profile features for WAVs, real
    frame-mean pixel features for videos; hash-derived stand-in for
    undecodable payloads), and emit one row per media item with
    metadata + checksum + feature summary. No stub path remains
    anywhere in this pipeline (r8).

    Scale: payload bytes cross into Python ONLY as Arrow record batches
    inside the mapInPandas stages — all pure maps, so the op scales
    with input splits and never shuffles; the kind filter and metadata
    projections are ordinary pushed-down columns. Swapping the BMP
    parser for PIL/ffmpeg changes only the batch inner functions."""
    d = t(spark, sf_dir, "documents")
    media = with_real_video(
        with_real_audio(
        with_real_images(
            d.select(
            F.col("doc_id").alias("media_id"),
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ).alias("kind"),
            F.encode(F.col("text"), "UTF-8").alias("content"),
        )
            .withColumn("n_bytes", F.length("content").cast("long"))
            .withColumn("mime", F.concat(F.col("kind"), F.lit("/x-fake")))
        )
        )
    )
    decoded = decode_media(media).select(
        "media_id", "kind", "n_bytes", "width", "height", "codec", "checksum"
    )
    feats = extract_features(media).select(
        "media_id",
        F.round(F.element_at("feature", 1), 6).alias("f0"),
        F.round(
            F.sqrt(F.aggregate("feature", F.lit(0.0), lambda a, x: a + x * x)), 6
        ).alias("f_norm"),
    )
    return decoded.join(feats, "media_id").orderBy("media_id")

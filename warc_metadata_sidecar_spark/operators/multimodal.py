"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata (schema.MEDIA), processed with Arrow-batched pandas UDFs.

The decode step is STUBBED (image/audio libraries are not in this
container): `decode_image` raises NotImplementedError when asked for a real
decode and otherwise produces a deterministic fake feature vector from the
bytes, so the Spark-side plumbing — schema, partitioning, UDF signature,
Arrow batch shape — is real and tested end to end. Swap `_fake_decode` for
PIL/torchvision/ffmpeg calls in production; nothing else changes.

Scale notes: media bytes never pass through a join wider than needed —
callers project `substring(bytes, 1, k)` or the feature column before any
shuffle; feature extraction runs mapInPandas so one Python worker per
partition streams Arrow batches without materializing the partition.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sniffed_mime", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(data: bytes) -> list[float]:
    """Deterministic stand-in for pixel decode: 16 floats from the sha256 of
    the payload, scaled to [0,1). Replace with a real decoder in production."""
    d = hashlib.sha256(data).digest()
    return [b / 255.0 for b in d[:FEATURE_DIM]]


def decode_image(data: bytes, real: bool = False) -> list[float]:
    if real:
        raise NotImplementedError(
            "real image decode requires PIL/torchvision — not present in this "
            "container; the deterministic fake keeps the pipeline testable"
        )
    return _fake_decode(data)


def extract_media_features(media: DataFrame) -> DataFrame:
    """media table -> per-blob features via mapInPandas (Arrow batches)."""
    from warc_metadata_sidecar_spark.functions.detectors import sniff_mime

    def batches(it):
        for pdf in it:
            out = pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": [m["media_type"] if m is not None else None for m in pdf["meta"]],
                    "n_bytes": [len(b) if b is not None else 0 for b in pdf["bytes"]],
                    "sniffed_mime": [
                        sniff_mime(None, bytes(b))[1] if b is not None else None
                        for b in pdf["bytes"]
                    ],
                    "features": [
                        decode_image(bytes(b)) if b is not None else None for b in pdf["bytes"]
                    ],
                }
            )
            yield out

    return media.mapInPandas(batches, FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLUMBING: one output row per planned frame
    timestamp (native sequence explode over duration metadata). The actual
    frame grab is the stubbed decode; the row fan-out, schema, and
    partitioning are the real thing."""
    frames = F.explode(
        F.sequence(
            F.lit(0),
            F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
            F.lit(every_ms),
        )
    )
    return media.filter(F.col("meta.media_type") == "video").select(
        "media_ref", frames.alias("frame_ms")
    )


def media_span_features(documents: DataFrame, media: DataFrame) -> DataFrame:
    """Join documents' media spans to blob features: (doc_id, media_ref,
    offset, sniffed_mime, features). Projection before the shuffle keeps the
    exchange narrow (features, not bytes)."""
    spans = documents.select(
        "doc_id", F.explode("spans").alias("s")
    ).filter(F.col("s.kind") == "media").select(
        "doc_id", F.col("s.media_ref").alias("media_ref"), F.col("s.offset").alias("offset")
    )
    features = extract_media_features(media).select("media_ref", "sniffed_mime", "features")
    return spans.join(features, "media_ref", "left")

"""Multimodal (image/audio/video) column operators: binary blobs + typed metadata.

Beyond the reference (it has no media types; nearest niche is varbinary +
digest functions, VarbinaryFunctions.java:37). A training pipeline treats
media as opaque ``binary`` columns with a typed metadata struct; decode /
feature-extract run as Arrow-batched ``mapInPandas`` stages so the bytes
never round-trip through Python row objects.

Codec reality: image/audio libraries are not in this container, so the
actual decoders are STUBS — ``decode_image``/``decode_audio`` raise
NotImplementedError unless ``codec="fake"`` selects the deterministic test
codec (byte-stats features). The Spark-side plumbing — schema, Arrow batch
iteration, partition-parallel execution, output contract — is real and
tested; swapping a stub for Pillow/librosa changes one function body.

Scale notes: mapInPandas streams Arrow batches (no collect, no per-row
Python); blobs stay partition-local (the only shuffle in the demo pipeline
is the final per-source aggregation of small feature rows).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# The media-row contract: one blob + typed metadata, media kind discriminated.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("blob", BinaryType()),
        StructField("source", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("source", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_mean", DoubleType()),
        StructField("byte_entropy_proxy", DoubleType()),
        StructField("header_hex", StringType()),
    ]
)


def decode_image(blob: bytes, codec: str = "real") -> dict:
    """Decode an image blob to features. STUB: no imaging libs in-container."""
    if codec == "fake":
        return _fake_decode(blob)
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "environment; use codec='fake' for the deterministic test codec"
    )


def decode_audio(blob: bytes, codec: str = "real") -> dict:
    """Decode an audio blob to features. STUB: no audio libs in-container."""
    if codec == "fake":
        return _fake_decode(blob)
    raise NotImplementedError(
        "audio decoding requires an audio library not present in this "
        "environment; use codec='fake' for the deterministic test codec"
    )


def _fake_decode(blob: bytes) -> dict:
    """Deterministic byte-stats 'decoder' exercising the full data path."""
    if not blob:
        return {"n_bytes": 0, "byte_mean": 0.0, "byte_entropy_proxy": 0.0, "header_hex": ""}
    n = len(blob)
    mean = sum(blob) / n
    distinct = len(set(blob))
    # No rounding: sum-of-ints / n and distinct/256 are computed identically
    # in any engine (exact integer sums, one double division) — and rounding
    # half-even vs half-away diverges exactly on the dyadic boundaries these
    # ratios love to hit (e.g. 18/256 = 0.0703125).
    return {
        "n_bytes": n,
        "byte_mean": mean,
        "byte_entropy_proxy": distinct / 256.0,
        "header_hex": blob[:8].hex(),
    }


def extract_features(media: DataFrame, codec: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over a media DataFrame.

    mapInPandas contract: an iterator of input pandas batches -> iterator of
    output batches; Spark handles partition parallelism and Arrow transfer.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoders = {"image": decode_image, "audio": decode_audio, "video": decode_audio}
        for pdf in it:
            feats = []
            for mid, kind, blob, source in zip(
                pdf["media_id"], pdf["kind"], pdf["blob"], pdf["source"]
            ):
                d = decoders.get(kind, decode_image)(bytes(blob or b""), codec=codec)
                feats.append(
                    {"media_id": mid, "kind": kind, "source": source, **d}
                )
            yield pd.DataFrame(feats, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Demo media table: document text bytes as opaque blobs (fixture has no
    real media; the blob column is genuinely binary so the pipeline is
    schema-faithful)."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode("text", "UTF-8").cast(BinaryType()).alias("blob"),
        F.col("source"),
    )

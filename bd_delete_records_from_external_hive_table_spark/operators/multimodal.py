"""Multimodal (image/audio/video) column handling for training-data
pipelines: opaque ``binary`` payloads + typed metadata, processed with
Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes — is real and tested. The actual media decoding is STUBBED: this
container ships no image/audio libraries, so ``decode=`` accepts either
``"fake"`` (deterministic md5-derived features, for pipeline tests) or a
user-supplied callable; ``"real"`` raises ``NotImplementedError`` at the
call site where PIL/librosa/ffmpeg decoding would plug in.

Scale notes: payloads stay in executor memory only for the lifetime of an
Arrow batch (``maxRecordsPerBatch`` bounds it); features are small arrays.
Repartition by a key (not payload) before heavy extraction so skewed media
sizes spread across executors.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, LongType, MapType, StringType,
    StructField, StructType,
)

__all__ = ["MEDIA_SCHEMA", "synthetic_media", "extract_features",
           "sample_frames", "fake_feature_vector"]

#: Canonical multimodal row: id, modality tag, opaque payload, metadata.
MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("modality", StringType()),      # image | audio | video
    StructField("payload", BinaryType()),
    StructField("meta", MapType(StringType(), StringType())),
])


def synthetic_media(spark: SparkSession, n: int = 64,
                    payload_bytes: int = 256) -> DataFrame:
    """Deterministic fake corpus: payload = repeated md5 bytes of the id —
    reproducible across runs/engines, no RNG."""
    # build in hex space, unhex once at the end — string functions applied
    # directly to binary would silently cast through (invalid) UTF-8
    reps = payload_bytes // 16 + 1
    payload_hex = F.substring(
        F.repeat(F.md5(F.col("id").cast("string")), reps),
        1, payload_bytes * 2)
    return (spark.range(n)
            .select(F.col("id").alias("media_id"),
                    F.element_at(
                        F.array(F.lit("image"), F.lit("audio"),
                                F.lit("video")),
                        (F.col("id") % 3 + 1).cast("int")).alias("modality"),
                    F.unhex(payload_hex).alias("payload"),
                    F.create_map(
                        F.lit("width"), F.lit("64"),
                        F.lit("height"), F.lit("64"),
                        F.lit("codec"), F.lit("fake")).alias("meta")))


def fake_feature_vector(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic 'features': md5-seeded bytes scaled to [0, 1)."""
    raw = b""
    seed = payload or b""
    while len(raw) < dim:
        seed = hashlib.md5(seed).digest()
        raw += seed
    return np.frombuffer(raw[:dim], dtype=np.uint8).astype(np.float32) / 256.0


def extract_features(df: DataFrame, dim: int = 8,
                     decode: str | Callable[[bytes], np.ndarray] = "fake",
                     ) -> DataFrame:
    """(media_id, modality, features: array<float>) via mapInPandas.

    ``decode="real"`` marks where an actual decoder (PIL/torchvision/
    librosa) would be injected — not available in this environment."""
    if decode == "real":
        raise NotImplementedError(
            "real media decoding needs image/audio libraries not present "
            "in this environment; pass decode='fake' or a callable")
    decoder = fake_feature_vector if decode == "fake" else decode

    out_schema = StructType([
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("features", ArrayType(FloatType())),
    ])

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:  # one Arrow batch at a time — bounded memory
            feats = [decoder(p, dim).tolist() if callable(decoder)
                     else decoder(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "features": feats,
            })

    return df.mapInPandas(extract, out_schema)


def sample_frames(df: DataFrame, frame_bytes: int = 32,
                  every_n: int = 2) -> DataFrame:
    """Video frame sampling stub: split the payload into fixed-size
    'frames', keep every n-th — exploded to one row per sampled frame.
    Pure JVM expressions (no Python): the payload slicing pattern a real
    frame sampler would follow after ffmpeg demux."""
    # slice in hex space (2 chars/byte) to stay in valid strings, then
    # unhex each frame back to binary
    hexp = F.hex(F.col("payload"))
    n_frames = F.floor(F.length("payload") / frame_bytes).cast("int")
    idx = F.filter(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: i % every_n == 0)
    frame = F.transform(
        idx, lambda i: F.struct(
            i.alias("frame_idx"),
            F.unhex(F.substring(hexp, i * (frame_bytes * 2) + 1,
                                frame_bytes * 2)).alias("frame")))
    # a payload with zero complete frames emits no rows (explode of an
    # empty array), never a truncated partial frame
    return (df.where((F.col("modality") == "video") & (n_frames > 0))
            .select("media_id", F.explode(frame).alias("f"))
            .select("media_id", "f.frame_idx", "f.frame"))

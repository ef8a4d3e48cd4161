"""Multimodal (image/audio/video) column handling for training-data
pipelines: opaque ``binary`` payloads + typed metadata, processed with
Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes — is real and tested. ``decode=`` accepts ``"fake"``
(deterministic md5-derived features, for pipeline tests), ``"real"``
(pure-Python PPM/WAV decoding via :mod:`.media_codecs` — actual pixels
and PCM samples in, statistics out), or a user-supplied
``(payload, dim) -> np.ndarray`` callable, which is where PIL/librosa/
ffmpeg decoders plug in for formats this container's library set can't
parse.

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

__all__ = ["MEDIA_SCHEMA", "AUDIO_QA_SCHEMA", "IMAGE_QA_SCHEMA",
           "synthetic_media", "synthetic_real_media", "synthetic_audio",
           "audio_quality_stats", "synthetic_images_qa",
           "image_quality_stats", "ingest_binary_dir",
           "extract_features", "sample_frames", "fake_feature_vector",
           "synthetic_image_corpus", "average_hash_64"]

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
    return (spark.range(0, n, 1, max(1, min(32, n // 32)))
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


def synthetic_real_media(spark: SparkSession, n: int = 48) -> DataFrame:
    """Corpus of VALID media payloads (PPM images / PCM16 WAV audio)
    built with the pure-Python encoders in :mod:`.media_codecs` —
    decodable by the real-decode path, deterministic per id, generated
    executor-side in Arrow batches (no driver materialization)."""
    from .media_codecs import encode_ppm, encode_wav

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "modality": [], "payload": [], "meta": []}
            for i in pdf["id"]:
                i = int(i)
                if i % 2 == 0:
                    px = ((np.arange(8 * 8 * 3, dtype=np.int64) * (i + 3))
                          % 256).reshape(8, 8, 3).astype(np.uint8)
                    payload, mod, codec = encode_ppm(px), "image", "ppm"
                else:
                    t = np.arange(160) / 160.0
                    s = (0.5 * np.sin(2 * np.pi * (i + 1) * t)) \
                        .astype(np.float32)
                    payload, mod, codec = encode_wav(s), "audio", "wav"
                out["media_id"].append(i)
                out["modality"].append(mod)
                out["payload"].append(payload)
                out["meta"].append({"codec": codec})
            yield pd.DataFrame(out)

    # bound the partition count: spark.range defaults to one partition
    # per core, and 32 one-row partitions cost 32 Arrow worker round
    # trips PER mapInPandas stage — pure overhead for a small corpus.
    # ~8 rows per partition keeps the default 48-image corpus spread
    # over 6 workers (the Python decode is the expensive part worth
    # parallelizing) while still capping round trips at 32. Real
    # corpora size their partitions by data volume instead.
    n_parts = max(1, min(32, n // 8))
    return spark.range(0, n, 1, n_parts).mapInPandas(gen, MEDIA_SCHEMA)


def synthetic_audio(spark: SparkSession, n: int = 48) -> DataFrame:
    """Audio-only corpus of VALID PCM16 WAV payloads with DETERMINISTIC
    planted quality defects, for the audio-QA rung of the pipeline
    (:func:`audio_quality_stats`): every 7th clip is driven past full
    scale (amp 1.2 → the encoder hard-clips, so the decoded PCM pins at
    ±32767) and every remaining 11th clip is near-silent (amp 0.004).
    All other clips are clean 0.5-amplitude sines. The planted
    populations make the QA report's counts provable at every corpus
    size — the same planted-ground-truth pattern as t20's PII scan."""
    from .media_codecs import encode_wav

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "modality": [], "payload": [], "meta": []}
            for i in pdf["id"]:
                i = int(i)
                if i % 7 == 0:
                    amp, kind = 1.2, "clipped"
                elif i % 11 == 0:
                    amp, kind = 0.004, "silent"
                else:
                    amp, kind = 0.5, "clean"
                t = np.arange(160) / 160.0
                s = (amp * np.sin(2 * np.pi * ((i % 13) + 1) * t)) \
                    .astype(np.float64)
                out["media_id"].append(i)
                out["modality"].append("audio")
                out["payload"].append(encode_wav(s))
                out["meta"].append({"codec": "wav", "planted": kind})
            yield pd.DataFrame(out)

    n_parts = max(1, min(32, n // 8))
    return spark.range(0, n, 1, n_parts).mapInPandas(gen, MEDIA_SCHEMA)


def synthetic_images_qa(spark: SparkSession, n: int = 48) -> DataFrame:
    """Image-only corpus of VALID PPM payloads with DETERMINISTIC planted
    quality defects for :func:`image_quality_stats`: every 5th image is
    a solid color (zero contrast — the blank/placeholder asset a crawl
    drags in), every remaining 9th is overexposed (≥80% of pixels at
    250+), the rest are banded gradients. Planted populations make the
    QA report's counts provable at every corpus size."""
    from .media_codecs import encode_ppm

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "modality": [], "payload": [], "meta": []}
            for i in pdf["id"]:
                i = int(i)
                if i % 5 == 0:
                    px = np.full((8, 8, 3), (i * 37) % 200,
                                 dtype=np.uint8)
                    kind = "solid"
                elif i % 9 == 0:
                    px = np.full((8, 8, 3), 252, dtype=np.uint8)
                    px[0, 0] = (10, 20, 30)  # one dark pixel: not solid
                    kind = "overexposed"
                else:
                    ramp = ((np.arange(8 * 8 * 3, dtype=np.int64)
                             * (i + 7)) % 200).reshape(8, 8, 3)
                    px = ramp.astype(np.uint8)
                    kind = "clean"
                out["media_id"].append(i)
                out["modality"].append("image")
                out["payload"].append(encode_ppm(px))
                out["meta"].append({"codec": "ppm", "planted": kind})
            yield pd.DataFrame(out)

    n_parts = max(1, min(32, n // 8))
    return spark.range(0, n, 1, n_parts).mapInPandas(gen, MEDIA_SCHEMA)


#: per-image QA row emitted by image_quality_stats.
IMAGE_QA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("n_pixels", LongType()),
    StructField("mean_brightness", FloatType()),
    StructField("contrast", FloatType()),
    StructField("overexp_frac", FloatType()),
    StructField("is_solid", LongType()),
    StructField("is_overexposed", LongType()),
])


def image_quality_stats(media: DataFrame,
                        overexp_level: int = 250,
                        overexp_frac: float = 0.8) -> DataFrame:
    """Per-image quality metrics from REAL PPM decode: pixel count, mean
    brightness, contrast (grayscale std), overexposed-pixel fraction and
    the solid-color / overexposed verdicts — the pre-training image QA
    pass that drops blank placeholders and blown-out frames before
    feature extraction. Solid-color detection is EXACT (max == min over
    raw integer pixel values); overexposure thresholds on integer pixel
    counts. Same Arrow shape as audio_quality_stats: one Python call
    per batch, 7 scalars per image leave Python. Non-image /
    undecodable payloads are dropped (m03 owns decode-error
    accounting)."""
    from .media_codecs import decode_ppm

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in IMAGE_QA_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    px = decode_ppm(bytes(payload))
                except Exception:
                    continue
                flat = px.astype(np.int64)
                gray = flat.mean(axis=2)
                n = int(gray.size)
                over = float((gray >= overexp_level).mean()) if n else 0.0
                out["media_id"].append(int(mid))
                out["n_pixels"].append(n)
                out["mean_brightness"].append(float(gray.mean()))
                out["contrast"].append(float(gray.std()))
                out["overexp_frac"].append(over)
                out["is_solid"].append(
                    int(flat.max() == flat.min()))
                out["is_overexposed"].append(int(over >= overexp_frac))
            yield pd.DataFrame(out)

    return (media.where(F.col("modality") == "image")
            .select("media_id", "payload")
            .mapInPandas(stats, IMAGE_QA_SCHEMA))


#: per-clip audio QA row emitted by audio_quality_stats.
AUDIO_QA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("n_samples", LongType()),
    StructField("rms", FloatType()),
    StructField("peak", FloatType()),
    StructField("clip_frac", FloatType()),
    StructField("is_clipped", LongType()),
    StructField("is_silent", LongType()),
])


def audio_quality_stats(media: DataFrame,
                        clip_level: int = 32767,
                        silence_rms: float = 0.01) -> DataFrame:
    """Per-clip audio quality metrics from REAL WAV decode: sample count,
    RMS loudness, absolute peak (in [0, 1] full-scale units), fraction
    of samples pinned at the PCM16 clip level, and the derived
    clipped/silent verdicts — the pre-training QA pass that drops
    unusable audio before feature extraction.

    Scale shape: mapInPandas decode, one Python call per Arrow batch;
    only 7 scalar stats per clip leave Python (the payload itself never
    re-serializes). Clipping is detected in the INTEGER PCM domain
    (|pcm| == clip_level) — an exact test immune to float round-trips;
    silence is an RMS floor in full-scale units. Non-audio / undecodable
    payloads are dropped (audio QA, not format validation — m03 owns
    decode-error accounting)."""
    from .media_codecs import decode_wav

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in AUDIO_QA_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    samples, _rate = decode_wav(bytes(payload))
                except Exception:
                    continue
                # decode_wav returns float32 = int16 / 32768 — ×32768
                # reconstructs the original PCM integers EXACTLY (every
                # int16/32768 is a dyadic rational, representable in
                # float32), so the clip test runs in the integer domain
                pcm = np.round(np.asarray(samples, dtype=np.float64)
                               * 32768.0).astype(np.int64)
                x = pcm.astype(np.float64) / 32768.0
                n = int(x.size)
                rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
                peak = float(np.max(np.abs(x))) if n else 0.0
                clip = float(np.mean(np.abs(pcm) >= clip_level)) if n \
                    else 0.0
                out["media_id"].append(int(mid))
                out["n_samples"].append(n)
                out["rms"].append(rms)
                out["peak"].append(peak)
                out["clip_frac"].append(clip)
                out["is_clipped"].append(int(clip > 0.0))
                out["is_silent"].append(int(rms < silence_rms))
            yield pd.DataFrame(out)

    return (media.where(F.col("modality") == "audio")
            .select("media_id", "payload")
            .mapInPandas(stats, AUDIO_QA_SCHEMA))


#: file-extension -> modality tag for the binaryFile ingest path.
_EXT_MODALITY = {"ppm": "image", "png": "image", "jpg": "image",
                 "jpeg": "image", "wav": "audio", "mp3": "audio",
                 "mp4": "video", "mkv": "video"}


def ingest_binary_dir(spark: SparkSession, path: str,
                      glob: str | None = None) -> DataFrame:
    """Ingest a directory of media FILES into the canonical MEDIA_SCHEMA
    via Spark's built-in ``binaryFile`` source — the real on-disk entry
    point of a multimodal pipeline (an object-store bucket of images /
    audio clips), where :func:`synthetic_media` is the in-memory one.

    binaryFile is distributed and lazy: each executor reads only its own
    split's files, `pathGlobFilter` prunes at listing time, and the
    (path, modificationTime, length, content) schema means predicates on
    length/path are evaluated without touching payload bytes. media_id
    is the 63-bit xxhash of the file path — stable across relistings,
    join-able with feature/caption tables downstream. At 100 TB the
    listing parallelizes over the driver's listing threads and payloads
    stream through the scan one file per row — no file ever lands on the
    driver."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    modality_map = F.create_map(
        *[F.lit(x) for kv in _EXT_MODALITY.items() for x in kv])
    return df.select(
        # mask the sign bit rather than abs(): abs(Long.MIN_VALUE) stays
        # negative in non-ANSI long math, and abs-folding +h/-h doubles
        # the collision rate of a join-key id
        F.xxhash64("path").bitwiseAND(F.lit(0x7FFFFFFFFFFFFFFF))
        .alias("media_id"),
        F.coalesce(modality_map[ext], F.lit("unknown")).alias("modality"),
        F.col("content").alias("payload"),
        F.create_map(
            F.lit("path"), F.col("path"),
            F.lit("bytes"), F.col("length").cast("string"),
            F.lit("codec"), ext).alias("meta"))


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

    ``decode="real"`` decodes actual media bytes with the pure-Python
    codecs in :mod:`.media_codecs` (PPM images, PCM16 WAV audio) — the
    genuinely end-to-end path. Richer formats (JPEG/MP3/MP4) need
    PIL/librosa/ffmpeg, absent in this environment; injecting them later
    means passing a callable here — the Spark-side plumbing is
    format-agnostic."""
    if decode == "real":
        from .media_codecs import real_feature_vector
        decoder: Callable = real_feature_vector
    elif decode == "fake":
        decoder = fake_feature_vector
    else:
        decoder = decode

    out_schema = StructType([
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("features", ArrayType(FloatType())),
    ])

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:  # one Arrow batch at a time — bounded memory
            feats = [decoder(p, dim).tolist() for p in pdf["payload"]]
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


# ---------------------------------------------------------------------------
# Perceptual hashing (image near-dup through the binary pipeline)
# ---------------------------------------------------------------------------

def synthetic_image_corpus(spark: SparkSession, n: int = 60,
                           dup_every: int = 6) -> DataFrame:
    """Deterministic 16x16 RGB PPM corpus with PLANTED near-duplicates:
    base image ``i`` is an md5-derived 8x8 block pattern upsampled 2x
    (so distinct ids are ~independent 64-bit patterns — expected
    perceptual-hash hamming ~32), and every ``dup_every``-th id also
    emits a copy under ``id + 100000`` with <=6 single-pixel nudges —
    each nudge moves ONE 2x2 block mean, so the copy's average-hash is
    provably within hamming 6 of its original. Executor-side generation
    in Arrow batches, no RNG (md5 of the id), no driver materialization.
    """
    from .media_codecs import encode_ppm

    def _pixels(i: int) -> np.ndarray:
        blocks = b"".join(hashlib.md5(b"img-%d-%d" % (i, k)).digest()
                          for k in range(4))           # 64 block values
        b8 = np.frombuffer(blocks, dtype=np.uint8).reshape(8, 8)
        gray = np.kron(b8, np.ones((2, 2), dtype=np.uint8))  # 16x16
        return np.repeat(gray[:, :, None], 3, axis=2)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "modality": [], "payload": [], "meta": []}

            def emit(mid: int, px: np.ndarray, kind: str) -> None:
                out["media_id"].append(mid)
                out["modality"].append("image")
                out["payload"].append(encode_ppm(px))
                out["meta"].append({"codec": "ppm", "kind": kind})

            for i in pdf["id"]:
                i = int(i)
                px = _pixels(i)
                emit(i, px, "base")
                if i % dup_every == 0:
                    noisy = px.copy()
                    pos = hashlib.md5(b"noise-%d" % i).digest()
                    for k in range(6):  # <=6 pixels → <=6 blocks touched
                        y, x = pos[2 * k] % 16, pos[2 * k + 1] % 16
                        noisy[y, x] = np.clip(
                            noisy[y, x].astype(np.int16) + 7, 0, 255
                        ).astype(np.uint8)
                    emit(i + 100000, noisy, "near_dup")
            yield pd.DataFrame(out)

    n_parts = max(1, min(32, n // 32))
    return spark.range(0, n, 1, n_parts).mapInPandas(gen, MEDIA_SCHEMA)


def average_hash_64(df: DataFrame, payload_col: str = "payload",
                    id_col: str = "media_id") -> DataFrame:
    """aHash: decode PPM → grayscale → 8x8 block means → 64-bit
    signature (bit k = block k brighter than the image's mean block).
    The canonical perceptual image fingerprint (robust to small pixel
    noise, recompression, brightness-preserving edits), computed inside
    the same Arrow ``mapInPandas`` plumbing as feature extraction: one
    linear decode pass, 8 bytes out per image — the signature, not the
    payload, is what shuffles in any downstream pair search."""
    from .media_codecs import decode_ppm

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sigs = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                px = decode_ppm(bytes(payload)).astype(np.float64)
                gray = px.mean(axis=2)
                h, w = gray.shape
                by, bx = h // 8, w // 8
                blocks = gray[:by * 8, :bx * 8] \
                    .reshape(8, by, 8, bx).mean(axis=(1, 3))
                bits = (blocks > blocks.mean()).astype(np.uint64).ravel()
                sig = int((bits << np.arange(64, dtype=np.uint64)).sum())
                # keep the top bit out of the sign: Spark longs are
                # signed and a negative sig breaks shiftright chunking
                ids.append(int(mid))
                sigs.append(sig & 0x7FFFFFFFFFFFFFFF)
            yield pd.DataFrame({id_col: ids, "sig": sigs})

    return df.mapInPandas(hash_batch, f"{id_col} long, sig long")

"""Multimodal plumbing tests: schema, Arrow-batched mapInPandas shapes,
deterministic fake decode, frame sampling, and the REAL decode path
(pure-Python PPM/WAV codecs end-to-end through mapInPandas)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bd_delete_records_from_external_hive_table_spark.operators import media_codecs as mc
from bd_delete_records_from_external_hive_table_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synthetic_media(spark, n=30, payload_bytes=256).cache()


def test_synthetic_media_schema_and_determinism(spark, media):
    assert media.schema.simpleString() == mm.MEDIA_SCHEMA.simpleString()
    assert media.count() == 30
    again = mm.synthetic_media(spark, n=30, payload_bytes=256)
    a = {r.media_id: bytes(r.payload) for r in media.collect()}
    b = {r.media_id: bytes(r.payload) for r in again.collect()}
    assert a == b
    assert all(len(p) == 256 for p in a.values())


def test_extract_features_fake(media):
    feats = mm.extract_features(media, dim=8).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r.features) == 8
        assert all(0.0 <= x < 1.0 for x in r.features)
    # deterministic across runs
    again = mm.extract_features(media, dim=8).collect()
    assert {r.media_id: tuple(r.features) for r in feats} == \
           {r.media_id: tuple(r.features) for r in again}


def test_extract_features_custom_decoder(media):
    import numpy as np

    def ones(payload: bytes, dim: int = 4) -> np.ndarray:
        return np.full(4, float(len(payload)), dtype=np.float32)

    out = mm.extract_features(media, dim=4, decode=lambda p, d=4: ones(p))
    assert out.first().features == [256.0] * 4


def _ppm_pixels(i: int) -> np.ndarray:
    """Deterministic 8x8 RGB gradient, distinct per id."""
    base = (np.arange(8 * 8 * 3, dtype=np.int64) * (i + 3)) % 256
    return base.reshape(8, 8, 3).astype(np.uint8)


def _wav_samples(i: int) -> np.ndarray:
    t = np.arange(160) / 160.0
    return (0.5 * np.sin(2 * np.pi * (i + 1) * t)).astype(np.float32)


def test_ppm_roundtrip():
    px = _ppm_pixels(5)
    assert np.array_equal(mc.decode_ppm(mc.encode_ppm(px)), px)
    # header with comment + arbitrary whitespace parses too
    manual = b"P6 # comment\n# another\n 8\t8\n255\n" + px.tobytes()
    assert np.array_equal(mc.decode_ppm(manual), px)
    with pytest.raises(ValueError):
        mc.decode_ppm(b"P5\n8 8\n255\n" + px.tobytes())


def test_wav_roundtrip():
    s = _wav_samples(2)
    decoded, rate = mc.decode_wav(mc.encode_wav(s, 8000))
    assert rate == 8000
    assert decoded.shape == s.shape
    assert np.abs(decoded - s).max() < 1e-3  # 16-bit quantization only
    with pytest.raises(ValueError):
        mc.decode_wav(b"RIFFxxxxNOPE")


def test_extract_features_real_end_to_end(spark):
    """decode='real' pushes actual PPM/WAV bytes through the same
    Arrow-batched mapInPandas plumbing and returns pixel/sample
    statistics that match a driver-side computation exactly."""
    rows = []
    for i in range(6):
        if i % 2 == 0:
            rows.append((i, "image", bytearray(mc.encode_ppm(_ppm_pixels(i))),
                         {"codec": "ppm"}))
        else:
            rows.append((i, "audio", bytearray(mc.encode_wav(_wav_samples(i))),
                         {"codec": "wav"}))
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r.media_id: np.array(r.features, dtype=np.float32)
           for r in mm.extract_features(df, dim=8, decode="real").collect()}
    assert len(got) == 6
    for i, _, payload, _ in rows:
        want = mc.real_feature_vector(bytes(payload), 8)
        assert np.allclose(got[i], want, atol=1e-6), i
    # image features: channel means land in [0,1] and are non-trivial
    img = got[0]
    assert img[:6].max() > 0.0
    # audio features: RMS of a 0.5-amplitude sine ~ 0.35
    aud = got[1]
    assert 0.2 < aud[1] < 0.5


def test_real_decode_rejects_unknown_format(spark):
    df = spark.createDataFrame(
        [(0, "image", bytearray(b"\x00\x01garbage"), {})], mm.MEDIA_SCHEMA)
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException
    with pytest.raises((PythonException, Py4JJavaError)):
        mm.extract_features(df, dim=8, decode="real").collect()


def test_sample_frames(media):
    frames = mm.sample_frames(media, frame_bytes=32, every_n=2)
    rows = frames.collect()
    vids = media.where(F.col("modality") == "video").count()
    # 256/32 = 8 frames, every 2nd → 4 per video
    assert len(rows) == vids * 4
    assert all(len(bytes(r.frame)) == 32 for r in rows)
    assert all(r.frame_idx % 2 == 0 for r in rows)


def test_ingest_binary_dir_end_to_end(spark, tmp_path):
    """Real on-disk files -> binaryFile scan -> MEDIA_SCHEMA -> real
    decode: the full multimodal ingestion path with zero synthetic
    DataFrames."""
    px = (np.arange(4 * 4 * 3, dtype=np.int64) * 7 % 256) \
        .reshape(4, 4, 3).astype(np.uint8)
    (tmp_path / "a.ppm").write_bytes(mc.encode_ppm(px))
    t = np.arange(80) / 80.0
    wav = mc.encode_wav((0.5 * np.sin(2 * np.pi * 5 * t)).astype(np.float32))
    (tmp_path / "b.wav").write_bytes(wav)
    (tmp_path / "notes.txt").write_bytes(b"not media")

    df = mm.ingest_binary_dir(spark, str(tmp_path), glob="*.{ppm,wav}")
    rows = {r.meta["codec"]: r for r in df.collect()}
    assert set(rows) == {"ppm", "wav"}          # txt pruned at listing
    assert rows["ppm"].modality == "image"
    assert rows["wav"].modality == "audio"
    assert bytes(rows["ppm"].payload) == mc.encode_ppm(px)
    assert int(rows["wav"].meta["bytes"]) == len(wav)
    assert all(r.media_id >= 0 for r in rows.values())

    feats = {r.modality: r.features
             for r in mm.extract_features(df, dim=8, decode="real").collect()}
    want_img = mc.real_feature_vector(mc.encode_ppm(px), 8)
    assert np.allclose(feats["image"], want_img, atol=1e-6)
    assert 0.2 < feats["audio"][1] < 0.5        # RMS of 0.5-amp sine


def test_ingest_binary_dir_no_glob_tags_unknown(spark, tmp_path):
    (tmp_path / "x.bin").write_bytes(b"\x00\x01\x02")
    df = mm.ingest_binary_dir(spark, str(tmp_path))
    [r] = df.collect()
    assert r.modality == "unknown"
    assert bytes(r.payload) == b"\x00\x01\x02"


# ---------------------------------------------------------------------------
# Perceptual hashing + banded hamming pair search
# ---------------------------------------------------------------------------

def test_image_phash_neardup_exact_recall_and_precision(spark):
    """Every planted noisy copy pairs with its original (<=6 hamming by
    construction) and NO cross-image pair appears (md5-derived patterns
    sit at expected hamming ~32, far above the threshold)."""
    from bd_delete_records_from_external_hive_table_spark.operators.dedup import banded_hamming_pairs
    corpus = mm.synthetic_image_corpus(spark, n=48, dup_every=6)
    sigs = mm.average_hash_64(corpus)
    pairs = {(r.a, r.b): r.hamming
             for r in banded_hamming_pairs(
                 sigs, id_col="media_id", sig_col="sig",
                 bits=63, max_hamming=6, chunks=7).collect()}
    planted = {(i, i + 100000) for i in range(0, 48, 6)}
    assert set(pairs) == planted
    assert all(h <= 6 for h in pairs.values())


def test_banded_hamming_pairs_matches_bruteforce_popcount(spark):
    """Pigeonhole exhaustiveness on random 63-bit signatures: the banded
    join must find EXACTLY the pairs a brute-force popcount finds."""
    import random as _random

    from bd_delete_records_from_external_hive_table_spark.operators.dedup import banded_hamming_pairs
    rng = _random.Random(99)
    base = [rng.getrandbits(63) for _ in range(30)]
    sigs = list(enumerate(base))
    # plant close variants: flip 1-6 random bits of earlier signatures
    for j, s in enumerate(base[:10]):
        flipped = s
        for _ in range(rng.randrange(1, 7)):
            flipped ^= 1 << rng.randrange(63)
        sigs.append((100 + j, flipped))
    expect = {}
    for i, (ai, asig) in enumerate(sigs):
        for bi, bsig in sigs[i + 1:]:
            h = bin(asig ^ bsig).count("1")
            if h <= 6:
                a, b = min(ai, bi), max(ai, bi)
                expect[(a, b)] = h
    df = spark.createDataFrame(sigs, "media_id long, sig long")
    got = {(r.a, r.b): r.hamming
           for r in banded_hamming_pairs(
               df, id_col="media_id", sig_col="sig",
               bits=63, max_hamming=6, chunks=7).collect()}
    assert got == expect
    assert expect  # the planted variants guarantee a non-trivial set

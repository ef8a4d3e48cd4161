"""Multimodal plumbing tests: schema, Arrow-batched mapInPandas shapes,
deterministic fake decode, frame sampling, and the real-decode stub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


def test_real_decode_is_explicit_stub(media):
    with pytest.raises(NotImplementedError):
        mm.extract_features(media, decode="real")


def test_sample_frames(media):
    frames = mm.sample_frames(media, frame_bytes=32, every_n=2)
    rows = frames.collect()
    vids = media.where(F.col("modality") == "video").count()
    # 256/32 = 8 frames, every 2nd → 4 per video
    assert len(rows) == vids * 4
    assert all(len(bytes(r.frame)) == 32 for r in rows)
    assert all(r.frame_idx % 2 == 0 for r in rows)

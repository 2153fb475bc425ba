"""Multimodal plumbing: schema/batch shape real, decode stubbed."""

import pytest
from pyspark.sql import functions as F

from aml_entity_resolution_assignment_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("m1", "image", b"\x89PNG-fake-bytes" * 20, "image/png", 64, 48, None),
        ("m2", "image", b"\xff\xd8jpeg-fake" * 50, "image/jpeg", 128, 128, None),
        ("m3", "video", b"\x00\x00ftyp-fake" * 100, "video/mp4", 320, 240, 4500),
        ("m4", "image", None, "image/png", 0, 0, None),
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA).cache()


def test_extract_features_shapes(media):
    out = M.extract_media_features(media).collect()
    rows = {r["media_id"]: r for r in out}
    assert len(rows) == 4
    for mid, r in rows.items():
        assert len(r["feature"]) == M.FEATURE_DIM
    assert rows["m4"]["n_bytes"] == 0
    assert sum(rows["m1"]["feature"]) == pytest.approx(1.0, abs=1e-6)


def test_extract_features_deterministic(media):
    a = {r["media_id"]: list(r["feature"]) for r in M.extract_media_features(media).collect()}
    b = {
        r["media_id"]: list(r["feature"])
        for r in M.extract_media_features(media.repartition(4)).collect()
    }
    assert a == b


def test_real_decode_is_marked_not_implemented():
    with pytest.raises(NotImplementedError):
        M._decode_image(b"bytes")


def test_sample_frames(media):
    frames = M.sample_frames(media, every_ms=1000).collect()
    got = sorted((r["media_id"], r["frame_ts_ms"]) for r in frames)
    assert got == [("m3", 0), ("m3", 1000), ("m3", 2000), ("m3", 3000), ("m3", 4000)]


def test_media_stats(media):
    stats = {r["media_id"]: r for r in M.attach_media_stats(media).collect()}
    assert stats["m1"]["n_pixels"] == 64 * 48
    assert stats["m1"]["aspect_ratio"] == pytest.approx(64 / 48)
    assert stats["m4"]["aspect_ratio"] is None

"""MJPEG-AVI codec (functions/avi.py): container roundtrips through
real JPEG bitstreams, fps metadata, corruption handling, and the
multimodal video feature path."""

import numpy as np
import pytest

from aml_entity_resolution_assignment_spark.functions.avi import (
    decode_mjpeg_avi,
    encode_gray_video,
    encode_mjpeg_avi,
)
from aml_entity_resolution_assignment_spark.operators.multimodal import (
    _video_feature,
)


def _const_frames(values, h=16, w=16):
    return np.stack(
        [np.full((h, w), v, dtype=np.uint8) for v in values]
    )


def test_constant_frames_roundtrip_bit_exact():
    """Constant 8x8 blocks survive the all-ones-quant baseline JPEG
    encoder bit-exactly, so the whole video path is exact."""
    vals = [0, 97, 128, 255]
    payload = encode_gray_video(_const_frames(vals), fps=10)
    frames, fps = decode_mjpeg_avi(payload)
    assert frames.shape == (4, 16, 16)
    assert fps == 10.0
    for i, v in enumerate(vals):
        assert (frames[i] == v).all()


def test_textured_frames_decode_close():
    rng = np.random.default_rng(3)
    src = rng.integers(0, 256, (3, 16, 16), dtype=np.uint8)
    frames, _ = decode_mjpeg_avi(encode_gray_video(src))
    assert frames.shape == (3, 16, 16)
    # all-ones quant -> only DCT rounding error
    assert np.abs(frames.astype(int) - src.astype(int)).max() <= 24


def test_corrupt_rejected():
    payload = encode_gray_video(_const_frames([50, 60]))
    with pytest.raises(ValueError):
        decode_mjpeg_avi(b"RIFX" + payload[4:])
    with pytest.raises(ValueError):
        decode_mjpeg_avi(payload[: len(payload) // 2])
    # non-JPEG video chunk -> explicit boundary error
    bad = bytearray(payload)
    pos = bad.index(b"\xff\xd8")
    bad[pos : pos + 2] = b"\x00\x00"
    with pytest.raises(ValueError, match="MJPEG"):
        decode_mjpeg_avi(bytes(bad))


def test_video_feature_per_frame_means():
    vals = [10, 200, 90]
    feat = _video_feature(encode_gray_video(_const_frames(vals)), dim=16)
    assert feat.shape == (16,) and feat.dtype == np.float32
    np.testing.assert_allclose(feat[:3] * 255, vals, atol=1e-3)
    assert (feat[3:] == 0).all()


def test_video_feature_animated_gif():
    """Animated GIFs flow through the same video feature path."""
    from aml_entity_resolution_assignment_spark.functions.gif import encode_gif

    pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    vals = [30, 180]
    frames = np.stack(
        [np.full((8, 8), v, dtype=np.uint8) for v in vals]
    )
    gif = encode_gif(frames, pal, delays_ms=[100, 100])
    feat = _video_feature(gif, dim=16)
    np.testing.assert_allclose(feat[:2] * 255, vals, atol=1e-3)


def test_decode_video_frames_boundary():
    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        decode_video_frames,
    )

    with pytest.raises(ValueError, match="H.264/VP9/AV1"):
        decode_video_frames(b"\x00\x00\x01\xba mpeg-ps junk")


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))

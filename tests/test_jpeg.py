"""Pure-numpy baseline JPEG codec: roundtrips through the real
bitstream (markers -> Huffman -> dequant -> IDCT), subsampling, restart
markers, and the multimodal decode integration."""

import numpy as np
import pytest

from aml_entity_resolution_assignment_spark.functions import jpeg as J


def _grad(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy * 3 + xx * 2) % 256).astype(np.uint8)


def test_constant_gray_blocks_bitexact():
    """All-ones quant: constant 8x8 blocks survive encode->decode
    bit-exactly (the multimodal_jpeg oracle's property)."""
    for v in (0, 1, 37, 128, 200, 255):
        img = np.full((16, 24), v, dtype=np.uint8)
        dec = J.decode_jpeg(J.encode_jpeg_gray(img))
        assert dec.shape == img.shape and (dec == v).all(), v


def test_gray_roundtrip_near_lossless():
    rng = np.random.Generator(np.random.PCG64(7))
    img = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg_gray(img))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_gray_std_quant_lossy_psnr():
    img = _grad(48, 64)
    dec = J.decode_jpeg(J.encode_jpeg_gray(img, J.STD_LUMA_QUANT))
    mse = ((dec.astype(float) - img.astype(float)) ** 2).mean()
    assert 10 * np.log10(255**2 / mse) > 30


def test_gray_odd_dimensions():
    rng = np.random.Generator(np.random.PCG64(3))
    img = rng.integers(0, 256, (13, 21), dtype=np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg_gray(img))
    assert dec.shape == (13, 21)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_restart_markers_roundtrip():
    rng = np.random.Generator(np.random.PCG64(5))
    img = rng.integers(0, 256, (24, 40), dtype=np.uint8)  # 15 MCUs
    for interval in (1, 2, 4, 7):
        payload = J.encode_jpeg_gray(img, restart_interval=interval)
        assert b"\xff\xdd" in payload  # DRI present
        dec = J.decode_jpeg(payload)
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2, interval


def test_color_444_and_420_roundtrip():
    h, w = 40, 56
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(yy * 3 + 20) % 256, (xx * 2 + 60) % 256, ((yy + xx) * 2) % 256],
        axis=2,
    ).astype(np.uint8)
    d444 = J.decode_jpeg(J.encode_jpeg_color(img, subsampling=(1, 1)))
    assert d444.shape == img.shape
    assert np.abs(d444.astype(int) - img.astype(int)).max() <= 3
    d420 = J.decode_jpeg(J.encode_jpeg_color(img, subsampling=(2, 2)))
    assert d420.shape == img.shape
    # chroma is subsampled: bound mean error, not max
    assert np.abs(d420.astype(int) - img.astype(int)).mean() < 2.0


def test_color_odd_dims_420():
    img = np.stack([_grad(13, 21)] * 3, axis=2)
    dec = J.decode_jpeg(J.encode_jpeg_color(img, subsampling=(2, 2)))
    assert dec.shape == (13, 21, 3)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3


def test_unsupported_features_raise_clearly():
    with pytest.raises(ValueError, match="SOI"):
        J.decode_jpeg(b"\x89PNG\r\n")
    # lossless (SOF3) stays a marked boundary (SOF2 decodes since r4)
    bad = bytearray(J.encode_jpeg_gray(np.zeros((8, 8), np.uint8)))
    idx = bytes(bad).find(b"\xff\xc0")
    bad[idx + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="lossless"):
        J.decode_jpeg(bytes(bad))
    bad[idx + 1] = 0xC9  # arithmetic-coded
    with pytest.raises(NotImplementedError, match="arithmetic"):
        J.decode_jpeg(bytes(bad))


def test_byte_stuffing_paths():
    """Values that force 0xFF bytes in the entropy stream roundtrip
    (writer stuffs 0x00, reader unstuffs)."""
    rng = np.random.Generator(np.random.PCG64(11))
    for seed in range(4):
        img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
        dec = J.decode_jpeg(J.encode_jpeg_gray(img))
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_multimodal_decode_image_jpeg_integration():
    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        _image_feature,
    )

    img = np.full((16, 16), 77, dtype=np.uint8)
    feat = _image_feature(J.encode_jpeg_gray(img), dim=16)
    assert feat.shape == (16,)
    assert np.allclose(feat, 77 / 255.0)


# ---------------------------------------------------------------------------
# progressive (SOF2) — round 4
# ---------------------------------------------------------------------------


def test_progressive_equals_baseline_gray():
    """A progressive stream carries the same quantized coefficients as
    the baseline stream of the same image, so decodes must be
    bit-identical — for both the near-lossless and the realistic
    quantizer."""
    rng = np.random.Generator(np.random.PCG64(41))
    g = rng.integers(0, 255, (64, 80)).astype(np.uint8)
    for qt in (None, J.STD_LUMA_QUANT):
        base = J.decode_jpeg(J.encode_jpeg_gray(g, qtab=qt))
        prog = J.decode_jpeg(J.encode_jpeg_progressive(g, qtab=qt))
        assert np.array_equal(base, prog)


def test_progressive_equals_baseline_color():
    rng = np.random.Generator(np.random.PCG64(42))
    img = rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)
    base = J.decode_jpeg(J.encode_jpeg_color(img, subsampling=(1, 1)))
    prog = J.decode_jpeg(J.encode_jpeg_progressive(img))
    assert np.array_equal(base, prog)


def test_progressive_spectral_selection_only():
    """Scan script with no successive approximation — AC first scans +
    EOB runs only."""
    rng = np.random.Generator(np.random.PCG64(43))
    g = rng.integers(0, 255, (40, 56)).astype(np.uint8)
    scans = [([0], 0, 0, 0, 0), ([0], 1, 20, 0, 0), ([0], 21, 63, 0, 0)]
    got = J.decode_jpeg(J.encode_jpeg_progressive(g, scans=scans))
    assert np.array_equal(got, J.decode_jpeg(J.encode_jpeg_gray(g)))


def test_progressive_two_bit_successive_approximation():
    """Al=2 first scans + two refinement passes — exercises repeated
    AC refinement (correction bits on already-significant coeffs)."""
    rng = np.random.Generator(np.random.PCG64(44))
    g = rng.integers(0, 255, (40, 56)).astype(np.uint8)
    scans = [
        ([0], 0, 0, 0, 2), ([0], 1, 63, 0, 2),
        ([0], 0, 0, 2, 1), ([0], 1, 63, 2, 1),
        ([0], 0, 0, 1, 0), ([0], 1, 63, 1, 0),
    ]
    got = J.decode_jpeg(J.encode_jpeg_progressive(g, scans=scans))
    assert np.array_equal(got, J.decode_jpeg(J.encode_jpeg_gray(g)))


def test_progressive_eob_runs_on_smooth_image():
    """Smooth gradient + std quantizer -> mostly-zero AC bands ->
    multi-block EOB runs (>1) in first AND refinement scans."""
    sm = np.tile((np.arange(56) * 2).astype(np.uint8), (40, 1))
    prog = J.decode_jpeg(
        J.encode_jpeg_progressive(sm, qtab=J.STD_LUMA_QUANT)
    )
    base = J.decode_jpeg(J.encode_jpeg_gray(sm, qtab=J.STD_LUMA_QUANT))
    assert np.array_equal(prog, base)


def test_progressive_flat_blocks_bit_exact():
    """Constant-gray blocks with the all-ones quantizer decode to the
    source exactly through the progressive path (the multimodal oracle
    property, preserved under SOF2)."""
    img = np.zeros((16, 32), dtype=np.uint8)
    img[:8, :8] = 73
    img[8:, 24:] = 200
    got = J.decode_jpeg(J.encode_jpeg_progressive(img))
    assert np.array_equal(got, img)


def test_progressive_restart_intervals():
    """DRI + per-scan RSTn markers: DC predictors and EOB runs reset at
    each marker; decode must still equal baseline exactly."""
    rng = np.random.Generator(np.random.PCG64(45))
    g = rng.integers(0, 256, (40, 56)).astype(np.uint8)
    base = J.decode_jpeg(J.encode_jpeg_gray(g))
    for ri in (1, 2, 5, 13):
        payload = J.encode_jpeg_progressive(g, restart_interval=ri)
        assert b"\xff\xdd" in payload
        assert np.array_equal(J.decode_jpeg(payload), base), ri
    img = rng.integers(0, 256, (32, 48, 3)).astype(np.uint8)
    b2 = J.decode_jpeg(J.encode_jpeg_color(img, subsampling=(1, 1)))
    p2 = J.decode_jpeg(J.encode_jpeg_progressive(img, restart_interval=3))
    assert np.array_equal(b2, p2)

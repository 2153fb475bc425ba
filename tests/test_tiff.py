"""Baseline TIFF codec: both byte orders, strip organization,
PackBits, TIFF-LZW (early change, table reset), horizontal predictor,
palette/WhiteIsZero photometrics, and boundary handling."""

import numpy as np
import pytest

from aml_entity_resolution_assignment_spark.functions.tiff import (
    decode_tiff,
    encode_tiff,
)


def _img(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


@pytest.mark.parametrize("comp", [1, 32773, 5])
@pytest.mark.parametrize("big_endian", [False, True])
def test_roundtrip_gray_rgb_all_compressions(comp, big_endian):
    gray = _img((37, 53), 1)
    rgb = _img((21, 33, 3), 2)
    assert np.array_equal(
        decode_tiff(encode_tiff(gray, compression=comp, big_endian=big_endian)),
        gray,
    )
    assert np.array_equal(
        decode_tiff(
            encode_tiff(rgb, compression=comp, rows_per_strip=5, big_endian=big_endian)
        ),
        rgb,
    )


def test_lzw_predictor_roundtrip_and_actually_compresses():
    smooth = np.tile(np.arange(64, dtype=np.uint8) * 4, (40, 1))
    pred = encode_tiff(smooth, compression=5, predictor=2, rows_per_strip=7)
    plain = encode_tiff(smooth, compression=5)
    assert np.array_equal(decode_tiff(pred), smooth)
    assert len(pred) < len(plain)  # differencing helps LZW on gradients


def test_lzw_width_growth_and_table_reset():
    big = _img((200, 300), 3)  # > 4093 distinct strings -> CLEAR reset
    assert np.array_equal(decode_tiff(encode_tiff(big, compression=5)), big)


def test_palette_and_whiteiszero_and_rgba():
    rng = np.random.default_rng(4)
    idx = rng.integers(0, 16, (9, 14)).astype(np.uint8)
    pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    assert np.array_equal(decode_tiff(encode_tiff(idx, palette=pal)), pal[idx])
    g = _img((8, 8), 5)
    assert np.array_equal(decode_tiff(encode_tiff(g, photometric=0)), g)
    rgba = _img((12, 17, 4), 6)
    assert np.array_equal(decode_tiff(encode_tiff(rgba, compression=5)), rgba)


def test_boundaries_raise_clearly():
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"PK\x03\x04")
    good = bytearray(encode_tiff(_img((4, 4), 7)))
    bad = bytearray(good)
    bad[2:4] = (43).to_bytes(2, "little")
    with pytest.raises(NotImplementedError, match="BigTIFF"):
        decode_tiff(bytes(bad))


def test_multimodal_dispatch():
    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        _image_feature,
    )

    img = np.full((16, 16), 77, dtype=np.uint8)
    for be in (False, True):
        feat = _image_feature(encode_tiff(img, compression=5, big_endian=be), dim=16)
        assert np.allclose(feat, 77 / 255.0)

"""BMP (uncompressed DIB) codec: roundtrips, padding/bottom-up rows,
palette expansion, 32-bit alpha drop, and corruption handling."""

import struct

import numpy as np
import pytest

from aml_entity_resolution_assignment_spark.functions.bmp import (
    decode_bmp,
    encode_bmp,
)


def test_rgb24_roundtrip_with_row_padding():
    rng = np.random.default_rng(1)
    for w in (1, 2, 3, 4, 5, 21):  # strides hit every padding case
        img = rng.integers(0, 256, (7, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img), w


def test_palette8_roundtrip():
    rng = np.random.default_rng(2)
    idx = rng.integers(0, 16, (9, 13), dtype=np.uint8)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(idx, palette=pal)), pal[idx])


def test_32bit_alpha_dropped():
    # hand-build a 1x2 top-down 32-bit BMP: pixels BGRA
    px = bytes([10, 20, 30, 99, 40, 50, 60, 99])  # two BGRA pixels
    info = struct.pack("<IiiHHIIiiII", 40, 2, -1, 1, 32, 0, len(px), 0, 0, 0, 0)
    head = b"BM" + struct.pack("<IHHI", 54 + len(px), 0, 0, 54)
    out = decode_bmp(head + info + px)
    assert out.shape == (1, 2, 3)
    assert out[0, 0].tolist() == [30, 20, 10]  # BGR -> RGB
    assert out[0, 1].tolist() == [60, 50, 40]


def test_unsupported_raise_clearly():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"XX")
    good = bytearray(encode_bmp(np.zeros((2, 2, 3), np.uint8)))
    bad = bytearray(good)
    bad[30:34] = struct.pack("<I", 1)  # RLE8
    with pytest.raises(ValueError, match="compression"):
        decode_bmp(bytes(bad))
    bad = bytearray(good)
    bad[28:30] = struct.pack("<H", 16)
    with pytest.raises(ValueError, match="bit depth"):
        decode_bmp(bytes(bad))


def test_multimodal_dispatch():
    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        _image_feature,
    )

    img = np.full((16, 16, 3), 77, dtype=np.uint8)
    feat = _image_feature(encode_bmp(img), dim=16)
    assert feat.shape == (16,)
    assert np.allclose(feat, 77 / 255.0)


# ---------------------------------------------------------------------------
# ICO (favicon container)
# ---------------------------------------------------------------------------


def test_ico_dib_and_png_roundtrip():
    from aml_entity_resolution_assignment_spark.functions.bmp import (
        decode_ico,
        encode_ico,
    )

    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (24, 19, 3), dtype=np.uint8)
    for as_png in (False, True):
        assert np.array_equal(decode_ico(encode_ico(img, as_png=as_png)), img)


def test_ico_rejects_garbage():
    from aml_entity_resolution_assignment_spark.functions.bmp import decode_ico

    with pytest.raises(ValueError, match="not an ICO"):
        decode_ico(b"\x00\x00\x02\x00")  # .cur, not .ico


def test_ico_multimodal_dispatch():
    from aml_entity_resolution_assignment_spark.functions.bmp import encode_ico
    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        _image_feature,
    )

    img = np.full((16, 16, 3), 90, dtype=np.uint8)
    feat = _image_feature(encode_ico(img), dim=16)
    assert np.allclose(feat, 90 / 255.0)

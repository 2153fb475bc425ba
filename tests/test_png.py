"""Pure-numpy PNG codec (functions/png.py): roundtrips across all
filter types and color types, palette decode, corruption handling,
and the multimodal dispatch boundary."""

import struct
import zlib

import numpy as np
import pytest

from aml_entity_resolution_assignment_spark.functions import png as P
from aml_entity_resolution_assignment_spark.functions.png import (
    decode_png,
    encode_png,
    encode_png_palette,
)
from aml_entity_resolution_assignment_spark.operators.multimodal import (
    _decode_image,
)


def _img(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4, "cycle"])
def test_roundtrip_gray_all_filters(ftype):
    img = _img((13, 17), seed=1)
    out = decode_png(encode_png(img, filter_type=ftype))
    assert out.shape == (13, 17)
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("channels", [2, 3, 4])
@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4, "cycle"])
def test_roundtrip_color_all_filters(channels, ftype):
    img = _img((9, 11, channels), seed=channels)
    out = decode_png(encode_png(img, filter_type=ftype))
    np.testing.assert_array_equal(out, img)


def test_roundtrip_1x1_and_gradients():
    np.testing.assert_array_equal(
        decode_png(encode_png(np.array([[200]], dtype=np.uint8))), [[200]]
    )
    # smooth gradients exercise Average/Paeth prediction wins
    g = np.add.outer(np.arange(32), np.arange(32)).astype(np.uint8)
    for ft in (3, 4):
        np.testing.assert_array_equal(decode_png(encode_png(g, filter_type=ft)), g)


def test_palette_decode():
    idx = np.array([[0, 1], [2, 1]], dtype=np.uint8)
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    out = decode_png(encode_png_palette(idx, pal))
    np.testing.assert_array_equal(out, pal[idx])


def test_crc_corruption_rejected():
    payload = bytearray(encode_png(_img((8, 8))))
    # flip a bit inside the IDAT body (after sig + IHDR chunk)
    payload[8 + 25 + 12] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


def test_truncated_and_non_png_rejected():
    payload = encode_png(_img((8, 8)))
    with pytest.raises(ValueError):
        decode_png(payload[: len(payload) // 2])
    with pytest.raises(ValueError):
        decode_png(b"\xff\xd8not a png")
    # truncation at every byte boundary must raise ValueError, never
    # an unwrapped struct/zlib error
    for cut in range(8, len(payload) - 1):
        try:
            decode_png(payload[:cut])
        except ValueError:
            pass


def test_bad_depths_rejected():
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    # 16-bit palette and nonstandard depths are out of scope
    # (sub-byte 1/2/4 decode for real since round 4)
    for depth, ctype in ((3, 0), (16, 3), (32, 0)):
        hdr = sig + chunk(
            b"IHDR", struct.pack(">IIBBBBB", 4, 4, depth, ctype, 0, 0, 0)
        )
        with pytest.raises(ValueError, match="depth"):
            decode_png(hdr)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4, "cycle"])
def test_16bit_roundtrip_high_byte(ftype):
    """16-bit samples filter over bytes (bpp = 2 x channels) and decode
    to their high byte — the standard 16 -> 8 reduction."""
    rng = np.random.default_rng(21)
    img16 = rng.integers(0, 65536, (9, 7), dtype=np.uint16)
    out = decode_png(encode_png(img16, filter_type=ftype))
    np.testing.assert_array_equal(out, (img16 >> 8).astype(np.uint8))
    rgb16 = rng.integers(0, 65536, (5, 6, 3), dtype=np.uint16)
    out = decode_png(encode_png(rgb16, filter_type=ftype, interlace=True))
    np.testing.assert_array_equal(out, (rgb16 >> 8).astype(np.uint8))


@pytest.mark.parametrize(
    "shape", [(16, 16), (13, 17), (7, 5), (3, 3), (1, 1), (2, 9), (9, 2)]
)
def test_adam7_interlaced_roundtrip_gray(shape):
    """Odd shapes exercise empty and partial Adam7 passes."""
    img = _img(shape, seed=shape[0] * 100 + shape[1])
    out = decode_png(encode_png(img, filter_type="cycle", interlace=True))
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("channels", [3, 4])
def test_adam7_interlaced_roundtrip_color(channels):
    img = _img((11, 6, channels), seed=50 + channels)
    out = decode_png(encode_png(img, filter_type="cycle", interlace=True))
    np.testing.assert_array_equal(out, img)


def test_adam7_truncated_pass_rejected():
    payload = encode_png(_img((16, 16), seed=9), interlace=True)
    for cut in range(8, len(payload) - 1, 7):
        try:
            decode_png(payload[:cut])
        except ValueError:
            pass


def test_multimodal_dispatch_decodes_png():
    img = _img((16, 16, 3), seed=7)
    out = _decode_image(encode_png(img, filter_type="cycle"))
    np.testing.assert_array_equal(out, img)


def test_multi_idat_chunks():
    """Spec allows pixel data split across several IDAT chunks."""
    img = _img((6, 6), seed=3)
    payload = encode_png(img)
    # re-split the single IDAT into two chunks
    sig, rest = payload[:8], payload[8:]
    chunks = []
    pos = 0
    while pos < len(rest):
        (ln,) = struct.unpack(">I", rest[pos : pos + 4])
        tag = rest[pos + 4 : pos + 8]
        body = rest[pos + 8 : pos + 8 + ln]
        chunks.append((tag, body))
        pos += 12 + ln

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    rebuilt = sig
    for tag, body in chunks:
        if tag == b"IDAT":
            mid = len(body) // 2
            rebuilt += chunk(b"IDAT", body[:mid]) + chunk(b"IDAT", body[mid:])
        else:
            rebuilt += chunk(tag, body)
    np.testing.assert_array_equal(decode_png(rebuilt), img)


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))


# ---------------------------------------------------------------------------
# sub-byte depths (1/2/4) — round 4
# ---------------------------------------------------------------------------


def test_subbyte_gray_all_depths_filters_interlace():
    rng = np.random.default_rng(21)
    for depth in (1, 2, 4):
        scale = 255 // ((1 << depth) - 1)
        for interlace in (False, True):
            for ft in (0, "cycle"):
                s = rng.integers(0, 1 << depth, (13, 21)).astype(np.uint8)
                payload = P.encode_png_subbyte(
                    s, depth, filter_type=ft, interlace=interlace
                )
                got = P.decode_png(payload)
                assert np.array_equal(got, s * scale), (depth, interlace, ft)


def test_subbyte_palette_roundtrip():
    rng = np.random.default_rng(22)
    for depth in (1, 2, 4):
        s = rng.integers(0, 1 << depth, (9, 17)).astype(np.uint8)
        pal = rng.integers(0, 256, (1 << depth, 3)).astype(np.uint8)
        got = P.decode_png(P.encode_png_subbyte(s, depth, palette=pal))
        assert np.array_equal(got, pal[s])


def test_subbyte_byte_boundary_widths():
    # widths that do / don't land on byte boundaries per depth
    rng = np.random.default_rng(23)
    for depth, widths in ((1, (7, 8, 9)), (2, (3, 4, 5)), (4, (1, 2, 3))):
        for w in widths:
            s = rng.integers(0, 1 << depth, (3, w)).astype(np.uint8)
            got = P.decode_png(P.encode_png_subbyte(s, depth))
            assert np.array_equal(got, s * (255 // ((1 << depth) - 1))), (depth, w)


def test_subbyte_invalid_color_type_rejected():
    # depth 2 with RGB color type is spec-invalid
    img = np.zeros((4, 4), dtype=np.uint8)
    payload = bytearray(P.encode_png_subbyte(img, 2))
    # IHDR body starts at offset 16; color type is byte 9 of the body
    payload[16 + 9] = 2
    import struct as _s
    import zlib as _z

    body = bytes(payload[16 : 16 + 13])
    payload[16 + 13 : 16 + 17] = _s.pack(
        ">I", _z.crc32(b"IHDR" + body) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="invalid for color type"):
        P.decode_png(bytes(payload))

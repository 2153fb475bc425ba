"""QOI codec (functions/qoi.py) — roundtrips, hand-pinned spec
vectors (convention locked against qoiformat.org, not the in-repo
encoder), op coverage, and error paths."""
import struct

import numpy as np
import pytest

from aml_entity_resolution_assignment_spark.functions.qoi import (
    decode_qoi,
    encode_qoi,
)

END = b"\x00" * 7 + b"\x01"


def _header(w, h, ch=3, cs=0):
    return b"qoif" + struct.pack(">II", w, h) + bytes((ch, cs))


def test_pinned_spec_vector_rgb_run_luma():
    # hand-assembled per the spec, NOT via encode_qoi:
    # px1 (128,0,0) raw RGB; px2 repeats (RUN 1); px3 (0,0,0) raw RGB
    # (slot 53 is occupied by px1 — hash collision with (0,0,0,255));
    # px4 (1,2,3) via LUMA dg=+2, dr-dg=-1, db-dg=+1
    stream = (
        _header(2, 2)
        + bytes((0xFE, 128, 0, 0))
        + bytes((0xC0,))
        + bytes((0xFE, 0, 0, 0))
        + bytes((0xA2, 0x79))
        + END
    )
    img = decode_qoi(stream)
    expect = np.array(
        [[[128, 0, 0], [128, 0, 0]], [[0, 0, 0], [1, 2, 3]]], dtype=np.uint8
    )
    assert np.array_equal(img, expect)


def test_pinned_spec_vector_index_and_diff():
    # px1 (5,5,5) raw -> slot (15+25+35+2805)%64 == 0; px2 (6,7,4) via
    # DIFF (+1,+2 biased... dr=+1,dg=+2 is out of DIFF range) -> use
    # DIFF for (6,6,6): dr=dg=db=+1 -> 0b01_11_11_11 = 0x7F;
    # px3 back to (5,5,5) via INDEX slot 0
    stream = (
        _header(3, 1)
        + bytes((0xFE, 5, 5, 5))
        + bytes((0x7F,))
        + bytes((0x00,))
        + END
    )
    img = decode_qoi(stream)
    expect = np.array([[[5, 5, 5], [6, 6, 6], [5, 5, 5]]], dtype=np.uint8)
    assert np.array_equal(img, expect)


def test_pinned_wraparound_diff():
    # DIFF deltas wrap mod 256: from (0,0,0) a -2 red delta lands 254
    stream = _header(1, 1) + bytes((0x40 | (0 << 4) | (2 << 2) | 2,)) + END
    img = decode_qoi(stream)
    assert img.tolist() == [[[254, 0, 0]]]


@pytest.mark.parametrize("shape,ch", [((16, 16, 3), 3), ((9, 13, 4), 4)])
def test_roundtrip_random(shape, ch):
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    enc = encode_qoi(img)
    dec = decode_qoi(enc)
    assert dec.shape == shape
    assert np.array_equal(dec, img)


def test_roundtrip_all_ops():
    # constant block (RUN > 62), gradient (DIFF/LUMA), repeats (INDEX)
    x = np.arange(256, dtype=np.uint8).reshape(16, 16)
    img = np.stack([x, (x + 1) % 256, (x + 3) % 256], axis=2).astype(np.uint8)
    img[:4, :] = 200
    img[12:, :] = img[:4, :]
    assert np.array_equal(decode_qoi(encode_qoi(img)), img)


def test_roundtrip_alpha_transitions():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    img[:, :, 3] = (rng.integers(0, 3, (8, 8)) * 120).astype(np.uint8)
    assert np.array_equal(decode_qoi(encode_qoi(img)), img)


def test_gray_broadcasts_to_rgb():
    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    dec = decode_qoi(encode_qoi(g))
    assert np.array_equal(dec, np.repeat(g[:, :, None], 3, axis=2))


def test_encoder_is_compact_on_runs():
    img = np.full((64, 64, 3), 7, dtype=np.uint8)
    enc = encode_qoi(img)
    # 4096 identical pixels: 1 RGB chunk + ceil(4095/62) RUN bytes
    assert len(enc) < 14 + 4 + 70 + 8


@pytest.mark.parametrize(
    "bad",
    [
        b"",
        b"qoif",
        b"nope" + b"\x00" * 30,
        _header(0, 4) + END,
        _header(2, 2, ch=5) + END,
        _header(2, 2) + bytes((0xFE, 1, 2)),  # truncated RGB chunk
        _header(1, 1) + bytes((0xC0 | 5,)) + END,  # run overflows 1px
    ],
)
def test_corrupt_raises(bad):
    with pytest.raises(ValueError):
        decode_qoi(bad)


def test_run_pixel_enters_index():
    # spec decoders hash px into the table on EVERY chunk including
    # RUN: a stream that OPENS with OP_RUN (run-extends the implicit
    # previous pixel (0,0,0,255)) must make slot 53 addressable by a
    # later OP_INDEX even though no non-RUN chunk ever wrote it.
    # px1-2: OP_RUN 2 -> (0,0,0,255); px3: raw RGB (1,2,3) which
    # lands in slot 23; px4: OP_INDEX 53 -> (0,0,0,255).
    stream = (
        _header(2, 2)
        + bytes((0xC0 | 1,))          # RUN of 2
        + bytes((0xFE, 1, 2, 3))      # raw RGB, slot 23
        + bytes((53,))                # INDEX slot 53
        + END
    )
    dec = decode_qoi(stream)
    assert dec[1, 1].tolist() == [0, 0, 0]


def test_missing_end_marker_raises():
    good = encode_qoi(np.zeros((2, 2, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_qoi(good[:-8] + b"\x00" * 8)


def test_multimodal_dispatch_decodes_qoi():
    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        _decode_image,
    )

    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    assert np.array_equal(_decode_image(encode_qoi(img)), img)

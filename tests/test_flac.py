"""FLAC codec (functions/flac.py): lossless — every roundtrip must be
sample-exact. Covers all four subframe types, Rice partitioning, all
stereo decorrelation modes, multi-frame streams, UTF-8 frame numbers,
wasted bits, and CRC rejection."""

import numpy as np
import pytest

from aml_entity_resolution_assignment_spark.functions import flac


def _sig(n, ch=1, seed=0, amp=12000):
    rng = np.random.Generator(np.random.PCG64(seed))
    t = np.arange(n, dtype=np.float64)
    base = amp * np.sin(2 * np.pi * t / 37.0)
    out = np.stack(
        [
            (base * (0.6 + 0.4 * c) + rng.integers(-300, 300, n)).astype(
                np.int64
            )
            for c in range(ch)
        ],
        axis=1,
    )
    return np.clip(out, -32768, 32767)


@pytest.mark.parametrize(
    "mode", ["verbatim", "fixed0", "fixed1", "fixed2", "fixed3", "fixed4",
             "lpc4", "lpc8"]
)
def test_roundtrip_subframe_modes(mode):
    x = _sig(700, seed=3)
    enc = flac.encode_flac(x, rate=8000, bps=16, block_size=256, mode=mode)
    dec, rate, bps = flac.decode_flac(enc)
    assert rate == 8000 and bps == 16
    assert np.array_equal(dec, x.astype(np.int32))


def test_roundtrip_constant_and_partitions():
    x = np.full((512, 1), -123, dtype=np.int64)
    enc = flac.encode_flac(x, mode="constant")
    dec, _, _ = flac.decode_flac(enc)
    assert np.array_equal(dec, x.astype(np.int32))
    # partitioned residual (porder 2 -> 4 partitions per frame)
    y = _sig(512, seed=9)
    enc2 = flac.encode_flac(y, block_size=256, mode="fixed2", porder=2)
    dec2, _, _ = flac.decode_flac(enc2)
    assert np.array_equal(dec2, y.astype(np.int32))


@pytest.mark.parametrize(
    "stereo", ["independent", "left_side", "right_side", "mid_side"]
)
def test_roundtrip_stereo_modes(stereo):
    x = _sig(600, ch=2, seed=5)
    enc = flac.encode_flac(
        x, bps=16, block_size=200, mode="fixed2", stereo=stereo
    )
    dec, _, _ = flac.decode_flac(enc)
    assert np.array_equal(dec, x.astype(np.int32))


def test_roundtrip_8bit_and_many_frames():
    x = (_sig(3000, seed=7) // 256).clip(-128, 127)
    enc = flac.encode_flac(x, bps=8, block_size=192, mode="fixed1")
    dec, _, bps = flac.decode_flac(enc)
    assert bps == 8
    assert np.array_equal(dec, x.astype(np.int32))


def test_utf8_frame_number_roundtrip():
    bw = flac._BitWriter()
    for v in (0, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0xFFFFF, 2**31):
        flac._write_utf8_coded(bw, v)
    bw.align()
    br = flac._BitReader(bw.bytes())
    for v in (0, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0xFFFFF, 2**31):
        assert flac._read_utf8_coded(br) == v


def test_wasted_bits_decode():
    """Hand-built single frame with a wasted-bits constant subframe:
    every sample has k low zero bits, stored shifted down."""
    wasted = 3
    val = 40  # stored; actual sample = 40 << 3 = 320
    n = 64
    si = flac._BitWriter()
    si.write(n, 16); si.write(n, 16); si.write(0, 24); si.write(0, 24)
    si.write(8000, 20); si.write(0, 3); si.write(15, 5); si.write(n, 36)
    body = si.bytes() + b"\x00" * 16
    out = bytearray(flac.MAGIC)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body
    bw = flac._BitWriter()
    bw.write(0x3FFE, 14); bw.write(0, 1); bw.write(0, 1)
    bw.write(7, 4); bw.write(0, 4); bw.write(0, 4); bw.write(4, 3)
    bw.write(0, 1)
    flac._write_utf8_coded(bw, 0)
    bw.write(n - 1, 16)
    bw.align()
    hdr = bw.bytes(); hdr += bytes([flac._crc8(hdr)])
    sw = flac._BitWriter()
    sw.write(0, 1); sw.write(0, 6)       # constant subframe
    sw.write(1, 1)                        # wasted flag
    sw.write_unary(wasted - 1)            # k-1 in unary
    sw.write_signed(val, 16 - wasted)
    sw.align()
    frame = hdr + sw.bytes()
    frame += flac._crc16(frame).to_bytes(2, "big")
    out += frame
    dec, _, _ = flac.decode_flac(bytes(out))
    assert dec.shape == (n, 1)
    assert (dec == (val << wasted)).all()


def test_crc_corruption_raises():
    x = _sig(300, seed=1)
    enc = bytearray(flac.encode_flac(x, block_size=256, mode="fixed2"))
    enc[-10] ^= 0x40  # flip a bit inside the last frame's payload
    with pytest.raises(ValueError, match="CRC"):
        flac.decode_flac(bytes(enc))


def test_not_flac_raises():
    with pytest.raises(ValueError, match="not a FLAC"):
        flac.decode_flac(b"RIFFxxxxWAVE")

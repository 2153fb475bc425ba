"""WAV codec + audio features (functions/wav.py): roundtrips across
bit depths and channel counts, chunk-walk robustness, feature
determinism, and the multimodal audio dispatch."""

import struct

import numpy as np
import pytest

from aml_entity_resolution_assignment_spark.functions.wav import (
    audio_features,
    decode_wav,
    encode_wav,
)
from aml_entity_resolution_assignment_spark.operators.multimodal import (
    _audio_feature,
)


def _sine(n=400, freq=440.0, rate=16000, amp=0.5):
    t = np.arange(n) / rate
    return amp * np.sin(2 * np.pi * freq * t)


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
def test_pcm_roundtrip_mono(bits):
    x = _sine()
    scale = {8: 127, 16: 32767, 24: (1 << 23) - 1, 32: (1 << 31) - 1}[bits]
    ints = (x * scale + (128 if bits == 8 else 0)).astype(np.int64)
    out, rate = decode_wav(encode_wav(ints, sample_rate=8000, bits=bits))
    assert rate == 8000
    assert out.shape == (400, 1)
    # quantization error bounded by one step
    np.testing.assert_allclose(out[:, 0], x, atol=2.0 / scale)


def test_stereo_roundtrip():
    left, right = _sine(freq=440), _sine(freq=880)
    ints = (np.stack([left, right], axis=1) * 32767).astype(np.int64)
    out, _ = decode_wav(encode_wav(ints, bits=16))
    assert out.shape == (400, 2)
    np.testing.assert_allclose(out[:, 0], left, atol=1e-3)
    np.testing.assert_allclose(out[:, 1], right, atol=1e-3)


def test_float_format_decodes():
    x = _sine().astype("<f4")
    fmt = struct.pack("<HHIIHH", 3, 1, 16000, 16000 * 4, 4, 32)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", x.nbytes) + x.tobytes()
    )
    out, rate = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    np.testing.assert_allclose(out[:, 0], x.astype(np.float64), atol=1e-7)


def test_unknown_chunks_skipped_and_word_alignment():
    base = encode_wav((_sine() * 32767).astype(np.int64), bits=16)
    # splice an odd-sized LIST chunk (padded per spec) before fmt
    head, rest = base[:12], base[12:]
    odd = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    payload = head + odd + rest
    payload = payload[:4] + struct.pack("<I", len(payload) - 8) + payload[8:]
    out, rate = decode_wav(payload)
    assert out.shape == (400, 1) and rate == 16000


def test_corrupt_rejected():
    wav = encode_wav((_sine() * 32767).astype(np.int64), bits=16)
    with pytest.raises(ValueError):
        decode_wav(b"notriff" + wav[7:])
    with pytest.raises(ValueError):
        decode_wav(wav[: len(wav) // 2])  # truncated data chunk
    # compressed format code rejected with the boundary message
    bad = bytearray(wav)
    bad[20:22] = struct.pack("<H", 85)  # MP3
    with pytest.raises(ValueError, match="codec"):
        decode_wav(bytes(bad))


def test_audio_features_deterministic_and_sane():
    x = _sine(n=1024)
    f1 = audio_features(x[:, None])
    f2 = audio_features(x[:, None])
    np.testing.assert_array_equal(f1, f2)
    rms, peak, zcr, centroid = f1[:4]
    assert 0.33 < rms < 0.37  # 0.5 amplitude sine -> rms ~0.354
    assert 0.49 < peak <= 0.51
    assert 0.04 < zcr < 0.07  # 440 Hz at 16 kHz -> ~0.055
    assert 0.0 <= centroid <= 1.0
    assert f1[4:].max() == 1.0  # bands normalized to max


def test_multimodal_audio_dispatch():
    wav = encode_wav((_sine() * 32767).astype(np.int64), bits=16)
    feat = _audio_feature(wav, dim=16)
    assert feat.shape == (16,)
    assert feat.dtype == np.float32
    assert 0.33 < feat[0] < 0.37  # rms survives the dispatch
    assert np.all(feat == _audio_feature(wav, dim=16))


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))


# ---------------------------------------------------------------------------
# G.711 µ-law / A-law (round 4)
# ---------------------------------------------------------------------------


def test_g711_code_space_bijection():
    """encode(decode(c)) == c for every byte code — A-law exactly;
    µ-law exactly except the canonical ±0 duality (0x7F, negative
    zero, re-encodes as 0xFF, positive zero)."""
    import numpy as np

    from aml_entity_resolution_assignment_spark.functions import wav as W

    for law, table, enc, allowed in (
        ("ulaw", W._ULAW, W.ulaw_encode, {127}),
        ("alaw", W._ALAW, W.alaw_encode, set()),
    ):
        dec = table.astype(np.int32)
        re = enc(dec)
        bad = {c for c in range(256) if re[c] != c}
        assert bad <= allowed, (law, sorted(bad)[:8])


def test_g711_wav_roundtrip_snr():
    """A companded sine decodes with telephony-grade SNR (> 30 dB) and
    correct shape/rate for both laws, mono and stereo."""
    import numpy as np

    from aml_entity_resolution_assignment_spark.functions import wav as W

    t = np.arange(800)
    sig = (12000 * np.sin(2 * np.pi * t / 80)).astype(np.int16)
    for law in ("ulaw", "alaw"):
        for ch in (1, 2):
            s = sig if ch == 1 else np.stack([sig, -sig], axis=1)
            payload = W.encode_wav_g711(s, law=law)
            out, rate = W.decode_wav(payload)
            assert rate == 8000 and out.shape == (800, ch)
            got = out[:, 0] * 32768.0
            err = got - sig.astype(np.float64)
            snr = 10 * np.log10((sig.astype(np.float64) ** 2).mean() / (err**2).mean())
            assert snr > 30, (law, ch, snr)


def test_g711_decode_tables_match_scalar_reference():
    """Spot-check LUT values against hand-computed G.711 expansions."""
    from aml_entity_resolution_assignment_spark.functions import wav as W

    # µ-law 0xFF is +0; 0x7F is -0 -> both decode to 0
    assert W._ULAW[0xFF] == 0 and W._ULAW[0x7F] == 0
    # µ-law: byte 0x00 (complement 0xFF): sign=1, exp=7, mant=15 ->
    # magnitude (((15<<3)+0x84)<<7) - 0x84 = 32124, negative
    assert W._ULAW[0x00] == -32124
    # A-law sign convention per ITU-T G.711 (and the classic g711.c
    # reference): transmitted sign bit 0x80 SET means POSITIVE. These
    # vectors are pinned against the spec, not the in-repo encoder, so
    # a shared encode/decode inversion cannot mask a defect.
    # byte 0xD5 (xor 0x55 -> 0x80): sign=1, exp=0, mant=0 -> +8
    assert W._ALAW[0xD5] == 8
    # byte 0x55 (xor 0x55 -> 0x00): sign=0, exp=0, mant=0 -> -8
    assert W._ALAW[0x55] == -8
    # byte 0x2A (xor 0x55 -> 0x7F): sign=0, exp=7, mant=15 ->
    # -(((15<<4)+0x108)<<6) = -32256 (negative max)
    assert W._ALAW[0x2A] == -32256
    # byte 0xAA (xor 0x55 -> 0xFF): sign=1 -> +32256 (positive max)
    assert W._ALAW[0xAA] == 32256


def test_ima_adpcm_roundtrip_mono_stereo():
    """IMA ADPCM (format 0x11): block headers, nibble packing, stereo
    8-nibble interleave; 4-bit differential coding recovers a mixed
    sine at ~ADPCM-typical SNR (> 18 dB)."""
    import numpy as np

    from aml_entity_resolution_assignment_spark.functions import wav as W

    t = np.arange(2000)
    sig = (
        9000 * np.sin(2 * np.pi * t / 100) + 3000 * np.sin(2 * np.pi * t / 37)
    ).astype(np.int16)
    for ch in (1, 2):
        s = sig if ch == 1 else np.stack([sig, sig // 2], axis=1)
        out, rate = W.decode_wav(W.encode_wav_ima(s, samples_per_block=249))
        assert rate == 8000 and out.shape[1] == ch
        got = (out[:2000, 0] * 32768).astype(np.float64)
        err = got - sig.astype(np.float64)
        snr = 10 * np.log10((sig.astype(np.float64) ** 2).mean() / (err**2).mean())
        assert snr > 18, (ch, snr)


def test_ima_adpcm_decoder_is_deterministic_state_machine():
    """Known nibble sequences against the hand-evaluated step table:
    nibble 0 from state (0,0) adds step>>3 = 0; nibble 7 adds
    7+3+1 = step + step>>1 + step>>2 (+ step>>3 = 0 at step 7:
    7 + 3 + 1 + 0 = 11? -> verify exact arithmetic)."""
    import numpy as np

    from aml_entity_resolution_assignment_spark.functions import wav as W

    out, pred, idx = W._ima_decode_nibbles(np.array([0], dtype=np.uint8), 0, 0)
    assert out[0] == 0 and idx == 0  # step 7>>3 = 0, index 0 + (-1) clamps
    out, pred, idx = W._ima_decode_nibbles(np.array([7], dtype=np.uint8), 0, 0)
    # step=7: diff = 0 + 1 + 3 + 7 = 11; index 0+8=8
    assert out[0] == 11 and idx == 8
    out, pred, idx = W._ima_decode_nibbles(np.array([15], dtype=np.uint8), 100, 0)
    assert out[0] == 100 - 11 and idx == 8  # sign bit subtracts

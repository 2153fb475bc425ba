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

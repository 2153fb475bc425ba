"""AIFF / Sun AU containers: encoder-pinned exact roundtrips, the
80-bit extended sample rate, mu-law path, malformed rejection, and
the container-agnostic audio feature dispatch."""

import numpy as np
import pytest

from aml_entity_resolution_assignment_spark.functions.aiff import (
    _AU_LINEAR,
    AudioContainerError,
    _ext80_decode,
    _ext80_encode,
    decode_aiff,
    decode_au,
    encode_aiff,
    encode_au,
)


@pytest.mark.parametrize("width", [8, 16, 24, 32])
def test_aiff_roundtrip_exact(width):
    hi = 2 ** (width - 1) - 1
    s = ((np.arange(48).reshape(24, 2) * 977 % (2 * hi + 1)) - hi).astype(
        np.int64
    )
    got, rate, bits = decode_aiff(encode_aiff(s, 44100, width))
    assert rate == 44100 and bits == width
    assert np.array_equal(got, s)


@pytest.mark.parametrize("rate", [8000, 11025, 22050, 44100, 96000])
def test_ext80_sample_rates_exact(rate):
    assert _ext80_decode(_ext80_encode(float(rate))) == float(rate)
    _, got, _ = decode_aiff(
        encode_aiff(np.zeros((4, 1), dtype=np.int32), rate)
    )
    assert got == rate


@pytest.mark.parametrize("enc", [2, 3, 4, 5])
def test_au_linear_roundtrip_exact(enc):
    hi = 2 ** (8 * _AU_LINEAR[enc] - 1) - 1
    s = np.clip(
        ((np.arange(30).reshape(15, 2) * 1103 % 60001) - 30000), -hi - 1, hi
    ).astype(np.int64)
    got, rate, bits = decode_au(encode_au(s, 8000, enc))
    assert rate == 8000 and bits == 8 * _AU_LINEAR[enc]
    assert np.array_equal(got, s)


def test_au_mulaw_within_quantization():
    s = ((np.arange(30).reshape(15, 2) * 1103 % 60001) - 30000).astype(
        np.int64
    )
    got, rate, bits = decode_au(encode_au(s, 8000, 1))
    assert bits == 16 and got.shape == s.shape
    assert np.abs(got.astype(np.int64) - s).max() < 1000


def test_malformed_raises():
    with pytest.raises(AudioContainerError):
        decode_aiff(b"RIFF....WAVE")
    with pytest.raises(AudioContainerError):
        decode_au(b"FORM....AIFF")
    good = encode_aiff(np.zeros((8, 1), dtype=np.int32), 8000)
    with pytest.raises(AudioContainerError):
        decode_aiff(good[:-5])  # truncated SSND


def test_audio_feature_container_agnostic():
    from aml_entity_resolution_assignment_spark.functions.wav import (
        encode_wav,
    )
    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        _audio_feature,
    )

    s = (np.sin(np.arange(256) / 5.0) * 20000).astype(np.int64)[:, None]
    f_wav = _audio_feature(encode_wav(s, 8000, bits=16))
    f_aiff = _audio_feature(encode_aiff(s, 8000, 16))
    f_au = _audio_feature(encode_au(s, 8000, 3))
    assert np.allclose(f_wav, f_aiff, atol=1e-4)
    assert np.allclose(f_wav, f_au, atol=1e-4)

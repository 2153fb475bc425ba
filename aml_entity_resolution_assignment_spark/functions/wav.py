"""Pure-numpy WAV (RIFF/PCM) codec + audio feature kernels.

Extends the multimodal surface to REAL audio the same way
functions/jpeg.py and functions/png.py made image decode real: WAV is
a struct-level container around raw PCM, so no codec library is
needed — only struct parsing and numpy. Compressed formats
(MP3/AAC/Opus/Vorbis) remain the marked boundary.

Supported: RIFF/WAVE with fmt + data chunks, PCM (format 1) and
IEEE-float (format 3), 8/16/24/32-bit integer and 32/64-bit float
samples, G.711 µ-law (format 7) and A-law (format 6) telephony
companding (round 4; pure-LUT decode from the ITU-T G.711 formulas),
any channel count (decoded to (n_frames, n_channels), mono-mixed by
the feature kernel). Unknown chunks (LIST, fact, cue) are skipped per
spec.

Feature kernel: deterministic numpy signal features with the same
fixed-width contract as the image thumbnail features — RMS, peak,
zero-crossing rate, and FFT band energies — so audio rows flow
through extract_media_features with real decode.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000, bits: int = 16
) -> bytes:
    """Encode (n,) mono or (n, ch) int/float samples to a PCM WAV.
    bits in (8, 16, 24, 32); input is clipped to the target range.
    Test/generator helper — spec-valid output."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    if bits == 8:
        data = np.clip(arr, 0, 255).astype(np.uint8).tobytes()
    elif bits == 16:
        data = np.clip(arr, -32768, 32767).astype("<i2").tobytes()
    elif bits == 24:
        a32 = np.clip(arr, -(1 << 23), (1 << 23) - 1).astype("<i4")
        b = a32.astype("<i4").view(np.uint8).reshape(n, ch, 4)
        data = np.ascontiguousarray(b[:, :, :3]).tobytes()
    elif bits == 32:
        data = np.clip(arr, -(1 << 31), (1 << 31) - 1).astype("<i4").tobytes()
    else:
        raise ValueError(f"unsupported bits {bits}")
    block = ch * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block, block, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a WAV payload -> (samples float64 in [-1, 1] shaped
    (n_frames, n_channels), sample_rate). Raises ValueError on
    corrupt or non-PCM/float input."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated WAV chunk")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("WAV fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_fmt, ch, rate, _byte_rate, _block, bits = fmt
    if ch == 0 or rate == 0:
        raise ValueError("WAV zero channels or sample rate")
    if audio_fmt == 1:  # integer PCM
        if bits == 8:
            x = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data, dtype=np.uint8)
            raw = raw[: (len(raw) // 3) * 3].reshape(-1, 3)
            x = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float64)
            x = x / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float64) / float(
                1 << 31
            )
        else:
            raise ValueError(f"WAV PCM bit depth {bits} not supported")
    elif audio_fmt == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise ValueError(f"WAV float bit depth {bits} not supported")
    elif audio_fmt == 7:  # G.711 µ-law
        x = _ULAW[np.frombuffer(data, dtype=np.uint8)].astype(np.float64) / 32768.0
    elif audio_fmt == 6:  # G.711 A-law
        x = _ALAW[np.frombuffer(data, dtype=np.uint8)].astype(np.float64) / 32768.0
    else:
        raise ValueError(
            f"WAV format {audio_fmt} not supported (PCM, IEEE-float and "
            "G.711 µ-law/A-law decode here; MP3/AAC/Opus need codec "
            "libraries absent in this container)"
        )
    n = (x.size // ch) * ch
    return x[:n].reshape(-1, ch), rate


def audio_features(samples: np.ndarray, n_bands: int = 12) -> np.ndarray:
    """Deterministic audio feature vector (4 + n_bands floats): RMS,
    peak, zero-crossing rate, spectral centroid (normalized), and
    n_bands mean FFT magnitude bands of the mono mix. Pure numpy —
    the audio analog of the image thumbnail feature."""
    if samples.size == 0:
        return np.zeros(4 + n_bands, dtype=np.float32)
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    rms = float(np.sqrt(np.mean(mono**2)))
    peak = float(np.max(np.abs(mono)))
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    mag = np.abs(np.fft.rfft(mono))
    freqs = np.arange(mag.size, dtype=np.float64)
    centroid = float((freqs * mag).sum() / (mag.sum() * max(mag.size - 1, 1))) if mag.sum() else 0.0
    # equal-width magnitude bands, padded to a multiple of n_bands
    pad = (-mag.size) % n_bands
    banded = np.pad(mag, (0, pad)).reshape(n_bands, -1).mean(axis=1)
    scale = banded.max()
    banded = banded / scale if scale else banded
    return np.concatenate(
        [[rms, peak, zcr, centroid], banded]
    ).astype(np.float32)


# ---------------------------------------------------------------------------
# G.711 companded telephony formats (round 4): µ-law (format 7) and
# A-law (format 6) — pure-LUT decode, no codec library (the formulas
# are in ITU-T G.711 itself). Encoders exist for tests.
# ---------------------------------------------------------------------------


def _ulaw_table() -> np.ndarray:
    """256-entry µ-law byte -> linear int16 (CCITT reference decode)."""
    u = np.arange(256, dtype=np.int32) ^ 0xFF  # stored complemented
    sign = (u & 0x80) != 0
    exp = (u >> 4) & 7
    mant = u & 0x0F
    t = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -t, t).astype(np.int16)


def _alaw_table() -> np.ndarray:
    """256-entry A-law byte -> linear int16."""
    a = np.arange(256, dtype=np.int32) ^ 0x55  # even bits inverted
    sign = (a & 0x80) != 0
    exp = (a >> 4) & 7
    mant = a & 0x0F
    t = np.where(
        exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << np.maximum(exp - 1, 0)
    )
    return np.where(sign, -t, t).astype(np.int16)


_ULAW = _ulaw_table()
_ALAW = _alaw_table()


def ulaw_encode(x: np.ndarray) -> np.ndarray:
    """Linear int16 -> µ-law bytes (reference algorithm; test helper)."""
    x = np.clip(np.asarray(x, dtype=np.int32), -32635, 32635)
    sign = x < 0
    mag = np.where(sign, -x, x) + 0x84
    exp = (np.floor(np.log2(np.maximum(mag, 1))).astype(np.int32) - 7).clip(0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    u = (np.where(sign, 0x80, 0) | (exp << 4) | mant) ^ 0xFF
    return u.astype(np.uint8)


def alaw_encode(x: np.ndarray) -> np.ndarray:
    """Linear int16 -> A-law bytes (reference algorithm; test helper)."""
    x = np.clip(np.asarray(x, dtype=np.int32), -32767, 32767)
    sign = x < 0
    mag = np.where(sign, -x, x)
    exp = (np.floor(np.log2(np.maximum(mag >> 8, 1))).astype(np.int32) + 1).clip(0, 7)
    exp = np.where(mag < 256, 0, exp)
    mant = np.where(exp == 0, mag >> 4, (mag >> (exp + 3)) & 0x0F)
    a = (np.where(sign, 0x80, 0) | (exp << 4) | (mant & 0x0F)) ^ 0x55
    return a.astype(np.uint8)


def encode_wav_g711(
    samples: np.ndarray, law: str = "ulaw", sample_rate: int = 8000
) -> bytes:
    """Encode (n,) or (n, ch) int16-range samples as a G.711 WAV
    (format 7 = µ-law, 6 = A-law) — decoder-exercise helper."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    enc = ulaw_encode if law == "ulaw" else alaw_encode
    code = 7 if law == "ulaw" else 6
    data = enc(arr).astype(np.uint8).tobytes()
    n, ch = arr.shape
    fmt = struct.pack("<HHIIHH", code, ch, sample_rate, sample_rate * ch, ch, 8)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body

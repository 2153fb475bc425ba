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
IMA ADPCM (format 0x11: 4-bit differential block coding with the
standard 89-entry step table, mono/stereo, round 4),
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
    elif audio_fmt == 0x11:  # IMA ADPCM (4-bit differential, block-coded)
        out = decode_wav_ima(data, ch, _block).astype(np.float64) / 32768.0
        return out, rate
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
    """256-entry A-law byte -> linear int16.

    ITU-T G.711 A-law sign convention: the transmitted sign bit 0x80
    (unaffected by the ^0x55 even-bit toggle) SET means POSITIVE —
    0xD5 decodes to +8 and 0x55 to -8 (pinned in tests against the
    spec, not the in-repo encoder, so a shared inversion can't hide).
    """
    a = np.arange(256, dtype=np.int32) ^ 0x55  # even bits inverted
    sign = (a & 0x80) != 0
    exp = (a >> 4) & 7
    mant = a & 0x0F
    t = np.where(
        exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << np.maximum(exp - 1, 0)
    )
    return np.where(sign, t, -t).astype(np.int16)


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
    # G.711: sign bit 0x80 set = non-negative sample
    a = (np.where(sign, 0, 0x80) | (exp << 4) | (mant & 0x0F)) ^ 0x55
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


# ---------------------------------------------------------------------------
# IMA ADPCM (format 0x11, round 4): 4-bit differential coding with the
# standard 89-entry step table — block-structured per the Microsoft
# WAVE mapping (per-channel 4-byte block headers, nibbles packed
# low-first, stereo interleaved in 8-nibble groups per channel).
# Decode state is inherently sequential (each sample's step size
# depends on the previous code), so the inner loop is per-nibble
# Python over numpy nibble arrays — same documented shape as the JPEG
# Huffman / GIF LZW entropy loops.
# ---------------------------------------------------------------------------

_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767,
], dtype=np.int32)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_decode_nibbles(nibbles, pred: int, index: int):
    """Decode a nibble sequence with initial (predictor, index) state.
    Returns (int16 samples, final pred, final index)."""
    out = np.empty(len(nibbles), dtype=np.int16)
    steps = _IMA_STEPS
    itab = _IMA_INDEX
    for i, n in enumerate(nibbles):
        step = int(steps[index])
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        pred = pred - diff if n & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        out[i] = pred
        index = max(0, min(88, index + int(itab[n & 7])))
    return out, pred, index


def _ima_encode_sample(x: int, pred: int, index: int):
    """Encode one sample -> (nibble, new pred, new index) — the
    reference quantizer (mirrors the decoder's reconstruction)."""
    step = int(_IMA_STEPS[index])
    delta = x - pred
    n = 0
    if delta < 0:
        n = 8
        delta = -delta
    if delta >= step:
        n |= 4
        delta -= step
    if delta >= step >> 1:
        n |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        n |= 1
    # reconstruct exactly like the decoder
    diff = step >> 3
    if n & 1:
        diff += step >> 2
    if n & 2:
        diff += step >> 1
    if n & 4:
        diff += step
    pred = pred - diff if n & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + int(_IMA_INDEX[n & 7])))
    return n, pred, index


def decode_wav_ima(data: bytes, ch: int, block_align: int) -> np.ndarray:
    """IMA ADPCM data chunk -> (n_frames, ch) int16 samples."""
    spb = (block_align - 4 * ch) * 2 // ch + 1  # samples per block
    frames = []
    pos = 0
    while pos + block_align <= len(data):
        block = data[pos : pos + block_align]
        pos += block_align
        chans = []
        preds, idxs = [], []
        for c in range(ch):
            p, ix, _r = struct.unpack("<hBB", block[c * 4 : c * 4 + 4])
            preds.append(p)
            idxs.append(max(0, min(88, ix)))
            chans.append([p])
        body = np.frombuffer(block, dtype=np.uint8)[4 * ch :]
        lo = body & 0x0F
        hi = body >> 4
        nib = np.empty(body.size * 2, dtype=np.uint8)
        nib[0::2] = lo
        nib[1::2] = hi
        if ch == 1:
            dec, _p, _i = _ima_decode_nibbles(nib, preds[0], idxs[0])
            chans[0].extend(int(v) for v in dec)
        else:
            # stereo: alternating 8-nibble (4-byte) groups per channel
            groups = nib.reshape(-1, 8)
            per_ch = [groups[c::ch].reshape(-1) for c in range(ch)]
            for c in range(ch):
                dec, _p, _i = _ima_decode_nibbles(per_ch[c], preds[c], idxs[c])
                chans[c].extend(int(v) for v in dec)
        n = min(spb, min(len(cc) for cc in chans))
        frames.append(np.stack([np.array(cc[:n], dtype=np.int16) for cc in chans], axis=1))
    if not frames:
        return np.zeros((0, ch), dtype=np.int16)
    return np.concatenate(frames, axis=0)


def encode_wav_ima(
    samples: np.ndarray, sample_rate: int = 8000, samples_per_block: int = 505
) -> bytes:
    """Encode (n,) or (n, ch<=2) int16-range samples as an IMA ADPCM
    WAV (format 0x11) — decoder-exercise helper."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    arr = np.clip(arr, -32768, 32767).astype(np.int32)
    n, ch = arr.shape
    if ch > 2:
        raise ValueError("IMA ADPCM helper supports mono/stereo")
    if (samples_per_block - 1) % 8:
        raise ValueError("samples_per_block - 1 must be divisible by 8")
    block_align = 4 * ch + (samples_per_block - 1) * ch // 2
    blocks = []
    for start in range(0, n, samples_per_block):
        chunk = arr[start : start + samples_per_block]
        if chunk.shape[0] < samples_per_block:  # pad final block
            pad = np.repeat(chunk[-1:], samples_per_block - chunk.shape[0], axis=0)
            chunk = np.concatenate([chunk, pad], axis=0)
        header = b""
        nibs = []
        for c in range(ch):
            pred = int(chunk[0, c])
            index = 0
            header += struct.pack("<hBB", pred, index, 0)
            cn = []
            for x in chunk[1:, c]:
                nb, pred, index = _ima_encode_sample(int(x), pred, index)
                cn.append(nb)
            nibs.append(cn)
        # interleave per-channel 8-nibble groups
        body = bytearray()
        for g in range(0, samples_per_block - 1, 8):
            for c in range(ch):
                grp = nibs[c][g : g + 8]
                for k in range(0, 8, 2):
                    body.append(grp[k] | (grp[k + 1] << 4))
        blocks.append(header + bytes(body))
    data = b"".join(blocks)
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, ch, sample_rate,
        sample_rate * block_align // samples_per_block, block_align, 4,
        2, samples_per_block,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body

"""QOI ("Quite OK Image") codec — from the public one-page spec at
qoiformat.org (Dominic Szablewski, 2022), pure Python/numpy, no codec
libraries.

QOI is a byte-aligned lossless RGB/RGBA format that several crawl
pipelines accept alongside PNG because it decodes in one linear pass.
Layout:

* 14-byte header: magic ``qoif``, u32be width, u32be height,
  u8 channels (3 or 4), u8 colorspace (0 sRGB / 1 linear)
* a stream of chunks, each starting with a tag byte:
    - ``0xFE`` QOI_OP_RGB:  3 payload bytes r, g, b (alpha carried over)
    - ``0xFF`` QOI_OP_RGBA: 4 payload bytes r, g, b, a
    - ``0b00iiiiii`` QOI_OP_INDEX: emit 64-entry table slot i
    - ``0b01drdgdb`` QOI_OP_DIFF: per-channel 2-bit deltas, bias 2,
      wrapping mod 256
    - ``0b10gggggg + 1 byte`` QOI_OP_LUMA: 6-bit green delta bias 32;
      second byte holds (dr-dg) and (db-dg) as 4-bit fields bias 8
    - ``0b11rrrrrr`` QOI_OP_RUN: repeat previous pixel 1..62 times
      (bias -1; 63/64 are the RGB/RGBA tags)
* every decoded pixel is written into the 64-slot table at
  ``(r*3 + g*5 + b*7 + a*11) % 64``; previous pixel starts at
  (0, 0, 0, 255) and the table starts zeroed
* 8-byte end marker: seven ``0x00`` then ``0x01``

The per-pixel loop is inherently sequential (each chunk's meaning
depends on decoder state), same boundary as the JPEG/VP8 entropy
loops in this package; batches stay Arrow-sized so the loop never
crosses a partition.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"qoif"
_END = b"\x00" * 7 + b"\x01"

_OP_RGB = 0xFE
_OP_RGBA = 0xFF
_OP_INDEX = 0x00
_OP_DIFF = 0x40
_OP_LUMA = 0x80
_OP_RUN = 0xC0


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def decode_qoi(payload: bytes) -> np.ndarray:
    """QOI bytes -> (h, w, 3) or (h, w, 4) uint8 array (by header
    channels). Raises ValueError on bad magic, truncated stream, or a
    missing end marker."""
    if len(payload) < 22 or payload[:4] != _MAGIC:
        raise ValueError("not a QOI stream (bad magic or too short)")
    w, h = struct.unpack(">II", payload[4:12])
    channels, colorspace = payload[12], payload[13]
    if channels not in (3, 4) or colorspace not in (0, 1):
        raise ValueError(
            f"QOI header invalid: channels={channels} colorspace={colorspace}"
        )
    if w == 0 or h == 0 or w * h > 400_000_000:
        raise ValueError(f"QOI dimensions invalid: {w}x{h}")
    n = w * h
    out = np.empty((n, 4), dtype=np.uint8)
    index = np.zeros((64, 4), dtype=np.uint8)
    r, g, b, a = 0, 0, 0, 255
    pos, i = 14, 0
    data = payload
    end = len(data)
    while i < n:
        if pos >= end:
            raise ValueError("QOI stream truncated mid-image")
        tag = data[pos]
        pos += 1
        if tag == _OP_RGB:
            if pos + 3 > end:
                raise ValueError("QOI RGB chunk truncated")
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif tag == _OP_RGBA:
            if pos + 4 > end:
                raise ValueError("QOI RGBA chunk truncated")
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        else:
            op = tag & 0xC0
            if op == _OP_INDEX:
                # ints, not np.uint8: later DIFF/LUMA deltas must wrap
                # via the explicit & 0xFF, not numpy modular arithmetic
                r, g, b, a = (int(v) for v in index[tag & 0x3F])
                out[i] = (r, g, b, a)
                i += 1
                continue  # table write below would be a no-op
            if op == _OP_DIFF:
                r = (r + ((tag >> 4) & 0x03) - 2) & 0xFF
                g = (g + ((tag >> 2) & 0x03) - 2) & 0xFF
                b = (b + (tag & 0x03) - 2) & 0xFF
            elif op == _OP_LUMA:
                if pos >= end:
                    raise ValueError("QOI LUMA chunk truncated")
                dg = (tag & 0x3F) - 32
                second = data[pos]
                pos += 1
                r = (r + dg + ((second >> 4) & 0x0F) - 8) & 0xFF
                g = (g + dg) & 0xFF
                b = (b + dg + (second & 0x0F) - 8) & 0xFF
            else:  # _OP_RUN
                run = (tag & 0x3F) + 1
                if i + run > n:
                    raise ValueError("QOI run overflows image")
                out[i : i + run] = (r, g, b, a)
                # reference decoder hashes px into the table on EVERY
                # chunk including RUN; without this a third-party
                # stream opening with OP_RUN then addressing that slot
                # via OP_INDEX decodes differently (ADVICE r5)
                index[_hash(r, g, b, a)] = (r, g, b, a)
                i += run
                continue
        out[i] = (r, g, b, a)
        index[_hash(r, g, b, a)] = (r, g, b, a)
        i += 1
    if data[pos : pos + 8] != _END:
        raise ValueError("QOI end marker missing")
    img = out.reshape(h, w, 4)
    return img[:, :, :3].copy() if channels == 3 else img


def encode_qoi(img: np.ndarray, colorspace: int = 0) -> bytes:
    """(h, w) gray, (h, w, 3) RGB, or (h, w, 4) RGBA uint8 -> QOI
    bytes. Gray input is broadcast to RGB (QOI has no gray mode).
    Spec-faithful encoder: RUN first, then INDEX, then DIFF/LUMA,
    then raw RGB(A) — the reference encoder's priority order."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError(f"encode_qoi: bad shape {arr.shape}")
    h, w, channels = arr.shape
    flat = arr.reshape(-1, channels)
    out = bytearray()
    out += _MAGIC
    out += struct.pack(">II", w, h)
    out.append(channels)
    out.append(colorspace)

    index = np.zeros((64, 4), dtype=np.uint8)
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    has_alpha = channels == 4
    for px in flat:
        r, g, b = int(px[0]), int(px[1]), int(px[2])
        a = int(px[3]) if has_alpha else 255
        if (r, g, b, a) == (pr, pg, pb, pa):
            run += 1
            if run == 62:
                out.append(_OP_RUN | (run - 1))
                run = 0
            continue
        if run:
            out.append(_OP_RUN | (run - 1))
            run = 0
        slot = _hash(r, g, b, a)
        if tuple(index[slot]) == (r, g, b, a):
            out.append(_OP_INDEX | slot)
        else:
            index[slot] = (r, g, b, a)
            if a == pa:
                dr = (r - pr + 128) % 256 - 128
                dg = (g - pg + 128) % 256 - 128
                db = (b - pb + 128) % 256 - 128
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(_OP_DIFF | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
                elif (
                    -32 <= dg <= 31
                    and -8 <= dr - dg <= 7
                    and -8 <= db - dg <= 7
                ):
                    out.append(_OP_LUMA | (dg + 32))
                    out.append(((dr - dg + 8) << 4) | (db - dg + 8))
                else:
                    out += bytes((_OP_RGB, r, g, b))
            else:
                out += bytes((_OP_RGBA, r, g, b, a))
        pr, pg, pb, pa = r, g, b, a
    if run:
        out.append(_OP_RUN | (run - 1))
    out += _END
    return bytes(out)

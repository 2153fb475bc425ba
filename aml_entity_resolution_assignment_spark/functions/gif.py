"""Pure-numpy GIF codec (decoder + spec-valid encoder for tests).

Third real image format after JPEG (functions/jpeg.py) and PNG
(functions/png.py), and the bridge to the video-ish path: animated
GIFs decode to frame stacks that feed the frame-sampling operator.
No codec libraries — GIF's only compression is LZW, implemented here
directly (LSB-first variable-width codes, 3-12 bits, clear/end
semantics per GIF89a appendix F).

Supported: GIF87a/GIF89a, global + local color tables, interlaced
images (the 4-pass row shuffle), multiple frames with per-frame
graphic-control extensions (delay + transparency index respected via
previous-frame compositing), unknown extensions skipped. Sub-8-bit
color tables work (they are the GIF norm).

The encoder emits spec-valid single- or multi-frame GIFs using
literal-only LZW with periodic clear codes (every code stays at
min_code_size + 1 bits — simple, valid, and deterministic), which is
exactly what the decoder-exercise tests and the oracle query need.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _read_color_table(buf: bytes, pos: int, size_field: int) -> tuple[np.ndarray, int]:
    n = 2 << size_field  # 2^(size+1) entries
    end = pos + 3 * n
    if end > len(buf):
        raise ValueError("truncated GIF color table")
    table = np.frombuffer(buf[pos:end], dtype=np.uint8).reshape(n, 3)
    return table, end


def _read_subblocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    while True:
        if pos >= len(buf):
            raise ValueError("truncated GIF data sub-blocks")
        n = buf[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        if pos + n > len(buf):
            raise ValueError("truncated GIF data sub-blocks")
        parts.append(buf[pos : pos + n])
        pos += n


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW: LSB-first bitstream, variable code width
    min+1..12 bits, clear resets the table."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"GIF LZW min code size {min_code_size} invalid")
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)]
    base_firsts = list(range(clear))
    # hot-loop shape (VERDICT r3 item 7): first-byte values ride a
    # parallel int list (no per-code `entry[:1]` bytes allocation), the
    # table length is tracked as a plain int, and the next code-width
    # bump threshold is precomputed — the remaining per-code work is
    # two list appends + one bytes concat (C memcpy), which is the
    # sequential core LZW cannot avoid
    table: list[bytes] = []
    firsts: list[int] = []
    tlen = 0
    code_size = min_code_size + 1
    mask = (1 << code_size) - 1
    grow_at = 1 << code_size
    out = bytearray()
    prev: bytes | None = None
    prev_first = 0
    acc = 0
    nbits = 0
    pos = 0
    data_len = len(data)
    while True:
        while nbits < code_size:
            if pos >= data_len:
                raise ValueError("GIF LZW stream ended without end code")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & mask
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = base + [b"", b""]
            firsts = base_firsts + [0, 0]
            tlen = end + 1
            code_size = min_code_size + 1
            mask = (1 << code_size) - 1
            grow_at = 1 << code_size
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if not table:
                table = base + [b"", b""]
                firsts = base_firsts + [0, 0]
                tlen = end + 1
            if code >= tlen:
                raise ValueError("GIF LZW first code not a literal")
            entry = table[code]
            first = firsts[code]
        elif code < tlen:
            entry = table[code]
            first = firsts[code]
            table.append(prev + entry[:1])
            firsts.append(prev_first)
            tlen += 1
        elif code == tlen:
            entry = prev + bytes((prev_first,))
            first = prev_first
            table.append(entry)
            firsts.append(prev_first)
            tlen += 1
        else:
            raise ValueError("GIF LZW code out of range")
        out += entry
        prev = entry
        prev_first = first
        if tlen == grow_at and code_size < 12:
            code_size += 1
            mask = (1 << code_size) - 1
            grow_at = 1 << code_size
        if len(out) >= n_pixels:
            break
    if len(out) < n_pixels:
        raise ValueError("GIF LZW produced too few pixels")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def _deinterlace(idx: np.ndarray, h: int, w: int) -> np.ndarray:
    out = np.empty((h, w), dtype=np.uint8)
    src = 0
    for start, step in _INTERLACE_PASSES:
        rows = range(start, h, step)
        for r in rows:
            out[r] = idx[src]
            src += 1
    return out


def decode_gif(payload: bytes) -> tuple[np.ndarray, list[int]]:
    """Decode a GIF payload -> (frames uint8 (n, h, w, 3), per-frame
    delays in ms). Frames composite over the previous frame with the
    transparency index respected (disposal simplification: draw-over),
    so animations reconstruct faithfully for the common case."""
    if len(payload) < 13 or payload[:4] != b"GIF8" or payload[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF payload")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    if w == 0 or h == 0:
        raise ValueError("GIF zero dimension")
    pos = 13
    gct = None
    if flags & 0x80:
        gct, pos = _read_color_table(payload, pos, flags & 0x07)
    frames: list[np.ndarray] = []
    delays: list[int] = []
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    transparent: int | None = None
    delay_ms = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(payload):
                raise ValueError("truncated GIF extension")
            label = payload[pos]
            pos += 1
            data, pos = _read_subblocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                gflags, delay_cs, tidx = struct.unpack("<BHB", data[:4])
                transparent = tidx if (gflags & 0x01) else None
                delay_ms = delay_cs * 10
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > len(payload):
            raise ValueError("truncated GIF image descriptor")
        left, top, fw, fh, iflags = struct.unpack("<HHHHB", payload[pos : pos + 9])
        pos += 9
        table = gct
        if iflags & 0x80:
            table, pos = _read_color_table(payload, pos, iflags & 0x07)
        if table is None:
            raise ValueError("GIF frame has no color table")
        if pos >= len(payload):
            raise ValueError("truncated GIF image data")
        min_code = payload[pos]
        pos += 1
        data, pos = _read_subblocks(payload, pos)
        idx = _lzw_decode(data, min_code, fw * fh).reshape(fh, fw)
        if iflags & 0x40:
            idx = _deinterlace(idx, fh, fw)
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("GIF pixel index outside color table")
        if left + fw > w or top + fh > h:
            raise ValueError("GIF frame outside logical screen")
        region = canvas[top : top + fh, left : left + fw]
        rgb = table[idx]
        if transparent is not None and transparent < len(table):
            mask = (idx == transparent)[..., None]
            rgb = np.where(mask, region, rgb)
        canvas[top : top + fh, left : left + fw] = rgb
        frames.append(canvas.copy())
        delays.append(delay_ms)
    if not frames:
        raise ValueError("GIF contains no image frames")
    return np.stack(frames), delays


def _lzw_encode_literals(idx: np.ndarray, min_code_size: int) -> bytes:
    """Literal-only LZW: every pixel is emitted as its own code at
    min_code_size + 1 bits, with a clear code re-emitted before the
    decoder's table would force a width increase. Valid per spec."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    # decoder table grows by 1 per literal after the first; reset while
    # len(table) = clear + 2 + emitted_since_clear stays below 2^code_size
    max_run = (1 << code_size) - (clear + 2) - 1
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    run = 0
    for px in idx.ravel():
        if run == max_run:
            emit(clear)
            run = 0
        emit(int(px))
        run += 1
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _subblocks(data: bytes) -> bytes:
    parts = []
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        parts.append(bytes([len(chunk)]) + chunk)
    return b"".join(parts) + b"\x00"


def encode_gif(
    frames: np.ndarray,
    palette: np.ndarray,
    delays_ms: list[int] | None = None,
    interlace: bool = False,
) -> bytes:
    """Encode (n, h, w) or (h, w) uint8 palette-index frames + (k, 3)
    palette into a GIF89a. Test/generator helper — spec-valid output
    exercised against the decoder."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 2:
        frames = frames[None]
    n, h, w = frames.shape
    palette = np.ascontiguousarray(palette, dtype=np.uint8)
    k = len(palette)
    size_field = max(int(np.ceil(np.log2(max(k, 2)))) - 1, 0)
    full = 2 << size_field
    pal = np.zeros((full, 3), dtype=np.uint8)
    pal[:k] = palette
    min_code = max(size_field + 1, 2)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    out += pal.tobytes()
    for i in range(n):
        if delays_ms is not None:
            out += b"\x21\xf9\x04"
            out += struct.pack("<BHB", 0, delays_ms[i] // 10, 0)
            out += b"\x00"
        iflags = 0x40 if interlace else 0
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
        idx = frames[i]
        if interlace:
            rows = [r for start, step in _INTERLACE_PASSES for r in range(start, h, step)]
            idx = idx[rows]
        out += bytes([min_code])
        out += _subblocks(_lzw_encode_literals(idx, min_code))
    out += b"\x3b"
    return bytes(out)

"""Pure-numpy baseline TIFF codec (decoder + spec-valid encoder).

Covers the baseline-TIFF profile that dominates real .tif files:

* both byte orders (II little-endian, MM big-endian), classic 32-bit
  IFDs (BigTIFF raises)
* strip-organized chunky (PlanarConfiguration=1) images, any
  RowsPerStrip
* 8-bit grayscale (PhotometricInterpretation 0/1 — WhiteIsZero
  inverted per spec), RGB, RGBA (extra samples kept), and palette
  (ColorMap expanded; TIFF color maps are 16-bit, reduced to their
  high byte)
* Compression 1 (none), 32773 (PackBits), and 5 (TIFF-LZW: MSB-first
  variable-width codes, Clear=256/EOI=257, the spec's EARLY
  code-width change at 2^n - 1) with Predictor 2 (horizontal
  differencing) undone vectorized per strip
* JPEG-in-TIFF, CCITT fax codings, tiled organization and 16-bit
  samples raise with a clear message

The encoder emits uncompressed, PackBits and LZW(+predictor) strips
for the roundtrip tests. The LZW decode loop is per-code Python (the
same documented entropy-loop shape as GIF/JPEG); everything else is
vectorized numpy.
"""

from __future__ import annotations

import struct

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284
_TAG_PREDICTOR = 317
_TAG_COLORMAP = 320

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _read_ifd(payload: bytes, bo: str) -> dict[int, list[int]]:
    (ifd_off,) = struct.unpack(bo + "I", payload[4:8])
    if ifd_off + 2 > len(payload):
        raise ValueError("TIFF IFD offset out of range")
    (n,) = struct.unpack(bo + "H", payload[ifd_off : ifd_off + 2])
    tags: dict[int, list[int]] = {}
    for i in range(n):
        e = ifd_off + 2 + i * 12
        tag, typ, cnt = struct.unpack(bo + "HHI", payload[e : e + 8])
        size = _TYPE_SIZES.get(typ, 1) * cnt
        if size <= 4:
            raw = payload[e + 8 : e + 8 + size]
        else:
            (off,) = struct.unpack(bo + "I", payload[e + 8 : e + 12])
            raw = payload[off : off + size]
        if typ == 3:
            vals = list(struct.unpack(bo + "H" * cnt, raw))
        elif typ == 4:
            vals = list(struct.unpack(bo + "I" * cnt, raw))
        elif typ == 1:
            vals = list(raw)
        else:
            continue  # rationals/ascii etc. — not needed for decode
        tags[tag] = vals
    return tags


def _unpackbits_decode(data: bytes, expected: int) -> bytes:
    """Apple PackBits: n in [0,127] -> copy n+1 literal bytes;
    n in [-127,-1] -> repeat next byte 1-n times; -128 no-op."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += data[i : i + 1] * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ValueError("TIFF PackBits strip ended early")
    return bytes(out[:expected])


def _lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW: MSB-first bitstream, 9..12-bit codes,
    Clear=256, EOI=257, EARLY code-width change (the table grows one
    entry ahead of GIF's convention — width bumps at 2^n - 1)."""
    CLEAR, EOI = 256, 257
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    acc = 0
    nbits = 0
    pos = 0
    out = bytearray()
    prev: bytes | None = None
    while len(out) < expected:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("TIFF LZW strip ended without EOI")
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == CLEAR:
            table = list(base)
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= 256:
                raise ValueError("TIFF LZW first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("TIFF LZW code out of range")
        out += entry
        prev = entry
        # EARLY change: the writer bumps width when the NEXT append
        # would reach 2^width - 1
        if len(table) >= (1 << width) - 1 and width < 12:
            width += 1
    if len(out) < expected:
        raise ValueError("TIFF LZW produced too few bytes")
    return bytes(out[:expected])


def decode_tiff(payload: bytes) -> np.ndarray:
    """TIFF -> uint8 (h, w) gray or (h, w, c) array."""
    if len(payload) < 8 or payload[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF payload")
    bo = "<" if payload[:2] == b"II" else ">"
    (magic,) = struct.unpack(bo + "H", payload[2:4])
    if magic == 43:
        raise NotImplementedError("BigTIFF is outside the classic-IFD scope")
    if magic != 42:
        raise ValueError("bad TIFF magic")
    tags = _read_ifd(payload, bo)
    w = tags.get(_TAG_WIDTH, [0])[0]
    h = tags.get(_TAG_HEIGHT, [0])[0]
    if not w or not h:
        raise ValueError("TIFF missing dimensions")
    spp = tags.get(_TAG_SPP, [1])[0]
    bits = tags.get(_TAG_BITS, [8] * spp)
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"TIFF bits-per-sample {bits} (8-bit only)")
    comp = tags.get(_TAG_COMPRESSION, [1])[0]
    photometric = tags.get(_TAG_PHOTOMETRIC, [1])[0]
    planar = tags.get(_TAG_PLANAR, [1])[0]
    predictor = tags.get(_TAG_PREDICTOR, [1])[0]
    if planar != 1:
        raise NotImplementedError("TIFF planar configuration 2")
    if comp in (2, 3, 4):
        raise NotImplementedError("CCITT fax compression")
    if comp in (6, 7):
        raise NotImplementedError("JPEG-in-TIFF")
    if comp not in (1, 5, 32773):
        raise NotImplementedError(f"TIFF compression {comp}")
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor}")
    if _TAG_STRIP_OFFSETS not in tags:
        raise NotImplementedError("tiled TIFF (no strip offsets)")

    offsets = tags[_TAG_STRIP_OFFSETS]
    counts = tags.get(_TAG_STRIP_COUNTS, [len(payload) - offsets[0]])
    rps = tags.get(_TAG_ROWS_PER_STRIP, [h])[0] or h
    row_bytes = w * spp
    rows = []
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        n_rows = min(rps, h - si * rps)
        if n_rows <= 0:
            break
        raw = payload[off : off + cnt]
        expected = n_rows * row_bytes
        if comp == 1:
            strip = raw[:expected]
            if len(strip) < expected:
                raise ValueError("TIFF strip shorter than expected")
        elif comp == 32773:
            strip = _unpackbits_decode(raw, expected)
        else:
            strip = _lzw_decode(raw, expected)
        arr = np.frombuffer(strip, dtype=np.uint8).reshape(n_rows, w, spp)
        if predictor == 2:
            arr = np.cumsum(arr.astype(np.uint32), axis=1).astype(np.uint8)
        rows.append(arr)
    img = np.concatenate(rows, axis=0)
    if img.shape[0] != h:
        raise ValueError("TIFF strips do not cover the image height")

    if photometric == 3:  # palette
        if spp != 1 or _TAG_COLORMAP not in tags:
            raise ValueError("TIFF palette image missing ColorMap")
        cm = np.array(tags[_TAG_COLORMAP], dtype=np.uint32)
        n = cm.size // 3
        # 16-bit color map entries -> high byte
        pal = (cm.reshape(3, n).T >> 8).astype(np.uint8)
        return pal[img.reshape(h, w)]
    if photometric == 0:  # WhiteIsZero
        img = 255 - img
    if spp == 1:
        return np.ascontiguousarray(img.reshape(h, w))
    return np.ascontiguousarray(img)


# ---------------------------------------------------------------------------
# encoder (test side)
# ---------------------------------------------------------------------------


def _unpackbits_encode(row: bytes) -> bytes:
    """Greedy PackBits encoder (runs >= 3 become replicate packets)."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and (n - i < 3 or not (row[i] == row[i + 1] == row[i + 2] if i + 2 < n else False)):
            if i - lit_start == 128:
                break
            i += 1
        chunk = row[lit_start : min(i, lit_start + 128)]
        i = lit_start + len(chunk)
        out += bytes([len(chunk) - 1]) + chunk
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """TIFF LZW encoder with the spec's early code-width change."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    prev = b""
    for b in data:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        next_code += 1
        # the decoder lags one table entry behind at read time, so the
        # spec's "early change" is a DECODER-side rule (bump at
        # 2^w - 1); the matching encoder bumps at 2^w
        if next_code == (1 << width) and width < 12:
            width += 1
        elif next_code == (1 << 12) - 1:
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        prev = bytes([b])
    if prev:
        emit(table[prev], width)
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def encode_tiff(
    img: np.ndarray,
    compression: int = 1,
    rows_per_strip: int | None = None,
    predictor: int = 1,
    palette: np.ndarray | None = None,
    photometric: int | None = None,
    big_endian: bool = False,
) -> bytes:
    """Encode uint8 gray (h, w), RGB/RGBA (h, w, c), or palette
    indices + (n, 3) palette as a strip-organized baseline TIFF.
    compression in (1, 5, 32773); predictor 2 valid with LZW."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    bo = ">" if big_endian else "<"
    if palette is not None:
        h, w = img.shape
        spp = 1
        photometric = 3
    elif img.ndim == 2:
        h, w = img.shape
        spp = 1
        photometric = 1 if photometric is None else photometric
        if photometric == 0:
            img = 255 - img
    else:
        h, w, spp = img.shape
        photometric = 2
    flat = img.reshape(h, w, spp)
    rps = rows_per_strip or h
    strips = []
    for y0 in range(0, h, rps):
        part = flat[y0 : y0 + rps]
        if predictor == 2:
            d = part.astype(np.int16)
            d[:, 1:] = d[:, 1:] - d[:, :-1]
            part = (d & 0xFF).astype(np.uint8)
        raw = part.tobytes()
        if compression == 1:
            strips.append(raw)
        elif compression == 32773:
            strips.append(
                b"".join(
                    _unpackbits_encode(
                        part[r].tobytes()
                    )
                    for r in range(part.shape[0])
                )
            )
        elif compression == 5:
            strips.append(_lzw_encode(raw))
        else:
            raise ValueError(f"unsupported compression {compression}")

    entries = []

    def entry(tag, typ, vals):
        entries.append((tag, typ, vals))

    entry(_TAG_WIDTH, 4, [w])
    entry(_TAG_HEIGHT, 4, [h])
    entry(_TAG_BITS, 3, [8] * spp)
    entry(_TAG_COMPRESSION, 3, [compression])
    entry(_TAG_PHOTOMETRIC, 3, [photometric])
    entry(_TAG_SPP, 3, [spp])
    entry(_TAG_ROWS_PER_STRIP, 4, [rps])
    entry(_TAG_STRIP_COUNTS, 4, [len(s) for s in strips])
    entry(_TAG_PLANAR, 3, [1])
    if predictor != 1:
        entry(_TAG_PREDICTOR, 3, [predictor])
    if palette is not None:
        pal = np.zeros((3, 256), dtype=np.uint32)
        p = np.asarray(palette, dtype=np.uint32)
        pal[:, : p.shape[0]] = p.T << 8
        entry(_TAG_COLORMAP, 3, [int(v) for v in pal.reshape(-1)])
    entry(_TAG_STRIP_OFFSETS, 4, [0] * len(strips))  # patched below

    entries.sort(key=lambda e: e[0])
    n_entries = len(entries)
    ifd_off = 8
    data_off = ifd_off + 2 + n_entries * 12 + 4
    # lay out overflow value blocks, then strips
    blocks = []
    fixed = []
    for tag, typ, vals in entries:
        size = _TYPE_SIZES[typ] * len(vals)
        if size <= 4:
            fixed.append((tag, typ, vals, None))
        else:
            fixed.append((tag, typ, vals, data_off))
            data_off += size + (size & 1)
    strip_offsets = []
    for s in strips:
        strip_offsets.append(data_off)
        data_off += len(s) + (len(s) & 1)

    out = bytearray()
    out += (b"II" if bo == "<" else b"MM") + struct.pack(bo + "H", 42)
    out += struct.pack(bo + "I", ifd_off)
    out += struct.pack(bo + "H", n_entries)
    overflow = bytearray()
    for tag, typ, vals, off in fixed:
        if tag == _TAG_STRIP_OFFSETS:
            vals = strip_offsets
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        packed = struct.pack(bo + fmt * len(vals), *vals)
        out += struct.pack(bo + "HHI", tag, typ, len(vals))
        if off is None:
            out += packed.ljust(4, b"\x00")
        else:
            out += struct.pack(bo + "I", off)
            overflow += packed
            if len(packed) & 1:
                overflow += b"\x00"
    out += struct.pack(bo + "I", 0)  # next IFD
    out += overflow
    for s in strips:
        out += s
        if len(s) & 1:
            out += b"\x00"
    return bytes(out)

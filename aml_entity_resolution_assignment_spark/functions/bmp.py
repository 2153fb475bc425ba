"""Pure-numpy BMP (Windows DIB) codec — the simplest mainstream raster
container: BITMAPFILEHEADER + BITMAPINFOHEADER + optional palette +
bottom-up rows padded to 4 bytes. Decodes uncompressed (BI_RGB)
8-bit palette, 24-bit BGR and 32-bit BGRA images — the forms produced
by virtually every 'save as BMP'; RLE4/RLE8 compression and 16-bit
bitfields raise with a clear message. Encoder emits spec-valid 24-bit
and 8-bit-palette files for the roundtrip tests.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP -> uint8 (h, w, 3) RGB (palette expanded; alpha dropped
    from 32-bit input)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack("<I", payload[10:14])[0]
    hdr_size = struct.unpack("<I", payload[14:18])[0]
    if hdr_size < 40:
        raise ValueError(f"BMP header size {hdr_size} not supported (BITMAPCOREHEADER)")
    w, h_raw = struct.unpack("<iI", payload[18:26])
    h_signed = struct.unpack("<i", payload[22:26])[0]
    top_down = h_signed < 0
    h = abs(h_signed)
    planes, bpp = struct.unpack("<HH", payload[26:30])
    compression = struct.unpack("<I", payload[30:34])[0]
    if planes != 1:
        raise ValueError("BMP planes != 1")
    if compression != 0:
        raise ValueError(
            f"BMP compression {compression} not supported (RLE/bitfields "
            "are outside the uncompressed-DIB scope)"
        )
    if w <= 0 or h == 0:
        raise ValueError("BMP invalid dimensions")
    if bpp == 8:
        n_colors = struct.unpack("<I", payload[46:50])[0] or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            payload[pal_off : pal_off + 4 * n_colors], dtype=np.uint8
        ).reshape(-1, 4)[:, :3][:, ::-1]  # BGRA quads -> RGB
        stride = (w + 3) & ~3
        rows = np.frombuffer(
            payload[data_offset : data_offset + stride * h], dtype=np.uint8
        ).reshape(h, stride)[:, :w]
        if int(rows.max(initial=0)) >= len(pal):
            raise ValueError("BMP palette index out of range")
        img = pal[rows]
    elif bpp in (24, 32):
        nb = bpp // 8
        stride = (w * nb + 3) & ~3
        rows = np.frombuffer(
            payload[data_offset : data_offset + stride * h], dtype=np.uint8
        ).reshape(h, stride)
        px = rows[:, : w * nb].reshape(h, w, nb)
        img = px[:, :, 2::-1]  # BGR(A) -> RGB
    else:
        raise ValueError(f"BMP bit depth {bpp} not supported")
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


def encode_bmp(img: np.ndarray, palette: np.ndarray | None = None) -> bytes:
    """Encode (h, w, 3) uint8 RGB as 24-bit BI_RGB, or (h, w) indices +
    (n, 3) palette as 8-bit — decoder-exercise helper."""
    img = np.asarray(img, dtype=np.uint8)
    if palette is None:
        h, w, _ = img.shape
        stride = (w * 3 + 3) & ~3
        body = np.zeros((h, stride), dtype=np.uint8)
        body[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
        pal_bytes = b""
        bpp, n_colors = 24, 0
    else:
        h, w = img.shape
        stride = (w + 3) & ~3
        body = np.zeros((h, stride), dtype=np.uint8)
        body[:, :w] = img[::-1]
        pal = np.asarray(palette, dtype=np.uint8)
        quads = np.zeros((len(pal), 4), dtype=np.uint8)
        quads[:, :3] = pal[:, ::-1]  # RGB -> BGR0
        pal_bytes = quads.tobytes()
        bpp, n_colors = 8, len(pal)
    data = body.tobytes()
    offset = 14 + 40 + len(pal_bytes)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(data), 2835, 2835, n_colors, 0
    )
    head = b"BM" + struct.pack("<IHHI", offset + len(data), 0, 0, offset)
    return head + info + pal_bytes + data


# ---------------------------------------------------------------------------
# ICO (favicon container, round 4): ICONDIR + entries, each a PNG
# payload or a DIB with doubled height (XOR pixels + 1-bit AND mask).
# Favicons are a standing fraction of any web crawl's image payloads.
# ---------------------------------------------------------------------------


def decode_ico(payload: bytes) -> np.ndarray:
    """Decode an ICO: picks the largest image entry; returns uint8
    (h, w, 3) RGB (PNG-compressed entries route through decode_png;
    DIB entries parse the doubled-height XOR image; the AND mask is
    ignored — features are luminance-based)."""
    if len(payload) < 6 or payload[:4] != b"\x00\x00\x01\x00":
        raise ValueError("not an ICO payload")
    (count,) = struct.unpack("<H", payload[4:6])
    if count == 0:
        raise ValueError("ICO with no images")
    best = None
    for i in range(count):
        e = payload[6 + i * 16 : 6 + (i + 1) * 16]
        if len(e) < 16:
            raise ValueError("truncated ICO directory")
        w, h = e[0] or 256, e[1] or 256
        size, off = struct.unpack("<II", e[8:16])
        if best is None or w * h > best[0]:
            best = (w * h, w, h, off, size)
    _, w, h, off, size = best
    body = payload[off : off + size]
    if body[:8] == b"\x89PNG\r\n\x1a\n":
        from .png import decode_png

        img = decode_png(body)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        return np.ascontiguousarray(img[:, :, :3])
    # DIB: BITMAPINFOHEADER with height = 2*h (XOR + AND mask)
    hdr_size = struct.unpack("<I", body[0:4])[0]
    if hdr_size < 40:
        raise ValueError("ICO DIB header too short")
    bpp = struct.unpack("<H", body[14:16])[0]
    comp = struct.unpack("<I", body[16:20])[0]
    if comp != 0:
        raise ValueError(f"ICO DIB compression {comp} not supported")
    pos = hdr_size
    if bpp == 8:
        n_colors = struct.unpack("<I", body[32:36])[0] or 256
        pal = np.frombuffer(
            body[pos : pos + 4 * n_colors], dtype=np.uint8
        ).reshape(-1, 4)[:, :3][:, ::-1]
        pos += 4 * n_colors
        stride = (w + 3) & ~3
        rows = np.frombuffer(
            body[pos : pos + stride * h], dtype=np.uint8
        ).reshape(h, stride)[:, :w]
        img = pal[rows]
    elif bpp in (24, 32):
        nb = bpp // 8
        stride = (w * nb + 3) & ~3
        rows = np.frombuffer(
            body[pos : pos + stride * h], dtype=np.uint8
        ).reshape(h, stride)
        img = rows[:, : w * nb].reshape(h, w, nb)[:, :, 2::-1]
    else:
        raise ValueError(f"ICO DIB bit depth {bpp} not supported")
    return np.ascontiguousarray(img[::-1])  # bottom-up


def encode_ico(img: np.ndarray, as_png: bool = False) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a one-entry ICO (DIB or PNG
    payload) — decoder-exercise helper."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    if as_png:
        from .png import encode_png

        body = encode_png(img)
    else:
        stride = (w * 3 + 3) & ~3
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
        mask_stride = ((w + 31) // 32) * 4
        mask = np.zeros((h, mask_stride), dtype=np.uint8)
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, 2 * h, 1, 24, 0,
            len(rows.tobytes()) + len(mask.tobytes()), 0, 0, 0, 0,
        )
        body = info + rows.tobytes() + mask.tobytes()
    entry = struct.pack(
        "<BBBBHHII",
        w if w < 256 else 0, h if h < 256 else 0, 0, 0, 1, 24, len(body), 22,
    )
    return b"\x00\x00\x01\x00\x01\x00" + entry + body

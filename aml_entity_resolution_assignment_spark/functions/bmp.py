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

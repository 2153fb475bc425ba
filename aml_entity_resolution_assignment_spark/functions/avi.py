"""MJPEG-in-AVI video codec (pure numpy, RIFF walk + functions/jpeg).

Closes the video modality the same way wav.py closed audio: AVI is a
RIFF container, and Motion-JPEG stores each frame as an ordinary
baseline JPEG — which functions/jpeg.py already decodes for real. So
a real video format needs only container parsing here; no codec
library. H.264/VP9/AV1 in MP4/WebM remain the marked boundary (true
inter-frame codecs need a full motion-compensation stack).

Supported: RIFF 'AVI ' with LIST hdrl (avih parsed for the frame
rate) and LIST movi containing '..dc'/'..db' video chunks, each a
baseline JPEG; idx1 and unknown chunks skipped; word alignment per
RIFF. The encoder writes a spec-valid minimal MJPEG AVI (avih + one
vids/MJPG stream + movi + idx1).
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg_gray


def encode_mjpeg_avi(
    frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """Wrap pre-encoded JPEG payloads into a minimal spec-valid MJPEG
    AVI: avih + strl(strh 'vids'/'MJPG' + strf BITMAPINFOHEADER) +
    movi + idx1. Test/generator helper."""
    n = len(frames)
    usec = 1_000_000 // max(fps, 1)
    avih = struct.pack(
        "<14I", usec, 0, 0, 0x10, n, 0, 1, 0, width, height, 0, 0, 0, 0
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, 0, 0xFFFFFFFF, 0
        )
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi_items = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_items)
    # idx1: one entry per frame (offset relative to movi list body)
    idx = bytearray()
    off = 4
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_mjpeg_avi(payload: bytes) -> tuple[np.ndarray, float]:
    """Decode an MJPEG AVI -> (frames uint8 (n, h, w[, c]), fps).
    Walks the RIFF tree, pulls every video chunk from LIST movi, and
    decodes each as a baseline JPEG. Raises ValueError on corrupt or
    non-MJPEG input."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    fps = 25.0
    frames: list[np.ndarray] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal fps
        while pos + 8 <= end:
            tag = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body_end = pos + 8 + size
            if body_end > end:
                raise ValueError("truncated AVI chunk")
            if tag == b"LIST":
                walk(buf, pos + 12, body_end)
            elif tag == b"avih" and size >= 4:
                (usec,) = struct.unpack("<I", buf[pos + 8 : pos + 12])
                if usec:
                    fps = 1_000_000.0 / usec
            elif tag[2:4] in (b"dc", b"db") and size > 0:
                jpeg = buf[pos + 8 : body_end]
                if jpeg[:2] != b"\xff\xd8":
                    raise ValueError(
                        "AVI video chunk is not JPEG — only MJPEG decodes "
                        "here (H.264/VP9 need codec libraries absent from "
                        "this container)"
                    )
                frames.append(decode_jpeg(jpeg))
            pos = body_end + (size & 1)

    walk(payload, 12, len(payload))
    if not frames:
        raise ValueError("AVI contains no video frames")
    return np.stack(frames), fps


def encode_gray_video(
    frames_px: np.ndarray, fps: int = 25
) -> bytes:
    """Encode a (n, h, w) uint8 gray frame stack as MJPEG AVI via the
    deterministic baseline-JPEG encoder (all-ones quant table, so
    constant 8x8 blocks roundtrip bit-exactly)."""
    frames_px = np.asarray(frames_px, dtype=np.uint8)
    n, h, w = frames_px.shape
    return encode_mjpeg_avi(
        [encode_jpeg_gray(frames_px[i]) for i in range(n)], w, h, fps
    )

"""MPEG audio (MP3/MP2/MP1) frame-header stream statistics.

STRUCTURAL parsing only (ISO/IEC 11172-3 §2.4.1.3 header syntax +
the public frame-length arithmetic): at crawl scale the audio
curation filters — duration caps, bitrate floors, CBR/VBR, sample
rate, channel mode — need only the 4-byte frame headers, never the
subband/huffman payload. Pairs with functions/id3.py exactly as
functions/mp4.py pairs with the video column: tags + stream stats,
zero decode.

Covered: MPEG-1 / MPEG-2 / MPEG-2.5, Layers I-III, all bitrate and
sample-rate table entries, padding, frame lengths

  Layer I:        (12  * bitrate / samplerate + padding) * 4
  Layer II/III:   (144 * bitrate / samplerate + padding)        (MPEG-1)
  Layer III:      ( 72 * bitrate / samplerate + padding)        (MPEG-2/2.5)

samples per frame: L1 384; L2 1152; L3 1152 (MPEG-1) / 576 (2/2.5).
Leading ID3v2 tags are skipped via their syncsafe size; trailing
ID3v1 is ignored by the walker (it never starts with a sync).

`build_frames` is the in-repo test encoder: syntactically-valid
frames with deterministic filler payloads.
"""

from __future__ import annotations

from dataclasses import dataclass

# bitrate kbps tables, indexed [version_group][layer][bits]; 0 = free
_BITRATES_V1 = {
    1: (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    2: (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    3: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
}
_BITRATES_V2 = {
    1: (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    2: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    3: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_SAMPLERATES = {
    "1": (44100, 48000, 32000),
    "2": (22050, 24000, 16000),
    "2.5": (11025, 12000, 8000),
}
_MODES = ("stereo", "joint_stereo", "dual_channel", "mono")


class MpegAudioError(ValueError):
    pass


@dataclass
class FrameInfo:
    version: str          # "1", "2", "2.5"
    layer: int            # 1..3
    bitrate_kbps: int
    samplerate: int
    mode: str
    frame_bytes: int
    samples: int


@dataclass
class StreamStats:
    n_frames: int
    duration_sec: float
    samplerate: int | None
    mode: str | None
    layer: int | None
    version: str | None
    mean_bitrate_kbps: float | None
    is_cbr: bool


def parse_frame_header(b: bytes, off: int = 0) -> FrameInfo:
    """Decode one 4-byte header at `off`; raises on non-sync/invalid."""
    if off + 4 > len(b):
        raise MpegAudioError("truncated header")
    h = int.from_bytes(b[off : off + 4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:
        raise MpegAudioError(f"no frame sync at {off}")
    vbits = (h >> 19) & 3
    version = {3: "1", 2: "2", 0: "2.5"}.get(vbits)
    if version is None:
        raise MpegAudioError("reserved version")
    lbits = (h >> 17) & 3
    if lbits == 0:
        raise MpegAudioError("reserved layer")
    layer = 4 - lbits
    bidx = (h >> 12) & 0xF
    if bidx in (0, 15):
        raise MpegAudioError("free/bad bitrate")
    table = _BITRATES_V1 if version == "1" else _BITRATES_V2
    bitrate = table[layer][bidx]
    sidx = (h >> 10) & 3
    if sidx == 3:
        raise MpegAudioError("reserved samplerate")
    samplerate = _SAMPLERATES[version][sidx]
    padding = (h >> 9) & 1
    mode = _MODES[(h >> 6) & 3]
    if layer == 1:
        frame_bytes = (12 * bitrate * 1000 // samplerate + padding) * 4
        samples = 384
    elif layer == 2:
        frame_bytes = 144 * bitrate * 1000 // samplerate + padding
        samples = 1152
    else:
        coef = 144 if version == "1" else 72
        frame_bytes = coef * bitrate * 1000 // samplerate + padding
        samples = 1152 if version == "1" else 576
    return FrameInfo(
        version, layer, bitrate, samplerate, mode, frame_bytes, samples
    )


def stream_stats(data: bytes) -> StreamStats:
    """Walk the whole frame chain (skipping a leading ID3v2 tag) and
    aggregate duration / bitrate / CBR-ness. Raises if no frame ever
    syncs; a malformed TAIL (sub-header leftover bytes, or a trailing
    ID3v1 'TAG') ends the walk cleanly."""
    off = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        size = (
            (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
        )
        off = 10 + size
    n = 0
    total_samples = 0
    bitrates: list[int] = []
    first: FrameInfo | None = None
    sr = None
    while off + 4 <= len(data):
        if data[off : off + 3] == b"TAG":
            break
        try:
            fi = parse_frame_header(data, off)
        except MpegAudioError:
            if n == 0:
                raise
            break
        if first is None:
            first, sr = fi, fi.samplerate
        n += 1
        total_samples += fi.samples
        bitrates.append(fi.bitrate_kbps)
        off += fi.frame_bytes
    if first is None:
        raise MpegAudioError("no MPEG audio frame found")
    return StreamStats(
        n_frames=n,
        duration_sec=total_samples / sr,
        samplerate=sr,
        mode=first.mode,
        layer=first.layer,
        version=first.version,
        mean_bitrate_kbps=sum(bitrates) / len(bitrates),
        is_cbr=len(set(bitrates)) == 1,
    )


# -------------------------------------------------------------- encoder

_VBITS = {"1": 3, "2": 2, "2.5": 0}


def build_frames(
    n_frames: int,
    bitrate_kbps: int = 128,
    samplerate: int = 44100,
    layer: int = 3,
    version: str = "1",
    mode: str = "joint_stereo",
    pad_every: int | None = None,
) -> bytes:
    """Syntactically-valid CBR-ish frame chain with 0xAA filler;
    pad_every=k sets the padding bit on every k-th frame."""
    table = _BITRATES_V1 if version == "1" else _BITRATES_V2
    bidx = table[layer].index(bitrate_kbps)
    sidx = _SAMPLERATES[version].index(samplerate)
    midx = _MODES.index(mode)
    out = bytearray()
    for i in range(n_frames):
        padding = 1 if pad_every and (i + 1) % pad_every == 0 else 0
        h = (
            (0x7FF << 21)
            | (_VBITS[version] << 19)
            | ((4 - layer) << 17)
            | (1 << 16)          # no CRC
            | (bidx << 12)
            | (sidx << 10)
            | (padding << 9)
            | (midx << 6)
        )
        fi = parse_frame_header(h.to_bytes(4, "big"))
        out += h.to_bytes(4, "big") + b"\xaa" * (fi.frame_bytes - 4)
    return bytes(out)

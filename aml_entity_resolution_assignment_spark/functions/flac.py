"""FLAC decode (and a test encoder), pure numpy/Python from the spec.

Scope (round 5): the full decode path a real .flac file needs —
STREAMINFO metadata walk, frame sync + UTF-8-coded frame numbers,
all four subframe types (CONSTANT, VERBATIM, FIXED orders 0-4, LPC
orders 1-32 with quantized coefficients), partitioned Rice residuals
incl. the escape (raw-bits) code, wasted-bits shifting, all four
channel assignments (independent, left/side, right/side, mid/side),
and both CRCs (CRC-8 header, CRC-16 frame) verified. Out of scope,
raised explicitly: sample rates/bit depths signalled "from END of
header" variants work; non-subset exotica (Rice2 partitions ARE
handled; 32-bit samples are).

Written against the public format spec (RFC 9639 / the xiph.org FLAC
format document); no reference to any codec library. The reference
repo (pandas/SQLite ER assignment) has no media code at all — this
module exists for the multimodal column layer (operators/
multimodal.py), where audio arrives as opaque binary and features are
extracted in Arrow batches.

Like the sibling codecs (jpeg.py, vp8.py, wav.py), the encoder exists
to generate test/oracle streams: it emits CONSTANT, VERBATIM, FIXED
and LPC subframes with partitioned Rice residuals and any channel
decorrelation mode, so the decoder's every branch is exercised by
in-repo roundtrips (FLAC is lossless — roundtrips are byte-exact).
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"fLaC"

_BLOCK_SIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitReader:
    """MSB-first bit reader with byte-position access (frame CRCs are
    computed over whole bytes, so the reader tracks byte boundaries)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def tell_bytes(self) -> int:
        return self.byte

    def align(self) -> None:
        if self.bit:
            self.byte += 1
            self.bit = 0

    def read(self, n: int) -> int:
        out = 0
        while n > 0:
            avail = 8 - self.bit
            take = min(n, avail)
            cur = self.data[self.byte]
            out = (out << take) | (
                (cur >> (avail - take)) & ((1 << take) - 1)
            )
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            n -= take
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
        return n


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


def _read_utf8_coded(br: _BitReader) -> int:
    """FLAC's UTF-8-style variable-length number (extended to 36
    bits for sample numbers)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    val = b0 & (mask - 1)
    for _ in range(n - 1):
        cont = br.read(8)
        if cont >> 6 != 0b10:
            raise ValueError("bad UTF-8-coded number continuation")
        val = (val << 6) | (cont & 0x3F)
    return val


def _write_utf8_coded(bw: _BitWriter, val: int) -> None:
    if val < 0x80:
        bw.write(val, 8)
        return
    # collect 6-bit groups
    groups = []
    v = val
    while v:
        groups.append(v & 0x3F)
        v >>= 6
    n = len(groups)
    # leading byte holds 7-n bits; grow n while it doesn't fit
    while (val >> (6 * (n - 1))) >= (1 << (7 - n)):
        n += 1
    lead_bits = val >> (6 * (n - 1))
    lead = ((0xFF << (8 - n)) & 0xFF) | lead_bits
    bw.write(lead, 8)
    for i in range(n - 2, -1, -1):
        bw.write(0b10 << 6 | ((val >> (6 * i)) & 0x3F), 8)


def _zigzag_decode(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _zigzag_encode(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else (v << 1)


def _read_residual(br: _BitReader, block_size: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if block_size % nparts:
        raise ValueError("partition order does not divide block size")
    res: list[int] = []
    for p in range(nparts):
        n = block_size // nparts - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            res.extend(
                br.read_signed(raw) if raw else 0 for _ in range(n)
            )
        else:
            for _ in range(n):
                q = br.read_unary()
                r = br.read(param) if param else 0
                res.append(_zigzag_decode((q << param) | r))
    return res


def _write_residual(
    bw: _BitWriter, res: list[int], order: int, param: int, porder: int = 0
) -> None:
    bw.write(0, 2)  # 4-bit rice
    bw.write(porder, 4)
    nparts = 1 << porder
    block_size = len(res) + order
    idx = 0
    for p in range(nparts):
        n = block_size // nparts - (order if p == 0 else 0)
        bw.write(param, 4)
        for _ in range(n):
            z = _zigzag_encode(res[idx])
            idx += 1
            bw.write_unary(z >> param)
            if param:
                bw.write(z & ((1 << param) - 1), param)


def _predict_fixed(order: int, warm: list[int], res: list[int]) -> list[int]:
    out = list(warm)
    coefs = _FIXED_COEFFS[order]
    for r in res:
        acc = r
        for j, c in enumerate(coefs):
            acc += c * out[-1 - j]
        out.append(acc)
    return out


def _predict_lpc(
    warm: list[int], res: list[int], coefs: list[int], shift: int
) -> list[int]:
    out = list(warm)
    o = len(coefs)
    for r in res:
        acc = 0
        for j in range(o):
            acc += coefs[j] * out[-1 - j]
        out.append(r + (acc >> shift))
    return out


def _read_subframe(br: _BitReader, block_size: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("subframe padding bit set")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if t == 0:
        val = br.read_signed(eff)
        samples = [val] * block_size
    elif t == 1:
        samples = [br.read_signed(eff) for _ in range(block_size)]
    elif 8 <= t <= 12:
        order = t - 8
        warm = [br.read_signed(eff) for _ in range(order)]
        res = _read_residual(br, block_size, order)
        samples = _predict_fixed(order, warm, res)
    elif t >= 32:
        order = t - 31
        warm = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision escape")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, block_size, order)
        samples = _predict_lpc(warm, res, coefs, shift)
    else:
        raise ValueError(f"reserved subframe type {t}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(payload: bytes) -> tuple[np.ndarray, int, int]:
    """payload -> (int32 samples (n, channels), sample_rate,
    bits_per_sample). Both CRCs are verified; a mismatch raises
    (corrupt data must not decode silently)."""
    if payload[:4] != MAGIC:
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        hdr = payload[pos : pos + 4]
        last = hdr[0] >> 7
        btype = hdr[0] & 0x7F
        size = int.from_bytes(hdr[1:4], "big")
        body = payload[pos + 4 : pos + 4 + size]
        if btype == 0:
            br = _BitReader(body)
            br.read(16)  # min block size
            br.read(16)  # max block size
            br.read(24)
            br.read(24)
            rate = br.read(20)
            ch = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            info = (rate, ch, bps, total)
        pos += 4 + size
        if last:
            break
    if info is None:
        raise ValueError("missing STREAMINFO")
    rate, ch, bps, total = info
    chans: list[list[int]] = [[] for _ in range(ch)]
    got = 0
    while (total == 0 or got < total) and pos < len(payload):
        frame_start = pos
        br = _BitReader(payload, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"lost frame sync at byte {pos}")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ca = br.read(4)
        ss_code = br.read(3)
        br.read(1)  # reserved
        _read_utf8_coded(br)
        if bs_code == 6:
            block_size = br.read(8) + 1
        elif bs_code == 7:
            block_size = br.read(16) + 1
        elif bs_code in _BLOCK_SIZES:
            block_size = _BLOCK_SIZES[bs_code]
        else:
            raise ValueError(f"reserved block size code {bs_code}")
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 0:
            pass
        elif sr_code in _SAMPLE_RATES:
            pass
        else:
            raise ValueError(f"invalid sample rate code {sr_code}")
        if ss_code == 0:
            pass
        elif ss_code in _SAMPLE_SIZES:
            if _SAMPLE_SIZES[ss_code] != bps:
                bps_frame = _SAMPLE_SIZES[ss_code]
                if bps_frame != bps:
                    raise ValueError("frame bps differs from STREAMINFO")
        else:
            raise ValueError(f"reserved sample size code {ss_code}")
        br.align()
        hdr_bytes = payload[frame_start : br.tell_bytes()]
        crc8 = payload[br.tell_bytes()]
        if _crc8(hdr_bytes) != crc8:
            raise ValueError("frame header CRC-8 mismatch")
        br = _BitReader(payload, br.tell_bytes() + 1)

        if ca < 8:
            n_sub = ca + 1
            if n_sub != ch:
                raise ValueError("channel count mismatch")
            subs = [
                _read_subframe(br, block_size, bps) for _ in range(n_sub)
            ]
        elif ca == 8:  # left/side
            left = _read_subframe(br, block_size, bps)
            side = _read_subframe(br, block_size, bps + 1)
            subs = [left, [lv - sv for lv, sv in zip(left, side)]]
        elif ca == 9:  # right/side
            side = _read_subframe(br, block_size, bps + 1)
            right = _read_subframe(br, block_size, bps)
            subs = [[rv + sv for rv, sv in zip(right, side)], right]
        elif ca == 10:  # mid/side
            mid = _read_subframe(br, block_size, bps)
            side = _read_subframe(br, block_size, bps + 1)
            subs = [[], []]
            for mv, sv in zip(mid, side):
                m2 = (mv << 1) | (sv & 1)
                subs[0].append((m2 + sv) >> 1)
                subs[1].append((m2 - sv) >> 1)
        else:
            raise ValueError(f"reserved channel assignment {ca}")
        br.align()
        crc16 = int.from_bytes(
            payload[br.tell_bytes() : br.tell_bytes() + 2], "big"
        )
        if _crc16(payload[frame_start : br.tell_bytes()]) != crc16:
            raise ValueError("frame CRC-16 mismatch")
        pos = br.tell_bytes() + 2
        for c in range(ch):
            chans[c].extend(subs[c])
        got += block_size
    if total:
        chans = [c[:total] for c in chans]
    return np.array(chans, dtype=np.int64).T.astype(np.int32), rate, bps


# ---------------------------------------------------------------------------
# Test encoder
# ---------------------------------------------------------------------------


def _best_rice_param(res: list[int]) -> int:
    if not res:
        return 0
    mean = sum(_zigzag_encode(r) for r in res) / len(res)
    p = 0
    while (1 << (p + 1)) < mean + 1 and p < 14:
        p += 1
    return p


def _lpc_coefficients(samples: list[int], order: int, prec: int = 12):
    """Levinson-Durbin on the autocorrelation, quantized to `prec`
    bits with a common shift — the textbook LPC quantization."""
    x = np.asarray(samples, dtype=np.float64)
    auto = [float((x[: len(x) - k] * x[k:]).sum()) for k in range(order + 1)]
    if auto[0] == 0:
        return [0] * order, 0
    err = auto[0]
    a = np.zeros(order)
    for i in range(order):
        acc = auto[i + 1]
        for j in range(i):
            acc -= a[j] * auto[i - j]
        k = acc / err
        new = a.copy()
        new[i] = k
        for j in range(i):
            new[j] = a[j] - k * a[i - 1 - j]
        a = new
        err *= 1 - k * k
        if err <= 0:
            break
    cmax = np.abs(a).max()
    if cmax == 0:
        return [0] * order, 0
    shift = prec - 1 - int(np.floor(np.log2(cmax))) - 1
    shift = max(0, min(15, shift))
    q = np.clip(
        np.round(a * (1 << shift)),
        -(1 << (prec - 1)),
        (1 << (prec - 1)) - 1,
    ).astype(np.int64)
    return [int(v) for v in q], shift


def _effective_porder(n: int, order: int, porder: int) -> int:
    """Largest partition order <= requested that is legal for this
    block: 2^po must divide the block size and the first partition
    must keep a non-negative residual count after the warmup."""
    po = porder
    while po > 0 and (n % (1 << po) or n // (1 << po) < order):
        po -= 1
    return po


def _encode_subframe(
    bw: _BitWriter, samples: list[int], bps: int, mode: str, porder: int = 0
) -> None:
    # downgrade gracefully on short blocks (the final block of a
    # stream may be shorter than the requested predictor order — real
    # encoders pick per-block orders the same way)
    if mode.startswith("fixed") and int(mode[-1]) > len(samples):
        mode = f"fixed{len(samples) if len(samples) <= 4 else 4}"
    if mode.startswith("lpc"):
        order = min(int(mode[3:]), len(samples) - 1)
        mode = f"lpc{order}" if order >= 1 else "verbatim"
    if mode == "constant" and len(set(samples)) == 1:
        bw.write(0, 1)
        bw.write(0, 6)
        bw.write(0, 1)
        bw.write_signed(samples[0], bps)
        return
    if mode == "verbatim":
        bw.write(0, 1)
        bw.write(1, 6)
        bw.write(0, 1)
        for s in samples:
            bw.write_signed(s, bps)
        return
    if mode.startswith("fixed"):
        order = int(mode[-1])
        bw.write(0, 1)
        bw.write(8 + order, 6)
        bw.write(0, 1)
        for s in samples[:order]:
            bw.write_signed(s, bps)
        coefs = _FIXED_COEFFS[order]
        res = []
        for i in range(order, len(samples)):
            acc = samples[i]
            for j, c in enumerate(coefs):
                acc -= c * samples[i - 1 - j]
            res.append(acc)
        _write_residual(
            bw, res, order, _best_rice_param(res),
            _effective_porder(len(samples), order, porder),
        )
        return
    if mode.startswith("lpc"):
        order = int(mode[3:])
        coefs, shift = _lpc_coefficients(samples, order)
        prec = 12
        bw.write(0, 1)
        bw.write(31 + order, 6)
        bw.write(0, 1)
        for s in samples[:order]:
            bw.write_signed(s, bps)
        bw.write(prec - 1, 4)
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(c, prec)
        res = []
        for i in range(order, len(samples)):
            acc = 0
            for j in range(order):
                acc += coefs[j] * samples[i - 1 - j]
            res.append(samples[i] - (acc >> shift))
        _write_residual(
            bw, res, order, _best_rice_param(res),
            _effective_porder(len(samples), order, porder),
        )
        return
    raise ValueError(f"unknown subframe mode {mode}")


def encode_flac(
    samples: np.ndarray,
    rate: int = 8000,
    bps: int = 16,
    block_size: int = 256,
    mode: str = "fixed2",
    stereo: str = "independent",
    porder: int = 0,
) -> bytes:
    """Test encoder. `samples` is (n,) or (n, ch) int. `mode` picks the
    subframe type (constant | verbatim | fixed0..fixed4 | lpc<order>);
    `stereo` one of independent | left_side | right_side | mid_side
    (2-channel input only). Block size must divide by 2^porder."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    out = bytearray(MAGIC)
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.bytes() + b"\x00" * 16  # md5 unset (all zero = unknown)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_no = 0
    for start in range(0, n, block_size):
        blk = x[start : start + block_size]
        bsz = blk.shape[0]
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed block size strategy
        bw.write(7, 4)  # 16-bit block size follows
        bw.write(0, 4)  # rate: from STREAMINFO
        if ch == 2 and stereo == "left_side":
            bw.write(8, 4)
        elif ch == 2 and stereo == "right_side":
            bw.write(9, 4)
        elif ch == 2 and stereo == "mid_side":
            bw.write(10, 4)
        else:
            bw.write(ch - 1, 4)
        bw.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
        bw.write(0, 1)
        _write_utf8_coded(bw, frame_no)
        bw.write(bsz - 1, 16)
        bw.align()
        hdr = bw.bytes()
        hdr += bytes([_crc8(hdr)])

        sw = _BitWriter()
        if ch == 2 and stereo != "independent":
            l = blk[:, 0].tolist()
            r = blk[:, 1].tolist()
            side = [lv - rv for lv, rv in zip(l, r)]
            if stereo == "left_side":
                _encode_subframe(sw, l, bps, mode, porder)
                _encode_subframe(sw, side, bps + 1, mode, porder)
            elif stereo == "right_side":
                _encode_subframe(sw, side, bps + 1, mode, porder)
                _encode_subframe(sw, r, bps, mode, porder)
            else:
                mid = [(lv + rv) >> 1 for lv, rv in zip(l, r)]
                _encode_subframe(sw, mid, bps, mode, porder)
                _encode_subframe(sw, side, bps + 1, mode, porder)
        else:
            for c in range(ch):
                _encode_subframe(sw, blk[:, c].tolist(), bps, mode, porder)
        sw.align()
        frame = hdr + sw.bytes()
        frame += _crc16(frame).to_bytes(2, "big")
        out += frame
        frame_no += 1
    return bytes(out)

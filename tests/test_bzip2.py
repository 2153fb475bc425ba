"""From-spec bzip2 decoder + splittable Spark source.

Conformance is against CPython's bundled libbzip2 (`bz2.compress`) —
real interop, not self-roundtrip: the decoder never sees bytes this
repo produced. The split tests sweep split sizes far smaller and
larger than block sizes so every boundary case (split inside a block,
split inside the magic, multiple blocks per split, empty splits,
lines spanning blocks AND splits) is exercised.
"""

import bz2
import random

import pytest

from aml_entity_resolution_assignment_spark.functions.bzip2 import (
    decode_block_at,
    decode_bzip2,
    find_block_bits,
)
from aml_entity_resolution_assignment_spark.sources import bz2_dump as B


def _texty(n, seed=0):
    rng = random.Random(seed)
    words = ["alpha", "beta", "entity", "spark", "graft", "wiki", "dump"]
    out = []
    total = 0
    while total < n:
        w = rng.choice(words)
        out.append(w)
        total += len(w) + 1
    return (" ".join(out)).encode()[:n]


@pytest.mark.parametrize("level", [1, 5, 9])
@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"a",
        b"hello world\n" * 200,
        _texty(50_000),
        bytes(random.Random(3).randbytes(30_000)),
        b"\x00" * 70_000,  # long RLE1 runs
        bytes(range(256)) * 300,
    ],
    ids=["empty", "one", "hello", "text50k", "rand30k", "zeros", "allbytes"],
)
def test_decode_matches_stdlib(level, data):
    assert decode_bzip2(bz2.compress(data, level)) == data


def test_decode_multistream():
    parts = [b"first stream\n" * 50, b"", b"second\n" * 80]
    blob = b"".join(bz2.compress(p, 1) for p in parts)
    assert decode_bzip2(blob) == b"".join(parts)
    assert decode_bzip2(blob) == bz2.decompress(blob)


def test_multiblock_level1():
    # level 1 = 100k block size -> 350k of incompressible-ish data
    # forces multiple blocks in one stream
    data = bytes(random.Random(7).randbytes(350_000))
    comp = bz2.compress(data, 1)
    bits = find_block_bits(comp)
    assert len(bits) >= 3
    assert bits[0] == 32  # first block magic right after 'BZh1'
    got = b""
    for b in bits:
        payload, nxt = decode_block_at(comp, b)
        got += payload
        assert nxt > b
    assert got == data


def test_block_crc_detects_corruption():
    comp = bytearray(bz2.compress(b"payload " * 500, 9))
    comp[len(comp) // 2] ^= 0x40
    with pytest.raises(ValueError):
        decode_bzip2(bytearray(bytes(comp)))


def test_stream_crc_checked():
    comp = bytearray(bz2.compress(b"x" * 100, 1))
    comp[-1] ^= 0x01  # stream CRC trailer
    with pytest.raises(ValueError, match="CRC"):
        decode_bzip2(bytes(comp))
    # and the check is skippable
    decode_bzip2(bytes(comp), check_crc=False)


def test_find_block_bits_multistream_and_phases():
    # concatenated streams put later magics at arbitrary bit phases
    blob = b"".join(
        bz2.compress(_texty(120_000, seed=s), 1) for s in range(3)
    )
    bits = find_block_bits(blob)
    assert len(bits) >= 4
    payload = b"".join(decode_block_at(blob, b)[0] for b in bits)
    assert payload == decode_bzip2(blob)


def _dump_file(tmp_path, lines, level=1, streams=1, name="dump.bz2"):
    text = ("\n".join(lines) + "\n").encode()
    if streams == 1:
        blob = bz2.compress(text, level)
    else:
        cut = len(text) // streams
        parts = [
            text[i * cut : (i + 1) * cut if i < streams - 1 else len(text)]
            for i in range(streams)
        ]
        blob = b"".join(bz2.compress(p, level) for p in parts)
    p = tmp_path / name
    p.write_bytes(blob)
    return str(p), text


def test_lines_for_split_sweep(tmp_path):
    """Exactly-once line emission for every split size, including
    splits much smaller than a block (most splits own zero blocks)
    and lines spanning block boundaries (multistream cuts mid-line)."""
    rng = random.Random(11)
    lines = [
        f"line{i}|" + "x" * rng.randrange(0, 200) for i in range(4000)
    ]
    path, text = _dump_file(tmp_path, lines, level=1, streams=4)
    fsize = len(open(path, "rb").read())
    for split in [1 << 12, 1 << 15, 1 << 20, fsize + 10]:
        rows = []
        start = 0
        while start < fsize:
            end = min(start + split, fsize)
            rows.extend(B._lines_for_split(path, fsize, start, end))
            start = end
        rows.sort(key=lambda r: (r[1], r[2]))
        assert [r[3] for r in rows] == lines, f"split={split}"


def test_lines_no_trailing_newline(tmp_path):
    p = tmp_path / "x.bz2"
    p.write_bytes(bz2.compress(b"a\nb\nfinal-without-newline", 1))
    fsize = p.stat().st_size
    rows = B._lines_for_split(str(p), fsize, 0, fsize)
    assert [r[3] for r in rows] == ["a", "b", "final-without-newline"]


def test_giant_line_spanning_blocks(tmp_path):
    """A single line larger than the level-1 block size: owned by the
    task holding the block where it starts; interior tasks emit []."""
    giant = "G" * 250_000
    lines = ["head"] + [giant] + ["tail"]
    import os

    path, _ = _dump_file(tmp_path, lines, level=1)
    fsize = os.path.getsize(path)
    split = 1 << 15
    rows = []
    start = 0
    while start < fsize:
        end = min(start + split, fsize)
        rows.extend(B._lines_for_split(path, fsize, start, end))
        start = end
    rows.sort(key=lambda r: (r[1], r[2]))
    assert [r[3] for r in rows] == lines


def test_read_bz2_blocks_spark(spark, tmp_path):
    data = _texty(300_000, seed=5)
    p = tmp_path / "blocks.bz2"
    p.write_bytes(bz2.compress(data, 1))
    df = B.read_bz2_blocks(spark, str(p), split_bytes=1 << 15)
    rows = df.orderBy("block_bit").collect()
    assert len(rows) >= 3
    assert b"".join(bytes(r.payload) for r in rows) == data


def test_read_bz2_lines_spark(spark, tmp_path):
    lines = [f"doc-{i}\t{'y' * (i % 97)}" for i in range(3000)]
    path, _ = _dump_file(tmp_path, lines, level=1, streams=3)
    df = B.read_bz2_lines(spark, path, split_bytes=1 << 15)
    got = [
        r.value for r in df.orderBy("block_bit", "line_idx").collect()
    ]
    assert got == lines


def test_non_posix_scheme_raises():
    with pytest.raises(NotImplementedError, match="ranged GET"):
        B._local_path("s3://bucket/key.bz2")

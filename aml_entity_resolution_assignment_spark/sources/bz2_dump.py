"""Splittable .bz2 source — parallel decode of Wikipedia-style dumps.

Why: after WARC (sources/warc.py), the second-most-common container
for web-scale text corpora is the giant .bz2 dump (Wikipedia/Wikidata
XML, many mirrored crawls): ONE multi-gigabyte file, useless to a
cluster if it can only be decoded by one task. bzip2 is uniquely
splittable — each ~100-900 KB block is independently decodable after
a scan for its 48-bit magic (the trick behind Hadoop's splittable
BZip2Codec) — and functions/bzip2.py provides the from-spec block
decoder. This module is the Spark side:

* split planning is DECLARATIVE: `binaryFile` lists (path, length)
  only — column pruning keeps file bytes unread — and
  `explode(sequence(...))` turns each file into fixed-size byte
  ranges. 20 GB at the 32 MB default = ~640 tasks per file; at
  100 TB the same plan yields ~3M tasks with zero driver-side state.
* each task reads ONLY its byte range (+ small overlap) via a posix
  range read, scans the 8 bit-phases for block magics it OWNS
  (magic bit offset in [start*8, end*8)), and decodes each block
  with a grow-on-truncation window; a 48-bit magic false positive
  (~2^-48/bit) is rejected by the block CRC and skipped.
* `read_bz2_lines` applies the standard split-record protocol
  (Hadoop TextInputFormat): a task drops everything up to the first
  newline of its first block unless that block is the file's first,
  and reads FORWARD past its range (decoding the next task's blocks)
  to complete its trailing partial line — so every line is emitted
  exactly once, by exactly one task, regardless of where block and
  range boundaries fall.

Storage seam: `_read_range` is the one function that touches bytes;
it handles posix paths and file: URIs (this sandbox, NFS/Lustre
mounts). An object-store deployment swaps in a ranged GET there —
the plan shape (listing -> range splits -> mapInPandas) is unchanged.

Reference parity: the reference ingests pre-extracted page tables
(src/preprocessing.py reads CSV); dump decoding is new surface the
north_star's 100 TB input domain requires, same tier as the WARC
source.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.bzip2 import decode_block_at, find_block_bits

BZ2_BLOCKS_SCHEMA = "path string, block_bit long, payload binary"
BZ2_LINES_SCHEMA = "path string, block_bit long, line_idx long, value string"

# A level-9 block holds <= 900_000 post-RLE1 bytes; coded size for any
# input a real encoder emits is under ~1.01x + tables. The decode
# window starts comfortably above that and doubles on truncation.
_WINDOW0 = 1 << 21  # 2 MiB
_WINDOW_MAX = 1 << 25  # 32 MiB: beyond this a "magic" is a false positive
_TAIL_CHUNK = 1 << 21  # forward-scan step when completing a trailing line
_MAX_CARRY_BLOCKS = 64  # a line spanning > 64 blocks (~57 MB) raises


def _local_path(path: str) -> str:
    if path.startswith("file://"):
        return path[len("file://") :] or "/"
    if path.startswith("file:"):
        return path[len("file:") :]
    if "://" in path:
        raise NotImplementedError(
            f"bz2_dump: only posix/file: paths are range-readable here; "
            f"swap _read_range for a ranged GET to use {path.split('://')[0]}://"
        )
    return path


def _read_range(path: str, start: int, length: int) -> bytes:
    with open(_local_path(path), "rb") as f:
        f.seek(start)
        return f.read(length)


def _decode_at(path: str, fsize: int, bit: int) -> tuple[bytes, int] | None:
    """Decode the block whose magic starts at file-global `bit`.
    Returns (payload, next_global_bit), or None for a false-positive
    magic (CRC/structure failure with the window already at EOF or at
    the growth cap). The window is re-read and doubled on truncation —
    a truncated real block fails exactly like a false positive, so the
    only way to tell them apart is to keep growing until EOF/cap."""
    base = bit >> 3
    win = _WINDOW0
    while True:
        capped = base + win >= fsize
        buf = _read_range(path, base, win)
        try:
            payload, nxt = decode_block_at(buf, bit - base * 8)
            return payload, base * 8 + nxt
        except NotImplementedError:
            raise
        except Exception:
            if capped or win >= _WINDOW_MAX:
                return None
            win *= 2


def _blocks_in_range(path: str, fsize: int, start: int, end: int):
    """Yield (global_bit, payload) for every real block whose magic
    bit offset lies in [start*8, end*8). The scan slice is extended
    6 bytes past `end` so a magic straddling the boundary is seen by
    exactly one side (ownership is by magic bit offset)."""
    lo = max(0, start - 6)
    slab = _read_range(path, lo, (end - lo) + 6)
    for local in find_block_bits(slab):
        g = lo * 8 + local
        if not (start * 8 <= g < end * 8):
            continue
        got = _decode_at(path, fsize, g)
        if got is not None:
            yield g, got[0]


def _next_block_after(path: str, fsize: int, byte_pos: int):
    """First real block whose magic starts at/after byte_pos*8 —
    forward scan in growing chunks (used to finish a trailing line)."""
    pos = max(0, byte_pos - 6)
    chunk = _TAIL_CHUNK
    while pos < fsize:
        slab = _read_range(path, pos, chunk + 6)
        for local in find_block_bits(slab):
            g = pos * 8 + local
            if g < byte_pos * 8:
                continue
            got = _decode_at(path, fsize, g)
            if got is not None:
                return g, got[0]
        if pos + chunk >= fsize:
            return None
        pos += chunk
        chunk *= 2
    return None


def plan_splits(spark: SparkSession, path: str, split_bytes: int) -> DataFrame:
    """(path, fsize, start, end) byte-range splits — pure metadata:
    binaryFile with only path/length selected never reads content."""
    files = (
        spark.read.format("binaryFile").load(path).select("path", "length")
    )
    return (
        files.select(
            "path",
            F.col("length").alias("fsize"),
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("length") - 1, F.lit(0)),
                    F.lit(split_bytes),
                )
            ).alias("start"),
        )
        .select(
            "path",
            "fsize",
            "start",
            F.least(F.col("start") + split_bytes, F.col("fsize")).alias("end"),
        )
        .repartition(spark.sparkContext.defaultParallelism, "path", "start")
    )


def read_bz2_blocks(
    spark: SparkSession, path: str, split_bytes: int = 32 << 20
) -> DataFrame:
    """Raw parallel block decode: one row per bzip2 block,
    (path, block_bit, payload). Concatenating payloads in block_bit
    order per path reproduces the uncompressed file exactly."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                for g, payload in _blocks_in_range(
                    r.path, int(r.fsize), int(r.start), int(r.end)
                ):
                    rows.append((r.path, g, payload))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["path", "block_bit", "payload"]
                )

    return plan_splits(spark, path, split_bytes).mapInPandas(
        run, BZ2_BLOCKS_SCHEMA
    )


def _lines_for_split(
    path: str, fsize: int, start: int, end: int
) -> list[tuple[str, int, int, str]]:
    blocks = list(_blocks_in_range(path, fsize, start, end))
    if not blocks:
        return []
    first_bit = blocks[0][0]
    buf = bytearray()
    for _, payload in blocks:
        buf += payload
    # complete the trailing partial line from the NEXT task's blocks
    tail_pos = (blocks[-1][0] >> 3) + 1  # strictly after our last magic
    carried = 0
    while not buf.endswith(b"\n"):
        nxt = _next_block_after(path, fsize, tail_pos)
        if nxt is None:
            break  # last block of file: trailing text is the final line
        g, payload = nxt
        cut = payload.find(b"\n")
        if cut >= 0:
            buf += payload[: cut + 1]
            break
        buf += payload
        tail_pos = (g >> 3) + 1
        carried += 1
        if carried > _MAX_CARRY_BLOCKS:
            raise ValueError(
                "bz2_dump: a single line spans more than "
                f"{_MAX_CARRY_BLOCKS} blocks; raise _MAX_CARRY_BLOCKS or "
                "fix the producer"
            )
    text = bytes(buf)
    # drop the head partial line (owned by the previous task) unless our
    # first block is the file's first (magic directly after 'BZh9': bit 32)
    if first_bit != 32:
        cut = text.find(b"\n")
        if cut < 0:
            return []  # entire region is the interior of one line
        text = text[cut + 1 :]
    if not text:
        return []
    body = text[:-1] if text.endswith(b"\n") else text
    return [
        (path, first_bit, i, ln.decode("utf-8", "replace"))
        for i, ln in enumerate(body.split(b"\n"))
    ]


def read_bz2_lines(
    spark: SparkSession, path: str, split_bytes: int = 32 << 20
) -> DataFrame:
    """Line-oriented parallel read of .bz2 text dumps. Every line of
    the uncompressed file is emitted exactly once; (block_bit,
    line_idx) is a deterministic per-file ordering key (sort by it to
    reproduce file order). Lines are utf-8 with replacement."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                rows.extend(
                    _lines_for_split(
                        r.path, int(r.fsize), int(r.start), int(r.end)
                    )
                )
            if rows:
                yield pd.DataFrame(
                    rows, columns=["path", "block_bit", "line_idx", "value"]
                )

    return plan_splits(spark, path, split_bytes).mapInPandas(
        run, BZ2_LINES_SCHEMA
    )

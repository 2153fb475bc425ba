"""Privacy-preserving record linkage: CLK Bloom-filter encodings.

Schnell, Bachteler & Reiher (2009/2011): fields are encoded into a
fixed-width Bloom bit vector (cryptographic-hash q-grams, k positions
each) and linkage compares ONLY the encodings — the plaintext never
crosses the trust boundary. Similarity of two encodings approximates
q-gram Dice similarity of the underlying strings:

    dice(A, B) = 2 * popcount(A & B) / (popcount(A) + popcount(B))

Engine mapping:
  * encode — Arrow-batched kernel (hashlib MD5 per distinct gram, the
    same md5-low64 family as the simhash oracle twin, so the DuckDB
    oracle recomputes every position in SQL via md5_number_lower);
    positions use standard double hashing pos_i = (h1 + i*h2) mod m.
  * compare — pure JVM: the encoding is an array<long> of CLK_WORDS
    words each holding 32 bits (low half; keeps every word positive in
    BOTH engines' signed types), so Dice is zip_with + bit_count +
    aggregate inside whole-stage codegen. At 10^12 records the Dice
    join rides the SAME banded-LSH / blocked candidate machinery as
    every other pairwise score — the encoding is just another compact
    binary column (32 bytes/record at m=256).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

CLK_BITS = 256  # m: filter width in bits
CLK_K = 4  # hash functions per q-gram
CLK_Q = 2  # q-gram width
CLK_WORDS = CLK_BITS // 32  # 32 payload bits per long (sign-safe)


def _md5_low64(s: str) -> int:
    """DuckDB md5_number_lower twin (functions/minhash.py:_token_hash64)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:16], "little")


def clk_positions(text: str, q: int = CLK_Q, m: int = CLK_BITS, k: int = CLK_K) -> set:
    """Set of Bloom positions for a field value. The caller normalizes
    (lower/trim) — the kernel only pads, so an external SQL twin can
    replicate the exact byte stream."""
    s = "_" + (text or "") + "_"
    pos = set()
    for i in range(len(s) - q + 1):
        g = s[i : i + q]
        h1 = _md5_low64(g + "|1")
        h2 = _md5_low64(g + "|2")
        for j in range(k):
            pos.add((h1 + j * h2) % m)
    return pos


def _pack_words(pos: set, m: int = CLK_BITS) -> list:
    words = [0] * (m // 32)
    for p in pos:
        words[p >> 5] |= 1 << (p & 31)
    return words


def batch_clk(texts: pd.Series, q: int = CLK_Q, m: int = CLK_BITS, k: int = CLK_K) -> pd.Series:
    """Arrow kernel: string column -> array<long> CLK words. Grams are
    memoized per batch (web text repeats bigrams heavily), so the MD5
    cost is per DISTINCT gram, not per occurrence."""
    gram_cache: dict[str, tuple] = {}
    out = []
    for t in texts:
        s = "_" + ("" if t is None else str(t)) + "_"
        pos = set()
        for i in range(len(s) - q + 1):
            g = s[i : i + q]
            hit = gram_cache.get(g)
            if hit is None:
                h1 = _md5_low64(g + "|1")
                h2 = _md5_low64(g + "|2")
                hit = tuple((h1 + j * h2) % m for j in range(k))
                gram_cache[g] = hit
            pos.update(hit)
        out.append(_pack_words(pos, m))
    return pd.Series(out, index=texts.index)


def clk_encode(col) -> Column:
    """Column wrapper for batch_clk (array<long> of CLK_WORDS)."""
    from pyspark.sql.types import ArrayType, LongType

    f = F.pandas_udf(lambda s: batch_clk(s), ArrayType(LongType()))
    return f(col)


def dice(a, b) -> Column:
    """JVM-side Dice over two CLK word arrays: no UDF, codegen only.
    0.0 when both encodings are empty (popcounts sum to zero)."""
    inter = F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseAND(y))),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    ca = F.aggregate(
        F.transform(a, F.bit_count), F.lit(0), lambda acc, v: acc + v
    )
    cb = F.aggregate(
        F.transform(b, F.bit_count), F.lit(0), lambda acc, v: acc + v
    )
    return F.when(
        (ca + cb) > 0, 2.0 * inter / (ca + cb)
    ).otherwise(F.lit(0.0))

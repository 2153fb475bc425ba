"""MinHash / SimHash signatures and LSH banding — columns, not indexes.

The reference builds a datasketch MinHashLSH object and pickles it
(/root/reference/src/preprocessing.py:269-291); querying it is a
driver-side loop (matching.py:126-132). That design cannot distribute.
Here signatures are **columns** (ArrayType(Long)) computed by a
vectorized pandas UDF, and the LSH "index" is the exploded band table —
the approximate self-join becomes `explode(bands)` + an equi-self-join
on (band_idx, band_hash), which Catalyst executes as an ordinary
shuffle join (operators/candidates.py).

Parameters: num_perm=128 like the reference (settings.py:41-42); the
banding (b=16, r=8) is pinned explicitly instead of datasketch's
threshold optimizer — (1/16)^(1/8) ≈ 0.707 reproduces the reference's
0.7 LSH threshold s-curve deterministically.

Hash family: 3-char shingles hashed with CRC32 (deterministic across
processes/platforms), then 128 universal-hash permutations
h_i(x) = (a_i*x + b_i) mod p over a Mersenne prime, min per permutation
— the standard construction (Broder 1997), evaluated with numpy over
whole Arrow batches.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

NUM_PERM = 128
LSH_BANDS = 16
LSH_ROWS = 8  # LSH_BANDS * LSH_ROWS == NUM_PERM
_MERSENNE = (1 << 61) - 1
_MAXH = (1 << 32) - 1
_EMPTY_SENTINEL = _MAXH  # datasketch-style init value for "no shingles"

SIMHASH_BITS = 64
SIMHASH_BANDS = 4  # 16 bits per band -> catches hamming distance <= 3


def _perm_params(num_perm: int = NUM_PERM, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) universal-hash parameters (seeded PCG64)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


_A, _B = _perm_params()


def shingle_hashes(text: str, k: int = 3, unit: str = "token") -> np.ndarray:
    """CRC32 hashes of the shingle set of a string.

    unit='char': k-char shingles — the reference's convention for SHORT
    name strings (preprocessing.py:155-159; texts shorter than k hash
    whole). unit='token': whitespace tokens — the right granularity for
    body text: the signature then estimates token Jaccard, and two
    unrelated web pages share ~0 shingles instead of ~60% of their
    character-trigram space (which would make every LSH band a hot key
    at 10^12 docs)."""
    if unit == "token":
        toks = set(text.split())
        if not toks:
            return np.array([zlib.crc32(text.encode("utf-8"))], dtype=np.uint64)
        return np.unique(
            np.fromiter(
                (zlib.crc32(t.encode("utf-8")) for t in toks),
                dtype=np.uint64,
                count=len(toks),
            )
        )
    data = text.encode("utf-8")
    if len(text) < k:
        return np.array([zlib.crc32(data)], dtype=np.uint64)
    # hash character shingles; encode per shingle to respect multi-byte
    # chars identically to the reference's str slicing
    return np.unique(
        np.fromiter(
            (zlib.crc32(text[i : i + k].encode("utf-8")) for i in range(len(text) - k + 1)),
            dtype=np.uint64,
        )
    )


def minhash_signature(
    text: str | None, num_perm: int = NUM_PERM, unit: str = "token"
) -> list[int] | None:
    """MinHash signature as a Python list (None for empty input)."""
    if text is None or text == "":
        return None
    x = shingle_hashes(text, unit=unit)
    # (num_perm, n_shingles) universal hashes, min over shingles
    ph = (
        (_A[:num_perm, None] * x[None, :] + _B[:num_perm, None]) % _MERSENNE
    ) & _MAXH
    return ph.min(axis=1).astype(np.int64).tolist()


def batch_minhash(texts: pd.Series) -> pd.Series:
    return pd.Series(
        [minhash_signature(t) for t in texts], index=texts.index, dtype="object"
    )


def minhash_udf() -> Column:
    return F.pandas_udf(batch_minhash, ArrayType(LongType()))


def band_hashes(sig: list[int] | None, bands: int = LSH_BANDS, rows: int = LSH_ROWS) -> list[int] | None:
    """Collapse a signature into one 64-bit hash per band. Band index is
    baked into the hash so a single column can be exploded and joined."""
    if sig is None:
        return None
    a = np.asarray(sig, dtype=np.uint64).reshape(bands, rows)
    out = np.full(bands, 1469598103934665603, dtype=np.uint64)  # FNV offset
    prime = np.uint64(1099511628211)
    for r in range(rows):
        out = (out ^ a[:, r]) * prime
    # mix band index in so band 0 and band 1 never collide cross-band
    out = out ^ (np.arange(bands, dtype=np.uint64) << np.uint64(56))
    return out.astype(np.int64).tolist()


def batch_band_hashes(sigs: pd.Series) -> pd.Series:
    return pd.Series(
        [band_hashes(s) for s in sigs], index=sigs.index, dtype="object"
    )


def band_hashes_udf() -> Column:
    return F.pandas_udf(batch_band_hashes, ArrayType(LongType()))


# ---------------------------------------------------------------------------
# SimHash (north_star: simhash-of-extracted-text blocking key)
# ---------------------------------------------------------------------------


def _token_hash64(tok: str) -> int:
    """64-bit deterministic token hash built from two salted CRC32s."""
    b = tok.encode("utf-8")
    return (zlib.crc32(b) << 32) | zlib.crc32(b, 0x9E3779B9)


def simhash64(text: str | None) -> int | None:
    """Charikar SimHash over whitespace tokens (unweighted)."""
    if text is None or text == "":
        return None
    toks = text.split()
    if not toks:
        return None
    hashes = np.fromiter((_token_hash64(t) for t in toks), dtype=np.uint64)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int32
    )
    votes = bits.sum(axis=0) * 2 - len(toks)  # (+1 / -1 votes)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out.astype(np.int64).view(np.int64))


def batch_simhash(texts: pd.Series) -> pd.Series:
    return pd.Series(
        [simhash64(t) for t in texts], index=texts.index, dtype="object"
    ).astype("Int64")


def simhash_udf() -> Column:
    return F.pandas_udf(batch_simhash, LongType())


def simhash_bands(h: int | None, bands: int = SIMHASH_BANDS) -> list[int] | None:
    """Split a 64-bit simhash into `bands` segments, band index baked in.
    Two documents within hamming distance (bands-1) share >= 1 band."""
    if h is None:
        return None
    u = np.uint64(np.int64(h).view(np.uint64)) if not isinstance(h, np.uint64) else h
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)
    out = []
    for i in range(bands):
        seg = (u >> np.uint64(i * width)) & mask
        out.append(int(seg) | (i << 60))
    return out


def batch_simhash_bands(hs: pd.Series) -> pd.Series:
    return pd.Series(
        [simhash_bands(None if pd.isna(h) else int(h)) for h in hs],
        index=hs.index,
        dtype="object",
    )


def simhash_bands_udf() -> Column:
    return F.pandas_udf(batch_simhash_bands, ArrayType(LongType()))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")

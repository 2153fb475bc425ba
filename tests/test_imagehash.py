"""dHash + banded image near-dup (operators/imagehash.py)."""

import numpy as np
import pytest

from aml_entity_resolution_assignment_spark.operators.imagehash import (
    HASH_H,
    HASH_W,
    dhash,
    dhash_images,
    image_neardup,
    luma,
)

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, mime string, "
    "width int, height int, duration_ms long"
)


def _pgm(img: np.ndarray) -> bytes:
    h, w = img.shape
    return f"P5\n{w} {h}\n255\n".encode() + img.tobytes()


def _rand_img(seed: int, h: int = 8, w: int = 9) -> np.ndarray:
    return np.random.RandomState(seed).randint(0, 256, (h, w), np.uint8)


def test_dhash_known_patterns():
    ramp = np.tile(np.arange(9, dtype=np.uint8) * 10, (8, 1))
    assert dhash(ramp) == 0  # monotonically increasing rows: no bit set
    assert dhash(ramp[:, ::-1].copy()) == -1  # all 64 bits set
    # single gradient flip -> exactly one bit, at the documented
    # row-major MSB-first position: (0,0) is bit 63
    img = ramp.copy()
    img[0, 0] = 255
    assert dhash(img) == -(1 << 63)


def test_dhash_resize_and_luma_invariance():
    img = _rand_img(7)
    big = np.kron(img, np.ones((4, 4), np.uint8))  # 4x nearest upscale
    assert dhash(big) == dhash(img)
    rgb = np.stack([img] * 3, axis=-1)
    assert dhash(rgb) == dhash(img)  # equal channels -> same luma


def test_luma_integer_definition():
    px = np.array([[[255, 0, 0]]], np.uint8)
    assert luma(px)[0, 0] == (299 * 255) // 1000
    px = np.array([[[10, 20, 30]]], np.uint8)
    assert luma(px)[0, 0] == (299 * 10 + 587 * 20 + 114 * 30) // 1000


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_neardup_exact_vs_bruteforce(spark):
    """Banded join output == brute-force Hamming filter (exactness for
    max_hamming <= bands-1), on a corpus of seeded noise + planted
    near-dups + an undecodable payload."""
    rng = np.random.RandomState(42)
    imgs = {}
    for i in range(30):
        imgs[f"d{i:02d}"] = _rand_img(i, 16, 17)
    # planted near-dups: flip a few pixels hard enough to move <=3 bits
    base = imgs["d03"]
    for j, flips in [(1, 1), (2, 3)]:
        v = base.copy()
        for _ in range(flips):
            r, c = rng.randint(0, 16), rng.randint(0, 17)
            v[r, c] = 255 - int(v[r, c])
        imgs[f"p{j}"] = v
    rows = [
        (mid, "image", _pgm(img), "image/x-pgm", img.shape[1], img.shape[0],
         None)
        for mid, img in imgs.items()
    ]
    rows.append(("bad", "image", b"\xde\xad", "image/jpeg", 0, 0, None))
    rows.append(("nul", "image", None, "image/jpeg", 0, 0, None))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    got = {
        (r["media_a"], r["media_b"]): r["hamming"]
        for r in image_neardup(media, max_hamming=6, bands=8).collect()
    }
    hashes = {mid: dhash(img) for mid, img in imgs.items()}
    ids = sorted(hashes)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = _hamming(hashes[a], hashes[b])
            if d <= 6:
                want[(a, b)] = d
    assert got == want
    assert any(k in want for k in [("d03", "p1"), ("d03", "p2")])


def test_neardup_threshold_guard(spark):
    media = spark.createDataFrame([], MEDIA_SCHEMA)
    with pytest.raises(ValueError, match="exceeds the exactness bound"):
        image_neardup(media, max_hamming=8, bands=8)
    with pytest.raises(ValueError, match="divide 64"):
        image_neardup(media, max_hamming=2, bands=7)


def test_dhash_images_null_handling(spark):
    img = _rand_img(1)
    media = spark.createDataFrame(
        [
            ("a", "image", _pgm(img), "image/x-pgm", 9, 8, None),
            ("b", "image", b"nope", "image/jpeg", 0, 0, None),
            ("c", "image", None, "image/jpeg", 0, 0, None),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r["dhash"] for r in dhash_images(media).collect()}
    assert rows["a"] == dhash(img)
    assert rows["b"] is None and rows["c"] is None


def test_neardup_partitioning_invariant(spark):
    """Signature + pair set identical at 1 and 8 partitions."""
    imgs = {f"m{i}": _rand_img(100 + i, 12, 13) for i in range(12)}
    rows = [
        (mid, "image", _pgm(img), "image/x-pgm", 13, 12, None)
        for mid, img in imgs.items()
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out1 = sorted(
        map(tuple, image_neardup(media.repartition(1), 6, 8).collect())
    )
    out8 = sorted(
        map(tuple, image_neardup(media.repartition(8), 6, 8).collect())
    )
    assert out1 == out8

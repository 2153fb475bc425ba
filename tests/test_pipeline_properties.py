"""Property-based invariants (hypothesis) for the round-5 pipeline
operators — pure-Python mirrors where the semantics are sequential,
plus an APNG codec roundtrip.  Spark-free: the operators' kernels are
expressed as column expressions, so the properties here pin the
ALGORITHMS (chunk coverage, winnowing guarantee, APNG compositing)
against randomized inputs; the Spark-vs-oracle equivalence is pinned
separately by the DuckDB twins."""

import hashlib
import re

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_common = dict(
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
    max_examples=40,
)


def _chunk_starts(n, chunk, stride):
    """Reference start rule (operators/packing.py:chunk_documents)."""
    if n <= 0:
        return []
    starts = list(range(0, max(n - 1, 0) + 1, stride))
    return [s for s in starts if s == 0 or s - stride + chunk < n]


@given(
    n=st.integers(min_value=0, max_value=400),
    chunk=st.integers(min_value=1, max_value=64),
    frac=st.floats(min_value=0.1, max_value=1.0),
)
@settings(**_common)
def test_chunk_starts_cover_every_token_without_waste(n, chunk, frac):
    stride = max(1, min(chunk, int(chunk * frac)))
    starts = _chunk_starts(n, chunk, stride)
    if n == 0:
        assert starts == []
        return
    covered = set()
    for s in starts:
        assert 0 <= s < n  # every chunk has at least one token
        covered.update(range(s, min(s + chunk, n)))
    assert covered == set(range(n))  # total coverage
    # no chunk is fully contained in its predecessor
    for prev, s in zip(starts, starts[1:]):
        assert min(s + chunk, n) > min(prev + chunk, n)


def _winnow_ref(text, k, w):
    s = re.sub(r"[^a-z0-9]", "", text.lower())
    if len(s) < k:
        return set()
    hl = [
        hashlib.md5(s[i : i + k].encode()).hexdigest()
        for i in range(len(s) - k + 1)
    ]
    out = set()
    for j in range(max(len(hl) - w + 1, 1)):
        sl = hl[j : j + w]
        m = min(sl)
        out.add((j + max(i for i, v in enumerate(sl) if v == m), m))
    return out


@given(
    a=st.text(alphabet="ab dk9", min_size=0, max_size=60),
    b=st.text(alphabet="ab dk9", min_size=0, max_size=60),
    core=st.text(alphabet="xyzw12", min_size=8, max_size=20),
)
@settings(**_common)
def test_winnowing_guarantee_shared_substring_shares_fingerprint(a, b, core):
    # k=5, w=4: any shared canonical substring of length >= w+k-1 = 8
    # must contribute at least one common fingerprint HASH
    k, w = 5, 4
    fa = {h for _, h in _winnow_ref(a + core + a, k, w)}
    fb = {h for _, h in _winnow_ref(b + core + b, k, w)}
    assert fa & fb


@given(
    lens=st.lists(st.integers(min_value=0, max_value=50), max_size=40),
    shard=st.integers(min_value=1, max_value=200),
)
@settings(**_common)
def test_shard_assignment_reference_is_balanced(lens, shard):
    # reference form of shard_by_tokens: exclusive running sum // shard
    acc, assign = 0, []
    for n in lens:
        assign.append(acc // shard)
        acc += n
    assert assign == sorted(assign)  # shard ids are non-decreasing
    # definition holds doc-by-doc: shard s iff start in [s*B, (s+1)*B)
    acc = 0
    for sid, n in zip(assign, lens):
        assert sid * shard <= acc < (sid + 1) * shard
        acc += n
    # whole docs never split, so a shard overflows its budget by less
    # than one document: total(s) < B + max doc length
    totals = {}
    for sid, n in zip(assign, lens):
        totals[sid] = totals.get(sid, 0) + n
    if lens:
        bound = shard + max(lens)
        assert all(t <= bound for t in totals.values())


@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    n=st.integers(min_value=1, max_value=5),
    h=st.integers(min_value=1, max_value=12),
    w=st.integers(min_value=1, max_value=12),
    rgba=st.booleans(),
)
@settings(**_common)
def test_apng_full_frame_roundtrip(seed, n, h, w, rgba):
    from aml_entity_resolution_assignment_spark.functions.png import (
        decode_apng,
        encode_apng,
    )

    rng = np.random.RandomState(seed)
    c = 4 if rgba else 3
    frames = [rng.randint(0, 256, (h, w, c), np.uint8) for _ in range(n)]
    out, delays = decode_apng(encode_apng(frames, delays_ms=[17] * n))
    assert out.shape == (n, h, w, 4)
    assert delays == [17] * n
    for i, f in enumerate(frames):
        assert np.array_equal(out[i, :, :, :3], f[:, :, :3])
        exp_a = f[:, :, 3] if rgba else np.full((h, w), 255, np.uint8)
        assert np.array_equal(out[i, :, :, 3], exp_a)


# ------------------------------------------------------- edit join lemma

def _edit_seg(l, k, i):
    """Segment convention mirror (operators/joins.py:_segments)."""
    base, rem = l // k, l % k
    slen = base + (1 if i < rem else 0)
    sstart = i * base + min(i, rem)
    return sstart, slen


def _edit_index_keys(s, d):
    k = d + 1
    return {
        (len(s), i) + (s[st : st + ln],)
        for i in range(k)
        for st, ln in [_edit_seg(len(s), k, i)]
    }


def _edit_probe_keys(r, d):
    k, m, out = d + 1, len(r), set()
    for l2 in range(max(m - d, 0), m + d + 1):
        for i in range(k):
            sstart, slen = _edit_seg(l2, k, i)
            plo, phi = max(sstart - d, 0), min(sstart + d, m - slen)
            for p in range(plo, phi + 1):
                out.add((l2, i, r[p : p + slen]))
    return out


@given(
    base=st.text(alphabet="abc", max_size=24),
    d=st.integers(min_value=0, max_value=3),
    data=st.data(),
)
@settings(**_common)
def test_edit_join_pigeonhole_never_misses(base, d, data):
    """PassJoin completeness (operators/joins.py:edit_distance_self_join):
    apply at most d random edits to `base`; the probe keys of either
    string MUST intersect the index keys of the other — the pair meets
    in the equi-join before the levenshtein verify ever runs."""
    s = list(base)
    n_edits = data.draw(st.integers(min_value=0, max_value=d))
    for _ in range(n_edits):
        op = data.draw(st.sampled_from("ids"))
        if op == "i":
            s.insert(data.draw(st.integers(0, len(s))), data.draw(st.sampled_from("abc")))
        elif s:
            p = data.draw(st.integers(0, len(s) - 1))
            if op == "d":
                del s[p]
            else:
                s[p] = data.draw(st.sampled_from("abc"))
    other = "".join(s)
    assert _edit_probe_keys(other, d) & _edit_index_keys(base, d)
    assert _edit_probe_keys(base, d) & _edit_index_keys(other, d)

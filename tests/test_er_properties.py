"""Property-based invariants (hypothesis) for the round-5 classical-ER
operators: Monge-Elkan, CLK/Dice PPRL, Fellegi-Sunter EM, and the
pure-python SNM oracle model. All driver-side (no Spark session) —
the Spark paths are pinned to these same kernels by their own tests."""

import math

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aml_entity_resolution_assignment_spark.functions import pprl as PP
from aml_entity_resolution_assignment_spark.functions import similarity as SIM
from aml_entity_resolution_assignment_spark.operators import fellegi as FS

_common = dict(
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
    max_examples=50,
)

_token = st.text(alphabet="abcdefgh ", min_size=0, max_size=8).map(str.strip)
_tokens = st.lists(_token.filter(bool), min_size=1, max_size=5)


@given(a=_tokens)
@settings(**_common)
def test_monge_elkan_identity(a):
    assert SIM.monge_elkan(a, a) == 1.0


@given(a=_tokens, b=_tokens)
@settings(**_common)
def test_monge_elkan_bounded(a, b):
    v = SIM.monge_elkan(a, b)
    assert 0.0 <= v <= 1.0


@given(a=_tokens, b=_tokens)
@settings(**_common)
def test_monge_elkan_monotone_in_b(a, b):
    """Adding a candidate token to B can only improve each A-token's
    best match, so the directional score is monotone in B."""
    base = SIM.monge_elkan(a, b)
    assert SIM.monge_elkan(a, b + [a[0]]) >= base


@given(a=_tokens, b=_tokens)
@settings(**_common)
def test_monge_elkan_batch_equals_scalar(a, b):
    got = SIM.batch_monge_elkan(pd.Series([a]), pd.Series([b])).iloc[0]
    assert math.isclose(got, SIM.monge_elkan(a, b), abs_tol=1e-12)


_field = st.text(alphabet="abcdef _-", min_size=0, max_size=20)


@given(s=_field)
@settings(**_common)
def test_clk_dice_identity_and_bounds(s):
    pos = PP.clk_positions(s)
    assert pos  # padding guarantees at least one gram
    assert all(0 <= p < PP.CLK_BITS for p in pos)
    words = PP._pack_words(pos)
    assert len(words) == PP.CLK_WORDS
    assert all(0 <= w < (1 << 32) for w in words)
    # dice(s, s) == 1
    assert 2 * len(pos & pos) / (len(pos) + len(pos)) == 1.0


@given(a=_field, b=_field)
@settings(**_common)
def test_clk_dice_symmetric_bounded(a, b):
    pa, pb = PP.clk_positions(a), PP.clk_positions(b)
    d = 2 * len(pa & pb) / (len(pa) + len(pb))
    d2 = 2 * len(pb & pa) / (len(pb) + len(pa))
    assert d == d2
    assert 0.0 <= d <= 1.0


_pattern_counts = st.lists(
    st.tuples(
        st.tuples(*[st.integers(0, 1)] * 3),
        st.integers(min_value=1, max_value=10_000),
    ),
    min_size=1,
    max_size=8,
    unique_by=lambda t: t[0],
)


@given(pats=_pattern_counts, iters=st.integers(1, 25))
@settings(**_common)
def test_fs_em_parameters_stay_in_open_unit_interval(pats, iters):
    lam, m, u = FS.fs_em(pats, 3, iters=iters)
    for v in [lam, *m, *u]:
        assert 0.0 < v < 1.0


def _fs_loglik(pats, k, lam, m, u):
    ll = 0.0
    for g, n in pats:
        pm, pu = lam, 1 - lam
        for j in range(k):
            pm *= m[j] if g[j] else 1 - m[j]
            pu *= u[j] if g[j] else 1 - u[j]
        ll += n * math.log(pm + pu)
    return ll


@given(pats=_pattern_counts, iters=st.integers(1, 30))
@settings(**_common)
def test_fs_em_loglik_nondecreasing(pats, iters):
    """EM's core guarantee: another iteration never decreases the
    observed-data log-likelihood (tiny slack for the deterministic
    per-step parameter rounding)."""
    a = FS.fs_em(pats, 3, iters=iters)
    b = FS.fs_em(pats, 3, iters=iters + 1)
    assert _fs_loglik(pats, 3, *b) >= _fs_loglik(pats, 3, *a) - 1e-6


def _python_snm(rows, window):
    srt = sorted(rows, key=lambda r: (r[1], r[0]))
    out = set()
    for i, (ida, _) in enumerate(srt):
        for d in range(1, window):
            if i + d < len(srt):
                idb = srt[i + d][0]
                out.add((min(ida, idb), max(ida, idb)))
    return out


@given(
    keys=st.lists(st.text(alphabet="ab", min_size=0, max_size=3), min_size=2, max_size=40),
    w=st.integers(2, 6),
)
@settings(**_common)
def test_snm_model_pair_count_formula(keys, w):
    """The python SNM model (pinned to Spark by test_snm) emits exactly
    (w-1)*N - w*(w-1)/2 pairs when N >= w, regardless of key skew."""
    rows = list(enumerate(keys))
    n = len(rows)
    got = 0
    srt = sorted(rows, key=lambda r: (r[1], r[0]))
    for i in range(n):
        got += max(0, min(w - 1, n - 1 - i))
    expected = sum(min(w - 1, n - 1 - i) for i in range(n))
    assert got == expected
    if n >= w:
        assert got == (w - 1) * n - w * (w - 1) // 2
    # and the pair set has that cardinality (ids unique -> no dedup loss)
    assert len(_python_snm(rows, w)) == got

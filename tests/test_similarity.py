"""Kernel parity tests: our scalar kernels vs DuckDB's implementations
(which agree with jellyfish on boost threshold / empty-string / full-DL
conventions — SURVEY.md §5.2 item 4)."""

import random
import string

import duckdb
import pytest

from aml_entity_resolution_assignment_spark.functions import similarity as sim


def _rand_strings(n, rng, alphabet=string.ascii_lowercase + "  .", maxlen=18):
    out = []
    for _ in range(n):
        ln = rng.randint(0, maxlen)
        out.append("".join(rng.choice(alphabet) for _ in range(ln)).strip())
    return out


KNOWN_JW = [
    ("martha", "marhta", 0.9611111111111111),
    ("dwayne", "duane", 0.8400000000000001),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("", "", 0.0),
    ("", "abc", 0.0),
    ("abc", "abc", 1.0),
]


@pytest.mark.parametrize("a,b,expected", KNOWN_JW)
def test_jaro_winkler_known(a, b, expected):
    assert sim.jaro_winkler_similarity(a, b) == pytest.approx(expected, abs=1e-12)


def test_jaro_winkler_vs_duckdb_random():
    rng = random.Random(42)
    pairs = list(zip(_rand_strings(500, rng), _rand_strings(500, rng)))
    con = duckdb.connect()
    for a, b in pairs:
        want = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        got = sim.jaro_winkler_similarity(a, b)
        assert got == pytest.approx(want, abs=1e-9), (a, b)


def test_levenshtein_vs_duckdb_random():
    rng = random.Random(7)
    pairs = list(zip(_rand_strings(300, rng), _rand_strings(300, rng)))
    con = duckdb.connect()
    for a, b in pairs:
        if not a or not b:
            continue  # duckdb levenshtein errors on empty in some versions
        want = con.execute("select levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert sim.levenshtein_distance(a, b) == want, (a, b)


def test_damerau_levenshtein_vs_duckdb_random():
    rng = random.Random(13)
    pairs = list(zip(_rand_strings(300, rng), _rand_strings(300, rng)))
    con = duckdb.connect()
    for a, b in pairs:
        if not a or not b:
            continue
        want = con.execute(
            "select damerau_levenshtein(?, ?)", [a, b]
        ).fetchone()[0]
        assert sim.damerau_levenshtein_distance(a, b) == want, (a, b)


def test_damerau_is_unrestricted():
    # 'a cat' -> 'a abct' is 2 under full DL, 3 under OSA
    assert sim.damerau_levenshtein_distance("a cat", "a abct") == 2
    assert sim.damerau_levenshtein_distance("ca", "ac") == 1


def test_normalized_edit_score_reference_conventions():
    # reference matching.py:263-270: empty either side -> 0.0; exact -> 1.0
    assert sim.normalized_edit_score("", "abc") == 0.0
    assert sim.normalized_edit_score("abc", "abc") == 1.0
    # dist=1, maxlen=9 -> 1 - 1/9
    assert sim.normalized_edit_score("123456789", "123456798", damerau=True) == (
        pytest.approx(1 - 1 / 9)
    )


def test_token_jaccard():
    assert sim.token_jaccard("a b c", "b c d") == pytest.approx(2 / 4)
    assert sim.token_jaccard("", "a") == 0.0
    assert sim.token_jaccard("x x x", "x") == 1.0


# ---------------------------------------------------------------------------
# Vectorized batch kernels vs their scalar oracles (no per-row Python on
# the hot path — the scalar kernels exist only as parity oracles here).
# ---------------------------------------------------------------------------


def test_batch_jaro_winkler_matches_scalar():
    import numpy as np
    import pandas as pd

    rng = random.Random(99)
    a = _rand_strings(800, rng, maxlen=40)
    b = _rand_strings(800, rng, maxlen=40)
    # force the fast paths + the scalar long-string fallback + unicode
    a += ["", "same", "żółć gęśla jaźń", "x" * 400, "pref match here"]
    b += ["x", "same", "zolc gesla jazn", "x" * 399 + "y", "pref match there"]
    got = sim.batch_jaro_winkler(pd.Series(a), pd.Series(b)).to_numpy()
    want = np.array([sim.jaro_winkler_similarity(x, y) for x, y in zip(a, b)])
    assert np.allclose(got, want, atol=0)


def test_batch_hashset_jaccard_matches_token_jaccard():
    import numpy as np
    import pandas as pd

    from aml_entity_resolution_assignment_spark.functions.minhash import (
        batch_token_hashset,
    )

    rng = random.Random(3)
    a = _rand_strings(600, rng, maxlen=60) + [None, "", "a b", "solo"]
    b = _rand_strings(600, rng, maxlen=60) + ["a", None, "b c", "solo"]
    pa = batch_token_hashset(pd.Series(a))
    pb = batch_token_hashset(pd.Series(b))
    got = sim.batch_hashset_jaccard(pa, pb).to_numpy()
    want = np.array(
        [sim.token_jaccard(x or "", y or "") for x, y in zip(a, b)]
    )
    assert np.allclose(got, want)


def test_batch_packed_sig_similarity_matches_elementwise():
    import numpy as np
    import pandas as pd

    rng = np.random.Generator(np.random.PCG64(5))
    sigs = [
        rng.integers(0, 2**32, 128, dtype=np.uint32).tobytes() for _ in range(64)
    ]
    a = sigs + [None, sigs[0]]
    b = [sigs[0]] * 64 + [sigs[1], None]
    got = sim.batch_packed_sig_similarity(pd.Series(a), pd.Series(b)).to_numpy()
    want = []
    for xa, xb in zip(a, b):
        if not xa or not xb:
            want.append(0.0)
        else:
            want.append(
                float(
                    np.mean(
                        np.frombuffer(xa, np.uint32) == np.frombuffer(xb, np.uint32)
                    )
                )
            )
    assert np.allclose(got, np.array(want))


def test_batch_edit_score_matches_scalar():
    import numpy as np
    import pandas as pd

    rng = random.Random(17)
    a = _rand_strings(800, rng, maxlen=40)
    b = _rand_strings(800, rng, maxlen=40)
    # fast paths + long-string scalar fallback + unicode + near-misses
    a += ["", "same", "żółć gęśla", "x" * 200, "a cat", "ca", "abcdef"]
    b += ["x", "same", "zolc gesla", "x" * 199 + "y", "a abct", "ac", "abdcef"]
    for damerau in (False, True):
        got = sim.batch_edit_score(
            pd.Series(a), pd.Series(b), damerau=damerau
        ).to_numpy()
        want = np.array(
            [sim.normalized_edit_score(x, y, damerau=damerau) for x, y in zip(a, b)]
        )
        assert np.allclose(got, want, atol=0), damerau


def test_batch_jaro_winkler_nul_codepoints():
    """A literal NUL in either string must not match zero padding
    (would inflate `common` past len1 and produce jaro > 1)."""
    import numpy as np
    import pandas as pd

    a = ["ab", "ab\x00", "\x00\x00", "abc"]
    b = ["ab\x00\x00", "ab", "ab", "a\x00c"]
    got = sim.batch_jaro_winkler(pd.Series(a), pd.Series(b)).to_numpy()
    want = np.array([sim.jaro_winkler_similarity(x, y) for x, y in zip(a, b)])
    assert (got <= 1.0).all()
    assert np.allclose(got, want, atol=0)


def test_batch_edit_score_nul_codepoints():
    import numpy as np
    import pandas as pd

    a = ["ab", "ab\x00", "\x00\x00", "abc"]
    b = ["ab\x00\x00", "ab", "ab", "a\x00c"]
    for damerau in (False, True):
        got = sim.batch_edit_score(
            pd.Series(a), pd.Series(b), damerau=damerau
        ).to_numpy()
        want = np.array(
            [sim.normalized_edit_score(x, y, damerau=damerau) for x, y in zip(a, b)]
        )
        assert np.allclose(got, want, atol=0)

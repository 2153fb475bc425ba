"""Monge-Elkan hybrid similarity (functions/similarity.py)."""

import pytest
import pandas as pd

from aml_entity_resolution_assignment_spark.functions import similarity as SIM


def test_scalar_definition():
    # ME(A,B) = mean over A of best JW in B
    a = ["john", "smith"]
    b = ["jon", "smyth", "dr"]
    expect = (
        max(SIM.jaro_winkler_similarity("john", t) for t in b)
        + max(SIM.jaro_winkler_similarity("smith", t) for t in b)
    ) / 2
    assert SIM.monge_elkan(a, b) == pytest.approx(expect)


def test_identical_sets_score_one():
    assert SIM.monge_elkan(["a", "bb"], ["bb", "a"]) == pytest.approx(1.0)


def test_directionality():
    # subset A of B scores 1 forward, < 1 backward
    assert SIM.monge_elkan(["john"], ["john", "zzz"]) == pytest.approx(1.0)
    assert SIM.monge_elkan(["john", "zzz"], ["john"]) < 1.0


def test_empty_sides():
    assert SIM.monge_elkan([], ["a"]) == 0.0
    assert SIM.monge_elkan(["a"], []) == 0.0


def test_batch_matches_scalar():
    rows_a = [["john", "smith"], ["mary"], [], ["x", "y", "z"], None]
    rows_b = [["jon", "smyth"], ["marie", "ann"], ["a"], ["x"], ["q"]]
    got = SIM.batch_monge_elkan(pd.Series(rows_a), pd.Series(rows_b))
    for g, ta, tb in zip(got, rows_a, rows_b):
        want = SIM.monge_elkan(ta or [], tb or [])
        assert g == pytest.approx(want)


def test_batch_preserves_index():
    s = SIM.batch_monge_elkan(
        pd.Series([["a"]], index=[42]), pd.Series([["a"]], index=[42])
    )
    assert list(s.index) == [42] and s.iloc[0] == pytest.approx(1.0)

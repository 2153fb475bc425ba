"""Rand / ARI / NMI clustering agreement (operators/evaluate.py)."""

import math
from collections import Counter

import pytest

from aml_entity_resolution_assignment_spark.operators.evaluate import (
    clustering_agreement,
)


def _py_reference(pairs):
    """Independent pure-python ARI/RI/NMI from the contingency table."""
    cells = Counter(pairs)
    rows = Counter()
    cols = Counter()
    for (p, t), c in cells.items():
        rows[p] += c
        cols[t] += c
    n = sum(cells.values())
    comb = lambda x: x * (x - 1) / 2  # noqa: E731
    s_cells = sum(comb(c) for c in cells.values())
    s_rows = sum(comb(c) for c in rows.values())
    s_cols = sum(comb(c) for c in cols.values())
    cn = comb(n)
    ri = 1 - (s_rows + s_cols - 2 * s_cells) / cn
    exp = s_rows * s_cols / cn
    mx = (s_rows + s_cols) / 2
    ari = (s_cells - exp) / (mx - exp) if abs(mx - exp) > 1e-12 else 1.0
    h_p = -sum((c / n) * math.log(c / n) for c in rows.values())
    h_t = -sum((c / n) * math.log(c / n) for c in cols.values())
    mi = sum(
        (c / n) * math.log(n * c / (rows[p] * cols[t]))
        for (p, t), c in cells.items()
    )
    if h_p > 1e-12 and h_t > 1e-12:
        nmi = mi / math.sqrt(h_p * h_t)
    else:
        nmi = 1.0 if (h_p <= 1e-12 and h_t <= 1e-12) else 0.0
    return ri, ari, nmi


def _run(spark, assign):
    pred = spark.createDataFrame(
        [(i, p) for i, (p, _) in enumerate(assign)], "id long, p string"
    )
    truth = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(assign)], "id long, t string"
    )
    row = clustering_agreement(
        pred, truth, id_col="id", pred_col="p", true_col="t"
    ).collect()[0]
    return row


def test_identical_clusterings_score_one(spark):
    assign = [("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"), ("c", "z")]
    r = _run(spark, assign)
    assert r["rand_index"] == pytest.approx(1.0)
    assert r["adjusted_rand"] == pytest.approx(1.0)
    assert r["nmi"] == pytest.approx(1.0)


def test_matches_python_reference(spark):
    import random

    rng = random.Random(5)
    assign = [
        (f"p{rng.randrange(4)}", f"t{rng.randrange(3)}") for _ in range(300)
    ]
    r = _run(spark, assign)
    ri, ari, nmi = _py_reference(assign)
    assert r["rand_index"] == pytest.approx(ri, abs=1e-9)
    assert r["adjusted_rand"] == pytest.approx(ari, abs=1e-9)
    assert r["nmi"] == pytest.approx(nmi, abs=1e-9)
    # random independent clusterings: ARI near zero, far from RI
    assert abs(r["adjusted_rand"]) < 0.1


def test_label_permutation_invariant(spark):
    assign = [("a", "x"), ("a", "x"), ("b", "y"), ("b", "x"), ("c", "z")]
    renamed = [(p.upper() + "_1", t) for p, t in assign]
    r1 = _run(spark, assign)
    r2 = _run(spark, renamed)
    for c in ("rand_index", "adjusted_rand", "nmi"):
        assert r1[c] == pytest.approx(r2[c], abs=1e-12)


def test_single_cluster_degenerate(spark):
    # both trivial -> perfect agreement by convention
    r = _run(spark, [("a", "x"), ("a", "x"), ("a", "x")])
    assert r["adjusted_rand"] == pytest.approx(1.0)
    assert r["nmi"] == pytest.approx(1.0)
    # one trivial, one not -> NMI 0, ARI 0 (expected == observed)
    r = _run(spark, [("a", "x"), ("a", "y"), ("a", "x")])
    assert r["nmi"] == pytest.approx(0.0)
    assert r["adjusted_rand"] == pytest.approx(0.0)


def test_blocking_quality_hand_computed(spark):
    from aml_entity_resolution_assignment_spark.operators.evaluate import (
        blocking_quality,
    )

    cand = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 5)], "id_a long, id_b long"
    )
    true = spark.createDataFrame(
        [(1, 2), (4, 5), (6, 7), (8, 9)], "id_a long, id_b long"
    )
    r = blocking_quality(cand, true, n_records=10).collect()[0]
    assert r["n_candidates"] == 3 and r["n_true"] == 4 and r["n_overlap"] == 2
    assert r["pairs_completeness"] == 0.5  # 2/4
    assert r["pairs_quality"] == pytest.approx(2 / 3)
    assert r["reduction_ratio"] == pytest.approx(1 - 3 / 45)


def test_blocking_quality_empty_candidates(spark):
    from aml_entity_resolution_assignment_spark.operators.evaluate import (
        blocking_quality,
    )

    empty = spark.createDataFrame([], "id_a long, id_b long")
    true = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = blocking_quality(empty, true, n_records=5).collect()[0]
    assert r["pairs_completeness"] == 0.0
    assert r["pairs_quality"] == 0.0
    assert r["reduction_ratio"] == 1.0

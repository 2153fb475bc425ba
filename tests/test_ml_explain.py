"""explain_contributions (ml/model.py): faithful additive attribution
of the logistic logit — sum of parts equals the logit, ranking is by
|contribution| with deterministic tie-breaks."""

import math

import pytest
from pyspark.sql import functions as F

from aml_entity_resolution_assignment_spark.ml.model import (
    MODEL_FEATURES,
    explain_contributions,
)

COEFS = [2.5, -1.0, 0.5, 1.5, 3.0, -0.25, 0.75]
INTERCEPT = -1.0


def _feats(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, " + ", ".join(f"{c} double" for c in MODEL_FEATURES)
    )


def test_top3_ranking_and_logit(spark):
    rows = [(1, 0.9, 0.1, 0.2, 0.8, 0.95, 0.3, 1.0)]
    out = explain_contributions(
        _feats(spark, rows), COEFS, INTERCEPT
    ).collect()
    assert len(out) == 3
    got = [(r["feature"], r["rank"]) for r in out]
    # contributions: host 2.25, url -0.1, title 0.1, jacc 1.2,
    # minhash 2.85, simhash -0.075, lang 0.75
    assert sorted(got, key=lambda x: x[1]) == [
        ("minhash_sim", 1), ("host_score", 2), ("jaccard_score", 3),
    ]
    want_logit = (
        2.5 * 0.9 - 1.0 * 0.1 + 0.5 * 0.2 + 1.5 * 0.8 + 3.0 * 0.95
        - 0.25 * 0.3 + 0.75 * 1.0 - 1.0
    )
    assert math.isclose(out[0]["logit"], want_logit, rel_tol=1e-12)


def test_sum_of_all_parts_equals_logit(spark):
    rows = [(7, 0.31, 0.2, 0.88, 0.18, 0.3, 0.94, 0.0)]
    full = explain_contributions(
        _feats(spark, rows), COEFS, INTERCEPT, top=len(COEFS)
    ).collect()
    assert len(full) == len(COEFS)
    total = sum(r["contribution"] for r in full) + INTERCEPT
    assert math.isclose(total, full[0]["logit"], rel_tol=1e-12)


def test_tie_breaks_on_feature_name(spark):
    # url (-1.0 * 0.5 = -0.5) and title (0.5 * 1.0 = 0.5) tie on abs
    rows = [(3, 0.0, 0.5, 1.0, 0.0, 0.0, 0.0, 0.0)]
    out = explain_contributions(
        _feats(spark, rows), COEFS, INTERCEPT, top=2
    ).collect()
    ranked = sorted(out, key=lambda r: r["rank"])
    assert [r["feature"] for r in ranked] == ["title_score", "url_score"]


def test_no_python_udf_in_plan(spark):
    rows = [(1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1)]
    df = explain_contributions(_feats(spark, rows), COEFS, INTERCEPT)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_mismatched_lengths_raise(spark):
    with pytest.raises(ValueError):
        explain_contributions(
            _feats(spark, [(1,) + (0.0,) * 7]), [1.0, 2.0], 0.0
        )


def test_partitioning_invariance(spark):
    rows = [
        (i, (i * 31 % 100) / 100, (i * 17 % 100) / 100,
         (i * 7 % 100) / 100, (i * 13 % 100) / 100,
         (i * 29 % 100) / 100, (i * 23 % 100) / 100, float(i % 2))
        for i in range(200)
    ]
    df = _feats(spark, rows)
    a = explain_contributions(df.repartition(1), COEFS, INTERCEPT)
    b = explain_contributions(df.repartition(8), COEFS, INTERCEPT)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

"""Single-pass data-quality checks."""

import pytest

from aml_entity_resolution_assignment_spark.operators.checks import (
    Check,
    quality_checks,
)


def test_metrics_and_verdicts(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0), (4, "b", None)],
        "id long, s string, v double",
    )
    out = quality_checks(
        df,
        [
            Check("completeness", "s", lo=0.9),        # 0.75 -> fail
            Check("completeness", "id", lo=1.0),       # 1.0 -> pass
            Check("uniqueness", "id", lo=1.0),          # 4/4 -> pass
            Check("uniqueness", "s", lo=1.0),           # 3 distinct/4 -> fail
            Check("min", "v", lo=0.0),                  # 10 -> pass
            Check("max", "v", hi=25.0),                 # 30 -> fail
            Check("mean", "v", lo=15.0, hi=25.0),       # 20 -> pass
        ],
    ).collect()
    got = {(r["check"], r["column"]): (r["metric"], r["passed"]) for r in out}
    assert got[("completeness", "s")] == (0.75, False)
    assert got[("completeness", "id")] == (1.0, True)
    assert got[("uniqueness", "id")] == (1.0, True)
    assert got[("uniqueness", "s")][1] is False
    assert got[("min", "v")] == (10.0, True)
    assert got[("max", "v")] == (30.0, False)
    assert got[("mean", "v")] == (20.0, True)
    # single aggregation pass: row order preserved
    assert [r["check"] for r in out][:2] == ["completeness", "completeness"]


def test_all_null_column_fails_not_errors(spark):
    df = spark.createDataFrame([(None,), (None,)], "v double")
    out = quality_checks(df, [Check("mean", "v", lo=0.0)]).collect()
    assert out[0]["metric"] is None and out[0]["passed"] is False


def test_bad_kind_and_empty():
    with pytest.raises(ValueError):
        Check("median", "x")
    with pytest.raises(ValueError):
        quality_checks(None, [])

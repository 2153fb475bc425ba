"""Golden-record survivorship (operators/golden.py)."""

import pytest

from aml_entity_resolution_assignment_spark.operators.golden import (
    golden_record,
)


def _fixture(spark):
    recs = spark.createDataFrame(
        [
            ("a1", "fr", "short", 10),
            ("a2", "en", "a much longer text", 99),
            ("a3", "en", None, 5),
            ("b1", "de", "solo", 7),
        ],
        "url string, lang string, text string, n int",
    )
    em = spark.createDataFrame(
        [("a1", 1), ("a2", 1), ("a3", 1), ("b1", 2)],
        "url string, predicted_entity_id long",
    )
    return recs, em


def test_survivorship_rules(spark):
    recs, em = _fixture(spark)
    out = {
        r["predicted_entity_id"]: r
        for r in golden_record(
            recs, em,
            rules={"lang": "mode", "text": "longest", "n": "max"},
        ).collect()
    }
    assert out[1]["n_members"] == 3
    assert out[1]["lang"] == "en"  # 2x en beats 1x fr
    assert out[1]["text"] == "a much longer text"
    assert out[1]["n"] == 99
    assert out[2]["lang"] == "de" and out[2]["text"] == "solo"


def test_mode_tiebreak_is_greatest_value(spark):
    recs = spark.createDataFrame(
        [("x1", "aa"), ("x2", "bb")], "url string, v string"
    )
    em = spark.createDataFrame(
        [("x1", 9), ("x2", 9)], "url string, predicted_entity_id long"
    )
    out = golden_record(recs, em, rules={"v": "mode"}).collect()[0]
    assert out["v"] == "bb"


def test_nulls_never_survive_unless_all_null(spark):
    recs = spark.createDataFrame(
        [("x1", None), ("x2", "real"), ("y1", None)],
        "url string, v string",
    )
    em = spark.createDataFrame(
        [("x1", 1), ("x2", 1), ("y1", 2)],
        "url string, predicted_entity_id long",
    )
    out = {
        r["predicted_entity_id"]: r["v"]
        for r in golden_record(recs, em, rules={"v": "mode"}).collect()
    }
    assert out[1] == "real"
    assert out[2] is None


def test_validation(spark):
    recs, em = _fixture(spark)
    with pytest.raises(ValueError, match="unsupported"):
        golden_record(recs, em, rules={"lang": "median"})
    with pytest.raises(ValueError, match="not in records"):
        golden_record(recs, em, rules={"nope": "mode"})


def test_partitioning_invariant(spark):
    recs, em = _fixture(spark)
    rules = {"lang": "mode", "text": "longest", "n": "min"}
    a = sorted(map(tuple, golden_record(recs, em, rules=rules).collect()))
    b = sorted(
        map(
            tuple,
            golden_record(recs.repartition(5), em.repartition(3), rules=rules).collect(),
        )
    )
    assert a == b

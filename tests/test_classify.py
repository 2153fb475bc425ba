"""Rule-cascade truth table at rule boundaries (FIXTURES.md §4;
reference decide_match_status /root/reference/src/matching.py:408-531)."""

import pytest

from aml_entity_resolution_assignment_spark.operators.classify import classify

BASE = {
    "id_a": "a",
    "id_b": "b",
    "host_score": 0.0,
    "url_score": 0.0,
    "title_score": 0.0,
    "jaccard_score": 0.0,
    "minhash_sim": 0.0,
    "simhash_sim": 0.0,
    "lang_match": 0,
    "host_match": 0,
    "title_both_present": 1,
    "ml_prob": 0.0,
}

SCHEMA = (
    "id_a string, id_b string, host_score double, url_score double, "
    "title_score double, jaccard_score double, minhash_sim double, "
    "simhash_sim double, lang_match int, host_match int, "
    "title_both_present int, ml_prob double"
)


def _classify_one(spark, **overrides):
    row = {**BASE, **overrides}
    df = spark.createDataFrame([tuple(row.values())], SCHEMA)
    return classify(df).collect()[0]


# (overrides, expected match_type, min confidence)
CASES = [
    # Rule 1 boundary: host_score >= 0.90 AND title > 0.85
    (dict(host_score=0.90, title_score=0.86), "match", 0.95),
    (dict(host_score=0.89, title_score=0.86), "no_match", 0.0),  # vetoed? no review fires -> no_match
    # R1 misses (title == 0.85 not >): review_host fires and host_score
    # 0.90 equals the veto guard (not < 0.9) so the veto is blocked
    (dict(host_score=0.90, title_score=0.85), "review", 0.60),
    # Rule 2: (url > .95 | host_match) & title > .80 & corroboration
    (dict(url_score=0.96, title_score=0.81, jaccard_score=0.51), "match", 0.90),
    (dict(host_match=1, title_score=0.81, minhash_sim=0.61), "match", 0.90),
    (dict(host_match=1, title_score=0.81, simhash_sim=0.91), "match", 0.90),
    # lang alone must NOT substitute for a strong identifier
    (dict(lang_match=1, title_score=0.81, jaccard_score=0.99), "no_match", 0.0),
    (dict(url_score=0.96, title_score=0.81), "no_match", 0.0),  # no corroboration
    # Rule 3: title > .85 & jaccard > .60
    (dict(title_score=0.86, jaccard_score=0.61), "match", 0.85),
    # Rule 4: title > .90 & url > .80
    (dict(title_score=0.91, url_score=0.81), "match", 0.85),
    # Rule 5: ml_prob > 0.80
    (dict(ml_prob=0.81), "match", 0.81),
    (dict(ml_prob=0.80), "review", 0.80),  # review_ml fires (> 0.2), no veto
    # Rule 6: title > .75 & jaccard > .80 & host > .80
    (dict(title_score=0.76, jaccard_score=0.81, host_score=0.81), "match", 0.95),
    # Review: strong host, weak title (host_score >= .85) — not vetoed
    # because ml < 0.1 but host_score >= veto guard 0.9? 0.85 < 0.9 -> vetoed!
    (dict(host_score=0.85), "no_match", 0.0),
    (dict(host_score=0.91, title_score=0.5), "review", 0.60),  # guard blocks veto
    # Review: title only > 0.9 but ml < 0.1 and guards low -> veto -> no_match
    (dict(title_score=0.91), "no_match", 0.0),
    # Same but moderate ml -> review survives
    (dict(title_score=0.91, ml_prob=0.15), "review", 0.50),
    # Exact url match only, ml moderate -> review 0.55
    (dict(url_score=1.0, ml_prob=0.15), "review", 0.55),
    # Doppelganger pattern: same title+lang, low content -> review (0.75)
    (dict(title_score=1.0, lang_match=1, ml_prob=0.3), "review", 0.75),
    # nothing -> no_match
    (dict(), "no_match", 0.0),
]


@pytest.mark.parametrize("overrides,expected,min_conf", CASES)
def test_rule_boundaries(spark, overrides, expected, min_conf):
    r = _classify_one(spark, **overrides)
    assert r["match_type"] == expected, (overrides, r["explanation"])
    assert r["confidence_score"] >= min_conf - 1e-9
    assert r["is_match"] == (1 if expected == "match" else 0)


def test_explanations_name_fired_rules(spark):
    r = _classify_one(spark, host_score=0.95, title_score=0.95, jaccard_score=0.7)
    assert "Rule 1" in r["explanation"]
    assert "Rule 3" in r["explanation"]


def test_veto_explanation(spark):
    r = _classify_one(spark, title_score=0.91)
    assert "Model Veto" in r["explanation"]
    assert r["match_type"] == "no_match"


def test_ml_prob_column_added_when_missing(spark):
    base = {k: v for k, v in BASE.items() if k != "ml_prob"}
    df = spark.createDataFrame(
        [tuple(base.values())], SCHEMA.rsplit(", ml_prob double", 1)[0]
    )
    out = classify(df)
    assert "ml_prob" in out.columns


def test_review_credit_counts(spark):
    from aml_entity_resolution_assignment_spark.operators.evaluate import (
        review_credit,
    )

    true_pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    match_pairs = spark.createDataFrame([(2, 1)], "id_a long, id_b long")
    review_pairs = spark.createDataFrame(
        [(3, 1), (9, 8)], "id_a long, id_b long"
    )
    row = review_credit(true_pairs, match_pairs, review_pairs).collect()[0]
    # FN = {(1,3),(2,3),(4,5)}; caught = {(1,3)} (orientation-normalized)
    assert (row["n_fn"], row["caught_in_review"], row["truly_missed"]) == (3, 1, 2)

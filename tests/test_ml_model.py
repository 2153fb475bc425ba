"""Training pipeline (T1-T4): candidate-labeled pairs -> logistic model
-> scoring path; model must separate match/non-match features."""

import pytest
from pyspark.sql import functions as F

from aml_entity_resolution_assignment_spark.ml.model import (
    MODEL_FEATURES,
    evaluate_model,
    label_pairs,
    score_with_model,
    train_model,
)
from aml_entity_resolution_assignment_spark.operators import blocking, candidates
from aml_entity_resolution_assignment_spark.operators.features import pair_features
from aml_entity_resolution_assignment_spark.sources.generator import generate_pages


@pytest.fixture(scope="module")
def labeled(spark):
    # high doppelgänger rate: candidate blocking is precise, so hard
    # negatives are rare at the default 5% — training needs both classes
    gen = generate_pages(spark, n_entities=150, seed=23, doppel_rate=0.5).cache()
    truth = gen.select("url", "entity_id")
    keyed = blocking.add_blocking_keys(gen.drop("entity_id")).cache()
    pairs = candidates.candidate_pairs(keyed)
    feats = pair_features(pairs, keyed)
    return label_pairs(feats, truth).cache()


def test_labels_from_same_blocking_as_inference(labeled):
    # key property (SURVEY.md §3.2): labels exist for every candidate
    assert labeled.where(F.col("label").isNull()).count() == 0
    counts = {r["label"]: r["cnt"] for r in labeled.groupBy("label").agg(F.count("*").alias("cnt")).collect()}
    assert counts.get(1.0, 0) > 20 and counts.get(0.0, 0) > 20


def test_train_score_roundtrip(spark, labeled, tmp_path):
    model_dir = str(tmp_path / "lr_model")
    model = train_model(labeled, model_dir, seed=42)
    assert len(model.coefficients) == len(MODEL_FEATURES)

    scored = score_with_model(spark, labeled, model_dir)
    assert "ml_prob" in scored.columns
    stats = scored.groupBy("label").agg(F.avg("ml_prob").alias("avg_p")).collect()
    by_label = {r["label"]: r["avg_p"] for r in stats}
    assert by_label[1.0] > 0.8, by_label
    assert by_label[0.0] < 0.2, by_label

    metrics = evaluate_model(scored)
    assert metrics["roc_auc"] > 0.95, metrics


def test_pipeline_with_model_improves_or_holds_f1(spark, labeled, tmp_path):
    from aml_entity_resolution_assignment_spark.operators.classify import classify
    from aml_entity_resolution_assignment_spark.operators.evaluate import (
        evaluate_labeled_pairs,
    )

    model_dir = str(tmp_path / "lr_model2")
    train_model(labeled, model_dir, seed=42)
    scored = score_with_model(spark, labeled, model_dir)

    gen = generate_pages(spark, n_entities=150, seed=23, doppel_rate=0.5)
    truth = gen.select("url", "entity_id")

    no_model = evaluate_labeled_pairs(classify(labeled.drop("label")), truth)
    with_model = evaluate_labeled_pairs(classify(scored.drop("label")), truth)
    assert with_model.f1 >= no_model.f1 - 1e-9, (no_model, with_model)
    assert with_model.f1 >= 0.99


def test_stratified_split_preserves_class_fractions(labeled):
    from aml_entity_resolution_assignment_spark.ml.model import stratified_split

    train, test = stratified_split(labeled, 0.8, seed=42)
    n = {r["label"]: r["c"] for r in labeled.groupBy("label").agg(F.count("*").alias("c")).collect()}
    tr = {r["label"]: r["c"] for r in train.groupBy("label").agg(F.count("*").alias("c")).collect()}
    # both classes individually near 80% (randomSplit only guarantees the total)
    for lbl, total in n.items():
        frac = tr.get(lbl, 0) / total
        assert 0.65 <= frac <= 0.95, (lbl, frac)
    # disjoint + exhaustive
    assert train.count() + test.count() == labeled.count()


def test_cross_validate_auc_five_folds(labeled):
    from aml_entity_resolution_assignment_spark.ml.model import cross_validate_auc

    m = cross_validate_auc(labeled, n_folds=5, seed=42)
    assert m["cv_folds"] == 5.0
    fold_keys = [k for k in m if k.startswith("cv_fold") and k.endswith("_roc_auc")]
    assert len(fold_keys) == 5
    # features are near-linearly separable by construction (T4 bar)
    assert m["cv_mean_roc_auc"] >= 0.95, m


def test_stratified_split_deterministic_under_repartition(labeled):
    """The split is a content hash, not per-partition RNG: re-evaluating
    either side under a different partitioning yields the same rows —
    no train/test leakage from nondeterministic upstream lineage."""
    from aml_entity_resolution_assignment_spark.ml.model import stratified_split

    train1, test1 = stratified_split(labeled, 0.8, seed=42)
    train2, test2 = stratified_split(labeled.repartition(7), 0.8, seed=42)
    assert train1.exceptAll(train2).count() == 0
    assert train2.exceptAll(train1).count() == 0
    # disjoint: no row appears on both sides
    assert train1.intersect(test1).count() == 0


def test_model_from_coefficients_pins_sigmoid(spark, tmp_path):
    """C1 production path with pinned coefficients: save -> load ->
    transform must equal closed-form sigmoid(w.x + b)."""
    import math

    from aml_entity_resolution_assignment_spark.ml.model import (
        MODEL_FEATURES,
        model_from_coefficients,
        score_with_model,
    )

    coefs = [0.5, -1.0, 2.0, 0.25, 1.5, -0.75, 1.0]
    b = -0.5
    model_dir = str(tmp_path / "fixed_lr")
    model_from_coefficients(spark, coefs, b).write().overwrite().save(model_dir)
    rows = [tuple((i * (j + 2)) % 10 / 10.0 for j in range(7)) for i in range(25)]
    df = spark.createDataFrame(
        rows, ", ".join(f"{c} double" for c in MODEL_FEATURES)
    )
    got = score_with_model(spark, df, model_dir).collect()
    for r in got:
        margin = sum(w * r[c] for w, c in zip(coefs, MODEL_FEATURES)) + b
        assert abs(r["ml_prob"] - 1 / (1 + math.exp(-margin))) < 1e-12

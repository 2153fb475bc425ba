"""End-to-end pipeline test (SURVEY.md §5.2 item 3): deterministic
synthetic pages -> full pipeline -> pairwise F1 >= 0.99 on labeled pairs
at the blocking keys (BASELINE.json metric) + checkpoint/resume
equivalence."""

import pytest

from aml_entity_resolution_assignment_spark.operators.evaluate import (
    evaluate_clusters,
    evaluate_labeled_pairs,
)
from aml_entity_resolution_assignment_spark.plans.pipeline import (
    PipelineConfig,
    run_pipeline,
)
from aml_entity_resolution_assignment_spark.sources.generator import generate_pages

N_ENTITIES = 250


@pytest.fixture(scope="module")
def pipeline_out(spark, tmp_path_factory):
    work = str(tmp_path_factory.mktemp("er_work"))
    gen = generate_pages(spark, n_entities=N_ENTITIES, seed=42).cache()
    pages = gen.drop("entity_id")
    truth = gen.select("url", "entity_id")
    cfg = PipelineConfig(work_dir=work)
    out = run_pipeline(spark, pages, cfg, input_fingerprint=f"test:{N_ENTITIES}:42")
    return gen, truth, out, work, cfg


def test_f1_gate_on_labeled_pairs(pipeline_out):
    """THE BASELINE.json gate: pairwise match F1 >= 0.99 on labeled
    pairs at the reference blocking keys."""
    _, truth, out, _, _ = pipeline_out
    m = evaluate_labeled_pairs(out["classified"], truth)
    print(f"\nlabeled-pair metrics: {m}")
    assert m.f1 >= 0.99, m


def test_cluster_level_metrics(pipeline_out):
    _, truth, out, _, _ = pipeline_out
    m, _, _ = evaluate_clusters(out["entity_map"], truth, out["classified"])
    print(f"\ncluster metrics: {m}")
    assert m.precision >= 0.98, m
    assert m.recall >= 0.97, m


def test_every_record_assigned(pipeline_out):
    gen, _, out, _, _ = pipeline_out
    assert out["entity_map"].count() == gen.count()
    assert (
        out["entity_map"].where(out["entity_map"].predicted_entity_id.isNull()).count()
        == 0
    )


def test_resume_skips_stages_and_is_identical(spark, pipeline_out):
    gen, _, out, work, cfg = pipeline_out
    pages = gen.drop("entity_id")
    out2 = run_pipeline(
        spark, pages, cfg, run_id="run1", input_fingerprint=f"test:{N_ENTITIES}:42"
    )
    a = sorted(
        (r["url"], r["predicted_entity_id"]) for r in out["entity_map"].collect()
    )
    b = sorted(
        (r["url"], r["predicted_entity_id"]) for r in out2["entity_map"].collect()
    )
    assert a == b
    # resumed run recorded 'resumed' metrics
    from aml_entity_resolution_assignment_spark.plans.pipeline import read_metrics

    m = read_metrics(spark, work)
    resumed = m.where(
        (m.run_id == "run1") & (m.metric == "resumed")
    ).count()
    assert resumed >= 5


def test_metrics_table_has_blocking_health(spark, pipeline_out):
    _, _, _, work, _ = pipeline_out
    from aml_entity_resolution_assignment_spark.plans.pipeline import read_metrics

    m = read_metrics(spark, work)
    names = {r["metric"] for r in m.select("metric").distinct().collect()}
    assert {"reduction_ratio", "pairs_per_record", "rows_out", "wall_sec"} <= names


def test_bcubed_hand_computed_and_properties(spark):
    """B-cubed vs the worked textbook example + invariances: perfect
    clustering scores 1.0; all-singletons gives precision 1; one giant
    cluster gives recall 1."""
    from aml_entity_resolution_assignment_spark.operators.evaluate import bcubed

    def run(pred_map, true_map):
        p = spark.createDataFrame(
            list(pred_map.items()), "url string, predicted_entity_id string"
        )
        t = spark.createDataFrame(
            list(true_map.items()), "url string, entity_id string"
        )
        r = bcubed(p, t).collect()[0]
        return r["b3_precision"], r["b3_recall"], r["b3_f1"]

    truth = {"a": "X", "b": "X", "c": "X", "d": "Y", "e": "Y"}
    # perfect
    pr, rc, f1 = run({k: v for k, v in truth.items()}, truth)
    assert pr == rc == f1 == 1.0
    # all singletons: every record's predicted cluster = itself
    pr, rc, f1 = run({k: k for k in truth}, truth)
    assert pr == 1.0
    assert abs(rc - (3 * (1 / 3) + 2 * (1 / 2)) / 5) < 1e-12
    # one giant cluster
    pr, rc, f1 = run({k: "ALL" for k in truth}, truth)
    assert rc == 1.0
    assert abs(pr - (3 * (3 / 5) + 2 * (2 / 5)) / 5) < 1e-12
    # hand-computed mixed case: pred {a,b,d} {c,e}
    pred = {"a": "P1", "b": "P1", "d": "P1", "c": "P2", "e": "P2"}
    # precision: a,b: 2/3 each; d: 1/3; c: 1/2; e: 1/2 -> (2/3+2/3+1/3+1/2+1/2)/5
    # recall:    a,b: 2/3 each; c: 1/3; d: 1/2; e: 1/2 -> same sum here
    want_p = (2 / 3 + 2 / 3 + 1 / 3 + 1 / 2 + 1 / 2) / 5
    want_r = (2 / 3 + 2 / 3 + 1 / 3 + 1 / 2 + 1 / 2) / 5
    pr, rc, f1 = run(pred, truth)
    assert abs(pr - want_p) < 1e-12 and abs(rc - want_r) < 1e-12



def test_transitivity_report_fates(spark):
    from aml_entity_resolution_assignment_spark.operators.evaluate import (
        transitivity_report,
    )
    import pyspark.sql.functions as F

    # clusters: {1,2,3} in A, {4} in B; 5 unlabeled (self-singleton)
    labels = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "A"), (4, "B")],
        "doc_id long, cluster string",
    )
    pairs = spark.createDataFrame(
        [
            (1, 2, True),   # kept_match
            (2, 3, False),  # forced_merge (CC pulled them together)
            (3, 4, True),   # cut_match (match across clusters)
            (4, 5, False),  # true_negative
            (1, 5, True),   # cut_match vs unlabeled singleton
        ],
        "id_a long, id_b long, is_match boolean",
    )
    out = {
        (r.id_a, r.id_b): (r.cluster_a, r.cluster_b, r.fate)
        for r in transitivity_report(pairs, labels).collect()
    }
    assert out[("1", "2")] == ("A", "A", "kept_match")
    assert out[("2", "3")] == ("A", "A", "forced_merge")
    assert out[("3", "4")] == ("A", "B", "cut_match")
    assert out[("4", "5")] == ("B", "5", "true_negative")
    assert out[("1", "5")] == ("A", "5", "cut_match")

"""Line-level dedup (CCNet/RefinedWeb boilerplate pass): cross-doc
duplicated lines drop, in-doc repeats survive, order is preserved,
short lines are exempt, and the result is partitioning-invariant."""

from pyspark.sql import functions as F

from aml_entity_resolution_assignment_spark.operators.dedup import line_dedup

DOCS = [
    (1, "welcome to example.com\nalpha prose one\ncookie notice here\nbeta prose two"),
    (2, "welcome to example.com\ngamma prose three\ncookie notice here"),
    (3, "delta prose four\nwelcome to example.com\n-\ndelta prose four"),
    (4, "unique page entirely\n-\nnothing shared at all"),
]


def _run(spark, min_len=2, parts=None):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    if parts:
        df = df.repartition(parts)
    out = line_dedup(df, min_docs=2, min_len=min_len)
    return {r["doc_id"]: r for r in out.collect()}


def test_cross_doc_lines_drop(spark):
    got = _run(spark)
    # "welcome..." in docs 1,2,3 and "cookie..." in docs 1,2 drop
    assert got[1]["clean_text"] == "alpha prose one\nbeta prose two"
    assert got[1]["n_lines"] == 4 and got[1]["n_removed"] == 2
    assert got[2]["clean_text"] == "gamma prose three"
    assert got[4]["n_removed"] == 0
    assert got[4]["clean_text"] == DOCS[3][1]


def test_in_doc_repeat_survives_and_short_exempt(spark):
    got = _run(spark)
    # "delta prose four" appears twice but only in doc 3 -> kept, order intact;
    # "-" is shorter than min_len and appears in docs 3+4 -> kept
    assert got[3]["clean_text"] == "delta prose four\n-\ndelta prose four"
    assert got[3]["n_removed"] == 1
    assert got[4]["clean_text"].split("\n")[1] == "-"


def test_short_line_threshold_engages(spark):
    got = _run(spark, min_len=1)
    # with min_len=1 the "-" separator is shared by docs 3 and 4 -> drops
    assert got[3]["clean_text"] == "delta prose four\ndelta prose four"
    assert got[4]["clean_text"] == "unique page entirely\nnothing shared at all"


def test_partitioning_invariant(spark):
    a = {(k, r["clean_text"], r["n_lines"], r["n_removed"]) for k, r in _run(spark).items()}
    b = {(k, r["clean_text"], r["n_lines"], r["n_removed"]) for k, r in _run(spark, parts=7).items()}
    assert a == b

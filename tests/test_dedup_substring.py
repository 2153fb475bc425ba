"""Exact-substring dedup (Lee et al. 2021 ExactSubstr, hash-gram
distributed form): duplicated-span detection + island merge +
built-ins-only span strip. Oracle parity lives in __spark_entry__
(dedup_substring); these tests pin the operator semantics."""

import os

import pytest
from pyspark.sql import functions as F

from aml_entity_resolution_assignment_spark.operators import dedup as D

X = "x-unique-prefix-aaaaaaaaaaaaaa "  # 31 chars, trailing space
P = "p" + "shared-paragraph-" * 5 + "end!!"  # 91 chars
Y = " y-unique-suffix"
Z = "z-other-prefix-bbbbbbbbbbbbbbbbbb "  # 34 chars, trailing space


@pytest.fixture(scope="module")
def docs(spark):
    # Both docs surround P with a space, so the maximal duplicated
    # region is " "+P: it starts ONE char before P in each doc.
    rows = [
        (1, X + P + Y),
        (2, Z + P),
        (3, "totally unique short doc"),  # < min_len: never flagged
        (4, "Q" * 60 + "-middle-unique-20b-" + "Q" * 60),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_spans_cover_exactly_the_shared_passages(spark, docs):
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in D.duplicated_substring_spans(
            docs, "doc_id", "text", min_len=50
        ).collect()
    }
    lx, lp, lz = len(X), len(P), len(Z)
    assert spans == {
        (1, lx - 1, lx + lp),  # " "+P in doc 1
        (2, lz - 1, lz + lp),  # " "+P in doc 2
        (4, 0, 60),  # first Q-run (self-repeat within one doc)
        (4, 79, 139),  # second Q-run
    }


def test_overlapping_windows_merge_into_maximal_islands(spark, docs):
    # Inside a 60-char repeated run every 50-window is duplicated;
    # the island merge must yield ONE span per run, not 11.
    spans = (
        D.duplicated_substring_spans(docs, "doc_id", "text", min_len=50)
        .where(F.col("doc_id") == 4)
        .count()
    )
    assert spans == 2


def test_strip_removes_spans_and_counts(spark, docs):
    spans = D.duplicated_substring_spans(docs, "doc_id", "text", min_len=50)
    out = {
        r["doc_id"]: r
        for r in D.strip_duplicated_spans(
            docs, spans, "doc_id", "text"
        ).collect()
    }
    assert out[1]["clean_text"] == X[:-1] + Y
    assert out[1]["dup_chars"] == len(P) + 1
    assert out[1]["n_dup_spans"] == 1
    assert out[2]["clean_text"] == Z[:-1]
    assert out[3]["clean_text"] == "totally unique short doc"
    assert out[3]["n_dup_spans"] == 0 and out[3]["dup_chars"] == 0
    assert out[4]["clean_text"] == "-middle-unique-20b-"
    assert out[4]["n_dup_spans"] == 2 and out[4]["dup_chars"] == 120


def test_hash_and_string_mode_agree_on_real_table(spark):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    hashed = {
        tuple(r)
        for r in D.duplicated_substring_spans(
            d, "doc_id", "text", min_len=50, use_hash=True
        ).collect()
    }
    exact = {
        tuple(r)
        for r in D.duplicated_substring_spans(
            d, "doc_id", "text", min_len=50, use_hash=False
        ).collect()
    }
    assert hashed == exact
    assert hashed  # the synthetic table plants real duplicates


def test_partitioning_invariance(spark, docs):
    a = {
        tuple(r)
        for r in D.duplicated_substring_spans(
            docs.repartition(1), "doc_id", "text", min_len=50
        ).collect()
    }
    b = {
        tuple(r)
        for r in D.duplicated_substring_spans(
            docs.repartition(7), "doc_id", "text", min_len=50
        ).collect()
    }
    assert a == b


def test_plan_shape_no_cartesian_no_python_udf(spark, docs):
    spans = D.duplicated_substring_spans(docs, "doc_id", "text", min_len=50)
    out = D.strip_duplicated_spans(docs, spans, "doc_id", "text")
    jvm = spark._jvm  # noqa: SLF001
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = out._jdf.queryExecution().explainString(mode)  # noqa: SLF001
    for bad in (
        "CartesianProduct",
        "BroadcastNestedLoopJoin",
        "BatchEvalPython",
        "ArrowEvalPython",
        "MapInPandas",
    ):
        assert bad not in plan, bad

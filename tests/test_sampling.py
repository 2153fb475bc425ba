"""Deterministic mixture sampling: content-hash Bernoulli selection,
oracle-checked against DuckDB's md5_number_lower in-test (the
registry is capacity-bound, so the SQL twin lives here)."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from aml_entity_resolution_assignment_spark.operators import sampling as SA

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def test_hash_matches_duckdb_md5_number_lower(spark):
    df = spark.range(0, 200).select(
        F.col("id"), SA.hash_u64(F.col("id"), seed=17).alias("h")
    )
    got = {r["id"]: int(r["h"]) for r in df.collect()}
    con = duckdb.connect()
    want = dict(
        con.execute(
            "select i, md5_number_lower(i || '|17')::UBIGINT"
            " from range(0, 200) t(i)"
        ).fetchall()
    )
    assert got == {k: int(v) for k, v in want.items()}


def test_mixture_sample_oracle_on_documents(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rates = {"web": 0.5, "wiki": 1.0, "forum": 0.25}
    got = {
        r["doc_id"]
        for r in SA.mixture_sample(
            docs, rates, default_rate=0.1, seed=7
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    full = 1 << 64
    case = " ".join(
        f"when source = '{s}' then {int(round(r * full))}"
        for s, r in rates.items()
    )
    want = {
        row[0]
        for row in con.execute(
            f"""
            select doc_id from documents
            where md5_number_lower(doc_id || '|7')::UBIGINT::HUGEINT <
                  (case {case} else {int(round(0.1 * full))} end)::HUGEINT
            """
        ).fetchall()
    }
    assert got == want
    assert 0 < len(got) < docs.count()


def test_rates_are_actually_respected(spark):
    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("source"),
    )
    out = SA.mixture_sample(df, {"a": 0.3, "b": 0.9}, seed=3)
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert abs(counts["a"] / 2000 - 0.3) < 0.05
    assert abs(counts["b"] / 2000 - 0.9) < 0.05
    # edge rates
    assert SA.sample_fraction(df, 0.0).count() == 0
    assert SA.sample_fraction(df, 1.0).count() == 4000


def test_determinism_and_partitioning_invariance(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = {
        r["doc_id"]
        for r in SA.sample_fraction(docs, 0.4, seed=9).collect()
    }
    b = {
        r["doc_id"]
        for r in SA.sample_fraction(
            docs.repartition(13), 0.4, seed=9
        ).collect()
    }
    assert a == b
    c = {
        r["doc_id"]
        for r in SA.sample_fraction(docs, 0.4, seed=10).collect()
    }
    assert a != c  # seed actually matters


def test_mixture_repeat_epochs(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), F.lit("wiki").alias("source")
    )
    out = SA.mixture_repeat(df, {"wiki": 2.5}, seed=5)
    n = out.count()
    assert abs(n / 1000 - 2.5) < 0.15
    per = out.groupBy("doc_id").agg(F.count("*").alias("c")).collect()
    assert {r["c"] for r in per} == {2, 3}
    eps = {
        r["epoch"]
        for r in out.where(F.col("doc_id") == per[0]["doc_id"]).collect()
    }
    assert eps == set(range(len(eps)))


def test_filter_is_codegen_no_udf_no_shuffle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = SA.mixture_sample(docs, {"web": 0.5}, default_rate=0.2)
    jvm = spark._jvm  # noqa: SLF001
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = out._jdf.queryExecution().explainString(mode)  # noqa: SLF001
    for bad in ("Exchange", "BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, bad
    # '*' prefix in formatted mode = inside a WholeStageCodegen span
    assert "* Filter" in plan

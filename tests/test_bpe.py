"""Real BPE (Sennrich et al. 2016): deterministic training, greedy
lowest-rank-first encoding, lossless decode, Arrow-batched Spark path."""

import os

import pytest
from pyspark.sql import functions as F

from aml_entity_resolution_assignment_spark.functions import bpe


def test_sennrich_toy_corpus_merges():
    # the classic example: {'low':5,'lower':2,'newest':6,'widest':3}
    texts = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    freqs = bpe._word_freqs(texts)
    assert freqs[("l", "o", "w", bpe.EOW)] == 5
    # first merge must be the most frequent pair ('e','s') from
    # newest(6)+widest(3)=9
    pair_counts = {}
    for word, n in freqs.items():
        for i in range(len(word) - 1):
            p = (word[i], word[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + n
    best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    assert best == ("e", "s")


def test_train_encode_roundtrip_spark(spark):
    rows = [
        (i, t)
        for i, t in enumerate(
            ["low low low low low", "lower lower", "newest " * 6, "widest " * 3]
        )
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe.train_bpe_merges(df, num_merges=50, sample=10)
    assert merges[0] == ("e", "s")
    assert len(merges) <= 50
    enc = df.select(
        "doc_id",
        "text",
        bpe.bpe_encode_udf(merges)(F.col("text")).alias("toks"),
        bpe.bpe_token_count_udf(merges)(F.col("text")).alias("n_tok"),
    ).collect()
    for r in enc:
        # decode is lossless on lowercase whitespace-normal text
        assert bpe.bpe_decode(r["toks"]) == " ".join(r["text"].lower().split())
        assert r["n_tok"] == len(r["toks"])
    # fully-merged frequent words become single tokens
    by_id = {r["doc_id"]: r["toks"] for r in enc}
    assert by_id[0] == ["low" + bpe.EOW] * 5


def test_training_is_deterministic_and_partitioning_invariant(spark):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m1 = bpe.train_bpe_merges(docs, num_merges=80, sample=300)
    m2 = bpe.train_bpe_merges(
        docs.repartition(7), num_merges=80, sample=300
    )
    assert m1 == m2 and len(m1) == 80


def test_counts_on_real_table_and_compression(spark):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = bpe.train_bpe_merges(docs, num_merges=150, sample=300)
    out = docs.select(
        bpe.bpe_token_count_udf(merges)(F.col("text")).alias("bpe"),
        F.size(F.split(F.lower(F.trim("text")), r"\s+")).alias("ws"),
        F.length("text").alias("chars"),
    ).agg(F.sum("bpe").alias("bpe"), F.sum("ws").alias("ws"),
          F.sum("chars").alias("chars")).collect()[0]
    # learned merges compress: fewer tokens than characters, at least
    # as many as whitespace words (a subword tokenizer never merges
    # across whitespace)
    assert out["ws"] <= out["bpe"] < out["chars"]


def test_plan_is_arrow_not_row_python(spark):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = bpe.train_bpe_merges(docs, num_merges=20, sample=100)
    out = docs.select(bpe.bpe_token_count_udf(merges)(F.col("text")))
    jvm = spark._jvm  # noqa: SLF001
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = out._jdf.queryExecution().explainString(mode)  # noqa: SLF001
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan

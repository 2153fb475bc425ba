"""Batch resolve (A1-A4): query records vs corpus."""

import pytest
from pyspark.sql import functions as F

from aml_entity_resolution_assignment_spark.operators.blocking import add_blocking_keys
from aml_entity_resolution_assignment_spark.operators.resolve import resolve
from aml_entity_resolution_assignment_spark.sources.generator import generate_pages


@pytest.fixture(scope="module")
def corpus_and_queries(spark):
    gen = generate_pages(spark, n_entities=80, seed=11).cache()
    corpus_keyed = add_blocking_keys(gen.drop("entity_id")).cache()
    # queries: re-crawls of existing pages (same url modulo tracking noise)
    multi = (
        gen.groupBy("entity_id")
        .count()
        .where(F.col("count") >= 2)
        .limit(10)
        .join(gen, "entity_id")
    )
    sample = multi.select("url", "warc_ts", "html", "text", "lang", "entity_id").limit(8).cache()
    queries = sample.drop("entity_id")
    return gen, corpus_keyed, queries, sample


def test_resolve_finds_self_and_duplicates(corpus_and_queries):
    gen, corpus_keyed, queries, sample = corpus_and_queries
    out = resolve(queries, corpus_keyed).cache()
    rows = {r["query_id"]: r for r in out.collect()}
    truth = {r["url"]: r["entity_id"] for r in gen.collect()}
    assert len(rows) == queries.count()
    # each query's best match must be a record of the same true entity
    for qid, r in rows.items():
        if r["match_type"] == "match":
            assert truth[r["matched_url"]] == truth[qid], r


def test_resolve_schema(corpus_and_queries):
    _, corpus_keyed, queries, _ = corpus_and_queries
    out = resolve(queries, corpus_keyed)
    assert set(out.columns) == {
        "query_id",
        "matched_url",
        "match_type",
        "confidence_score",
        "explanation",
        "rank",
        "identity_conflict",
    }


def test_resolve_unknown_query_no_match(spark, corpus_and_queries):
    _, corpus_keyed, _, _ = corpus_and_queries
    from aml_entity_resolution_assignment_spark.sources.generator import render_html

    text = "totally novel content zzz qqq xxx unique tokens"
    unknown = spark.createDataFrame(
        [
            (
                "https://nowhere.example/zzz",
                None,
                render_html("Nonexistent Title Zzz", text),
                text,
                "en",
            )
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = resolve(unknown, corpus_keyed).collect()
    # either no candidates at all, or nothing classified as match
    assert all(r["match_type"] != "match" for r in out)

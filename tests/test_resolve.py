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


def test_resolve_shuffle_join_fallback(corpus_and_queries):
    """broadcast_queries=False (the bulk re-resolve shape) must not
    FORCE a broadcast of the melted query side — no broadcast hint in
    the optimized candidate join (the planner may still pick a
    size-estimate broadcast for a genuinely tiny side, which is the
    desired behavior) — and must return the same rows as the
    serving-shape broadcast path."""
    from aml_entity_resolution_assignment_spark.operators.resolve import (
        find_candidates,
    )

    gen, corpus_keyed, queries, sample = corpus_and_queries
    query_keyed = add_blocking_keys(queries)
    cand_b = find_candidates(query_keyed, corpus_keyed)
    cand_s = find_candidates(
        query_keyed, corpus_keyed, broadcast_queries=False
    )
    plan_b = cand_b._jdf.queryExecution().optimizedPlan().toString()
    plan_s = cand_s._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" in plan_b  # the serving default forces it
    assert "strategy=broadcast" not in plan_s, plan_s
    rows_b = sorted(map(tuple, cand_b.collect()))
    rows_s = sorted(map(tuple, cand_s.collect()))
    assert rows_b == rows_s

    out = resolve(queries, corpus_keyed, broadcast_queries=False)
    assert out.count() == queries.count()

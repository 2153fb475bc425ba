"""Generator invariants: determinism across parallelism, extraction
byte-identity (input_hint), duplicate/doppelgänger structure."""

import pytest

from aml_entity_resolution_assignment_spark.functions.normalize import (
    extract_text,
    extract_title,
)
from aml_entity_resolution_assignment_spark.sources.generator import generate_pages


@pytest.fixture(scope="module")
def pages(spark):
    return generate_pages(spark, n_entities=120, seed=42).cache()


def test_row_counts_and_schema(pages):
    n = pages.count()
    # >= 1 record per entity, up to 4 + doppelgängers
    assert 120 <= n <= 120 * 4 + 40
    assert set(pages.columns) == {"url", "warc_ts", "html", "text", "lang", "entity_id"}


def test_urls_unique(pages):
    assert pages.select("url").distinct().count() == pages.count()


def test_deterministic_across_parallelism(spark, pages):
    a = sorted(pages.collect(), key=lambda r: r["url"])
    b = sorted(
        generate_pages(spark, n_entities=120, seed=42, partitions=1).collect(),
        key=lambda r: r["url"],
    )
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra == rb


def test_extraction_invariant_byte_identical(pages):
    # input_hint: byte-identical extracted text per url vs the extractor
    for r in pages.collect():
        assert extract_text(r["html"]) == r["text"], r["url"]


def test_titles_extractable(pages):
    rows = pages.limit(20).collect()
    for r in rows:
        t = extract_title(r["html"])
        assert t is not None and len(t) > 0


def test_entities_have_duplicates(pages):
    from pyspark.sql import functions as F

    sizes = pages.groupBy("entity_id").count()
    multi = sizes.where(F.col("count") >= 2).count()
    assert multi > 20, "expected a healthy share of multi-record entities"


def test_doppelgangers_present(pages):
    from pyspark.sql import functions as F

    dopp = pages.where(F.col("entity_id").endswith("D")).count()
    assert dopp > 0, "expected some doppelgänger entities at 5% rate"


def test_different_seed_differs(spark, pages):
    other = generate_pages(spark, n_entities=120, seed=43)
    a = {r["url"] for r in pages.select("url").collect()}
    b = {r["url"] for r in other.select("url").collect()}
    assert a != b

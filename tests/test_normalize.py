"""Normalizer tests pinning reference semantics
(/root/reference/src/preprocessing.py:18-130) — cases from FIXTURES.md §4."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aml_entity_resolution_assignment_spark.functions import normalize as N


def _one(spark, col_expr, value):
    df = spark.createDataFrame([Row(v=value)], schema="v string")
    return df.select(col_expr(F.col("v")).alias("out")).collect()[0]["out"]


def test_ascii_fold_scalar():
    assert N.ascii_fold("Łukasz Gżegżółka") == "lukasz gzegzolka"
    assert N.ascii_fold("  Müller-Straße ") == "muller-strasse"
    assert N.ascii_fold(None) == ""
    assert N.ascii_fold("José Ñuñez") == "jose nunez"


def test_norm_national_id(spark):
    assert _one(spark, N.norm_national_id, "ab-12 34.xy") == "AB1234XY"
    assert _one(spark, N.norm_national_id, None) == ""


def test_norm_email(spark):
    # preprocessing.py:39-41: dots dropped from local part only
    assert _one(spark, N.norm_email, "Jan.Kowalski@X.pl") == "jankowalski@x.pl"
    assert _one(spark, N.norm_email, "no-at-sign") == "no-at-sign"
    assert _one(spark, N.norm_email, None) == ""


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("0048 881 819 600", "881819600"),  # preprocessing.py:57-65
        ("+1 (212) 555-0099", "2125550099"),
        ("0034 612 345 678", "612345678"),
        ("0049 30 123456789", "30123456789"),  # len>=12 with 49
        ("00 12 34", "1234"),
        (None, ""),
    ],
)
def test_norm_phone(spark, raw, expected):
    assert _one(spark, N.norm_phone, raw) == expected


def test_norm_address(spark):
    # preprocessing.py:93-128 — FIXTURES.md §4 case
    assert _one(spark, N.norm_address, "ul. Cyprysowa 08/38") == "ulica cyprysowa 0838"
    assert _one(spark, N.norm_address, "123 Main St.") == "123 main street"
    assert _one(spark, N.norm_address, "Hauptstr. 5") == "hauptstr 5"  # \b anchored: 'hauptstr' unchanged


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("1990-06-24", "1990-06-24"),
        ("24/06/1990", "1990-06-24"),
        ("06-24-1990", "1990-06-24"),
        ("1990/06/24", "1990-06-24"),
        ("garbage", None),
        (None, None),
    ],
)
def test_norm_date_four_formats(spark, raw, expected):
    out = _one(spark, lambda c: N.norm_date(c).cast("string"), raw)
    assert out == expected


def test_norm_date_year_sentinel(spark):
    assert _one(spark, lambda c: N.norm_date_year(N.norm_date(c)), "1990-06-24") == "1990"
    assert _one(spark, lambda c: N.norm_date_year(N.norm_date(c)), "junk") == "0000"


def test_norm_hostname(spark):
    assert _one(spark, N.norm_hostname, "WWW.Example.COM:8080") == "example.com"
    assert _one(spark, N.norm_hostname, "m.example.co.uk") == "example.co.uk"
    assert _one(spark, N.norm_hostname, "www2.example.com") == "example.com"


def test_url_host_and_norm_url(spark):
    assert _one(spark, N.url_host, "https://WWW.Example.com/a/b?x=1") == "www.example.com"
    assert (
        _one(spark, N.norm_url_for_match, "https://www.Example.com/a/b/?utm=1#frag")
        == "example.com/a/b"
    )


def test_extract_text_roundtrip():
    text = "Hello <world> & friends\n  second   line"
    html = (
        "<html><head><title>T &amp; t</title></head><body><p>"
        + text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        + "</p></body></html>"
    ).encode("utf-8")
    assert N.extract_text(html) == text
    assert N.extract_title(html) == "T & t"
    assert N.extract_text(b"<nope>") is None


def test_get_soundex(spark):
    # jellyfish soundex('Smith') == 'S530'; empty/None -> '0000'
    assert _one(spark, N.get_soundex, "Smith") == "S530"
    assert _one(spark, N.get_soundex, "Robert") == "R163"
    assert _one(spark, N.get_soundex, None) == "0000"
    assert _one(spark, N.get_soundex, "  ") == "0000"


def test_soundex_variant_and_sentinel(spark):
    from aml_entity_resolution_assignment_spark.functions.normalize import (
        get_soundex,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("Robert",), ("honeyman",), ("Ashcraft",), ("",), (None,), ("123",)],
        "w string",
    )
    got = [r["s"] for r in df.select(get_soundex(F.col("w")).alias("s")).collect()]
    # vowel-reset H/W-transparent US variant + '0000' empty sentinel
    assert got == ["R163", "H555", "A261", "0000", "0000", "0000"]

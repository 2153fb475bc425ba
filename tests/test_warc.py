"""WARC source reader: record parse, per-record gzip members, HTTP
envelope stripping, non-response record skipping, and the Spark
binaryFile + mapInPandas ingestion path ending in the pages shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from aml_entity_resolution_assignment_spark.sources import warc as W


def _pages(n=5, lang="en"):
    out = []
    for i in range(n):
        html = (
            f"<html><head><title>Doc {i}</title></head>"
            f"<body><p>hello world {i} spark</p></body></html>"
        ).encode()
        out.append(
            {
                "url": f"https://example.com/p/{i}",
                "warc_ts": f"2024-03-01T12:00:{i:02d}Z",
                "html": html,
                "lang": lang,
            }
        )
    return out


@pytest.mark.parametrize("gz", [False, True])
def test_parse_roundtrip(gz):
    pages = _pages(4)
    raw = W.write_warc(pages, per_record_gzip=gz)
    got = W.parse_warc_file(raw, "f.warc")
    assert len(got) == 4
    for want, rec in zip(pages, got):
        assert rec["url"] == want["url"]
        assert rec["html"] == want["html"]  # HTTP envelope stripped
        assert rec["lang"] == "en"
        assert rec["text"] and "hello world" in rec["text"]


def test_non_response_records_skipped():
    pages = _pages(2)
    raw = bytearray(W.write_warc(pages, per_record_gzip=False))
    # prepend a warcinfo record
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
        b"Content-Length: 5\r\n\r\nhello\r\n\r\n"
    )
    got = W.parse_warc_file(bytes(info) + bytes(raw))
    assert len(got) == 2


def test_read_warc_spark_end_to_end(spark, tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    all_pages = []
    for f in range(3):
        pages = _pages(4, lang="en" if f % 2 == 0 else "de")
        for i, p in enumerate(pages):
            p["url"] = f"https://site{f}.example.com/p/{i}"
        all_pages += pages
        (d / f"part{f}.warc.gz").write_bytes(W.write_warc(pages))
    df = W.read_warc(spark, str(d))
    rows = df.collect()
    assert len(rows) == 12
    assert {r["url"] for r in rows} == {p["url"] for p in all_pages}
    r0 = sorted(rows, key=lambda r: r["url"])[0]
    assert r0["text"] and "hello world" in r0["text"]
    assert str(r0["warc_ts"]).startswith("2024-03-01 12:00:")
    # the pages shape feeds the blocking stage directly
    from aml_entity_resolution_assignment_spark.operators.blocking import (
        add_blocking_keys,
    )

    keyed = add_blocking_keys(df.select("url", "warc_ts", "html", "text", "lang"))
    assert keyed.where(F.col("bk_host").isNotNull()).count() == 12


def test_malformed_warc_raises():
    with pytest.raises(ValueError, match="malformed WARC"):
        W.parse_warc_file(b"NOT A WARC FILE AT ALL\r\n\r\n")


def test_read_warc_stream_matches_batch(spark, tmp_path):
    d = tmp_path / "warcs_s"
    d.mkdir()
    for f in range(3):
        pages = _pages(3)
        for i, p in enumerate(pages):
            p["url"] = f"https://s{f}.example.com/p/{i}"
        (d / f"seg{f}.warc.gz").write_bytes(W.write_warc(pages))
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        W.read_warc_stream(spark, str(d), max_files_per_trigger=1)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out_dir)
    want = W.read_warc(spark, str(d))
    assert got.count() == 9
    assert {r["url"] for r in got.collect()} == {r["url"] for r in want.collect()}

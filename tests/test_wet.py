"""WET source reader (sources/warc.py read_wet): conversion-record
parse, per-record gzip members, non-conversion skipping, and the Spark
binaryFile + mapInPandas ingestion path ending in the text shape."""

import pytest

from aml_entity_resolution_assignment_spark.sources import warc as W


def _texts(n=5, lang="en"):
    return [
        {
            "url": f"https://example.com/p/{i}",
            "warc_ts": f"2024-03-01T12:00:{i:02d}Z",
            "text": f"hello wet world {i}\nsecond line {i * 7}",
            "lang": lang,
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_parse_wet_roundtrip(gz):
    rows = _texts(4)
    raw = W.write_wet(rows, per_record_gzip=gz)
    got = W.parse_wet_file(raw, "f.wet")
    assert len(got) == 4
    for want, rec in zip(rows, got):
        assert rec["url"] == want["url"]
        assert rec["text"] == want["text"]
        assert rec["lang"] == "en"
        assert rec["n_chars"] == len(want["text"])
        assert rec["source_file"] == "f.wet"


def test_wet_skips_warcinfo_and_response():
    rows = _texts(2)
    raw = W.write_wet(rows, per_record_gzip=False)
    # a response record (the WARC kind) must NOT appear in WET output
    resp = W.write_warc(
        [
            {
                "url": "https://example.com/resp",
                "warc_ts": "2024-03-01T12:00:00Z",
                "html": b"<html><body>x</body></html>",
            }
        ],
        per_record_gzip=False,
    )
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
        b"Content-Length: 5\r\n\r\nhello\r\n\r\n"
    )
    got = W.parse_wet_file(info + resp + raw)
    assert [r["url"] for r in got] == [r["url"] for r in rows]


def test_wet_mixed_members_and_warc_reader_ignores_conversion():
    rows = _texts(3)
    raw = W.write_wet(rows, per_record_gzip=True)
    # the WARC (response) reader over a WET file yields nothing
    assert W.parse_warc_file(raw) == []


def test_read_wet_spark_end_to_end(spark, tmp_path):
    d = tmp_path / "wets"
    d.mkdir()
    total = 0
    for f in range(3):
        rows = _texts(4, lang="en" if f % 2 == 0 else "de")
        (d / f"seg-{f}.wet.gz").write_bytes(W.write_wet(rows))
        total += len(rows)
    df = W.read_wet(spark, str(d / "*.wet.gz"))
    pdf = df.toPandas()
    assert len(pdf) == total
    assert set(pdf.columns) == {
        "url", "warc_ts", "text", "lang", "n_chars", "source_file",
    }
    assert pdf["warc_ts"].notna().all()
    assert (pdf["n_chars"] == pdf["text"].str.len()).all()
    assert set(pdf["lang"]) == {"en", "de"}

"""WARC (Web ARChive, ISO 28500) source — the actual container format
of Common-Crawl, the north_star's input domain.

A WARC file is a sequence of records, each
``WARC/1.x CRLF header-lines CRLF CRLF block CRLF CRLF``; Common-Crawl
ships them gzip-compressed with ONE GZIP MEMBER PER RECORD so readers
can split without decompressing the whole file. This reader follows
the standard Spark ingestion shape for such formats:

* `spark.read.format("binaryFile")` lists the .warc / .warc.gz files —
  one task per file, which matches how every production WARC ingester
  parallelizes (CC segment files are ~1 GB; 100 TB = ~100k files =
  ~100k tasks, ideal granularity)
* a `mapInPandas` stage parses records per file: multi-member gzip
  inflate (zlib with per-member tail handling), WARC header parse,
  `response` records filtered, the HTTP envelope stripped, and the
  HTML payload emitted with the record's WARC-Target-URI and
  WARC-Date — directly in the engine's pages shape
  (url, warc_ts, html, text, lang); `text` comes from the SAME
  deterministic extractor the rest of the pipeline pins byte-identity
  on (functions/normalize.extract_text)

`write_warc` emits spec-valid (optionally per-record-gzipped) WARC
bytes for the roundtrip tests — the same encoder-exercises-decoder
contract as the codec modules.
"""

from __future__ import annotations

import gzip
import io as _io
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

PAGES_FROM_WARC_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, "
    "lang string, source_file string"
)


def _split_gzip_members(data: bytes) -> list[bytes]:
    """Decompress a multi-member gzip stream into per-member payloads
    (CC's one-record-per-member layout); plain data returns [data]."""
    if data[:2] != b"\x1f\x8b":
        return [data]
    out = []
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out.append(d.decompress(data[pos:]))
        tail = d.unused_data
        if not tail:
            break
        pos = len(data) - len(tail)
    return out


def _parse_records(data: bytes) -> list[dict]:
    """Parse concatenated WARC records from an uncompressed buffer."""
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"malformed WARC record at byte {pos}")
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("WARC header not terminated")
        headers: dict[str, str] = {}
        lines = data[pos:hdr_end].split(b"\r\n")
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("ascii", "replace").lower()] = (
                v.strip().decode("utf-8", "replace")
            )
        length = int(headers.get("content-length", "0"))
        block = data[hdr_end + 4 : hdr_end + 4 + length]
        records.append({"headers": headers, "block": block})
        pos = hdr_end + 4 + length
    return records


def _strip_http_envelope(block: bytes) -> bytes:
    """response records carry an HTTP envelope before the body."""
    if block[:5] in (b"HTTP/",):
        end = block.find(b"\r\n\r\n")
        if end >= 0:
            return block[end + 4 :]
    return block


def parse_warc_file(content: bytes, path: str = "") -> list[dict]:
    """One .warc or .warc.gz file -> list of page dicts (url, warc_ts,
    html, text, lang, source_file). Only `response` records with an
    http(s) target URI are pages; warcinfo/request/metadata records
    are skipped per spec."""
    from ..functions.normalize import extract_text

    pages = []
    for member in _split_gzip_members(content):
        for rec in _parse_records(member):
            h = rec["headers"]
            if h.get("warc-type") != "response":
                continue
            url = h.get("warc-target-uri", "")
            if not url.startswith(("http://", "https://")):
                continue
            html = _strip_http_envelope(rec["block"])
            ts = h.get("warc-date")  # ISO-8601 per spec
            pages.append(
                {
                    "url": url,
                    "warc_ts": ts,
                    "html": html,
                    "text": extract_text(html),
                    "lang": h.get("warc-identified-content-language"),
                    "source_file": path,
                }
            )
    return pages


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files at `path` -> pages DataFrame in the engine's input
    shape. One task per file (binaryFile source); record parsing +
    HTML->text extraction run Arrow-batched in mapInPandas."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_warc_file(bytes(content), p))
            out = pd.DataFrame(
                rows,
                columns=["url", "warc_ts", "html", "text", "lang", "source_file"],
            )
            if len(out):
                out["warc_ts"] = pd.to_datetime(
                    out["warc_ts"], utc=True, errors="coerce"
                ).dt.tz_localize(None)
            else:
                out["warc_ts"] = pd.to_datetime(out["warc_ts"])
            yield out

    return files.mapInPandas(run, PAGES_FROM_WARC_SCHEMA)


# ---------------------------------------------------------------------------
# writer (test side)
# ---------------------------------------------------------------------------


def write_warc(pages: list[dict], per_record_gzip: bool = True) -> bytes:
    """Spec-valid WARC bytes from (url, warc_ts iso string, html bytes)
    dicts — response records with a minimal HTTP envelope, one gzip
    member per record when `per_record_gzip` (the Common-Crawl
    layout)."""
    out = bytearray()
    for i, p in enumerate(pages):
        body = p["html"]
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body
        )
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + b"WARC-Record-ID: <urn:uuid:rec-" + str(i).encode() + b">\r\n"
            + b"WARC-Target-URI: " + p["url"].encode() + b"\r\n"
            + b"WARC-Date: " + p["warc_ts"].encode() + b"\r\n"
            + (
                b"WARC-Identified-Content-Language: " + p["lang"].encode() + b"\r\n"
                if p.get("lang")
                else b""
            )
            + b"Content-Type: application/http; msgtype=response\r\n"
            + b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
        )
        rec = hdr + http + b"\r\n\r\n"
        if per_record_gzip:
            buf = _io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(rec)
            out += buf.getvalue()
        else:
            out += rec
    return bytes(out)


TEXT_FROM_WET_SCHEMA = (
    "url string, warc_ts timestamp, text string, lang string, "
    "n_chars long, source_file string"
)


def parse_wet_file(content: bytes, path: str = "") -> list[dict]:
    """One .wet / .wet.gz file -> list of text dicts. WET is the
    Common-Crawl text-extract sibling of WARC: the SAME ISO-28500
    container, but records are ``WARC-Type: conversion`` with a
    ``text/plain`` block holding the pre-extracted page text (no HTTP
    envelope). warcinfo and any other record types are skipped."""
    rows = []
    for member in _split_gzip_members(content):
        for rec in _parse_records(member):
            h = rec["headers"]
            if h.get("warc-type") != "conversion":
                continue
            url = h.get("warc-target-uri", "")
            if not url.startswith(("http://", "https://")):
                continue
            text = rec["block"].decode("utf-8", errors="replace")
            rows.append(
                {
                    "url": url,
                    "warc_ts": h.get("warc-date"),
                    "text": text,
                    "lang": h.get("warc-identified-content-language"),
                    "n_chars": len(text),
                    "source_file": path,
                }
            )
    return rows


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """WET files at `path` -> (url, warc_ts, text, lang, n_chars,
    source_file) DataFrame. Same ingestion shape as read_warc: one
    binaryFile task per ~150 MB CC segment, Arrow-batched parsing —
    the cheap path when only the extracted text is needed (no HTML
    byte shuffling, ~5x smaller input than the WARC for the same
    crawl)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_wet_file(bytes(content), p))
            out = pd.DataFrame(
                rows,
                columns=[
                    "url", "warc_ts", "text", "lang", "n_chars",
                    "source_file",
                ],
            )
            if len(out):
                out["warc_ts"] = pd.to_datetime(
                    out["warc_ts"], utc=True, errors="coerce"
                ).dt.tz_localize(None)
            else:
                out["warc_ts"] = pd.to_datetime(out["warc_ts"])
            yield out

    return files.mapInPandas(run, TEXT_FROM_WET_SCHEMA)


def write_wet(pages: list[dict], per_record_gzip: bool = True) -> bytes:
    """Spec-valid WET bytes from (url, warc_ts iso string, text str)
    dicts — conversion records, one gzip member per record when
    `per_record_gzip` (the Common-Crawl layout). Encoder exercises
    the reader the same way write_warc does."""
    out = bytearray()
    for i, p in enumerate(pages):
        body = p["text"].encode("utf-8")
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: conversion\r\n"
            + b"WARC-Record-ID: <urn:uuid:wet-" + str(i).encode() + b">\r\n"
            + b"WARC-Target-URI: " + p["url"].encode() + b"\r\n"
            + b"WARC-Date: " + p["warc_ts"].encode() + b"\r\n"
            + (
                b"WARC-Identified-Content-Language: "
                + p["lang"].encode() + b"\r\n"
                if p.get("lang")
                else b""
            )
            + b"Content-Type: text/plain\r\n"
            + b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
        )
        rec = hdr + body + b"\r\n\r\n"
        if per_record_gzip:
            buf = _io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(rec)
            out += buf.getvalue()
        else:
            out += rec
    return bytes(out)


def read_warc_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 4) -> DataFrame:
    """Streaming form of read_warc: new WARC segment files appearing
    under `path` become micro-batches of pages (the crawl-ingest shape
    the north_star describes). Same binaryFile + mapInPandas plan as
    batch; plugs directly into stream_pages_keyed / resolve_stream."""
    import pandas as pd
    from collections.abc import Iterator as _It

    files = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, length long, content binary")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
        .select("path", "content")
    )

    def run(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_warc_file(bytes(content), p))
            out = pd.DataFrame(
                rows,
                columns=["url", "warc_ts", "html", "text", "lang", "source_file"],
            )
            if len(out):
                out["warc_ts"] = pd.to_datetime(
                    out["warc_ts"], utc=True, errors="coerce"
                ).dt.tz_localize(None)
            else:
                out["warc_ts"] = pd.to_datetime(out["warc_ts"])
            yield out

    return files.mapInPandas(run, PAGES_FROM_WARC_SCHEMA)

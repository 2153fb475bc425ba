"""WAT metadata records: typed extraction from Common-Crawl WAT JSON.

Common Crawl ships three artifacts per crawl: WARC (payloads — see
sources/warc.py), WET (extracted text) and WAT — one JSON envelope per
response with the HTTP/HTML metadata (target URI, status, title,
outlinks, lengths). Pipelines that only need metadata read WAT and
never touch payload bytes: ~10x less IO.

``parse_wat`` stays entirely JVM-side: Spark's get_json_object /
json_array_length evaluate inside whole-stage codegen — no UDF, no
Python, no full from_json schema materialization (WAT envelopes carry
dozens of fields; path extraction reads only the five this engine
uses). Missing paths yield NULL (n_links -> 0), matching WAT records
for non-HTML responses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ENV = "$.Envelope"
_HDR = _ENV + "['WARC-Header-Metadata']"
_RSP = _ENV + "['Payload-Metadata']['HTTP-Response-Metadata']"


def parse_wat(df: DataFrame, col: str = "wat") -> DataFrame:
    """Append typed WAT fields: uri, content_length, status, title,
    n_links. Input column holds one WAT JSON envelope per row."""
    return df.select(
        "*",
        F.get_json_object(col, _HDR + "['WARC-Target-URI']").alias("uri"),
        F.get_json_object(col, _HDR + "['Content-Length']")
        .cast("long")
        .alias("content_length"),
        F.get_json_object(col, _RSP + "['Response-Message'].Status")
        .cast("int")
        .alias("status"),
        F.get_json_object(col, _RSP + "['HTML-Metadata'].Head.Title").alias(
            "title"
        ),
        F.coalesce(
            F.json_array_length(
                F.get_json_object(col, _RSP + "['HTML-Metadata'].Links")
            ),
            F.lit(0),
        ).alias("n_links"),
    )

"""PII redaction: placeholder substitution, per-class counts, and
Java-regex/RE2 parity (the patterns must mean the same thing in Spark
and DuckDB — that parity is what the registry oracle hashes)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from aml_entity_resolution_assignment_spark.operators import pii as P

CASES = [
    ("mail me at jo.doe+spam@ex-ample.co.uk now", "email", 1),
    ("two: a@b.io and c_d%x@y.org", "email", 2),
    ("ssn 123-45-6789 on file", "ssn", 1),
    ("call (555) 123-4567 today", "phone", 1),
    ("intl +1 555-123-4567", "phone", 1),
    ("plain 555 123 4567 works", "phone", 1),
    ("host 192.168.0.1 and 10.0.0.255", "ip", 2),
    ("no pii here, just 12345 and v1.2", None, 0),
    # an SSN must not double-count as a phone
    ("id 123-45-6789", "phone", 0),
]


def test_redact_and_counts(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _, _) in enumerate(CASES)], "i int, text string"
    )
    rows = {
        r["i"]: r
        for r in P.redact_pii_df(df).orderBy("i").collect()
    }
    for i, (text, cls, n) in enumerate(CASES):
        c = rows[i]["pii"].asDict()
        if cls is not None:
            assert c[cls] == n, (text, cls, c)
        else:
            assert sum(c.values()) == 0, (text, c)
    # placeholders actually substituted
    assert "[EMAIL]" in rows[0]["clean_text"]
    assert rows[2]["clean_text"] == "ssn [SSN] on file"
    assert rows[3]["clean_text"] == "call [PHONE] today"
    assert rows[6]["clean_text"] == "host [IP] and [IP]"
    # redacted text contains no residual matches
    again = P.redact_pii_df(
        spark.createDataFrame(
            [(r["clean_text"],) for r in rows.values()], "text string"
        )
    ).collect()
    assert all(sum(r["pii"].asDict().values()) == 0 for r in again)


def test_duckdb_parity(spark):
    """Every pattern produces the identical redaction in RE2."""
    texts = [t for t, _, _ in CASES] + [
        "a@b.cd 1.2.3.4 999-99-9999 (123) 456 7890 +12 345-678-9012",
        "edge: 1.2.3.4.5 and a@@b.com and 12-34-5678",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        r["c"]
        for r in df.select(P.redact_pii(F.col("text")).alias("c"))
        .collect()
    ]
    con = duckdb.connect()
    expr = "text"
    for _, pat, token in P.PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{token}', 'g')"
    want = [
        r[0]
        for r in con.execute(
            f"select {expr} from (select unnest(?) as text)", [texts]
        ).fetchall()
    ]
    assert got == want

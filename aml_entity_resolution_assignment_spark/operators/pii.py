"""PII detection and redaction for web-crawl training corpora.

Emails, phone numbers, IPv4 addresses and US-SSN-shaped ids are the
classes public corpus pipelines scrub before training (the BigScience
ROOTS and BigCode StarCoder pipelines redact exactly these shapes;
Subramani et al. 2023, "Detecting Personal Information in Training
Corpora"). Redaction replaces each match with a typed placeholder
token so downstream tokenization sees a stable vocabulary item
instead of a high-entropy string.

Every pattern is written in the common subset of Java regex (Spark)
and RE2 (DuckDB): no backreferences, no lookaround, ASCII classes
only — so each redaction step is reproducible in ANSI SQL and the
whole operator carries a hard value-hash oracle in the driver
harness.

Scale shape: one chained `regexp_replace`/`regexp_count` projection —
whole-stage-codegen'd, zero shuffles, zero UDFs; at 100 TB this is a
pure map over the scan, limited only by read bandwidth.

Classes are applied in a fixed canonical order (email, ssn, phone,
ip) and each class counts matches on the text as already redacted by
the previous classes, so every count is exactly the number of
placeholder tokens that class inserted — no double counting when
shapes overlap (an SSN is never also a phone).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (class, pattern, placeholder) in canonical application order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "[EMAIL]",
    ),
    # 123-45-6789 (before phone: both are dash-grouped digit runs)
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    # +1 555-123-4567 / (555) 123-4567 / 555 123 4567; separators are
    # space/dash only so dotted IPv4 octets never match
    (
        "phone",
        r"(\+\d{1,2}[ -])?\(?\d{3}\)?[ -]\d{3}[ -]\d{4}\b",
        "[PHONE]",
    ),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
)


def redact_pii(col: Column) -> Column:
    """Text with all PII classes replaced by placeholder tokens."""
    out = col
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(col: Column) -> Column:
    """Struct of per-class match counts, counted on the progressively
    redacted text (see module docstring for why)."""
    cur = col
    fields = []
    for name, pat, token in PII_PATTERNS:
        fields.append(F.regexp_count(cur, F.lit(pat)).alias(name))
        cur = F.regexp_replace(cur, pat, token)
    return F.struct(*fields)


def redact_pii_df(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "clean_text",
    counts_col: str | None = "pii",
) -> DataFrame:
    """Add a redacted copy of `text_col` (and, unless `counts_col` is
    None, a struct column of per-class counts)."""
    out = df.withColumn(out_col, redact_pii(F.col(text_col)))
    if counts_col is not None:
        out = out.withColumn(counts_col, pii_counts(F.col(text_col)))
    return out

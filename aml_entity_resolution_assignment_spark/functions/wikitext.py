"""Deterministic wikitext -> plain text extraction (WikiExtractor-style).

Why: the Wikipedia dump is the canonical high-quality LLM-pretraining
source, and its payload is wikitext markup — templates, links, refs,
tables — that must be stripped before quality scoring / dedup /
tokenization. Full template EXPANSION needs the wiki's template
database and is out of scope everywhere (WikiExtractor, wikitextparser
and production corpus pipelines all drop unexpanded templates); this
module implements that same light, lossy, DETERMINISTIC strip:

  1. HTML comments `<!-- -->` removed
  2. `<ref...>...</ref>` / `<ref .../>` citations removed
  3. `{{templates}}` removed with nesting (linear brace scan)
  4. `{| tables |}` removed with nesting
  5. `[[File:...]]` / `[[Image:...]]` media links removed with nesting
  6. `[[target|label]]` -> label, `[[target]]` -> target (innermost-
     first so nested captions resolve)
  7. `[http://u label]` -> label, bare `[http://u]` -> dropped
  8. remaining HTML tags dropped, entities unescaped
  9. bold/italic apostrophe runs dropped, `== heading ==` -> heading
 10. whitespace canonicalized: lines stripped, empties dropped

Pure-Python per-string (nesting makes it non-regex-expressible), so
the Spark surface is an Arrow-batched pandas_udf — same pattern as
the unidecode/JW kernels (functions/similarity.py). Parity note: the
reference has no markup handling (pre-extracted text CSVs); this is
north_star input-domain surface, sibling to sources/warc.py.
"""

from __future__ import annotations

import html
import re

_COMMENT = re.compile(r"<!--.*?-->", re.S)
_REF = re.compile(r"<ref[^>/]*/>|<ref[^>]*>.*?</ref>", re.S | re.I)
_TAG = re.compile(r"<[^>]+>")
_EXTLINK = re.compile(r"\[(?:https?|ftp)://[^\s\]]+(?:\s+([^\]]*))?\]")
_QUOTES = re.compile(r"''+")
_HEADING = re.compile(r"^(={2,6})\s*(.*?)\s*\1\s*$", re.M)
_ILINK = re.compile(r"\[\[([^\[\]|]*)(?:\|([^\[\]]*))?\]\]")
_MEDIA_PREFIX = re.compile(r"^(file|image|media)\s*:", re.I)


def _drop_nested(text: str, open_s: str, close_s: str) -> str:
    """Remove every balanced open..close span (nesting-aware, one
    linear pass); an unbalanced opener drops through to end-of-text,
    matching WikiExtractor's behavior on truncated markup."""
    out = []
    depth = 0
    i = 0
    n = len(text)
    lo, lc = len(open_s), len(close_s)
    while i < n:
        if text.startswith(open_s, i):
            depth += 1
            i += lo
        elif depth and text.startswith(close_s, i):
            depth -= 1
            i += lc
        elif depth:
            i += 1
        else:
            out.append(text[i])
            i += 1
    return "".join(out)


def _links(text: str) -> str:
    """Resolve [[...]] innermost-first so nested file captions and
    piped links inside captions reduce deterministically."""

    def repl(m: re.Match) -> str:
        target, label = m.group(1), m.group(2)
        if _MEDIA_PREFIX.match(target.strip()):
            return ""
        return label if label is not None else target

    prev = None
    while prev != text:
        prev = text
        text = _ILINK.sub(repl, text)
    return text


def strip_wikitext(text: str) -> str:
    if not text:
        return ""
    t = _COMMENT.sub("", text)
    t = _REF.sub("", t)
    t = _drop_nested(t, "{{", "}}")
    t = _drop_nested(t, "{|", "|}")
    t = _links(t)
    t = _EXTLINK.sub(lambda m: m.group(1) or "", t)
    t = _HEADING.sub(r"\2", t)
    t = _TAG.sub("", t)
    t = html.unescape(t)
    t = _QUOTES.sub("", t)
    lines = [re.sub(r"[ \t]+", " ", ln).strip() for ln in t.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def strip_wikitext_col(col):
    """Arrow-batched column form for DataFrame pipelines."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    def _k(s):
        return pd.Series(
            [strip_wikitext(v) if v is not None else None for v in s],
            index=s.index,
            dtype="object",
        )

    _k = pandas_udf(_k, StringType())

    return _k(col)

"""Boilerplate-removing HTML -> main-text extraction (jusText-style).

General-purpose extractor for arbitrary crawl HTML, complementing the
engine-shape inverse extractor (functions/normalize.py:extract_text,
which serves the byte-identity invariant for pages the engine itself
rendered). Algorithm follows the public jusText / boilerpipe family
(Pomikalek 2011; Kohlschutter et al. 2010): segment the document into
text blocks at block-level tag boundaries, measure each block's
length and link density (characters under an <a> ancestor / total
characters), and keep blocks that look like running prose.

The classifier here is deliberately a FIXED deterministic rule —
  keep iff  n_chars >= min_chars  AND  link_density <= max_link_density
— rather than jusText's context-sensitive smoothing, so the result is
a pure per-block function: reproducible across engines (the DuckDB
oracle twin recomputes it), stable under partitioning, and cheap. The
thresholds default to jusText's published short-block / link-density
constants (25 chars, 0.4).

Parsing is a single linear scan (no recursion, no DOM): comments and
raw-text elements (script/style/noscript/template) are skipped
wholesale, block-level tags flush the current block, <a> nesting
depth attributes characters to link text. Entities are resolved with
the stdlib html.unescape. Malformed markup never raises — an
unterminated tag or comment just ends the scan; crawl HTML is hostile
by default.

The reference repo ingests pre-extracted text CSVs and has no HTML
handling; this is training-data-pipeline surface over the BASELINE
input shape's html:binary column.
"""

from __future__ import annotations

import html as _html
import re

MIN_CHARS = 25
MAX_LINK_DENSITY = 0.4

_BLOCK_TAGS = frozenset(
    """p div h1 h2 h3 h4 h5 h6 li ul ol dl dt dd td th tr table
    blockquote pre article section header footer nav aside main form
    figure figcaption hr br body html head title""".split()
)
_RAW_TEXT = frozenset(("script", "style", "noscript", "template"))

_TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)")
_WS_RE = re.compile(r"\s+")


def html_blocks(html: str | bytes | None) -> list[tuple[str, int, int]]:
    """Segment HTML into text blocks: [(text, link_chars, total_chars)].
    `text` is entity-resolved and whitespace-normalized; char counts
    are measured on the normalized text (so density is layout-free).
    Empty/whitespace-only blocks are dropped."""
    if html is None:
        return []
    s = (
        html.decode("utf-8", "replace")
        if isinstance(html, (bytes, bytearray))
        else str(html)
    )
    blocks: list[tuple[str, int, int]] = []
    parts: list[str] = []  # text pieces of the current block
    link_parts: list[str] = []
    a_depth = 0

    def _flush() -> None:
        nonlocal parts, link_parts
        text = _WS_RE.sub(" ", _html.unescape("".join(parts))).strip()
        link = _WS_RE.sub(" ", _html.unescape("".join(link_parts))).strip()
        if text:
            blocks.append((text, len(link), len(text)))
        parts = []
        link_parts = []

    i, n = 0, len(s)
    while i < n:
        lt = s.find("<", i)
        if lt < 0:
            piece = s[i:]
            parts.append(piece)
            if a_depth > 0:
                link_parts.append(piece)
            break
        if lt > i:
            piece = s[i:lt]
            parts.append(piece)
            if a_depth > 0:
                link_parts.append(piece)
        if s.startswith("<!--", lt):
            end = s.find("-->", lt + 4)
            i = n if end < 0 else end + 3
            continue
        if s[lt + 1 : lt + 2] in ("!", "?"):  # doctype/PI/CDATA marker
            end = s.find(">", lt + 2)
            i = n if end < 0 else end + 1
            continue
        m = _TAG_RE.match(s, lt)
        if m is None:  # stray '<' (doctype, CDATA, junk): skip the char
            parts.append("<")
            if a_depth > 0:
                link_parts.append("<")
            i = lt + 1
            continue
        gt = s.find(">", m.end())
        if gt < 0:
            break  # unterminated tag: crawl truncation — stop cleanly
        closing, name = m.group(1) == "/", m.group(2).lower()
        i = gt + 1
        if not closing and name in _RAW_TEXT:
            close = re.search(
                rf"</{name}\s*>", s[i:], flags=re.IGNORECASE
            )
            i = n if close is None else i + close.end()
            continue
        if name == "a":
            a_depth = max(0, a_depth - 1) if closing else a_depth + 1
        elif name in _BLOCK_TAGS:
            _flush()
    _flush()
    return blocks


def extract_main_text(
    html: str | bytes | None,
    min_chars: int = MIN_CHARS,
    max_link_density: float = MAX_LINK_DENSITY,
) -> str | None:
    """Boilerplate-stripped main text: newline-joined blocks passing
    the fixed length + link-density rule. None in, None out; a page
    with no qualifying block yields an empty string (a real signal —
    link farms and redirect stubs — distinct from missing HTML)."""
    if html is None:
        return None
    kept = [
        text
        for text, link, total in html_blocks(html)
        if total >= min_chars and link <= max_link_density * total
    ]
    return "\n".join(kept)


def extract_main_text_col(
    col,
    min_chars: int = MIN_CHARS,
    max_link_density: float = MAX_LINK_DENSITY,
):
    """Arrow-batched column form for DataFrame pipelines (binary or
    string HTML column -> main text)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    def _k(s):
        return pd.Series(
            [
                extract_main_text(v, min_chars, max_link_density)
                for v in s
            ],
            index=s.index,
            dtype="object",
        )

    _k = pandas_udf(_k, StringType())

    return _k(col)

"""MediaWiki XML dump source — parallel <page> records from .bz2.

The Wikipedia/Wikidata dumps ship as ONE multistream .bz2 XML file
(`enwiki-...-pages-articles-multistream.xml.bz2`, ~20 GB). This reader
composes the splittable block machinery (sources/bz2_dump.py) with a
start-tag/end-tag record protocol (the XmlInputFormat shape):

* a task owns every `<page>` whose start tag BEGINS in its owned block
  region (tag-start byte ownership means a tag straddling a block
  boundary belongs to exactly one task: the one owning the byte of
  `<`; the other side simply never sees a complete opener)
* it carries forward into the next task's blocks until the last owned
  page's `</page>` arrives — so every page is parsed exactly once,
  whatever the block/range/stream geometry
* `<page>` cannot occur in content: MediaWiki XML escapes `<` as
  `&lt;` inside text nodes, so a raw opener is always a real record

Each page fragment is parsed with the stdlib XML parser (fragments
are small; entities/CDATA handled for free) into
(page_id, ns, title, redirect, rev_ts, text); `read_wiki_pages` adds
`plain_text` via the deterministic wikitext stripper
(functions/wikitext.py) — the dump-to-training-text path end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from ..functions.wikitext import strip_wikitext_col
from .bz2_dump import (
    _MAX_CARRY_BLOCKS,
    _blocks_in_range,
    _next_block_after,
    plan_splits,
)

WIKI_PAGES_SCHEMA = (
    "path string, page_id long, ns long, title string, "
    "redirect string, rev_ts string, text string"
)

_OPEN = b"<page>"
_CLOSE = b"</page>"


def _parse_page(frag: bytes) -> tuple:
    import xml.etree.ElementTree as ET

    el = ET.fromstring(frag)
    title = el.findtext("title")
    ns = int(el.findtext("ns") or 0)
    page_id = int(el.findtext("id") or -1)  # page <id> precedes <revision>
    red = el.find("redirect")
    redirect = red.get("title") if red is not None else None
    rev = el.find("revision")
    rev_ts = rev.findtext("timestamp") if rev is not None else None
    text = rev.findtext("text") if rev is not None else None
    return page_id, ns, title, redirect, rev_ts, text


def _pages_for_split(
    path: str, fsize: int, start: int, end: int
) -> list[tuple]:
    blocks = list(_blocks_in_range(path, fsize, start, end))
    if not blocks:
        return []
    buf = bytearray()
    for _, payload in blocks:
        buf += payload
    owned_end = len(buf)  # openers at/after this offset belong to the
    # next task — but we still append its blocks to finish OUR pages
    tail_pos = (blocks[-1][0] >> 3) + 1
    carried = 0

    def _need_more(b: bytes) -> bool:
        """More bytes required? — an owned opener lacks its closer, or
        the buffer is still too short to rule out an opener whose `<`
        is owned but whose tail crosses owned_end."""
        pos = 0
        while True:
            o = b.find(_OPEN, pos)
            if o < 0 or o >= owned_end:
                # No (further) owned opener found. A straddling opener
                # (starts before owned_end, completes after) is found
                # by find() itself once its bytes are present, so the
                # tail-prefix probe only applies while the buffer is
                # too short to disambiguate — otherwise a boundary that
                # cuts ANY tag after its `<` (e.g. `<title>` split as
                # `...<` | `title>...`) would look like an opener
                # prefix forever and carry blocks until the limit.
                if len(b) >= owned_end + len(_OPEN) - 1:
                    return False
                tail = b[max(0, owned_end - (len(_OPEN) - 1)) : owned_end]
                for k in range(1, min(len(_OPEN), len(tail) + 1)):
                    if tail[-k:] == _OPEN[:k]:
                        return True
                return False
            c = b.find(_CLOSE, o)
            if c < 0:
                return True
            pos = c + len(_CLOSE)

    while _need_more(bytes(buf)):
        nxt = _next_block_after(path, fsize, tail_pos)
        if nxt is None:
            break  # truncated final page: dropped below (no closer)
        g, payload = nxt
        buf += payload
        tail_pos = (g >> 3) + 1
        carried += 1
        if carried > _MAX_CARRY_BLOCKS:
            raise ValueError(
                "wiki: a single <page> spans more than "
                f"{_MAX_CARRY_BLOCKS} blocks; raise the carry limit"
            )
    data = bytes(buf)
    out = []
    pos = 0
    while True:
        o = data.find(_OPEN, pos)
        if o < 0 or o >= owned_end:
            break
        c = data.find(_CLOSE, o)
        if c < 0:
            break
        out.append((path,) + _parse_page(data[o : c + len(_CLOSE)]))
        pos = c + len(_CLOSE)
    return out


def read_wiki_dump(
    spark: SparkSession, path: str, split_bytes: int = 32 << 20
) -> DataFrame:
    """Raw parallel page parse of a multistream wiki .bz2 dump:
    (path, page_id, ns, title, redirect, rev_ts, text) with `text` as
    unexpanded wikitext. Every page is emitted exactly once."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "path", "page_id", "ns", "title", "redirect", "rev_ts", "text",
        ]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                rows.extend(
                    _pages_for_split(
                        r.path, int(r.fsize), int(r.start), int(r.end)
                    )
                )
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    return plan_splits(spark, path, split_bytes).mapInPandas(
        run, WIKI_PAGES_SCHEMA
    )


def read_wiki_pages(
    spark: SparkSession,
    path: str,
    split_bytes: int = 32 << 20,
    articles_only: bool = True,
) -> DataFrame:
    """Dump -> training-text: parsed pages with `plain_text` from the
    deterministic wikitext strip; `articles_only` keeps ns=0
    non-redirect pages (the standard pretraining subset)."""
    from pyspark.sql import functions as F

    df = read_wiki_dump(spark, path, split_bytes)
    if articles_only:
        df = df.where((F.col("ns") == 0) & F.col("redirect").isNull())
    return df.withColumn("plain_text", strip_wikitext_col(F.col("text")))

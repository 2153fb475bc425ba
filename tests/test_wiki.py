"""Wikitext stripper + MediaWiki dump source (split-exactly-once)."""

import bz2

import pytest

from aml_entity_resolution_assignment_spark.functions.wikitext import (
    strip_wikitext,
)
from aml_entity_resolution_assignment_spark.sources import wiki as W


# ---------------------------------------------------------------- wikitext


@pytest.mark.parametrize(
    "src,want",
    [
        ("'''Bold''' and ''italic'' text", "Bold and italic text"),
        ("{{Infobox|a=1|b={{nested|x}}}}Rest", "Rest"),
        ("See [[Spark (engine)|Spark]] and [[Catalyst]].", "See Spark and Catalyst."),
        ("[[File:Pic.png|thumb|A [[linked]] caption]]Body", "Body"),
        ("[http://e.com/x label here] and [http://bare.com]", "label here and"),
        ("== Heading ==\ncontent", "Heading\ncontent"),
        ("a<ref name=x>cite</ref>b<ref follow=y/>c", "abc"),
        ("pre{|\n|-\n| cell\n|}post", "prepost"),
        ("x<!-- hidden -->y", "xy"),
        ("Fish &amp; chips &lt;now&gt;", "Fish & chips <now>"),
        ("<div class=x>wrapped</div>", "wrapped"),
        ("a  b\t c\n\n\n  d  ", "a b c\nd"),
        ("", ""),
        ("{{unclosed template...", ""),
    ],
)
def test_strip_wikitext(src, want):
    assert strip_wikitext(src) == want


def test_strip_deep_nesting_and_mixed():
    src = (
        "{{a|{{b|{{c}}}}}}Start [[x|[[inner]] out]] "
        "mid [[plain]] {{t}} end"
    )
    assert strip_wikitext(src) == "Start inner out mid plain end"


# ---------------------------------------------------------------- dump

_SITE = (
    '<mediawiki xml:lang="en">\n  <siteinfo>\n    <sitename>TestWiki'
    "</sitename>\n  </siteinfo>\n"
)


def _page_xml(pid, title, text, ns=0, redirect=None):
    from xml.sax.saxutils import escape

    red = (
        f'    <redirect title="{escape(redirect, {chr(34): "&quot;"})}" />\n'
        if redirect
        else ""
    )
    return (
        "  <page>\n"
        f"    <title>{escape(title)}</title>\n"
        f"    <ns>{ns}</ns>\n"
        f"    <id>{pid}</id>\n{red}"
        "    <revision>\n"
        f"      <id>{pid * 10}</id>\n"
        f"      <timestamp>2024-06-0{1 + pid % 9}T00:00:00Z</timestamp>\n"
        f"      <text bytes=\"{len(text)}\">{escape(text)}</text>\n"
        "    </revision>\n"
        "  </page>\n"
    )


def _dump(tmp_path, pages, chunk=20_000, name="wiki.xml.bz2"):
    xml = (
        _SITE
        + "".join(_page_xml(*p[:2], p[2], *p[3:]) for p in pages)
        + "</mediawiki>\n"
    ).encode()
    blob = b"".join(
        bz2.compress(xml[i : i + chunk], 1) for i in range(0, len(xml), chunk)
    )
    p = tmp_path / name
    p.write_bytes(blob)
    return str(p)


def _many_pages(n):
    pages = []
    for i in range(n):
        body = (
            f"'''Page {i}''' {{{{tmpl|{i}}}}} body-{i} "
            + ("lorem ipsum " * (i % 40))
            + f"[[link {i}|L{i}]]"
        )
        pages.append((i + 1, f"Title {i}", body))
    return pages


def test_pages_exactly_once_sweep(tmp_path):
    """Every page parsed exactly once for split sizes from far below
    to far above the file size; multistream chunking cuts mid-page and
    mid-tag."""
    import os

    pages = _many_pages(300)
    path = _dump(tmp_path, pages, chunk=7_777)
    fsize = os.path.getsize(path)
    for split in [1 << 11, 1 << 14, fsize + 1]:
        got = []
        start = 0
        while start < fsize:
            end = min(start + split, fsize)
            got.extend(W._pages_for_split(path, fsize, start, end))
            start = end
        got.sort(key=lambda r: r[1])
        assert [(r[1], r[3]) for r in got] == [
            (p[0], f"Title {p[0] - 1}") for p in pages
        ], f"split={split}"
        # wikitext payload survives byte-exact (entities re-resolved)
        assert got[5][6] == pages[5][2]


def test_boundary_cut_tag_bounded_carry(tmp_path):
    """A block boundary that cuts a NON-page tag right after its `<`
    (here `<title>` split as `...<` | `title>...`) must not be mistaken
    for a cut-off `<page>` opener: the pre-fix code re-probed the same
    owned tail forever and carried blocks until _MAX_CARRY_BLOCKS blew
    up (the round-5 bench failure at sf0.1). One extra block fully
    disambiguates the prefix."""
    import os

    pages = _many_pages(300)
    xml = (
        _SITE
        + "".join(_page_xml(*p[:2], p[2]) for p in pages)
        + "</mediawiki>\n"
    ).encode()
    # first chunk ends with the bare `<` of a <title> tag deep enough
    # that the cut is a real block boundary, then >64 tiny blocks follow
    # (the old probe only raised when the limit was hit BEFORE EOF)
    cut = xml.index(b"<title>", 4_000) + 1
    chunks = [xml[:cut]] + [
        xml[i : i + 300] for i in range(cut, len(xml), 300)
    ]
    assert len(chunks) > 70  # enough trailing blocks to trip the limit
    streams = [bz2.compress(c, 1) for c in chunks]
    blob = b"".join(streams)
    path = tmp_path / "cutwiki.xml.bz2"
    path.write_bytes(blob)
    fsize = os.path.getsize(str(path))
    # exact geometry: the task owning ONLY block 0 ends at the `...<`
    # tail — bounded carry (last owned page's closer + 1 block), not a
    # file-wide crawl / carry-limit ValueError
    rows0 = W._pages_for_split(str(path), fsize, 0, len(streams[0]))
    assert [r[1] for r in rows0] == sorted(r[1] for r in rows0)
    # sweep splits: every page exactly once, no carry-limit ValueError
    for split in [1 << 10, 1 << 12, fsize + 1]:
        got = []
        start = 0
        while start < fsize:
            end = min(start + split, fsize)
            got.extend(W._pages_for_split(str(path), fsize, start, end))
            start = end
        got.sort(key=lambda r: r[1])
        assert [r[1] for r in got] == [p[0] for p in pages], f"split={split}"


def test_boundary_cut_page_opener_owned(tmp_path):
    """A genuine `<page>` opener straddling a block boundary (cut as
    `...<pa` | `ge>...`) belongs to the task owning the `<` byte and is
    parsed exactly once."""
    import os

    pages = _many_pages(30)
    xml = (
        _SITE
        + "".join(_page_xml(*p[:2], p[2]) for p in pages)
        + "</mediawiki>\n"
    ).encode()
    cut = xml.index(b"<page>", 2_000) + 3  # mid-opener
    chunks = [xml[:cut]] + [
        xml[i : i + 900] for i in range(cut, len(xml), 900)
    ]
    blob = b"".join(bz2.compress(c, 1) for c in chunks)
    path = tmp_path / "straddle.xml.bz2"
    path.write_bytes(blob)
    fsize = os.path.getsize(str(path))
    for split in [1 << 10, 1 << 13, fsize + 1]:
        got = []
        start = 0
        while start < fsize:
            end = min(start + split, fsize)
            got.extend(W._pages_for_split(str(path), fsize, start, end))
            start = end
        got.sort(key=lambda r: r[1])
        assert [r[1] for r in got] == [p[0] for p in pages], f"split={split}"


def test_dump_fields_and_redirect(tmp_path, spark):
    pages = [
        (1, "Alpha", "'''Alpha''' is first. {{stub}}"),
        (2, "Beta", "#REDIRECT [[Alpha]]", 0, "Alpha"),
        (3, "Template:Box", "{{{1}}}", 10),
        (4, "A & B <x>", "Uses &amp; and &lt;tags&gt;."),
    ]
    path = _dump(tmp_path, pages, chunk=300)
    df = W.read_wiki_dump(spark, path, split_bytes=1 << 11)
    rows = {r.page_id: r for r in df.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[2].redirect == "Alpha"
    assert rows[3].ns == 10
    assert rows[4].title == "A & B <x>"
    assert rows[4].text == "Uses &amp; and &lt;tags&gt;."
    assert rows[1].rev_ts == "2024-06-02T00:00:00Z"

    arts = W.read_wiki_pages(spark, path, split_bytes=1 << 11)
    got = {r.page_id: r.plain_text for r in arts.collect()}
    assert set(got) == {1, 4}  # redirect + non-ns0 filtered
    assert got[1] == "Alpha is first."
    assert got[4] == "Uses & and <tags>."

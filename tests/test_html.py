"""Boilerplate-removing HTML extractor (functions/html.py)."""

import pytest

from aml_entity_resolution_assignment_spark.functions.html import (
    extract_main_text,
    extract_main_text_col,
    html_blocks,
)

PAGE = b"""<!DOCTYPE html><html><head><title>T</title>
<style>body{color:red}</style>
<script>var x = "<p>not a block</p>";</script>
</head><body>
<nav><ul><li><a href="/">Home</a></li><li><a href="/about">About our company</a></li></ul></nav>
<h1>Tiny</h1>
<p>This is the first real paragraph of running prose, long enough to keep.</p>
<p>Short.</p>
<p>Second real paragraph with an <a href="x">inline link</a> inside but mostly prose text here.</p>
<div><a href="/1">one</a> <a href="/2">two</a> <a href="/3">three link words all of it</a></div>
<footer><a href="/tos">Terms</a> &middot; <a href="/priv">Privacy</a></footer>
</body></html>"""


def test_extract_keeps_prose_drops_boilerplate():
    got = extract_main_text(PAGE)
    assert got == (
        "This is the first real paragraph of running prose, long enough"
        " to keep.\nSecond real paragraph with an inline link inside but"
        " mostly prose text here."
    )


def test_block_accounting():
    blocks = {t: (l, n) for t, l, n in html_blocks(PAGE)}
    # nav items are pure link text
    assert blocks["Home"] == (4, 4)
    assert blocks["About our company"] == (17, 17)
    # inline link contributes only its own chars
    t = (
        "Second real paragraph with an inline link inside but mostly"
        " prose text here."
    )
    assert blocks[t] == (len("inline link"), len(t))
    # script/style content never leaks into any block
    assert not any("not a block" in k or "color:red" in k for k in blocks)


def test_link_density_threshold():
    # exactly at the boundary: link chars == 0.4 * total keeps
    text = "x" * 15
    page = f"<p><a>{'y' * 10}</a>{text}</p>"  # 10 link / 25 total = 0.4
    assert extract_main_text(page) == "y" * 10 + text
    page = f"<p><a>{'y' * 11}</a>{'x' * 14}</p>"  # 11/25 > 0.4
    assert extract_main_text(page) == ""


def test_entities_comments_doctype():
    page = (
        "<!DOCTYPE html><!-- header comment --><p>Fish &amp; chips"
        " &lt;fresh&gt; daily, every single day</p>"
    )
    assert extract_main_text(page) == (
        "Fish & chips <fresh> daily, every single day"
    )


def test_whitespace_normalized():
    page = "<p>  lots\n\n of \t whitespace  inside this long block </p>"
    assert extract_main_text(page) == (
        "lots of whitespace inside this long block"
    )


def test_hostile_markup_never_raises():
    cases = [
        b"",
        b"plain text with no tags at all but quite long anyway",
        b"broken <p unterminated",
        b"<script>never closed",
        b"<!-- never closed",
        b"<p><a>nested <a>anchors</a> closing twice</a></a></p>",
        b"\xff\xfe garbage bytes <p>ok</p>",
        b"<![CDATA[x]]><p>after a marked section the prose continues</p>",
    ]
    for c in cases:
        extract_main_text(c)  # must not raise
    assert extract_main_text(None) is None
    # raw text outside tags still forms one block
    assert extract_main_text(
        b"plain text with no tags at all but quite long anyway"
    ) == "plain text with no tags at all but quite long anyway"


def test_nested_anchor_depth():
    # chars under any <a> ancestor count once; stray closes clamp at 0
    page = "<p><a>aa<a>bb</a>cc</a>dd" + "e" * 30 + "</p>"
    blocks = html_blocks(page)
    assert len(blocks) == 1
    t, link, total = blocks[0]
    assert link == len("aabbcc")
    assert total == len(t)


def test_column_form(spark):
    df = spark.createDataFrame(
        [
            ("a", PAGE),
            ("b", None),
            ("c", b"<p><a href=x>" + b"link " * 20 + b"</a></p>"),
        ],
        "id string, html binary",
    )
    rows = {
        r["id"]: r["t"]
        for r in df.select(
            "id", extract_main_text_col("html").alias("t")
        ).collect()
    }
    assert rows["a"].startswith("This is the first real paragraph")
    assert rows["b"] is None
    assert rows["c"] == ""

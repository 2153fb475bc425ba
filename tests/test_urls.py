"""SURT canonicalization, CDX indexing, URL filtering."""
import pytest

from pyspark.sql import functions as F

from aml_entity_resolution_assignment_spark.operators.urls import (
    cdx_index,
    surt_key,
    url_filter,
)


def _surt(spark, url):
    return (
        spark.createDataFrame([(url,)], "url string")
        .select(surt_key("url").alias("s"))
        .collect()[0]["s"]
    )


@pytest.mark.parametrize(
    "url,expected",
    [
        # canonical reference shape: host reversed, scheme dropped
        ("http://example.com/path", "com,example)/path"),
        # www + default port stripped, case folded
        ("HTTP://WWW.Example.COM:80/A/B", "com,example)/a/b"),
        ("https://www2.example.com:443/", "com,example)/"),
        # nonstandard port kept, after the reversed host
        ("http://sub.example.org:8080/x", "org,example,sub:8080)/x"),
        # query params sorted, fragment dropped
        ("http://e.com/p?b=2&a=1#frag", "com,e)/p?a=1&b=2"),
        # empty path -> '/', query survives
        ("http://e.com?z=1&a=2", "com,e)/?a=2&z=1"),
        # deep host reversal
        ("http://a.b.c.d.com/", "com,d,c,b,a)/"),
        # www5 is still a www label; m. is NOT (SURT strips www only)
        ("http://www5.e.com/x", "com,e)/x"),
        ("http://m.e.com/x", "com,e,m)/x"),
    ],
)
def test_surt_key_pinned_vectors(spark, url, expected):
    assert _surt(spark, url) == expected


def test_cdx_index_sorted_and_digested(spark):
    rows = [
        ("http://b.com/2", 20, "beta"),
        ("http://a.com/1", 10, "alpha"),
        ("http://a.com/1", 5, "alpha-earlier"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts long, text string")
    out = cdx_index(df, sort=True)
    got = [(r["surt"], r["warc_ts"]) for r in out.collect()]
    assert got == [("com,a)/1", 5), ("com,a)/1", 10), ("com,b)/2", 20)]
    digs = {r["warc_ts"]: r["digest"] for r in out.collect()}
    assert len(set(digs.values())) == 3  # distinct text -> distinct digest


URLS = [
    (1, "http://www.bad.com/fine"),
    (2, "https://good.com/casino/page"),
    (3, "http://good.com/clean?q=1"),
    (4, "http://good.com/xxx-casino"),  # two banned terms
]


def _pages(spark):
    return spark.createDataFrame(URLS, "doc_id long, url string")


def test_url_filter_list_blocklist(spark):
    out = {
        r["doc_id"]: (r["blocked_host"], r["n_banned"], r["keep"])
        for r in url_filter(
            _pages(spark), ["bad.com"], ["casino", "xxx"]
        ).collect()
    }
    assert out == {
        1: (True, 0, False),
        2: (False, 1, False),
        3: (False, 0, True),
        4: (False, 2, False),
    }


def test_url_filter_dataframe_blocklist_matches_list(spark):
    bl = spark.createDataFrame([("bad.com",)], "host string")
    a = url_filter(_pages(spark), ["bad.com"], ["casino"]).collect()
    b = url_filter(_pages(spark), bl, ["casino"]).collect()
    key = lambda rows: {  # noqa: E731
        r["doc_id"]: (r["blocked_host"], r["n_banned"], r["keep"]) for r in rows
    }
    assert key(a) == key(b)


def test_url_filter_max_banned_threshold(spark):
    out = {
        r["doc_id"]: r["keep"]
        for r in url_filter(
            _pages(spark), None, ["casino", "xxx"], max_banned=1
        ).collect()
    }
    assert out == {1: True, 2: True, 3: True, 4: False}


def test_url_filter_drops_nothing(spark):
    assert url_filter(_pages(spark), ["bad.com"], ["casino"]).count() == len(URLS)


# ------------------------------------------------- registrable domain


def test_registrable_domain_psl_vectors(spark):
    """Pinned publicsuffix.org algorithm vectors: normal, multi-label,
    wildcard, exception-overrides-wildcard, default rule, and
    host-is-a-suffix NULLs."""
    from aml_entity_resolution_assignment_spark.operators.urls import (
        registrable_domain,
    )

    cases = [
        ("a.example.com", "com", "example.com"),
        ("example.com", "com", "example.com"),
        ("com", "com", None),
        ("b.shop.co.uk", "co.uk", "shop.co.uk"),
        ("co.uk", "co.uk", None),
        ("deep.sub.gov.uk", "gov.uk", "sub.gov.uk"),
        ("x.foo.ck", "foo.ck", "x.foo.ck"),   # wildcard *.ck
        ("foo.ck", "foo.ck", None),           # the wildcard suffix itself
        ("www.ck", "ck", "www.ck"),           # exception !www.ck
        ("a.www.ck", "ck", "www.ck"),         # exception beats wildcard
        ("host.unknowntld", "unknowntld", "host.unknowntld"),  # rule "*"
        ("unknowntld", "unknowntld", None),
        ("a.b.ne.jp", "ne.jp", "b.ne.jp"),
        ("UP.Example.COM", "com", "example.com"),  # case folding
    ]
    df = spark.createDataFrame([(h,) for h, _, _ in cases], "h string")
    got = {
        r["h"]: (r["public_suffix"], r["domain"])
        for r in registrable_domain(df, host_col="h").collect()
    }
    for h, ps, dom in cases:
        assert got[h] == (ps, dom), h


def test_registrable_domain_from_url_and_custom_rules(spark):
    from aml_entity_resolution_assignment_spark.operators.urls import (
        registrable_domain,
    )

    df = spark.createDataFrame(
        [("https://www.a.b.mytld:8080/p?q=1",), ("http://only.mytld/",)],
        "url string",
    )
    out = {
        r["url"]: (r["public_suffix"], r["domain"])
        for r in registrable_domain(df, rules=["mytld", "b.mytld"]).collect()
    }
    # www. is NOT stripped by the host normalizer here; it's a label
    assert out["https://www.a.b.mytld:8080/p?q=1"] == ("b.mytld", "a.b.mytld")
    assert out["http://only.mytld/"] == ("mytld", "only.mytld")


def test_registrable_domain_partitioning_invariant(spark):
    from aml_entity_resolution_assignment_spark.operators.urls import (
        registrable_domain,
    )

    hosts = [(f"h{i}.d{i % 5}.example.com",) for i in range(40)] + [
        (f"x{i}.w{i % 3}.ck",) for i in range(12)
    ]
    df = spark.createDataFrame(hosts, "h string")
    a = {
        (r["h"], r["public_suffix"], r["domain"])
        for r in registrable_domain(df.repartition(1), host_col="h").collect()
    }
    b = {
        (r["h"], r["public_suffix"], r["domain"])
        for r in registrable_domain(df.repartition(8), host_col="h").collect()
    }
    assert a == b and len(a) == 52


# ----------------------------------------------------- sitemap parsing


def test_sitemap_urlset_and_index(spark):
    from aml_entity_resolution_assignment_spark.operators.urls import (
        sitemap_entries,
    )

    urlset = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>https://a.example/p1</loc>"
        "<lastmod>2024-01-02</lastmod>"
        "<changefreq>daily</changefreq><priority>0.8</priority></url>"
        "<url><loc> https://a.example/p2 </loc></url>"
        "</urlset>"
    )
    index = (
        "<sitemapindex>"
        "<sitemap><loc>https://a.example/s1.xml</loc>"
        "<lastmod>2024-02-03</lastmod></sitemap>"
        "</sitemapindex>"
    )
    df = spark.createDataFrame(
        [(1, urlset), (2, index), (3, "<html>not a sitemap</html>")],
        "doc_id long, xml string",
    )
    rows = sitemap_entries(df).collect()
    got = {
        (r["doc_id"], r["kind"], r["loc"]): (
            r["lastmod"], r["changefreq"], r["priority"]
        )
        for r in rows
    }
    assert got[(1, "url", "https://a.example/p1")] == (
        "2024-01-02", "daily", 0.8
    )
    # whitespace trimmed; absent optionals NULL
    assert got[(1, "url", "https://a.example/p2")] == (None, None, None)
    assert got[(2, "sitemap", "https://a.example/s1.xml")] == (
        "2024-02-03", None, None,
    )
    assert len(rows) == 3  # the html doc contributes nothing


class TestFrontierSchedule:
    def _frontier(self, spark, rows):
        return spark.createDataFrame(
            rows, "url string, host string, score double"
        )

    def test_politeness_cap_and_budget(self, spark):
        from aml_entity_resolution_assignment_spark.operators.urls import (
            frontier_schedule,
        )

        rows = (
            # host a: 6 candidates, scores 0.9..0.4 — cap keeps top 2
            [(f"a/{i}", "a", 0.9 - i / 10) for i in range(6)]
            # host b: 3 candidates, all below host a's best
            + [(f"b/{i}", "b", 0.3 - i / 100) for i in range(3)]
        )
        out = frontier_schedule(
            self._frontier(spark, rows), per_host=2, capacity=3
        ).collect()
        assert [r["url"] for r in out] == ["a/0", "a/1", "b/0"]
        assert [r["host_rank"] for r in out] == [1, 2, 1]

    def test_tie_break_is_deterministic(self, spark):
        from aml_entity_resolution_assignment_spark.operators.urls import (
            frontier_schedule,
        )

        rows = [(u, "h", 0.5) for u in ("h/z", "h/a", "h/m")]
        out = frontier_schedule(
            self._frontier(spark, rows), per_host=2, capacity=10
        ).collect()
        assert [r["url"] for r in out] == ["h/a", "h/m"]

    def test_budget_cut_is_take_ordered(self, spark):
        from aml_entity_resolution_assignment_spark.operators.urls import (
            frontier_schedule,
        )

        df = spark.range(500).selectExpr(
            "concat('h', id % 20, '/p', id) as url",
            "concat('h', id % 20) as host",
            "cast(id % 97 as double) / 97 as score",
        )
        plan = (
            frontier_schedule(df, per_host=3, capacity=10)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan, plan

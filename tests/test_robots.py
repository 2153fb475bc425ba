"""robots.txt parsing + RFC 9309 filtering semantics."""
import pytest

from aml_entity_resolution_assignment_spark.operators.robots import (
    parse_robots,
    robots_filter,
)

ROBOTS = """\
# comment line
User-agent: *
Disallow: /private
Allow: /private/ok

User-agent: trainbot
User-agent: otherbot
Disallow: /train
Allow: /train/docs
Disallow:

User-agent: trainbot
Disallow: /extra
"""


def _rules(spark, txt=ROBOTS, host="h.com"):
    df = spark.createDataFrame([(host, txt)], "host string, robots_txt string")
    return parse_robots(df)


def test_parse_groups_and_agents(spark):
    rows = {
        (r["agent"], r["allow"], r["prefix"]) for r in _rules(spark).collect()
    }
    assert rows == {
        ("*", False, "/private"),
        ("*", True, "/private/ok"),
        # consecutive UA lines share the group's rules
        ("trainbot", False, "/train"),
        ("trainbot", True, "/train/docs"),
        ("otherbot", False, "/train"),
        ("otherbot", True, "/train/docs"),
        # second trainbot group combines (multi-group agent)
        ("trainbot", False, "/extra"),
    }
    # empty-value Disallow dropped at parse
    assert not any(r["prefix"] == "" for r in _rules(spark).collect())


def _filter(spark, urls, agent):
    pages = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    out = robots_filter(pages, _rules(spark), agent=agent)
    return {r["url"]: r["allowed"] for r in out.collect()}


def test_exact_agent_group_overrides_star(spark):
    got = _filter(
        spark,
        [
            "http://h.com/private/x",  # * group would block; trainbot group applies -> allowed
            "http://h.com/train/x",  # trainbot disallow
            "http://h.com/train/docs/a",  # longest match: allow
            "http://h.com/extra/y",  # second trainbot group disallows
            "http://h.com/free",  # no rule -> allowed
            "http://h.com",  # empty path -> '/'
        ],
        "trainbot",
    )
    assert got == {
        "http://h.com/private/x": True,
        "http://h.com/train/x": False,
        "http://h.com/train/docs/a": True,
        "http://h.com/extra/y": False,
        "http://h.com/free": True,
        "http://h.com": True,
    }


def test_star_group_for_unknown_agent(spark):
    got = _filter(
        spark,
        ["http://h.com/private/x", "http://h.com/private/ok/y", "http://h.com/train/x"],
        "somebot",
    )
    assert got == {
        "http://h.com/private/x": False,
        "http://h.com/private/ok/y": True,  # longer Allow wins
        "http://h.com/train/x": True,  # trainbot group doesn't apply
    }


def test_unknown_host_always_allowed(spark):
    got = _filter(spark, ["http://other.com/private/x"], "somebot")
    assert got == {"http://other.com/private/x": True}


def test_allow_wins_length_tie(spark):
    txt = "User-agent: *\nDisallow: /p/ab\nAllow: /p/ab\n"
    pages = spark.createDataFrame([(1, "http://h.com/p/abc")], "doc_id long, url string")
    out = robots_filter(pages, _rules(spark, txt), agent="x")
    assert out.collect()[0]["allowed"] is True


def test_filter_drops_nothing_and_agent_case_insensitive(spark):
    urls = ["http://h.com/train/x", "http://h.com/a"]
    a = _filter(spark, urls, "TrainBot")
    b = _filter(spark, urls, "trainbot")
    assert a == b and len(a) == 2

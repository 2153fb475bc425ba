"""robots.txt parsing and RFC 9309 URL filtering.

Common-Crawl-style corpora ship one robots.txt capture per host; a
compliant training-data pipeline must honor them retroactively. Two
operators, both pure column expressions (string splits + two window
passes + joins — no UDF):

- ``parse_robots``   (host, robots_txt) -> (host, agent, allow, prefix)
                     rule rows. Record grouping per RFC 9309 §2.1:
                     consecutive ``User-agent:`` lines share one group
                     (detected with a lag window), each group's
                     Allow/Disallow lines attach to all its agents, and
                     an agent appearing in several groups contributes
                     all of them. Comments (#) stripped; empty-value
                     Disallow (``allow everything``) dropped at parse.
- ``robots_filter``  pages + rules + agent -> pages with an ``allowed``
                     flag. Group selection per RFC: if the host has any
                     rules for the exact agent, ONLY those apply,
                     otherwise the ``*`` group. Longest-prefix match
                     wins; on a length tie Allow wins. No matching rule
                     -> allowed. Flags only — the caller routes.

Scale: rules tables are hosts-sized (~10^8 rows max for the full web —
1000x smaller than pages); the filter is one host-keyed join + one
per-page window over the handful of matching prefixes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aml_entity_resolution_assignment_spark.functions.normalize import (
    norm_hostname,
    url_host,
)

def parse_robots(
    robots: DataFrame, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) -> (host, agent, allow, prefix) rule rows."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(txt_col), "\n")).alias("pos", "raw"),
    )
    clean = F.trim(F.regexp_replace("raw", r"#.*$", ""))
    key_raw = F.substring_index(clean, ":", 1)
    kv = lines.select(
        "host",
        "pos",
        F.lower(F.trim(key_raw)).alias("key"),
        F.trim(F.substring(clean, F.length(key_raw) + 2, F.lit(2147483647))).alias("val"),
    )
    w = Window.partitionBy("host").orderBy("pos")
    kv = kv.withColumn("is_ua", F.col("key") == "user-agent").withColumn(
        "prev_ua", F.coalesce(F.lag("is_ua").over(w), F.lit(False))
    )
    kv = kv.withColumn(
        "rec",
        F.sum(
            F.when(F.col("is_ua") & ~F.col("prev_ua"), 1).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    agents = kv.where(F.col("is_ua") & (F.col("val") != "")).select(
        "host", "rec", F.lower("val").alias("agent")
    )
    rules = kv.where(
        F.col("key").isin("allow", "disallow") & (F.col("val") != "")
    ).select(
        "host",
        "rec",
        (F.col("key") == "allow").alias("allow"),
        F.col("val").alias("prefix"),
    )
    return agents.join(rules, ["host", "rec"]).select(
        "host", "agent", "allow", "prefix"
    )


def url_path(url) -> F.Column:
    """Raw (case-preserved) path of a url column; '' -> '/'."""
    p = F.regexp_extract(
        url if not isinstance(url, str) else F.col(url),
        r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)",
        1,
    )
    return F.when(p == "", F.lit("/")).otherwise(p)


def robots_filter(
    pages: DataFrame,
    rules: DataFrame,
    agent: str,
    id_col: str = "doc_id",
    url_col: str = "url",
) -> DataFrame:
    """Add an `allowed` flag to pages per the host's robots rules."""
    a = agent.lower()
    exact = rules.where(F.col("agent") == a)
    star = rules.where(F.col("agent") == "*")
    applicable = exact.select("host", "allow", "prefix").unionByName(
        star.join(exact.select("host").distinct(), "host", "left_anti").select(
            "host", "allow", "prefix"
        )
    )
    pg = pages.withColumn(
        "_rhost", norm_hostname(url_host(F.col(url_col)))
    ).withColumn("_rpath", url_path(url_col))
    cand = pg.select(id_col, "_rhost", "_rpath").join(
        applicable, pg["_rhost"] == applicable["host"]
    )
    cand = cand.where(F.col("_rpath").startswith(F.col("prefix")))
    w = Window.partitionBy(id_col).orderBy(
        F.length("prefix").desc(), F.col("allow").desc()
    )
    decision = (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, F.col("allow").alias("_dec"))
    )
    return (
        pg.join(decision, id_col, "left")
        .withColumn("allowed", F.coalesce("_dec", F.lit(True)))
        .drop("_rhost", "_rpath", "_dec")
    )

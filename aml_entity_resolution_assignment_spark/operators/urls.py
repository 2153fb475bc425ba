"""URL canonicalization (SURT), CDX-style capture indexing, URL filters.

Web-archive plumbing for a Common-Crawl-scale corpus:

- ``surt_key``   Sort-friendly URI Reordering Transform — the canonical
                 key every CDX index and wayback lookup sorts on. This
                 implements the documented urlcanon/Heritrix core:
                 lowercase, scheme and fragment dropped, leading
                 ``www\\d*.`` label stripped, default ports (80/443)
                 stripped, host dot-segments REVERSED comma-joined,
                 query parameters sorted; ``com,example:8080)/path?a=1``
                 shape. (Out of scope, documented: userinfo stripping,
                 percent-encoding normalization, IDN — the corpus
                 generator never emits them.)
- ``cdx_index``  pages -> (surt, warc_ts, url, digest) capture index
                 rows, the N-line CDX(J) analog; at scale written
                 sorted-within-partitions after a range partition on
                 surt so per-prefix lookups prune files.
- ``url_filter`` RefinedWeb-style URL-level filtering: hard host
                 blocklist (broadcast semi-join on the bk_host
                 normalizer) + soft banned-term score over the URL
                 string; emits flags, never silently drops.

All pure column expressions — no UDF, no shuffle except cdx_index's
optional sort.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aml_entity_resolution_assignment_spark.functions.normalize import (
    norm_hostname,
    url_host,
)


def surt_key(url: Column | str) -> Column:
    """SURT canonical key for a url column (see module docstring)."""
    u = F.lower(F.trim(F.col(url) if isinstance(url, str) else url))
    u = F.regexp_replace(u, r"#.*$", "")  # fragment
    rest = F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?]+)", 1)
    tail = F.substring(rest, F.length(hostport) + 1, F.lit(2147483647))
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    host = F.regexp_replace(hostport, r":\d+$", "")
    host = F.regexp_replace(host, r"^www\d*\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    port_sfx = F.when(
        (port != "") & ~port.isin("80", "443"), F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    path = F.regexp_extract(tail, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(tail, r"\?(.*)$", 1)
    q_sorted = F.array_join(F.array_sort(F.split(query, "&")), "&")
    q_sfx = F.when(query != "", F.concat(F.lit("?"), q_sorted)).otherwise(
        F.lit("")
    )
    return F.concat(rev, port_sfx, F.lit(")"), path, q_sfx)


def cdx_index(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
    sort: bool = False,
) -> DataFrame:
    """CDX-style capture index: (surt, warc_ts, url, digest).

    digest = md5 of the extracted text (the engine's byte-identity
    invariant column), the dedup key CDXJ calls ``digest``. With
    ``sort=True`` the result is range-partitioned on surt and sorted
    within partitions — the on-disk layout a binary-searchable CDX
    needs; leave False when the index feeds a join instead.
    """
    out = pages.select(
        surt_key(url_col).alias("surt"),
        F.col(ts_col).alias("warc_ts"),
        F.col(url_col).alias("url"),
        F.md5(F.col(text_col).cast("string")).alias("digest"),
    )
    if sort:
        out = out.repartitionByRange("surt", "warc_ts").sortWithinPartitions(
            "surt", "warc_ts"
        )
    return out


def url_filter(
    pages: DataFrame,
    block_hosts: Iterable[str] | DataFrame | None = None,
    banned_terms: Iterable[str] = (),
    max_banned: int = 0,
    url_col: str = "url",
) -> DataFrame:
    """Flag pages by URL signals (RefinedWeb §URL filtering shape).

    - blocked_host: normalized host appears in `block_hosts` (list ->
      broadcast literal set via isin; DataFrame(host) -> broadcast
      left-semi-style join, the 100k-entry-blocklist path).
    - n_banned: how many of `banned_terms` occur in the lowercased URL.
    - keep: not blocked and n_banned <= max_banned.

    Adds columns, drops nothing — the caller decides between
    ``.where("keep")`` and routing rejects to a quarantine sink.
    """
    host = norm_hostname(url_host(F.col(url_col)))
    u = F.lower(F.col(url_col))
    n_banned = F.lit(0)
    for t in banned_terms:
        n_banned = n_banned + F.when(u.contains(t.lower()), 1).otherwise(0)

    if block_hosts is None:
        blocked = F.lit(False)
        out = pages.withColumn("_h", host)
    elif isinstance(block_hosts, DataFrame):
        bl = block_hosts.select(
            F.col(block_hosts.columns[0]).alias("_h"),
            F.lit(True).alias("_blocked"),
        ).distinct()
        out = pages.withColumn("_h", host).join(F.broadcast(bl), "_h", "left")
        blocked = F.coalesce("_blocked", F.lit(False))
    else:
        out = pages.withColumn("_h", host)
        blocked = F.col("_h").isin([h.lower() for h in block_hosts])

    return (
        out.withColumn("blocked_host", blocked)
        .withColumn("n_banned", n_banned.cast("int"))
        .withColumn(
            "keep",
            ~F.col("blocked_host") & (F.col("n_banned") <= max_banned),
        )
        .drop("_h", "_blocked")
    )

"""Batch resolve: query records vs corpus (A1-A4).

Reference serves single records over HTTP (/root/reference/src/api.py:
219-390); the Spark-native equivalent is DataFrame-in/DataFrame-out:
resolve(queries_df) scores every query against its blocked candidates
and returns the best match per query with ranking, host-dedup, and
identity-conflict detection — the same semantics, batched.

  A1 candidate lookup  api.py:163-215  -> per-key semi-joins + band join
  A2 best-match rank   api.py:308-341  -> window over (priority, confidence)
  A3 NID dedup         api.py:313-323  -> row_number per (query, host)
  A4 conflict check    api.py:344-374  -> per-query aggregation over
                                          id-driven vs name-driven sets
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .blocking import BAND_KEYS, BLOCKING_KEYS, add_blocking_keys
from .classify import RuleThresholds, classify
from .features import compute_features

CANDIDATE_LIMIT = 50  # api.py:163


def find_candidates(
    query_keyed: DataFrame,
    corpus_keyed: DataFrame,
    limit: int = CANDIDATE_LIMIT,
) -> DataFrame:
    """(query_id, candidate url) pairs: equality on any exact blocking
    key or shared LSH band, capped per query (api.py:163-215). Unlike
    the self-join path, this is query-vs-corpus, so each key is a plain
    two-sided equi-join; the query side is typically small -> broadcast."""
    parts = []
    q = F.broadcast(query_keyed)
    for k in BLOCKING_KEYS:
        parts.append(
            q.where(F.col(k).isNotNull())
            .select(F.col("url").alias("query_id"), F.col(k).alias("_k"))
            .join(
                corpus_keyed.where(F.col(k).isNotNull()).select(
                    F.col("url").alias("candidate_id"), F.col(k).alias("_k")
                ),
                "_k",
            )
            .drop("_k")
        )
    for k in BAND_KEYS:
        parts.append(
            q.where(F.col(k).isNotNull())
            .select(
                F.col("url").alias("query_id"), F.explode(F.col(k)).alias("_b")
            )
            .join(
                corpus_keyed.where(F.col(k).isNotNull()).select(
                    F.col("url").alias("candidate_id"),
                    F.explode(F.col(k)).alias("_b"),
                ),
                "_b",
            )
            .drop("_b")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # dedup doubles as a relevance proxy: candidates hitting MORE
    # blocking keys rank first, so the per-query cap keeps the likeliest
    # matches instead of the lexicographically-smallest urls (the
    # reference's bare LIMIT 50, api.py:163, drops arbitrarily)
    out = (
        out.where(F.col("query_id") != F.col("candidate_id"))
        .groupBy("query_id", "candidate_id")
        .agg(F.count("*").alias("n_shared_keys"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_shared_keys"), F.asc("candidate_id")
    )
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= limit)
        .drop("_rn", "n_shared_keys")
    )


def resolve(
    queries: DataFrame,
    corpus_keyed: DataFrame,
    thresholds: RuleThresholds | None = None,
    limit: int = CANDIDATE_LIMIT,
    top_n: int = 1,
    already_keyed: bool = False,
) -> DataFrame:
    """Batch resolve: pages-shaped queries -> best candidate(s) per
    query with match_type/confidence/explanation + conflict flag.
    Pass already_keyed=True when `queries` is a pre-keyed table (same
    schema as corpus_keyed) — e.g. a stage checkpoint, or the oracle
    harness that constructs keys in SQL-expressible form."""
    query_keyed = queries if already_keyed else add_blocking_keys(queries)
    cand = find_candidates(query_keyed, corpus_keyed, limit=limit)

    # hydrate both sides (queries from query_keyed, candidates from corpus)
    from .features import HYDRATION_COLS

    qcols = query_keyed.select(
        *[F.col(c).alias(f"{c}_a") for c in HYDRATION_COLS]
    )
    ccols = corpus_keyed.select(
        *[F.col(c).alias(f"{c}_b") for c in HYDRATION_COLS]
    )
    hydrated = (
        cand.withColumnRenamed("query_id", "id_a")
        .withColumnRenamed("candidate_id", "id_b")
        .join(qcols, F.col("id_a") == F.col("url_a"))
        .join(ccols, F.col("id_b") == F.col("url_b"))
        .drop("url_a", "url_b")
    )
    classified = classify(compute_features(hydrated), thresholds)

    # A4: identity conflict — id-driven (host) vs name-driven (title)
    # candidate sets disjoint => force review (api.py:344-374)
    id_driven = F.collect_set(
        F.when(F.col("host_score") >= 0.9, F.col("id_b"))
    ).alias("_id_set")
    name_driven = F.collect_set(
        F.when(F.col("title_score") > 0.9, F.col("id_b"))
    ).alias("_name_set")
    conflicts = classified.groupBy(F.col("id_a")).agg(id_driven, name_driven)
    conflicts = conflicts.select(
        "id_a",
        (
            (F.size("_id_set") > 0)
            & (F.size("_name_set") > 0)
            & (F.size(F.array_intersect("_id_set", "_name_set")) == 0)
        ).alias("identity_conflict"),
    )

    # A2/A3: priority map match=2/review=1/no_match=0; host-dedup then rank
    pri = (
        F.when(F.col("match_type") == "match", 2)
        .when(F.col("match_type") == "review", 1)
        .otherwise(0)
    )
    hosts = corpus_keyed.select(
        F.col("url").alias("id_b"), F.col("host").alias("host_b")
    )
    ranked = classified.join(hosts, "id_b").withColumn("priority", pri)
    w_host = Window.partitionBy("id_a", "host_b").orderBy(
        F.desc("priority"), F.desc("confidence_score"), F.asc("id_b")
    )
    ranked = ranked.withColumn("_hr", F.row_number().over(w_host)).where(
        F.col("_hr") == 1
    )
    w_best = Window.partitionBy("id_a").orderBy(
        F.desc("priority"), F.desc("confidence_score"), F.asc("id_b")
    )
    best = (
        ranked.withColumn("rank", F.row_number().over(w_best))
        .where(F.col("rank") <= top_n)
        .join(conflicts, "id_a", "left")
        .select(
            F.col("id_a").alias("query_id"),
            F.col("id_b").alias("matched_url"),
            F.when(
                F.coalesce("identity_conflict", F.lit(False))
                & (F.col("match_type") == "match"),
                "review",
            )
            .otherwise(F.col("match_type"))
            .alias("match_type"),
            "confidence_score",
            "explanation",
            "rank",
            F.coalesce("identity_conflict", F.lit(False)).alias("identity_conflict"),
        )
    )
    return best

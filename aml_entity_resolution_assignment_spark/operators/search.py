"""Full-text search over the corpus: inverted postings + BM25 ranking.

A training-data pipeline needs keyword search for decontamination
audits, targeted-domain mining, and eval-set mining. This provides the
two classic layers:

- ``build_postings``  (term, doc_id, tf) inverted-index rows — written
                      bucketed by term at scale (sources/io.py
                      write_bucketed) so a query's term lookups are a
                      zero-shuffle bucket-pruned scan.
- ``bm25_scores``     Okapi BM25 (Lucene's non-negative idf variant:
                      ln(1 + (N - df + 0.5)/(df + 0.5))) for a fixed
                      query-term list. The term filter is applied
                      BEFORE any aggregation, so only query-term
                      postings ever reach a shuffle; corpus-wide stats
                      (N, avgdl) are two scalar aggregates.

Tokenization is the engine's standard whitespace split (functions/
text.py token semantics) — swap in functions/bpe.py upstream when
subword postings are wanted.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str):
    return F.split(F.lower(F.col(text_col)), r"\s+")


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, doc_id, tf) inverted-index rows, empty terms dropped."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_tokens(text_col)).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, score) for every doc containing >= 1 query term.

    score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    dl = whitespace token count of the doc, avgdl its corpus mean,
    idf the Lucene BM25 form. All plain DataFrame aggregations; the
    only rows shuffled are the query-term postings.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]

    base = docs.select(
        F.col(id_col).alias("doc_id"), _tokens(text_col).alias("toks")
    ).withColumn(
        "dl", F.size(F.filter("toks", lambda t: t != "")).cast("double")
    )
    base = base.persist()
    stats = base.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n, avgdl = stats["n"], stats["avgdl"]

    hits = (
        base.select("doc_id", "dl", F.explode("toks").alias("term"))
        .where(F.col("term").isin(terms))  # pushed below the aggregation
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = hits.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    # idf is a driver-side map over <= |query| rows — aggregate-sized
    idf = {
        r["term"]: math.log(1.0 + (n - r["df"] + 0.5) / (r["df"] + 0.5))
        for r in df_.collect()
    }
    idf_col = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in idf.items() for x in kv]
        ),
        F.col("term"),
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
    contrib = idf_col * F.col("tf") * (k1 + 1.0) / denom
    out = (
        hits.select("doc_id", contrib.alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("score"))
    )
    out = out.localCheckpoint(eager=True)
    base.unpersist()
    return out

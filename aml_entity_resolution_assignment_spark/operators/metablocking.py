"""Meta-blocking: weight and prune the candidate-pair graph.

Published scale technique for redundancy-positive blocking (Papadakis
et al., TKDE 2014): when every entity appears in several blocks (the
exact-key + LSH-band union this engine's candidate stage produces —
operators/candidates.py), the NUMBER and SIZE of blocks two entities
share is evidence. Meta-blocking turns the block collection into a
weighted pair graph and discards low-evidence pairs BEFORE the
expensive pairwise-scoring stage — at 10^12 records this is the lever
that cuts the scoring-stage shuffle by an order of magnitude while
keeping recall (reference counterpart: none — the reference scores
every candidate, src/matching.py:186).

Weighting schemes (standard names):
  CBS   — common blocks: how many blocks the pair co-occurs in.
  ECBS  — CBS scaled by entity rarity: cbs * ln(B/B_i) * ln(B/B_j)
          (B = total blocks, B_i = blocks containing entity i).
  ARCS  — sum over shared blocks of 1/comparison-cardinality
          (1 / (|b|*(|b|-1)/2)) — discounts big blocks.

Pruning: WEP (weighted-edge pruning) keeps pairs whose weight is >=
the global mean weight. The mean is computed on CBS (integer counts:
sum/count divides the same exact integers in any engine, so the
boundary is bit-deterministic — ARCS/ECBS are float sums whose
summation order varies across engines/partitionings).

Plan shape: one per-block self-join bounded by `purge_cap` (block
purging is PART of the technique: oversized blocks carry near-zero
evidence per pair and quadratic cost — same role as the candidates
drop-cap), one groupBy (id_a, id_b), one broadcast join of per-entity
block degrees, one scalar-aggregate broadcast for the mean. Every
shuffle key is either the block key (bounded by purge) or the pair id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_PURGE_CAP = 200


def metablock_pairs(
    entity_blocks: DataFrame,
    id_col: str = "doc_id",
    block_col: str = "block_key",
    purge_cap: int = DEFAULT_PURGE_CAP,
    prune: bool = True,
) -> DataFrame:
    """(entity, block) table -> weighted (id_a, id_b, cbs, arcs, ecbs)
    pairs, WEP-pruned on CBS when `prune`.

    Input rows are deduplicated on (entity, block). Blocks with fewer
    than 2 or more than `purge_cap` entities are purged before any
    pair is formed.
    """
    eb = (
        entity_blocks.select(
            F.col(id_col).alias("eid"), F.col(block_col).alias("bk")
        )
        .where(F.col("bk").isNotNull())
        .distinct()
    )

    sizes = eb.groupBy("bk").agg(F.count("*").alias("bsize"))
    kept = sizes.where(
        (F.col("bsize") >= 2) & (F.col("bsize") <= purge_cap)
    )
    ebk = eb.join(kept, "bk")

    # per-entity block degree and total block count (post-purge)
    degrees = ebk.groupBy("eid").agg(F.count("*").alias("deg"))
    n_blocks = kept.agg(F.count("*").alias("nb"))

    a = ebk.select(
        F.col("eid").alias("id_a"), "bk", F.col("bsize")
    )
    b = ebk.select(F.col("eid").alias("id_b"), F.col("bk"))
    per_block = a.join(b, "bk").where(F.col("id_a") < F.col("id_b"))

    pair_w = per_block.groupBy("id_a", "id_b").agg(
        F.count("*").alias("cbs"),
        F.sum(2.0 / (F.col("bsize") * (F.col("bsize") - 1))).alias("arcs"),
    )

    da = degrees.select(
        F.col("eid").alias("id_a"), F.col("deg").alias("deg_a")
    )
    db = degrees.select(
        F.col("eid").alias("id_b"), F.col("deg").alias("deg_b")
    )
    # degree joins are per-entity tables: NOT broadcastable at 10^12
    # entities — leave them as equi-joins and let AQE pick broadcast
    # when the input is actually small
    out = (
        pair_w.join(da, "id_a")
        .join(db, "id_b")
        .crossJoin(F.broadcast(n_blocks))
        .withColumn(
            "ecbs",
            F.col("cbs")
            * F.log(F.col("nb") / F.col("deg_a"))
            * F.log(F.col("nb") / F.col("deg_b")),
        )
        .drop("deg_a", "deg_b", "nb")
    )

    if prune:
        # WEP on CBS: integer sum / integer count — engine-independent
        mean_w = pair_w.agg(
            (F.sum("cbs") / F.count("*")).alias("mean_cbs")
        )
        out = out.crossJoin(F.broadcast(mean_w)).where(
            F.col("cbs") >= F.col("mean_cbs")
        ).drop("mean_cbs")

    return out.select("id_a", "id_b", "cbs", "arcs", "ecbs")

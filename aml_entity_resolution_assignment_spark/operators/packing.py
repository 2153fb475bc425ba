"""Sequence packing: concat tokenized docs, emit fixed-length blocks.

The final stage of every LLM pretraining pipeline: documents become
token arrays (functions/bpe.py or whitespace tokens), the corpus is
concatenated in a canonical document order (optionally with an EOS
token after each document), and the stream is cut into fixed-length
training blocks. Deterministic: block b always contains global token
positions [b*L, (b+1)*L), independent of partitioning.

Scale design (10^12 docs): the naive formulation needs a global
running-sum window (one ordered partition — a single-reducer
scale-killer) or a token-level explode (|corpus| rows through a
shuffle). This implementation does neither:

1. range-partition docs by id; per-partition token-count cumsum runs
   as a window PARTITIONED by spark_partition_id() (parallel), and the
   per-partition totals (#partitions rows — aggregate-sized) are
   collected once and broadcast back as partition base offsets: the
   standard two-phase distributed prefix sum.
2. each doc emits one row per training block it overlaps (explode of a
   2-3 element block-id sequence, NOT per token) carrying the exact
   array slice for that block; the groupBy(block) then moves each
   token exactly once — packing's inherent single data pass — and
   reassembles slices with an order-pinning sort_array.

The partial tail block is dropped by default (drop_last), matching
standard pretraining practice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _with_global_offsets(
    docs: DataFrame, id_col: str, n_col: str
) -> DataFrame:
    """Add `start`: the exclusive running sum of n_col in id_col order.

    Two-phase prefix sum: range repartition by id (ranges are assigned
    to ascending partition ids, so partition-local order + partition
    base = global order), per-partition cumsum window, then one
    #partitions-row collect for the bases. The final offsets are
    partitioning-invariant even though the sampled range boundaries are
    not — the cumsum in id order is well-defined wherever the cuts
    fall.
    """
    from aml_entity_resolution_assignment_spark.operators.candidates import (
        _PERSISTED,
    )

    d = docs.repartitionByRange(F.col(id_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    d = d.persist()
    _PERSISTED.append(d)  # released via candidates.release_persisted()
    w = Window.partitionBy("_pid").orderBy(id_col)
    local = (F.sum(n_col).over(w) - F.col(n_col)).alias("_local")
    totals = sorted(
        d.groupBy("_pid").agg(F.sum(n_col).alias("_tot")).collect(),
        key=lambda r: r["_pid"],
    )
    bases, acc = [], 0
    for r in totals:
        bases.append((r["_pid"], acc))
        acc += r["_tot"] or 0
    spark = docs.sparkSession
    base_df = spark.createDataFrame(bases, "_pid int, _base long")
    out = (
        d.select("*", local)
        .join(F.broadcast(base_df), "_pid")
        .withColumn("start", (F.col("_base") + F.col("_local")).cast("long"))
        .drop("_pid", "_local", "_base")
    )
    return out


def pack_sequences(
    docs: DataFrame,
    block_size: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    eos: object | None = None,
    drop_last: bool = True,
) -> DataFrame:
    """(id, tokens array) -> (block_id, n_tokens, tokens) fixed blocks.

    Token stream = concat of tokens in ascending id order, `eos`
    appended after each doc when given; block b = positions
    [b*block_size, (b+1)*block_size). Empty docs contribute nothing
    (an eos is still emitted for them when eos is set — an empty
    document is still a document boundary).
    """
    if block_size <= 0:
        raise ValueError("block_size must be positive")
    toks: Column = F.col(tokens_col)
    if eos is not None:
        toks = F.concat(toks, F.array(F.lit(eos)))
    d = docs.select(F.col(id_col).alias("_id"), toks.alias("_toks")).withColumn(
        "_n", F.size("_toks")
    )
    d = d.where(F.col("_n") > 0)
    d = _with_global_offsets(d, "_id", "_n")

    L = F.lit(block_size).cast("long")
    first = (F.col("start") / L).cast("long")
    last = ((F.col("start") + F.col("_n") - 1) / L).cast("long")
    spans = d.select(
        "_toks",
        "start",
        "_n",
        F.explode(F.sequence(first, last)).alias("block_id"),
    )
    # intersection of [start, start+n) with [b*L, (b+1)*L)
    gstart = F.greatest(F.col("start"), F.col("block_id") * L)
    gend = F.least(F.col("start") + F.col("_n"), (F.col("block_id") + 1) * L)
    chunk = F.slice(
        "_toks",
        (gstart - F.col("start") + 1).cast("int"),
        (gend - gstart).cast("int"),
    )
    pieces = spans.select(
        "block_id",
        F.struct(gstart.alias("off"), chunk.alias("chunk")).alias("piece"),
    )
    out = (
        pieces.groupBy("block_id")
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(F.collect_list("piece")), lambda p: p["chunk"]
                )
            ).alias("tokens")
        )
        .withColumn("n_tokens", F.size("tokens"))
    )
    if drop_last:
        out = out.where(F.col("n_tokens") == block_size)
    # the prefix-sum input persisted inside _with_global_offsets stays
    # cached until candidates.release_persisted()/persisted_scope()
    # (shared registry): unpersisting before the caller materializes
    # this plan would re-trigger the totals collect on recompute
    return out.select("block_id", "n_tokens", "tokens")

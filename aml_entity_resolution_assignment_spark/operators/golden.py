"""Golden-record survivorship: one consolidated record per entity.

The step after clustering that every production ER deployment needs
(reference counterpart: none — the reference stops at cluster ids):
given the records and the entity map, build the "golden" merged record
under per-field survivorship rules. Because the merge functions are
per-cluster aggregates (not order-dependent pairwise merges a la
R-Swoosh), the result is deterministic and partitioning-invariant by
construction — the distributed-safe fragment of merge-based ER.

Rules (per field):
  mode    — most frequent value; count ties broken by the
            lexicographically greatest value. Implemented for ALL mode
            fields in ONE shuffle chain via a melt -> (entity, field,
            value) count -> max_by -> pivot, instead of one groupBy
            per field.
  longest — longest string; ties -> lexicographically greatest.
  min/max — plain extrema.

Nulls never survive when any record in the cluster has a value
(aggregates skip nulls; an all-null cluster yields null).

Scale shape: every aggregation is keyed by entity id (and field name
for the melt) — map-side combine applies, no skew beyond cluster-size
skew itself, which the upstream drop-caps already bound. One shuffle
for the melt chain + one for the extrema aggs + a final equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SUPPORTED_RULES = ("mode", "longest", "min", "max")


def golden_record(
    records: DataFrame,
    entity_map: DataFrame,
    rules: dict[str, str],
    id_col: str = "url",
    entity_col: str = "predicted_entity_id",
) -> DataFrame:
    """records + (id -> entity) map -> one row per entity with the
    surviving value per field according to `rules` (field -> rule).

    Output columns: entity_col, n_members, then one column per rule
    field (mode fields come back as strings — the melt casts)."""
    bad = {f: r for f, r in rules.items() if r not in SUPPORTED_RULES}
    if bad:
        raise ValueError(f"unsupported survivorship rules: {bad}")
    missing = [f for f in rules if f not in records.columns]
    if missing:
        raise ValueError(f"rule fields not in records: {missing}")

    em = entity_map.select(
        F.col(id_col).alias("_gid"), F.col(entity_col).alias("_ent")
    )
    joined = records.withColumnRenamed(id_col, "_gid").join(em, "_gid")

    base = joined.groupBy("_ent").agg(F.count("*").alias("n_members"))
    out = base

    mode_fields = [f for f, r in rules.items() if r == "mode"]
    if mode_fields:
        # melt: one row per (entity, field, value) — all mode fields in
        # a single shuffle chain regardless of how many there are
        melted = joined.select(
            "_ent",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(f).alias("_fld"),
                            F.col(f).cast("string").alias("_val"),
                        )
                        for f in mode_fields
                    ]
                )
            ).alias("_fv"),
        ).select("_ent", "_fv._fld", "_fv._val")
        counts = (
            melted.where(F.col("_val").isNotNull())
            .groupBy("_ent", "_fld", "_val")
            .agg(F.count("*").alias("_cnt"))
        )
        winners = counts.groupBy("_ent", "_fld").agg(
            F.max(F.struct("_cnt", "_val")).alias("_w")
        )
        pivoted = (
            winners.groupBy("_ent")
            .pivot("_fld", mode_fields)
            .agg(F.first("_w._val"))
        )
        out = out.join(pivoted, "_ent", "left")

    extrema_aggs = []
    for f, r in rules.items():
        if r == "longest":
            extrema_aggs.append(
                F.max(
                    F.when(
                        F.col(f).isNotNull(),
                        F.struct(F.length(F.col(f)).alias("_l"), F.col(f)),
                    )
                )[f].alias(f)
            )
        elif r == "min":
            extrema_aggs.append(F.min(f).alias(f))
        elif r == "max":
            extrema_aggs.append(F.max(f).alias(f))
    if extrema_aggs:
        ext = joined.groupBy("_ent").agg(*extrema_aggs)
        out = out.join(ext, "_ent", "left")

    return out.withColumnRenamed("_ent", entity_col)

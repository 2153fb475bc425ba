"""Custom join operators Spark lacks as built-ins: AS-OF join and
RANGE (interval) join — the two shapes the build brief names for
large-scale training-data pipelines (feature lookup at event time;
point-in-interval enrichment).

Both are compositions of existing DataFrame ops chosen for the
100 TB execution model, not row-at-a-time reimplementations:

* as_of_join — the union/carry-forward form of a merge as-of join:
  tag both sides, sort within each key by (ts, side), and
  carry-forward the latest right row as a STRUCT with
  last(ignorenulls) over an unbounded-preceding window. ONE shuffle
  on the key, one sort — exactly the cost of a sort-merge join; no
  per-left-row probe, no correlated subquery, no skew beyond the
  key's own distribution.

* range_join_points_intervals — the bucketed form of an interval
  join: intervals explode to fixed-width buckets, points hash to
  their single bucket, the join is a plain equi-join on
  (keys..., bucket) with the exact containment predicate applied
  after. Each matching (point, interval) pair meets in EXACTLY one
  bucket (the point's), so no dedup pass is needed. Without
  bucketing Catalyst can only produce a broadcast-nested-loop or a
  cartesian per key — quadratic death at scale; with it, cost is
  O(points + intervals * spans) with spans = interval width /
  bucket_width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance: float | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """For every left row, attach the most recent right row of the same
    key with right_ts <= left_ts (backward as-of, inclusive — the
    pandas.merge_asof default). Right payload columns come back
    prefixed; rows with no prior right row (or outside `tolerance`
    seconds) get nulls.

    Ties: right rows sort before left rows at equal timestamps
    (inclusive match); multiple right rows at the SAME (key, ts) are
    broken deterministically by the struct's column order."""
    rcols = [c for c in right.columns if c not in on and c != right_ts]
    l = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(
            right.select(
                F.struct(
                    F.col(right_ts).alias("_rts"), *[F.col(c) for c in rcols]
                ).alias("s")
            ).schema["s"].dataType
        ).alias("_rrow"),
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l.schema["_lrow"].dataType).alias("_lrow"),
        F.struct(
            F.col(right_ts).alias("_rts"), *[F.col(c) for c in rcols]
        ).alias("_rrow"),
    )
    tagged = l.unionByName(r)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_rrow").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged.withColumn(
        "_match", F.last("_rrow", ignorenulls=True).over(w)
    ).where(F.col("_side") == 1)
    if tolerance is not None:
        in_tol = (
            F.col("_ts").cast("double") - F.col("_match._rts").cast("double")
        ) <= F.lit(float(tolerance))
        carried = carried.withColumn(
            "_match", F.when(in_tol, F.col("_match"))
        )
    out_cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("_match._rts").alias(f"{right_prefix}{right_ts}"))
    out_cols += [
        F.col(f"_match.{c}").alias(f"{right_prefix}{c}") for c in rcols
    ]
    return carried.select(*out_cols)


def range_join_points_intervals(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
    bucket_width: float = 100.0,
) -> DataFrame:
    """Inner join of points to every interval containing them
    (start <= point <= end, inclusive), optionally also keyed on `on`.
    Bucketed equi-join (see module docstring); pick `bucket_width`
    near the typical interval width so most intervals explode to a
    handful of buckets."""
    on = on or []
    p = points.withColumn(
        "_b", F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long")
    )
    iv = intervals.where(F.col(start_col) <= F.col(end_col)).withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(end_col) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    return (
        p.join(iv, on + ["_b"])
        .where(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("_b")
    )

"""Slowly-changing-dimension (SCD type 2) interval builder.

The warehouse-side counterpart of entity resolution: once records
resolve to stable entity ids, downstream tables need the HISTORY of an
attribute per entity as validity intervals — (key, attr, valid_from,
valid_to, is_current), one row per run of consecutive equal values.
This is the standard gaps-and-islands construction:

  1. per-key change flag: attr IS DISTINCT FROM lag(attr)  (null-safe,
     so NULL -> value and value -> NULL both open a new interval)
  2. island id = running sum of change flags
  3. one groupBy((key, island)) -> valid_from = min(ts)
  4. valid_to = next island's valid_from via lead(); NULL = current

Scale shape: both windows and the aggregate are partitioned by the
entity key — no global window, no single-reducer exchange; skew is
bounded by per-entity event counts. Two shuffles total (the key
window's and the final lead's hash partitioning are reused by AQE
where possible).

Determinism: orders by (ts, tiebreak_col) — callers pass a unique
tiebreak column so equal timestamps produce a stable island order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """(key, attr, ts) event stream -> SCD2 validity intervals.

    Output: key_col, attr_col, valid_from, valid_to (NULL for the
    open/current interval), is_current, n_events (rows collapsed into
    the interval)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    prev = F.lag(F.col(attr_col)).over(w)
    first_row = F.lag(F.col(ts_col)).over(w).isNull()
    chg = F.when(
        first_row | ~F.col(attr_col).eqNullSafe(prev), F.lit(1)
    ).otherwise(F.lit(0))
    islands = df.select(
        F.col(key_col),
        F.col(attr_col),
        F.col(ts_col),
        F.sum(chg).over(w).alias("_isl"),
    )
    grouped = islands.groupBy(key_col, "_isl").agg(
        F.first(attr_col).alias(attr_col),  # constant within an island
        F.min(ts_col).alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    w2 = Window.partitionBy(key_col).orderBy("valid_from", "_isl")
    out = grouped.select(
        key_col,
        attr_col,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events",
    )
    return out.withColumn("is_current", F.col("valid_to").isNull())

"""Declarative data-quality checks — the deequ-style validation gate
every production pipeline runs between ingest and train.

One `Check` per assertion (completeness / uniqueness / min / max /
mean, with optional [lo, hi] bounds); `quality_checks` evaluates ALL
of them in a SINGLE aggregation pass over the table (one job, one
scan — metrics are plain agg expressions, so a 100 TB validation is
exactly one map-reduce over the columns the checks touch, and column
pruning keeps the scan narrow). Uniqueness adds the standard
count-distinct expansion; everything else is a first-class partial
aggregate.

Output is a tidy (check, column, metric, passed) table — write it to
the metrics sink, alert on `not passed`, or hard-fail the DAG with
`.where("not passed").count() == 0`. Fully SQL-expressible, so the
driver oracle recomputes every metric and verdict."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_KINDS = ("completeness", "uniqueness", "min", "max", "mean")


@dataclass(frozen=True)
class Check:
    """One assertion: `kind` over `col`, passing iff the metric lies
    in [lo, hi] (either bound may be None = unbounded)."""

    kind: str
    col: str
    lo: float | None = None
    hi: float | None = None

    def __post_init__(self):
        if self.kind not in _KINDS:
            raise ValueError(f"unknown check kind {self.kind!r}")

    @property
    def name(self) -> str:
        return f"{self.kind}({self.col})"


def _metric(c: Check) -> Column:
    col = F.col(c.col)
    if c.kind == "completeness":
        return F.avg(col.isNotNull().cast("double"))
    if c.kind == "uniqueness":
        return F.countDistinct(col).cast("double") / F.count(F.lit(1))
    if c.kind == "min":
        return F.min(col).cast("double")
    if c.kind == "max":
        return F.max(col).cast("double")
    return F.avg(col.cast("double"))


def quality_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate every check in ONE aggregation; returns
    (check, column, metric, passed) with one row per check, in the
    order given."""
    if not checks:
        raise ValueError("need at least one check")
    agg = df.agg(
        *[_metric(c).alias(f"_m{i}") for i, c in enumerate(checks)]
    )
    rows = []
    for i, c in enumerate(checks):
        m = F.col(f"_m{i}")
        ok = F.lit(True)
        if c.lo is not None:
            ok = ok & (m >= F.lit(float(c.lo)))
        if c.hi is not None:
            ok = ok & (m <= F.lit(float(c.hi)))
        ok = F.when(m.isNull(), F.lit(False)).otherwise(ok)
        rows.append(
            F.struct(
                F.lit(c.kind).alias("check"),
                F.lit(c.col).alias("column"),
                m.alias("metric"),
                ok.alias("passed"),
            )
        )
    return agg.select(
        F.explode(F.array(*rows)).alias("_r")
    ).select("_r.check", "_r.column", "_r.metric", "_r.passed")


def corpus_rollup(
    df: DataFrame, dims: list[str], text_col: str = "text"
) -> DataFrame:
    """Multi-level corpus telemetry in ONE aggregation pass via
    ``ROLLUP`` — the per-dimension / per-subtotal / grand-total report
    (doc counts, token volumes, length means) a training-data pipeline
    publishes after every build.  ``dims`` are existing columns of
    ``df`` (derive bucket columns with ``withColumn`` first); the
    output carries one ``g_<dim>`` GROUPING flag per dimension so
    subtotal rows are distinguishable from a genuine NULL dimension
    value.

    Scale shape: rollup compiles to one Expand + hash aggregate —
    partial (map-side) aggregation applies AFTER the expand, so a
    100 TB scan shuffles only (levels x group-cardinality) partial
    rows, never data rows; the scan stays column-pruned to
    (dims, text).  One shuffle total.
    """
    t = F.col(text_col)
    n_tokens = (
        F.when(F.trim(t) == "", F.lit(0))
        .otherwise(F.size(F.split(F.trim(t), r"\s+")))
    )
    per = df.select(
        *[F.col(d) for d in dims],
        n_tokens.alias("_nt"),
        F.length(t).alias("_nc"),
    )
    return per.rollup(*dims).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_nt").alias("total_tokens"),
        F.round(F.avg("_nt"), 6).alias("avg_tokens"),
        F.round(F.avg("_nc"), 6).alias("avg_chars"),
        *[F.grouping(d).cast("int").alias(f"g_{d}") for d in dims],
    )


def skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
    target_rows_per_task: int = 1_000_000,
) -> DataFrame:
    """Join/shuffle-key skew diagnostic — the pre-flight a 100 TB
    pipeline runs before keying a join or aggregation: the ``top_k``
    heaviest keys with their frequencies, global key statistics, and
    the salt factor (``ceil(cnt / target_rows_per_task)``) the salted
    self-join machinery (operators/candidates.py) would need for each
    heavy key.  NULL keys participate (they hash to one partition
    like any other value — often they ARE the skew).

    Scale shape: one hash aggregation over the key (map-side partial
    combine, shuffle carries one partial row per key per partition),
    then top-k via sort+limit (TakeOrderedAndProject: per-partition
    heap, driver merge of k-row heads — never a full sort) and a
    broadcast of the single global-stats row.  The rank window runs
    on <= top_k rows.
    """
    cnts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = cnts.agg(
        F.sum("cnt").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
        F.round(F.avg("cnt"), 6).alias("avg_cnt"),
    )
    top = (
        cnts.orderBy(F.desc("cnt"), F.asc_nulls_first("key"))
        .limit(top_k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("cnt"), F.asc_nulls_first("key"))
            ),
        )
    )
    salt = F.ceil(F.col("cnt") / F.lit(target_rows_per_task)).cast("long")
    return (
        top.crossJoin(F.broadcast(stats))
        .withColumn("salt_factor", salt)
        .withColumn(
            "skew_ratio",
            F.round(F.col("cnt") / F.col("avg_cnt"), 6),
        )
    )

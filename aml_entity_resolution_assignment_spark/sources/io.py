"""Table sources and sinks (S1-S7) — the ONE place table format lives.

The reference reads/writes SQLite tables and CSVs
(/root/reference/src/generation.py:321-327, matching.py:650-661,
preprocessing.py:256). The Spark engine's storage layer is
parquet-directory tables with an Iceberg-style layout (one directory
per table, overwrite-by-replace semantics); CSV is kept for human
review exports only (S4). Secondary indexes (S6,
preprocessing.py:263-266) have no analog — repartition/sort-within
write options fill that role.

TABLE_FORMAT centralizes the storage format: every engine table write
(stage checkpoints in plans/pipeline.py included) funnels through
write_table/read_table, so moving this sandbox's plain-parquet layout
to real Iceberg on a cluster with a catalog is a one-module swap:
set TABLE_FORMAT = "iceberg" and route the writer through
``df.writeTo(f"{catalog}.{name}").using("iceberg")`` here. The mapping
is 1:1 — stage directory = Iceberg table, _MANIFEST_<stage>.json
(plans/pipeline.py) = table snapshot metadata, overwrite-by-replace =
replace snapshot, partition_by dirs = Iceberg partition spec.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# "parquet" in this catalog-less sandbox; "iceberg" on a cluster
TABLE_FORMAT = os.environ.get("SPARK_GRAFT_TABLE_FORMAT", "parquet")


def read_table(spark: SparkSession, base: str, name: str, schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.format(TABLE_FORMAT).load(os.path.join(base, name))


def write_table(
    df: DataFrame,
    base: str,
    name: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    buckets: int | None = None,
    bloom_filter_cols: list[str] | None = None,
) -> str:
    """S5 table sink (to_sql if_exists='replace' analog). `sort_by`
    pre-sorts within partitions (the scan-locality role of the
    reference's B-tree indexes); `partition_by` maps to Iceberg-style
    partition dirs for partition pruning; `bloom_filter_cols` writes
    parquet bloom filters for those columns — the serving-path lever:
    a point lookup (resolve by url) then skips row groups at the
    FOOTER, before any data page is read, which at 10^12 rows is the
    difference between touching ~1 row group and scanning the
    partition.

    `buckets` (with `sort_by` as the bucket/sort key) writes a
    BUCKETED table — Spark bucketing requires a catalog entry, so the
    table is registered as ``bucketed_<name>`` with its files at
    `path`: two tables bucketed the same way then join/aggregate on
    the bucket key with NO exchange (the co-located-join lever the
    100 TB plan uses for repeated joins against the keyed corpus)."""
    path = os.path.join(base, name)
    out = df
    if sort_by and not buckets:
        out = out.sortWithinPartitions(*sort_by)
    writer = out.write.mode(mode).format(TABLE_FORMAT)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for c in bloom_filter_cols or []:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
    if buckets:
        if not sort_by:
            raise ValueError("bucketed write needs sort_by as the bucket key")
        table = f"bucketed_{name.replace('=', '_').replace('/', '_').replace('-', '_')}"
        (
            writer.bucketBy(buckets, *sort_by)
            .sortBy(*sort_by)
            .option("path", path)
            .saveAsTable(table)
        )
        return path
    writer.save(path)
    return path


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime jar is on the session
    classpath (org.apache.iceberg.spark.SparkCatalog loadable)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def configure_hadoop_catalog(
    spark: SparkSession, catalog: str, warehouse: str
) -> None:
    """Register a Hadoop-type Iceberg catalog at runtime (Iceberg
    catalogs initialize lazily, so post-session conf works)."""
    spark.conf.set(
        f"spark.sql.catalog.{catalog}", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set(f"spark.sql.catalog.{catalog}.type", "hadoop")
    spark.conf.set(f"spark.sql.catalog.{catalog}.warehouse", warehouse)


def write_table_iceberg(
    df: DataFrame,
    ident: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> str:
    """S5 on a cluster with a catalog: the Iceberg twin of write_table.
    `ident` is `<catalog>.<namespace>.<table>`; overwrite maps to
    createOrReplace (replace snapshot — same semantics as the parquet
    overwrite-by-replace directory), partition_by to the partition
    spec. Exercised by tests/test_streaming.py::test_iceberg_roundtrip
    when the runtime jar is present (absent in this sandbox — the test
    skips with that reason and the parquet layout stands in 1:1)."""
    writer = df.writeTo(ident).using("iceberg")
    if partition_by:
        writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
    if mode == "overwrite":
        writer.createOrReplace()
    elif mode == "append":
        writer.append()
    else:
        raise ValueError(f"unsupported mode for iceberg sink: {mode}")
    return ident


def read_table_iceberg(spark: SparkSession, ident: str) -> DataFrame:
    return spark.table(ident)


def export_csv(df: DataFrame, path: str, single_file: bool = True) -> str:
    """S4 human-review CSV sink (matching.py:653-661 review/missed/false
    exports). single_file coalesces for human consumption — never use
    on big tables."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)
    return path


def export_review_cases(classified: DataFrame, base: str) -> str:
    """E6/matching.py:708-712: manual-review export."""
    review = classified.where(F.col("match_type") == "review")
    return export_csv(review, os.path.join(base, "manual_review_cases"))


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    """Read JSON-Lines (the training-data interchange format: one JSON
    object per line, newline-delimited). `schema` is REQUIRED — at
    10^5-file scale schema inference is a full extra pass over the
    data and silently unions drifting shapes; an explicit schema makes
    malformed rows surface in `_corrupt_record`-free strict mode
    instead. Splittable: uncompressed/bzip2 JSONL parallelizes by
    byte range like any text source."""
    return spark.read.schema(schema).json(path)


def write_jsonl(df: DataFrame, path: str, single_file: bool = False) -> str:
    """Write JSON-Lines. `single_file=True` coalesces to one part —
    for exports/fixtures only (a single writer is a bottleneck at
    scale); the default keeps one part per partition."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(path)
    return path

"""Structured Streaming ingestion for the ER engine.

The reference has no streaming (SURVEY.md §2.11); a web-scale crawl
pipeline does: pages arrive continuously, and the keyed table must stay
current without full recompute. Three streaming operators:

  * stream_pages_keyed — readStream -> watermark on warc_ts ->
    streaming dropDuplicates(url) -> the SAME add_blocking_keys
    projection as batch (stateless, so it runs unchanged in a stream)
  * stream_event_counts — tumbling-window counts per event_type with
    late-data watermark (the events testdata shape)
  * incremental_upsert — foreachBatch hook appending each micro-batch
    to the keyed table; candidate generation then runs new-vs-all as a
    two-sided join (operators/resolve.find_candidates), which is the
    streaming-compatible form of the self-join.

All sinks are exercised with Trigger.AvailableNow in tests —
deterministic, no wall-clock waits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.blocking import add_blocking_keys
from ..schemas import PAGES


def read_pages_stream(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    return (
        spark.readStream.format(fmt)
        .schema(PAGES)
        .option("maxFilesPerTrigger", 16)
        .load(path)
    )


def stream_pages_keyed(
    pages_stream: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Watermarked, url-deduped, blocking-keyed page stream. The keying
    projection is the batch operator verbatim — stateless projections
    are streaming-safe; only the dedup keeps state (bounded by the
    watermark)."""
    deduped = pages_stream.withWatermark("warc_ts", watermark).dropDuplicates(
        ["url"]
    )
    return add_blocking_keys(deduped)


def stream_event_counts(
    events_stream: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window per-type counts + value sums with late-data
    tolerance — the standard streaming aggregation shape."""
    # parquet TIMESTAMP_NTZ is not a valid event-time type; normalize
    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def incremental_upsert(
    keyed_stream: DataFrame,
    target_path: str,
    checkpoint_path: str,
):
    """foreachBatch append of each micro-batch of keyed pages into the
    keyed table path. Returns the StreamingQuery (AvailableNow trigger:
    drains what exists, then stops — suits both tests and scheduled
    incremental runs)."""

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(target_path)

    return (
        keyed_stream.writeStream.foreachBatch(_upsert)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )

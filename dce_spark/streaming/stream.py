"""Structured Streaming wrapper of the extraction map.

The reference is pure batch (SURVEY.md §2.10) — this is the Spark-native
extension for continuous crawl ingestion: a file-source stream of pages
parquet, the same mapInArrow extraction kernel, an exactly-once file
sink with checkpointing. Because extraction is a stateless per-row map,
no watermarks or state stores are involved; end-to-end exactly-once
comes from the source's file tracking + the sink's commit log.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from dce_spark.spark.schema import PAGES_SCHEMA
from dce_spark.spark.udf import attach_extraction


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    mode: str = "both",
    max_files_per_trigger: int = 16,
):
    """Start the streaming extraction query; returns StreamingQuery."""
    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    extracted = attach_extraction(pages, mode=mode)
    return (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def stream_dedup_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    mode: str = "both",
    watermark: str = "10 minutes",
    max_files_per_trigger: int = 16,
    canonical_urls: bool = False,
):
    """Streaming extraction with in-flight url dedup.

    Crawl frontiers re-emit urls (retries, mirrored seeds); this variant
    drops repeats BEFORE the expensive extraction map using
    dropDuplicatesWithinWatermark on (url): state is bounded by the
    event-time watermark on warc_ts, so a url seen again within the
    watermark window is dropped and state older than it is evicted —
    the standard bounded-state streaming dedup (an unbounded
    dropDuplicates would grow state forever at crawl scale).

    ``canonical_urls=True`` dedups on the CANONICAL url
    (urlops.url_normalize_col: case/port/tracking-param/fragment
    noise collapsed), so ``...?utm_source=feed`` retries of an
    already-seen page are dropped too; the emitted rows keep the
    original url. The key is a stateless projection, so it adds no
    state beyond the narrower key space.
    """
    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    # WARC records with a missing/unparsable WARC-Date arrive with
    # warc_ts=null (see read_warc); a null event time would make the
    # watermark operator silently drop the row. Substitute the ingest
    # time so dateless crawl pages still flow through dedup — they
    # dedup against each other within the watermark window like any
    # freshly-crawled url.
    pages = pages.withColumn(
        "warc_ts", F.coalesce("warc_ts", F.current_timestamp())
    )
    if canonical_urls:
        from dce_spark.functions.urlops import url_normalize_col

        pages = pages.withColumn("url_key", url_normalize_col(F.col("url")))
        key = "url_key"
    else:
        key = "url"
    deduped = pages.withWatermark("warc_ts", watermark)\
        .dropDuplicatesWithinWatermark([key])
    if canonical_urls:
        deduped = deduped.drop("url_key")
    extracted = attach_extraction(deduped, mode=mode)
    return (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )

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

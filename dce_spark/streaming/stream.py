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


def _quality_gate(extracted, min_words: int | None = None):
    """Stateless in-flight quality gate on the EXTRACTED text: the
    Gopher keep rule (word-count floor, mean-word-length band,
    alphabetic fraction, stopword floor — the shared
    textops._gopher_signal_cols expressions) applied as a streaming
    filter, so boilerplate-only and junk pages never reach the sink.
    Pure projection+filter: no state, no watermark interaction, valid
    in append mode. Failed extractions (status != 'ok') are kept —
    dropping errors would hide ingest problems from the sink's
    monitoring."""
    from dce_spark.functions.textops import (
        GOPHER_MAX_MEAN_WORD_LEN,
        GOPHER_MIN_ALPHA_FRAC,
        GOPHER_MIN_MEAN_WORD_LEN,
        GOPHER_MIN_STOP_HITS,
        _gopher_signal_cols,
    )

    if min_words is None:
        from dce_spark.functions.textops import GOPHER_MIN_WORDS
        min_words = GOPHER_MIN_WORDS

    # mode="article" leaves extracted_text EMPTY (extract_page
    # initializes it to "", not null) — gate on whichever text the
    # mode actually produced; an empty gate column would fail
    # min_words for every row and silently drain the stream
    def _nonempty(c):
        return F.when(F.length(F.coalesce(F.col(c), F.lit(""))) > 0,
                      F.col(c))

    gated = extracted.withColumn(
        "_gate_text",
        F.coalesce(_nonempty("extracted_text"),
                   _nonempty("article_text"), F.lit("")),
    )
    n_words, mean_word_len, alpha_frac, stop_hits = _gopher_signal_cols(
        "_gate_text"
    )
    keep = (
        (n_words >= min_words)
        & (mean_word_len >= GOPHER_MIN_MEAN_WORD_LEN)
        & (mean_word_len <= GOPHER_MAX_MEAN_WORD_LEN)
        & (alpha_frac >= GOPHER_MIN_ALPHA_FRAC)
        & (stop_hits >= GOPHER_MIN_STOP_HITS)
    )
    return gated.filter((F.col("status") != "ok") | keep).drop(
        "_gate_text"
    )


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    mode: str = "both",
    max_files_per_trigger: int = 16,
    quality_gate: bool = False,
    min_words: int | None = None,
):
    """Start the streaming extraction query; returns StreamingQuery.

    ``quality_gate=True`` filters emitted rows through the Gopher keep
    rule over the extracted text (see _quality_gate)."""
    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    extracted = attach_extraction(pages, mode=mode)
    if quality_gate:
        extracted = _quality_gate(extracted, min_words)
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

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


def _probe_historical(pages, key, flt, n_hashes, n_bits):
    """Drop rows whose ``key`` is (probably) in the packed Bloom
    table: one broadcast join per hash against the (word, bits) rows,
    then keep iff ANY position's bit is unset. Stateless — see
    stream_dedup_extract."""
    from dce_spark.functions.textops import (
        _BLOOM_BITS_PER_WORD as W,
        _bloom_positions,
    )

    pages = pages.withColumn(
        "_blp", _bloom_positions(F.col(key), n_hashes, n_bits)
    )
    any_unset = F.lit(False)
    drop_cols = ["_blp"]
    for i in range(n_hashes):
        fi = F.broadcast(
            flt.select(
                F.col("word").alias(f"_w{i}"),
                F.col("bits").alias(f"_b{i}"),
            )
        )
        pages = pages.join(
            fi,
            F.expr(f"element_at(_blp, {i + 1}) div {W}")
            == F.col(f"_w{i}"),
            "left",
        )
        hit = F.when(F.col(f"_b{i}").isNull(), F.lit(0)).otherwise(
            F.expr(
                f"CAST(shiftright(_b{i}, CAST(pmod(element_at(_blp,"
                f" {i + 1}), {W}) AS INT)) & 1 AS INT)"
            )
        )
        any_unset = any_unset | (hit == 0)
        drop_cols += [f"_w{i}", f"_b{i}"]
    return pages.filter(any_unset).drop(*drop_cols)


def stream_dedup_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    mode: str = "both",
    watermark: str = "10 minutes",
    max_files_per_trigger: int = 16,
    canonical_urls: bool = False,
    historical_filter=None,
    historical_n_hashes: int = 5,
    historical_n_bits: int = 1 << 20,
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

    ``historical_filter`` connects the stream to the BATCH history:
    pass the packed Bloom table built offline by
    ``textops.bloom_filter_words`` over the historical corpus's url
    keys (canonical urls when ``canonical_urls=True`` — build and
    probe MUST agree on the key form and on n_hashes/n_bits), and
    pages whose url is probably already crawled are dropped before
    the watermark dedup ever sees them. The probe is ``n_hashes``
    stream-static BROADCAST joins plus a boolean fold — stateless and
    append-safe (the batch formulation's explode + groupBy would be a
    streaming aggregation and force a different output mode), so
    state stays bounded by the watermark window while the filter
    carries the unbounded history. Bloom false positives drop a
    never-crawled url (rate set by the filter sizing); false
    negatives cannot happen, so nothing already crawled re-extracts.
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
    if historical_filter is not None:
        pages = _probe_historical(
            pages, key, historical_filter,
            historical_n_hashes, historical_n_bits,
        )
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

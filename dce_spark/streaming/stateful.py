"""Custom stateful streaming operator: per-host crawl accounting.

The extraction map itself is stateless, but a continuous-ingest
deployment wants per-host running counters (pages seen, bytes, ok rate)
maintained across micro-batches — the canonical
``applyInPandasWithState`` shape: group by host, fold batch aggregates
into keyed state, emit updated running totals each trigger.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

HOST_STATS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("pages_total", T.LongType(), False),
        T.StructField("bytes_total", T.LongType(), False),
        T.StructField("pages_ok", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("pages_total", T.LongType(), False),
        T.StructField("bytes_total", T.LongType(), False),
        T.StructField("pages_ok", T.LongType(), False),
    ]
)


def _update_host(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    pages = bytes_total = ok = 0
    if state.exists:
        pages, bytes_total, ok = state.get
    for pdf in pdf_iter:
        pages += len(pdf)
        bytes_total += int(pdf["bytes_in"].fillna(0).sum())
        ok += int((pdf["status"] == "ok").sum())
    state.update((pages, bytes_total, ok))
    yield pd.DataFrame(
        [(key[0], pages, bytes_total, ok)],
        columns=["host", "pages_total", "bytes_total", "pages_ok"],
    )


def windowed_crawl_rate(
    pages_stream: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Event-time windowed ingest rate with a watermark for late data.

    Crawl records arrive out of order (fetch time vs ingest time); the
    watermark bounds how late a warc_ts may be before its window is
    finalized and state evicted — the standard late-data pattern
    (event-time window + append-mode finalization)."""
    return (
        pages_stream.withWatermark("warc_ts", watermark_delay)
        .groupBy(F.window("warc_ts", window_duration))
        .agg(
            F.count("*").alias("pages"),
            F.sum(F.length("html")).alias("bytes_in"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            F.col("pages").cast("long").alias("pages"),
            F.col("bytes_in").cast("long").alias("bytes_in"),
        )
    )


def host_stats_stream(extracted_stream: DataFrame) -> DataFrame:
    """extracted rows (streaming) -> running per-host totals.

    State is keyed by host (bounded cardinality at crawl scale by
    construction: hosts, not urls); no timeout — counters live for the
    job. Output mode 'update' emits only touched hosts per trigger.
    """
    with_host = extracted_stream.withColumn(
        # no trailing '/': path-less URLs (https://example.com) must
        # still group under their real host, not an '' catch-all key
        "host", F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1)
    )
    return (
        with_host.groupBy("host")
        .applyInPandasWithState(
            _update_host,
            outputStructType=HOST_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

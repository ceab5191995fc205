#!/usr/bin/env python3
"""Incremental crawl-ingest demo: the batch history gates the stream.

A 100 TB corpus is not rebuilt per crawl — each new crawl batch is
deduped AGAINST the existing corpus and appended. This demo shows the
two halves this repo provides:

1. BATCH: collapse the historical corpus's canonical URLs into a
   packed Bloom table (``textops.bloom_filter_words`` — a (word, bits)
   DataFrame, built with one explode + one bit_or aggregate; mergeable
   across crawls with a further bit_or).
2. STREAM: run the continuous extraction pipeline with
   ``stream_dedup_extract(historical_filter=...)`` — every micro-batch
   probes the filter with stateless broadcast joins, so already-crawled
   URLs are dropped before extraction, while the watermark dedup
   handles repeats WITHIN the stream.

Usage:
  python examples/incremental_ingest.py [work_dir]
"""

import datetime as dt
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    work = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(
        tempfile.mkdtemp(prefix="incr_ingest_")
    )
    from pyspark.sql import functions as F

    from dce_spark.functions.textops import bloom_filter_words
    from dce_spark.functions.urlops import url_normalize_col
    from dce_spark.spark.schema import PAGES_SCHEMA
    from dce_spark.spark.session import get_spark
    from dce_spark.streaming.stream import stream_dedup_extract

    spark = get_spark(master="local[8]", shuffle_partitions=16)

    # --- batch half: the "historical corpus" is 3 already-crawled urls
    history = spark.createDataFrame(
        [(f"https://site.test/archive/{i}",) for i in range(3)], ["url"]
    ).select(url_normalize_col(F.col("url")).alias("url_key"))
    n_bits = 1 << 16
    flt = bloom_filter_words(
        history, n_bits=n_bits, text_col="url_key"
    ).localCheckpoint(eager=True)
    print(f"history filter: {flt.count()} packed words for "
          f"{history.count()} urls")

    # --- stream half: a crawl batch with 2 re-crawls + 2 new pages
    ts = dt.datetime(2025, 6, 1, 12, 0, 0)
    html = b"<html><body><p>Incremental ingest demo page body."
    html += b"</p></body></html>"
    rows = [
        ("https://site.test/archive/0", ts, html, None, "en"),
        ("HTTPS://SITE.test/archive/1?utm_source=x", ts, html, None, "en"),
        ("https://site.test/fresh/1", ts, html, None, "en"),
        ("https://site.test/fresh/2", ts, html, None, "en"),
    ]
    in_dir = str(work / "in")
    spark.createDataFrame(rows, PAGES_SCHEMA).write.mode(
        "overwrite").parquet(in_dir)
    q = stream_dedup_extract(
        spark, in_dir, str(work / "out"), str(work / "ck"),
        canonical_urls=True, historical_filter=flt,
        historical_n_bits=n_bits,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = spark.read.parquet(str(work / "out"))
    urls = sorted(r.url for r in out.select("url").collect())
    print(f"extracted {len(urls)} of {len(rows)} streamed pages:")
    for u in urls:
        print(" ", u)
    ok = urls == ["https://site.test/fresh/1", "https://site.test/fresh/2"]
    print("history correctly excluded:", ok)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

"""Watermarked event-time windowing on the pages stream."""

import datetime

import pytest

from dce_spark.spark.schema import PAGES_SCHEMA
from dce_spark.streaming.stateful import windowed_crawl_rate

pytestmark = pytest.mark.spark


def test_windowed_crawl_rate_with_watermark(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("window")
    inp = str(base / "in")

    t0 = datetime.datetime(2025, 6, 1, 10, 0, 0)

    def row(i, minutes):
        return {
            "url": f"https://h/{i}",
            "warc_ts": t0 + datetime.timedelta(minutes=minutes),
            "html": b"<body><p>x</p></body>",
            "text": None,
            "lang": "en",
        }

    # two event-time hours, out-of-order arrivals within them
    rows = [row(i, m) for i, m in enumerate([5, 65, 10, 70, 50, 119, 1])]
    spark.createDataFrame(rows, PAGES_SCHEMA).write.parquet(inp)

    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(inp)
    rates = windowed_crawl_rate(stream, "1 hour", "30 minutes")
    q = (
        rates.writeStream.format("memory")
        .queryName("crawl_rate")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = {r.window_start: r.pages for r in spark.sql("select * from crawl_rate").collect()}
    assert out[t0] == 4  # minutes 5, 10, 50, 1
    assert out[t0 + datetime.timedelta(hours=1)] == 3  # 65, 70, 119

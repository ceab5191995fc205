"""applyInPandasWithState: per-host running counters across micro-batches."""

import pytest

from dce_spark.spark.corpus import build_pages_df
from dce_spark.spark.schema import PAGES_SCHEMA
from dce_spark.spark.udf import attach_extraction
from dce_spark.streaming.stateful import host_stats_stream

pytestmark = pytest.mark.spark


def test_host_stats_accumulate_across_batches(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stateful")
    inp = str(base / "in")

    pages = build_pages_df(spark, n_synthetic=20, include_fixtures=False,
                           partitions=4)
    pages.write.parquet(inp, mode="overwrite")

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # forces multiple micro-batches
        .parquet(inp)
    )
    stats = host_stats_stream(attach_extraction(stream))
    q = (
        stats.writeStream.format("memory")
        .queryName("host_stats")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # the memory sink accumulates one row per (host, trigger) update;
    # the LAST row per host carries the running total
    rows = spark.sql(
        "select * from host_stats"
    ).collect()
    assert rows
    latest = {}
    for r in rows:
        cur = latest.get(r.host)
        if cur is None or r.pages_total >= cur.pages_total:
            latest[r.host] = r
    total_pages = sum(r.pages_total for r in latest.values())
    assert total_pages == 20
    assert all(r.pages_ok == r.pages_total for r in latest.values())
    assert all(r.bytes_total > 0 for r in latest.values())
    hot = latest.get("hotnews.example.com")
    assert hot is None or hot.pages_total >= 1

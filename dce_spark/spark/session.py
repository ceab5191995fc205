"""SparkSession builder with the settings the extraction job needs."""

from __future__ import annotations

import os


def get_spark(app_name: str = "dce-spark", master: str | None = None,
              shuffle_partitions: int | None = None):
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from pyspark.sql import SparkSession

    master = master or os.environ.get("DCE_SPARK_MASTER", "local[*]")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # AQE: post-shuffle coalescing + skew-join splits for the
        # DataFrame-native ops (dedup, scoring joins).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Pages average ~50 KB; 256 rows/batch keeps Arrow IPC messages
        # ~10-30 MB and bounds Python-worker memory on multi-MB tails.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("DCE_DRIVER_MEM", "8g"))
    )
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return builder.getOrCreate()

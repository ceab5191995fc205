"""Table schemas (from the driver's input_hint and FIXTURES.md)."""

from __future__ import annotations

from pyspark.sql import types as T

# Input: Common-Crawl-style pages table.
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

SPAN_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("node_index", T.IntegerType(), False),
            T.StructField("start", T.IntegerType(), False),
            T.StructField("end", T.IntegerType(), False),
        ]
    )
)

# Output of the extraction UDF (appended to url + passthroughs).
EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("extracted_text", T.StringType(), True),
        T.StructField("article_text", T.StringType(), True),
        T.StructField("extracted_md", T.StringType(), True),
        T.StructField("content_node_spans", SPAN_TYPE, True),
        T.StructField("node_count", T.IntegerType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("primary_script", T.StringType(), True),
        T.StructField("content_links", T.ArrayType(T.StringType()), True),
        T.StructField("bytes_in", T.LongType(), True),
    ]
)

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("url_count", T.LongType(), False),
        T.StructField("bytes_in", T.LongType(), False),
        T.StructField("pages_ok", T.LongType(), False),
        T.StructField("pages_failed", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
        T.StructField("committed_at", T.TimestampType(), False),
    ]
)

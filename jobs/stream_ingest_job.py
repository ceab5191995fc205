#!/usr/bin/env python3
"""Continuous crawl-ingest job for spark-submit: file-source pages
stream -> (optional) historical Bloom gate -> watermark url dedup ->
extraction -> exactly-once parquet sink.

Usage:
  spark-submit --py-files dce_spark.zip jobs/stream_ingest_job.py \
      --input  /path/to/incoming_pages \
      --output /path/to/extracted \
      --checkpoint /path/to/ckpt \
      [--historical /path/to/bloom_words_parquet] \
      [--historical-n-bits 1048576] [--historical-n-hashes 5] \
      [--canonical-urls] [--watermark "10 minutes"] \
      [--mode both] [--max-files-per-trigger 16] [--once]

--historical points at the packed Bloom table built offline by
textops.bloom_filter_words over the historical corpus's url keys
(canonical when --canonical-urls; sizing flags must match the build).
--once drains everything currently available and exits, printing a
one-line JSON summary — the batch-drain mode a scheduler invokes per
crawl dump; without it the query runs until terminated.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--mode", default="both")
    ap.add_argument("--watermark", default="10 minutes")
    ap.add_argument("--max-files-per-trigger", type=int, default=16)
    ap.add_argument("--canonical-urls", action="store_true")
    ap.add_argument("--historical", default=None)
    ap.add_argument("--historical-n-bits", type=int, default=1 << 20)
    ap.add_argument("--historical-n-hashes", type=int, default=5)
    ap.add_argument("--once", action="store_true")
    args = ap.parse_args()

    from dce_spark.spark.session import get_spark
    from dce_spark.streaming.stream import stream_dedup_extract

    spark = get_spark(app_name="dce-stream-ingest")
    flt = None
    if args.historical:
        # localCheckpoint: the filter broadcasts once per micro-batch;
        # materializing it here keeps the batch-side scan out of every
        # trigger's plan
        flt = spark.read.parquet(args.historical).localCheckpoint(
            eager=True
        )
    q = stream_dedup_extract(
        spark,
        args.input,
        args.output,
        args.checkpoint,
        mode=args.mode,
        watermark=args.watermark,
        max_files_per_trigger=args.max_files_per_trigger,
        canonical_urls=args.canonical_urls,
        historical_filter=flt,
        historical_n_hashes=args.historical_n_hashes,
        historical_n_bits=args.historical_n_bits,
    )
    if args.once:
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        # A drain where the gate filters every page writes zero part
        # files; schema inference then raises. That is the realistic
        # all-duplicates re-crawl case — report rows_out=0 instead of
        # crashing before the JSON line a scheduler parses. The empty
        # case is detected EXPLICITLY (no part files on disk), so any
        # other read failure — corrupt part files, permissions, wrong
        # path with data present — propagates instead of masquerading
        # as a successful zero-row drain.
        parts = list(Path(args.output).glob("part-*"))
        if not parts:
            rows_out = urls_out = 0
        else:
            out = spark.read.parquet(args.output)
            rows_out = out.count()
            urls_out = out.select("url").distinct().count()
        print(
            json.dumps(
                {
                    "rows_out": rows_out,
                    "urls_out": urls_out,
                    "historical_gate": bool(args.historical),
                    "output": args.output,
                }
            )
        )
        spark.stop()
    else:
        q.awaitTermination()


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Production corpus-curation job for spark-submit.

Usage:
  spark-submit --py-files dce_spark.zip jobs/curate_job.py \
      --input  /path/to/documents_parquet \
      --output /path/to/shards \
      [--benchmark /path/to/benchmark_parquet] \
      [--min-tokens 20] [--token-budget 4096] \
      [--strict] [--max-dup-ngram-frac 0.5] \
      [--urls /path/to/urls_parquet] [--blocklist /path/to/hosts] \
      [--robots /path/to/rules_parquet] [--latest-only]

Runs the composed curation pipeline (optional URL hygiene layer:
domain blocklist -> robots exclusion -> latest-snapshot dedup, then
quality gate -> exact dedup -> MinHash near-dup dedup -> optional
strict gates -> benchmark decontamination -> token-budget shard
packing) and writes the packed shard table partitioned by shard id,
plus a one-line JSON stats summary on stdout (the number a scheduler
checks).

URL-layer inputs: --urls is a parquet of (doc_id, url[, ts]);
--blocklist a parquet with a `host` column (suffix-matched);
--robots a parquet of (host, allow, prefix) RFC 9309 rules;
--latest-only keeps only the newest (ts, doc_id) capture per
canonical URL and requires a ts column in --urls.

Without --benchmark, every 50th document plays the held-out set (the
demo default from __spark_entry__); in production point it at the
real eval-suite parquet. --strict enables the corpus-relative gates
(RefinedWeb duplicate-5-gram cap + CCNet cross-entropy tail drop).

Package the library with (cd repo && zip -qr dce_spark.zip dce_spark)
and pass it via --py-files, exactly like jobs/extract_job.py.
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
    ap.add_argument("--benchmark", default=None)
    ap.add_argument("--min-tokens", type=int, default=20)
    ap.add_argument("--token-budget", type=int, default=4096)
    ap.add_argument("--shingle-k", type=int, default=3)
    ap.add_argument("--strict", action="store_true")
    ap.add_argument("--max-dup-ngram-frac", type=float, default=None)
    ap.add_argument("--urls", default=None)
    ap.add_argument("--blocklist", default=None)
    ap.add_argument("--robots", default=None,
                    help="parquet of pre-parsed (host, allow, prefix)")
    ap.add_argument("--robots-bodies", default=None,
                    help="parquet of raw (host, body) robots.txt "
                         "fetches, parsed in-job")
    ap.add_argument("--robots-agent", default="*")
    ap.add_argument("--latest-only", action="store_true")
    ap.add_argument("--cc-dedup", action="store_true",
                    help="transitive-closure near-dup dedup instead "
                         "of the one-pass band keeper")
    args = ap.parse_args()
    if args.urls is None and (
        args.blocklist or args.robots or args.robots_bodies
        or args.latest_only
    ):
        ap.error(
            "--blocklist/--robots/--robots-bodies/--latest-only"
            " require --urls"
        )
    if args.robots and args.robots_bodies:
        ap.error("pass --robots or --robots-bodies, not both")

    from pyspark.sql import functions as F

    from dce_spark.functions.curation import curate_corpus
    from dce_spark.spark.session import get_spark

    spark = get_spark(app_name="dce-curate")
    docs = spark.read.parquet(args.input)
    if args.benchmark:
        benchmark = spark.read.parquet(args.benchmark)
    else:
        benchmark = docs.filter(F.pmod(F.col("doc_id"), F.lit(50)) == 0)

    # an explicit --max-dup-ngram-frac enables the dup gate on its
    # own (a silently-ignored flag would ship an unfiltered corpus
    # the operator believes was gated); --strict enables both gates
    # with the default cap
    dup_cap = args.max_dup_ngram_frac
    if dup_cap is None and args.strict:
        dup_cap = 0.5
    packed = curate_corpus(
        docs,
        benchmark,
        min_tokens=args.min_tokens,
        k=args.shingle_k,
        token_budget=args.token_budget,
        max_dup_ngram_frac=dup_cap,
        drop_tail_bucket=args.strict,
        urls=spark.read.parquet(args.urls) if args.urls else None,
        blocklist=(
            spark.read.parquet(args.blocklist)
            if args.blocklist else None
        ),
        robots_rules=(
            spark.read.parquet(args.robots) if args.robots else None
        ),
        robots_bodies=(
            spark.read.parquet(args.robots_bodies)
            if args.robots_bodies else None
        ),
        robots_agent=args.robots_agent,
        latest_only=args.latest_only,
        cc_dedup=args.cc_dedup,
    ).persist()
    # shard is the natural read unit downstream (one training file per
    # shard) — partition the sink by it so a trainer reads one
    # directory per shard without a post-hoc repartition
    packed.write.mode("overwrite").partitionBy("shard").parquet(
        args.output
    )

    # stats from the persisted frame, not a read-back of the sink: a
    # legitimately-empty run writes no part files and
    # spark.read.parquet would fail schema inference instead of
    # reporting docs_out=0
    stats = packed.groupBy().agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.countDistinct("source", "shard").alias("shards"),
    ).collect()[0]
    print(
        json.dumps(
            {
                "docs_in": docs.count(),
                "docs_out": int(stats["docs"]),
                "tokens_out": int(stats["tokens"] or 0),
                "shards": int(stats["shards"]),
                "strict": bool(args.strict),
                "url_layer": bool(args.urls),
                "output": args.output,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

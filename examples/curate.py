#!/usr/bin/env python3
"""End-to-end corpus curation demo: quality gate -> exact dedup ->
MinHash near-dup dedup -> benchmark decontamination -> token-budget
shard packing, over a documents parquet table.

Usage:
  python examples/curate.py [sf_dir] [token_budget] [--strict]

--strict adds the corpus-relative gates between dedup and
decontamination: the RefinedWeb duplicate-5-gram cap (frac > 0.5
drops) and the CCNet cross-entropy tail-quartile drop.

Prints the survivor count per stage-equivalent and the shard histogram.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--strict"]
    strict = "--strict" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    budget = int(args[1]) if len(args) > 1 else 4096

    from pyspark.sql import functions as F

    from dce_spark.functions.curation import curate_corpus
    from dce_spark.spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    benchmark = docs.filter(F.pmod(F.col("doc_id"), F.lit(50)) == 0)

    n_in = docs.count()
    gates = (
        dict(max_dup_ngram_frac=0.5, drop_tail_bucket=True)
        if strict else {}
    )
    packed = curate_corpus(docs, benchmark, token_budget=budget, **gates)
    n_out = packed.count()
    print(f"documents in:  {n_in}")
    print(f"survivors out: {n_out}  ({100.0 * n_out / max(n_in,1):.1f}%)")
    print("shards per source:")
    packed.groupBy("source").agg(
        F.countDistinct("shard").alias("shards"),
        F.sum("n_tokens").alias("tokens"),
    ).orderBy("source").show(20, truncate=False)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

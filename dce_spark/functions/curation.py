"""End-to-end training-corpus curation: the composed pipeline a 100 TB
pretraining-data job actually runs, built purely from this package's
Catalyst operators — no Python on any hot path.

    quality gate (token floor)
      -> exact dedup            (min doc_id per identical text)
      -> MinHash near-dup dedup (band keeper over the survivors)
      -> benchmark decontamination (drop docs sharing any k-gram with
                                    the held-out set)
      -> shard packing          (per-source token-budget cumsum)

Each stage is a semi-join on the previous survivors, so the whole plan
stays joins+aggregations over (doc_id)-keyed decision tables: one
shuffle per decision, map-side partials everywhere, no collect. The
composition is deterministic end-to-end (every stage is), so the final
shard assignment is DuckDB-oracle-checkable as one SQL statement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dce_spark.functions.textops import (
    decontaminate,
    minhash_dedup,
    pack_shards,
    tokens_col,
)


def curate_corpus(
    documents: DataFrame,
    benchmark: DataFrame,
    *,
    min_tokens: int = 20,
    k: int = 3,
    token_budget: int = 4096,
) -> DataFrame:
    """Returns the packed shard table (source, doc_id, n_tokens, shard)
    of the curated survivors."""
    base = documents.withColumn("doc_id", F.col("doc_id").cast("long"))
    gated = base.filter(F.size(tokens_col()) >= min_tokens)

    # exact dedup: the smallest doc_id per identical text survives
    exact_keep = gated.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    g2 = gated.join(exact_keep.select("doc_id"), "doc_id", "semi")

    # near-dup dedup over the exact-dedup survivors (band keeper)
    mh = minhash_dedup(g2, k=k)
    g3 = g2.join(
        mh.filter(F.col("is_kept")).select("doc_id"), "doc_id", "semi"
    )

    # decontamination: drop survivors sharing any k-gram with the
    # benchmark (benchmark members themselves self-hit and drop out)
    dec = decontaminate(g3, benchmark, k=k)
    g4 = g3.join(
        dec.filter(~F.col("contaminated")).select("doc_id"), "doc_id", "semi"
    )

    return pack_shards(g4, token_budget=token_budget)

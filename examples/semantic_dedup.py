#!/usr/bin/env python3
"""End-to-end semantic curation demo over the embeddings table:

    k-means quantizer (uncapped struct-min assignment)
      -> SemDeDup with bounded (cluster, sub, chunk) pairing,
         both keeper policies (first-seen min_id vs the paper's
         centroid-farthest exemplar)
      -> IVF ANN sanity probe routed through the SAME centroids

Prints one JSON stats line. Defaults to /root/testdata/sf0.01; pass a
different sf dir as argv[1]. This is the composition a training-data
pipeline runs before mixing: cluster the corpus, collapse semantic
near-dups inside clusters, and keep an ANN index path for retrieval —
all deterministic (fixed-point centroids, integer LSH sub-shards).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from pyspark.sql import functions as F

    from dce_spark.functions.simsearch import ivf_topk, semdedup
    from dce_spark.spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    # the synthetic vectors are mutually far apart — inject the crawl
    # reality deterministically: every vec_id < 60 re-appears as a
    # re-crawled copy (id + 100000, identical embedding), the semantic
    # near-dups the pass must collapse
    emb = base.unionByName(
        base.filter(F.col("vec_id") < 60).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
    )

    kept = {}
    for policy in ("min_id", "centroid_far"):
        decided = semdedup(
            emb, k=8, n_iters=1, dim=64, threshold=0.95,
            max_cluster_size=32, keep_policy=policy,
        )
        kept[policy] = decided.filter(F.col("is_kept")).count()

    ann = ivf_topk(
        emb, n_queries=5, k=3, n_clusters=8, n_iters=1, dim=64,
        n_probes=2,
    ).count()

    n = emb.count()
    print(json.dumps({
        "vectors": n,
        "kept_min_id": kept["min_id"],
        "kept_centroid_far": kept["centroid_far"],
        "dropped_pct": round(100.0 * (n - kept["min_id"]) / n, 2),
        "ivf_topk_rows": ann,
        "sf_dir": sf_dir,
    }))
    spark.stop()


if __name__ == "__main__":
    main()

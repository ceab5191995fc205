"""Spark-side pipeline: scan -> salted exchange -> Arrow-batched
extraction -> committed write with lineage manifests."""

"""End-to-end extraction pipeline: scan -> salted exchange -> Arrow map
-> bucket-committed write with lineage manifests + resume.

Physical plan (the job's ONLY shuffle is the explicit salting exchange):

    Scan parquet/Iceberg [url, html]          (column-pruned, pushed down)
      -> Exchange hashpartitioning(xxhash64(url), P)   (skew defeat)
      -> PythonMapInArrow extract_batches              (the CETD map)
      -> Write bucket=k partitions + manifest commit   (resume unit)

Scale notes (10^12-row framing):

* Skew: Common-Crawl inputs cluster by host and by page size. AQE only
  re-plans joins, not cost-per-row skew in a map stage, so the pipeline
  repartitions explicitly on xxhash64(url) — uniformly spreading hot
  domains; the salt factor multiplies partition count so a straggler
  page delays ~1/(P*salt) of the work.
* Resumability: output is committed per url-hash *bucket* (pmod of
  xxhash64). A bucket is visible only after its manifest row is
  written; rerun processes only buckets missing from the manifest and
  rewrites them with dynamic partition overwrite, giving exactly-once
  per url at bucket granularity. On Iceberg this maps 1:1 to snapshot
  commits + an anti-join on the manifest table.
* Lineage: per-bucket url/byte/ok/failed counters live in the manifest
  table, computed as a native groupBy over the extracted output.
"""

from __future__ import annotations

import datetime as _dt
import re
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dce_spark.spark.schema import EXTRACTED_SCHEMA, MANIFEST_SCHEMA
from dce_spark.spark.udf import attach_extraction

__all__ = ["salt_partitions", "extract_pages", "run_pipeline", "read_manifest"]


def _is_missing_table(exc: Exception) -> bool:
    """True only for 'the target table does not exist' failures, the
    one case where falling back to CTAS is correct. V2 catalogs raise
    NoSuchTableException, the session catalog raises AnalysisException
    with condition TABLE_OR_VIEW_NOT_FOUND; both are captured-side
    AnalysisExceptions in PySpark, so match the error condition first
    and the class names in the message as the fallback."""
    try:
        from pyspark.errors import AnalysisException
    except ImportError:  # pragma: no cover
        AnalysisException = ()
    if isinstance(exc, AnalysisException):
        cond = ""
        for meth in ("getCondition", "getErrorClass"):
            try:
                cond = getattr(exc, meth)() or ""
                break
            except Exception:
                continue
        if cond in ("TABLE_OR_VIEW_NOT_FOUND", "NO_SUCH_TABLE") or (
            cond.startswith("TABLE_OR_VIEW_NOT_FOUND")
        ):
            return True
    msg = str(exc)
    return "NoSuchTable" in msg or "TABLE_OR_VIEW_NOT_FOUND" in msg


def salt_partitions(df: DataFrame, num_partitions: int, salt_factor: int = 4) -> DataFrame:
    """Explicit skew-defeating exchange: hash-repartition on xxhash64(url)
    into num_partitions * salt_factor slices."""
    return df.repartition(num_partitions * salt_factor, F.xxhash64("url"))


def salt_partitions_two_tier(
    df: DataFrame,
    num_partitions: int,
    salt_factor: int = 4,
    big_page_bytes: int = 1_000_000,
) -> DataFrame:
    """Cost-per-row skew variant: multi-MB pages cost 10-100x a median
    page, so hash placement alone leaves variance (one unlucky task can
    draw several). Big pages are round-robined (exactly uniform, at most
    ceil(n_big/P) per task); the rest hash on xxhash64(url). Each row
    crosses one exchange; both legs share the downstream map plan."""
    p = num_partitions * salt_factor
    is_big = F.length("html") > big_page_bytes
    big = df.filter(is_big).repartition(p)  # round-robin: exact spread
    small = df.filter(~is_big | F.col("html").isNull()).repartition(
        p, F.xxhash64("url")
    )
    return small.unionByName(big)


def extract_pages(df: DataFrame, mode: str = "both",
                  num_partitions: int | None = None,
                  salt_factor: int = 4) -> DataFrame:
    """pages -> extracted rows; the one-shuffle one-map logical plan."""
    if num_partitions is not None:
        df = salt_partitions(df, num_partitions, salt_factor)
    return attach_extraction(df, mode=mode)


def _manifest_dir(output_path: str) -> str:
    return str(Path(output_path) / "_manifest")


def _data_dir(output_path: str) -> str:
    return str(Path(output_path) / "data")


def read_manifest(spark: SparkSession, output_path: str) -> DataFrame:
    mpath = _manifest_dir(output_path)
    try:
        return spark.read.schema(MANIFEST_SCHEMA).parquet(mpath)
    except Exception:
        return spark.createDataFrame([], MANIFEST_SCHEMA)


def completed_buckets(spark: SparkSession, output_path: str) -> set[int]:
    mf = read_manifest(spark, output_path)
    return {r.bucket for r in mf.select("bucket").distinct().collect()}


def run_pipeline(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    *,
    buckets: int = 16,
    buckets_per_commit: int = 4,
    mode: str = "both",
    num_partitions: int | None = None,
    salt_factor: int = 4,
    max_commits: int | None = None,
    sink: str = "parquet",
    table_provider: str = "iceberg",
    manifest_path: str | None = None,
    input_format: str = "parquet",
) -> dict:
    """Run (or resume) the extraction job.

    Input rows are assigned to ``buckets`` deterministic url-hash
    buckets; each commit processes ``buckets_per_commit`` of them,
    writes their output partitions, then appends manifest rows (the
    commit point). ``max_commits`` exists for kill-and-rerun tests.

    ``sink="table"`` writes through the DataFrameWriterV2 path
    (``writeTo(output_path).overwritePartitions()`` with a
    ``partitionedBy(bucket)`` CTAS on first contact) — ``output_path``
    is then a catalog table name and ``table_provider`` the table
    format. ``sink="iceberg"`` is that same path with the iceberg
    provider pinned; in environments without the iceberg-spark runtime
    jar the identical code path is exercised against the session
    catalog with ``table_provider="parquet"`` (see
    tests/test_pipeline_resume.py). ``manifest_path`` (REQUIRED for
    table sinks — a table name is not a filesystem path) locates the
    lineage manifests; the parquet sink defaults it to
    ``<output_path>/_manifest``.
    """
    table_sink = sink in ("iceberg", "table")
    if sink == "iceberg":
        table_provider = "iceberg"
    if table_sink and manifest_path is None:
        # Pure-argument validation BEFORE any Spark job runs (the
        # pre-bucketed input checks below scan metadata/samples —
        # minutes at crawl scale). output_path is a catalog table NAME
        # here, not a filesystem path; defaulting the manifest root to
        # it would drop lineage manifests in a cwd-relative directory
        # ("catalog.db.tbl/_manifest"), making resume silently depend
        # on the driver's working directory — a rerun from another cwd
        # re-extracts everything, a rerun from the same cwd against
        # different input skips everything.
        raise ValueError(
            "sink='table'/'iceberg' needs an explicit manifest_path "
            "(a filesystem or object-store URI for the lineage "
            "manifests); the catalog table name cannot serve as one"
        )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    if input_format == "warc":
        # straight-from-crawl ingestion: .warc(.gz) archives through
        # the streaming record reader; no bucket column exists, so the
        # runtime url-hash salting path below applies
        from dce_spark.spark.warc import read_warc

        pages = read_warc(spark, input_path)
    elif input_format == "parquet":
        pages = spark.read.parquet(input_path)
    else:
        raise ValueError(f"unknown input_format: {input_format!r}")
    if "bucket" in pages.columns:
        # Pre-bucketed input (hive layout bucket=k / Iceberg bucket(url)
        # partition spec): the per-commit isin filter becomes a PARTITION
        # filter, so each commit scans only its buckets' files instead of
        # re-reading the whole corpus once per commit — the difference
        # between O(input) and O(input * buckets/buckets_per_commit)
        # total bytes read at 100 TB. The stored column must be
        # pmod(xxhash64(url), buckets) with the SAME bucket count;
        # validated on a sample below.
        # Range check first: a stored bucket count that is a MULTIPLE of
        # `buckets` (e.g. stored 32, run 16) would pass a sampled
        # equality check on low buckets while the isin filters silently
        # never select buckets >= `buckets` — half the corpus lost. The
        # distinct partition values expose that immediately.
        # Prefer the PARTITION LISTING (driver-side file metadata — no
        # Spark job over the data) to enumerate stored bucket values; a
        # full distinct() scan of a 100-TB input just to validate its
        # layout would defeat the pruning this branch exists for. When
        # `bucket` is a plain data column (no hive dirs), fall back to a
        # LIMIT-bounded distinct: among any `buckets`+1 DISTINCT ints at
        # least one is outside range(buckets) (pigeonhole), so the limit
        # is provably sufficient to detect a mismatched bucket count.
        stored: set | None = None
        dir_vals = {
            m.group(1)
            for f in pages.inputFiles()
            for m in [re.search(r"/bucket=([^/]+)/", f)]
            if m
        }
        if dir_vals:
            try:
                stored = {int(v) for v in dir_vals}
            except ValueError:
                stored = None  # exotic partition values: re-derive below
        if stored is None:
            stored = {
                r.bucket
                for r in pages.select("bucket")
                .distinct()
                .limit(buckets + 1)
                .collect()
            }
        if any(b is None or b < 0 or b >= buckets for b in stored):
            raise ValueError(
                f"input 'bucket' partition values {sorted(stored, key=str)[:8]}"
                f"... fall outside range({buckets}); the input was written "
                "with a different bucket count — rewrite it or pass the "
                "count it was partitioned with"
            )
        # pmod equality probe across SEVERAL buckets (a single limit(100)
        # typically reads one partition dir and sees no bucket diversity).
        probe_buckets = sorted(stored)
        step = max(1, len(probe_buckets) // 4)
        probe_buckets = probe_buckets[::step][:4]
        sample = []
        for b in probe_buckets:
            sample.extend(
                pages.filter(F.col("bucket") == b)
                .select(
                    "bucket",
                    F.pmod(F.xxhash64("url"), F.lit(buckets))
                    .cast("int")
                    .alias("_expect"),
                )
                .limit(25)
                .collect()
            )
        if any(r.bucket != r._expect for r in sample):
            raise ValueError(
                "input has a 'bucket' column that does not match "
                f"pmod(xxhash64(url), {buckets}); rewrite the input or "
                "pass the bucket count it was partitioned with"
            )
        pages = pages.withColumn("bucket", F.col("bucket").cast("int"))
        pre_bucketed = True
    else:
        pages = pages.withColumn(
            "bucket", F.pmod(F.xxhash64("url"), F.lit(buckets)).cast("int")
        )
        pre_bucketed = False

    manifest_root = manifest_path if manifest_path is not None else output_path
    done = completed_buckets(spark, manifest_root)
    todo = [b for b in range(buckets) if b not in done]
    commits = 0
    # A pre-bucketed input is already url-hash-spread (write-time
    # salting), so the runtime salting exchange would re-shuffle every
    # html byte per commit for nothing: scan parallelism comes from
    # row-group splits. An explicit num_partitions still forces it.
    if num_partitions is not None:
        parallelism = num_partitions
    elif pre_bucketed:
        parallelism = None
    else:
        parallelism = spark.sparkContext.defaultParallelism

    for lo in range(0, len(todo), buckets_per_commit):
        if max_commits is not None and commits >= max_commits:
            break
        chunk = todo[lo : lo + buckets_per_commit]
        t0 = time.time()
        subset = pages.filter(F.col("bucket").isin(chunk))
        extracted = extract_pages(
            subset.select("url", "html"),
            mode=mode,
            num_partitions=parallelism,
            salt_factor=salt_factor,
        ).withColumn("bucket", F.pmod(F.xxhash64("url"), F.lit(buckets)).cast("int"))

        # Dynamic partition overwrite: rewriting a bucket is idempotent,
        # so a crash between data write and manifest append cannot
        # duplicate urls on rerun (the bucket is simply rewritten).
        if table_sink:
            # Catalog-table mapping of the same commit protocol: the
            # table is partitioned by bucket and each chunk lands as
            # one snapshot (overwritePartitions == dynamic overwrite of
            # exactly the chunk's buckets); resume reads the manifest
            # table exactly as in the parquet path. With
            # table_provider="iceberg" this needs the iceberg-spark
            # runtime jar; the code path itself is exercised in tests
            # against the session catalog with a parquet-provider table.
            try:
                extracted.writeTo(output_path).overwritePartitions()
            except Exception as exc:
                if not _is_missing_table(exc):
                    # a write fault on an EXISTING table (executor
                    # loss, schema drift, capability error) must
                    # surface as itself — falling through to CTAS
                    # would die on TableAlreadyExists and bury the
                    # root cause
                    raise
                # first contact: CTAS partitioned by bucket
                (
                    extracted.writeTo(output_path)
                    .using(table_provider)
                    .partitionedBy(F.col("bucket"))
                    .create()
                )
        else:
            (
                extracted.write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(_data_dir(output_path))
            )

        wall_ms = int((time.time() - t0) * 1000)
        try:
            if table_sink:
                committed = spark.table(output_path)
            else:
                committed = spark.read.parquet(_data_dir(output_path))
            out = committed.filter(F.col("bucket").isin(chunk))
        except Exception:
            # nothing written yet (an entirely-empty first chunk)
            out = spark.createDataFrame([], EXTRACTED_SCHEMA).withColumn(
                "bucket", F.lit(0).cast("int")
            )
        agg = out.groupBy("bucket").agg(
            F.count("*").alias("url_count"),
            F.sum("bytes_in").alias("bytes_in"),
            F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias(
                "pages_ok"
            ),
            F.sum(F.when(F.col("status") != "ok", 1).otherwise(0)).alias(
                "pages_failed"
            ),
        )
        # A bucket with zero input rows still needs a manifest row, or
        # resume would reprocess it forever: left-join the chunk list.
        chunk_df = spark.createDataFrame(
            [(int(b),) for b in chunk], "bucket int"
        )
        manifest_rows = (
            chunk_df.join(agg, "bucket", "left")
            .na.fill(
                {"url_count": 0, "bytes_in": 0, "pages_ok": 0, "pages_failed": 0}
            )
            .withColumn("wall_ms", F.lit(wall_ms).cast("long"))
            .withColumn("committed_at", F.lit(_dt.datetime.now()))
            .select(*[f.name for f in MANIFEST_SCHEMA.fields])
        )
        manifest_rows.write.mode("append").parquet(
            _manifest_dir(manifest_root)
        )
        commits += 1

    return {
        "buckets": buckets,
        "resumed_from": len(done),
        "committed": commits,
        "remaining": max(0, len(todo) - commits * buckets_per_commit),
    }


def read_extracted(spark: SparkSession, output_path: str) -> DataFrame:
    """Read back ONLY committed buckets (manifest-gated visibility)."""
    data = spark.read.parquet(_data_dir(output_path))
    mf = read_manifest(spark, output_path).select("bucket").distinct()
    return data.join(F.broadcast(mf), "bucket", "inner")

"""Structured Streaming wrapper: file source -> extraction -> parquet
sink with checkpoint (exactly-once across restarts)."""

import time

import pytest

from dce_spark.spark.corpus import build_pages_df
from dce_spark.streaming.stream import stream_extract

pytestmark = pytest.mark.spark


def _wait_done(query, timeout=120):
    deadline = time.time() + timeout
    while time.time() < deadline:
        query.processAllAvailable()
        return
    raise TimeoutError


def test_stream_extracts_and_is_exactly_once(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    inp, outp, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")

    pages = build_pages_df(spark, n_synthetic=12, include_fixtures=False,
                           partitions=2)
    pages.write.parquet(inp, mode="overwrite")

    q = stream_extract(spark, inp, outp, ckpt, max_files_per_trigger=1)
    try:
        _wait_done(q)
    finally:
        q.stop()

    out = spark.read.parquet(outp)
    assert out.count() == 12
    assert out.filter("status = 'ok'").count() == 12
    assert out.select("url").distinct().count() == 12

    # second batch of NEW files; restart from checkpoint must process
    # only the new files (no duplicates of the old rows)
    more = build_pages_df(spark, n_synthetic=30, include_fixtures=False,
                          partitions=2).filter("url like '%/2_'")
    n_more = more.count()
    more.write.mode("append").parquet(inp)

    q2 = stream_extract(spark, inp, outp, ckpt, max_files_per_trigger=1)
    try:
        _wait_done(q2)
    finally:
        q2.stop()

    out2 = spark.read.parquet(outp)
    assert out2.count() == out2.select("url").distinct().count()
    assert out2.count() >= 12


def test_stream_dedup_drops_repeated_urls(spark, tmp_path):
    """Repeated urls within the watermark window are extracted once."""
    import datetime as dt

    from dce_spark.spark.schema import PAGES_SCHEMA
    from dce_spark.streaming.stream import stream_dedup_extract

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    ts = dt.datetime(2025, 6, 1, 12, 0, 0)
    html = b"<html><body><p>Stream dedup page body text.</p></body></html>"
    rows = [
        ("https://a.test/1", ts, html, None, "en"),
        ("https://a.test/1", ts, html, None, "en"),  # dup in-batch
        ("https://a.test/2", ts, html, None, "en"),
        # dateless WARC record (warc_ts=None): must NOT vanish at the
        # watermark — ingest time is substituted for the event time.
        ("https://a.test/3-no-date", None, html, None, "en"),
    ]
    spark.createDataFrame(rows, PAGES_SCHEMA).write.parquet(in_dir)
    q = stream_dedup_extract(spark, in_dir, out_dir, ck_dir)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.read.parquet(out_dir)
    urls = [r.url for r in out.select("url").collect()]
    assert sorted(urls) == [
        "https://a.test/1",
        "https://a.test/2",
        "https://a.test/3-no-date",
    ]


def test_stream_dedup_canonical_urls(spark, tmp_path):
    """canonical_urls=True drops tracking-param/case variants of an
    already-seen url while keeping the ORIGINAL url in the output."""
    import datetime as dt

    from dce_spark.spark.schema import PAGES_SCHEMA
    from dce_spark.streaming.stream import stream_dedup_extract

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    ts = dt.datetime(2025, 6, 1, 12, 0, 0)
    html = b"<html><body><p>Canonical stream dedup body.</p></body></html>"
    rows = [
        ("https://a.test/p?utm_source=feed", ts, html, None, "en"),
        ("HTTPS://A.test/p#top", ts, html, None, "en"),   # same canonical
        ("https://a.test/p?x=1", ts, html, None, "en"),   # different
    ]
    spark.createDataFrame(rows, PAGES_SCHEMA).write.parquet(in_dir)
    q = stream_dedup_extract(
        spark, in_dir, out_dir, ck_dir, canonical_urls=True
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.read.parquet(out_dir)
    urls = sorted(r.url for r in out.select("url").collect())
    assert len(urls) == 2
    assert "https://a.test/p?x=1" in urls
    # exactly one of the two canonical-equal variants survived, and the
    # synthetic url_key never leaks into the output schema
    assert "url_key" not in out.columns
    assert any(u in urls for u in
               ("https://a.test/p?utm_source=feed", "HTTPS://A.test/p#top"))


def test_stream_quality_gate_filters_junk(spark, tmp_path):
    """quality_gate=True keeps rich pages and drops boilerplate-only
    extractions, using the same Gopher rule as the batch operators."""
    import datetime as dt

    from dce_spark.spark.schema import PAGES_SCHEMA

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    ts = dt.datetime(2025, 6, 1, 12, 0, 0)
    body = " ".join(
        "the quick brown fox and that dog have fun with it".split()
        * 8
    )
    rich = f"<html><body><p>{body}</p></body></html>".encode()
    junk = b"<html><body><p>menu</p></body></html>"
    rows = [
        ("https://q.test/rich", ts, rich, None, "en"),
        ("https://q.test/junk", ts, junk, None, "en"),
    ]
    spark.createDataFrame(rows, PAGES_SCHEMA).write.parquet(in_dir)

    q = stream_extract(spark, in_dir, out_dir, ck_dir,
                       quality_gate=True, min_words=20)
    try:
        _wait_done(q)
    finally:
        q.stop()

    out = spark.read.parquet(out_dir)
    urls = {r.url for r in out.select("url").collect()}
    assert urls == {"https://q.test/rich"}
    # the gate column is internal — the sink schema is unchanged
    assert "_gate_text" not in out.columns


def test_stream_quality_gate_article_mode(spark, tmp_path):
    """mode='article' leaves extracted_text as '' (not null); the gate
    must fall back to article_text instead of draining the stream."""
    import datetime as dt

    from dce_spark.spark.schema import PAGES_SCHEMA

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    ts = dt.datetime(2025, 6, 1, 12, 0, 0)
    body = " ".join(
        "the quick brown fox and that dog have fun with it".split()
        * 8
    )
    rich = f"<html><body><article><p>{body}</p></article></body></html>"
    rows = [("https://a.test/art", ts, rich.encode(), None, "en")]
    spark.createDataFrame(rows, PAGES_SCHEMA).write.parquet(in_dir)

    q = stream_extract(spark, in_dir, out_dir, ck_dir, mode="article",
                       quality_gate=True, min_words=20)
    try:
        _wait_done(q)
    finally:
        q.stop()

    out = spark.read.parquet(out_dir)
    assert out.count() == 1  # the rich article survives the gate


def test_stream_historical_bloom_gate(spark, tmp_path):
    """The packed Bloom table of the batch history gates the stream:
    already-crawled canonical urls (including tracking-param variants)
    are dropped before extraction; new urls flow through."""
    import datetime as dt

    from dce_spark.functions.textops import bloom_filter_words
    from dce_spark.functions.urlops import url_normalize_col
    from dce_spark.spark.schema import PAGES_SCHEMA
    from dce_spark.streaming.stream import stream_dedup_extract
    from pyspark.sql import functions as F

    in_dir, out_dir, ck_dir = (
        str(tmp_path / d) for d in ("in", "out", "ck")
    )
    # batch history: two canonical urls, filter built on the SAME key
    # form the stream probes (canonical)
    hist = spark.createDataFrame(
        [("https://a.test/old1",), ("https://a.test/old2?utm_source=x",)],
        ["url"],
    ).select(url_normalize_col(F.col("url")).alias("url_key"))
    flt = bloom_filter_words(
        hist, n_bits=1 << 14, text_col="url_key"
    ).localCheckpoint(eager=True)

    ts = dt.datetime(2025, 6, 1, 12, 0, 0)
    html = b"<html><body><p>Historical gate body text.</p></body></html>"
    rows = [
        ("https://a.test/old1", ts, html, None, "en"),            # seen
        ("HTTPS://A.test/old2#frag", ts, html, None, "en"),       # seen (canonical)
        ("https://a.test/new1", ts, html, None, "en"),
        ("https://a.test/new2", ts, html, None, "en"),
    ]
    spark.createDataFrame(rows, PAGES_SCHEMA).write.parquet(in_dir)
    q = stream_dedup_extract(
        spark, in_dir, out_dir, ck_dir, canonical_urls=True,
        historical_filter=flt, historical_n_bits=1 << 14,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    urls = sorted(r.url for r in spark.read.parquet(out_dir).collect())
    assert urls == ["https://a.test/new1", "https://a.test/new2"]


def test_stream_ingest_job_cli_once(spark, tmp_path):
    """jobs/stream_ingest_job.py --once as a subprocess: historical
    Bloom gate + canonical dedup + extraction drain to parquet."""
    import datetime as dt
    import json
    import subprocess
    import sys as _sys
    from pathlib import Path

    from dce_spark.functions.textops import bloom_filter_words
    from dce_spark.functions.urlops import url_normalize_col
    from dce_spark.spark.schema import PAGES_SCHEMA
    from pyspark.sql import functions as F

    repo = Path(__file__).resolve().parent.parent
    hist = spark.createDataFrame(
        [("https://j.test/seen",)], ["url"]
    ).select(url_normalize_col(F.col("url")).alias("url_key"))
    flt_dir = str(tmp_path / "flt")
    bloom_filter_words(hist, n_bits=1 << 14, text_col="url_key")\
        .write.parquet(flt_dir)

    ts = dt.datetime(2025, 6, 1, 12, 0, 0)
    html = b"<html><body><p>Stream job page body text.</p></body></html>"
    rows = [
        ("https://j.test/seen?utm_source=x", ts, html, None, "en"),
        ("https://j.test/new", ts, html, None, "en"),
    ]
    in_dir = str(tmp_path / "in")
    spark.createDataFrame(rows, PAGES_SCHEMA).write.parquet(in_dir)

    r = subprocess.run(
        [
            _sys.executable, "jobs/stream_ingest_job.py",
            "--input", in_dir,
            "--output", str(tmp_path / "out"),
            "--checkpoint", str(tmp_path / "ck"),
            "--historical", flt_dir,
            "--historical-n-bits", str(1 << 14),
            "--canonical-urls", "--once",
        ],
        capture_output=True, cwd=repo, timeout=600, text=True,
    )
    assert r.returncode == 0, r.stderr[-800:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats == {
        "rows_out": 1, "urls_out": 1, "historical_gate": True,
        "output": str(tmp_path / "out"),
    }


def test_stream_ingest_job_cli_once_all_filtered(spark, tmp_path):
    """The realistic all-duplicates re-crawl: every page in the drain
    is in the historical Bloom filter, the sink gets zero part files,
    and the job must still exit 0 with a rows_out=0 JSON line (not
    crash on schema inference over an empty directory)."""
    import datetime as dt
    import json
    import subprocess
    import sys as _sys
    from pathlib import Path

    from dce_spark.functions.textops import bloom_filter_words
    from dce_spark.spark.schema import PAGES_SCHEMA

    repo = Path(__file__).resolve().parent.parent
    hist = spark.createDataFrame(
        [("https://j.test/a",), ("https://j.test/b",)], ["url_key"]
    )
    flt_dir = str(tmp_path / "flt")
    bloom_filter_words(hist, n_bits=1 << 14, text_col="url_key")\
        .write.parquet(flt_dir)

    ts = dt.datetime(2025, 6, 1, 12, 0, 0)
    html = b"<html><body><p>Already-seen page body.</p></body></html>"
    rows = [
        ("https://j.test/a", ts, html, None, "en"),
        ("https://j.test/b", ts, html, None, "en"),
    ]
    in_dir = str(tmp_path / "in")
    spark.createDataFrame(rows, PAGES_SCHEMA).write.parquet(in_dir)

    r = subprocess.run(
        [
            _sys.executable, "jobs/stream_ingest_job.py",
            "--input", in_dir,
            "--output", str(tmp_path / "out"),
            "--checkpoint", str(tmp_path / "ck"),
            "--historical", flt_dir,
            "--historical-n-bits", str(1 << 14),
            "--once",
        ],
        capture_output=True, cwd=repo, timeout=600, text=True,
    )
    assert r.returncode == 0, r.stderr[-800:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["rows_out"] == 0 and stats["urls_out"] == 0

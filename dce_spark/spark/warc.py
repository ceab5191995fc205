"""WARC source: Common-Crawl-style archives -> the pages table.

Minimal-but-real WARC/1.0-1.1 reader (ISO 28500): parses record headers,
keeps ``WARC-Type: response`` records, strips the HTTP response header
block, and yields (url, warc_ts, html) rows matching PAGES_SCHEMA.
``.warc.gz`` in the Common Crawl layout (one gzip member per record) and
plain ``.warc`` both work.

Memory discipline (the 100 TB read):

* **Streaming decompression** — gz archives are decoded through
  ``gzip.GzipFile`` over the raw buffer (concatenated members read
  transparently), so the several-GB *decompressed* form of a ~1 GB
  Common-Crawl archive is never materialized; at any instant the task
  holds the compressed bytes (the binaryFile row), gzip's window, and
  ONE record payload.
* **Bounded row batches** — the kernel flushes accumulated rows to an
  Arrow batch every ``flush_bytes`` of payload (default 64 MB) instead
  of accumulating an entire archive's records into one Python list, so
  peak kernel memory is compressed-row + flush budget, independent of
  archive size.

Distributed shape: Spark's binaryFile source lists/reads the archives
(one row per file — WARC's gzip-member framing is not block-splittable,
so parallelism comes from the many-files layout Common Crawl already
has: ~1 GB per archive, tens of thousands of archives per crawl), and a
mapInPandas kernel parses records. Knobs that matter at 100 TB:

* file count >= cluster cores (the crawl layout satisfies this);
* binaryFile caps individual files at 2 GB (Spark's byte-array row
  limit) — standard crawl archives are ~1 GB compressed, under the cap;
  re-shard anything bigger upstream;
* files-per-task packing is governed by
  ``spark.sql.files.maxPartitionBytes`` / ``openCostInBytes`` — leave
  maxPartitionBytes at/below the archive size so each task owns one
  archive and the flush budget is the only per-task buffer.
"""

from __future__ import annotations

import datetime as _dt
import gzip
import io
from collections.abc import Iterator

__all__ = ["iter_warc_records", "read_warc", "wet_record_bytes",
           "write_wet_shards", "read_wet"]

_CRLF = b"\r\n"

DEFAULT_FLUSH_BYTES = 64 << 20


def _read_headers(stream) -> dict[bytes, bytes] | None:
    """Read a CRLF-terminated header block; None at clean EOF."""
    line = stream.readline()
    while line in (_CRLF, b"\n"):  # skip inter-record blank lines
        line = stream.readline()
    if not line:
        return None
    headers: dict[bytes, bytes] = {}
    if not line.startswith(b"WARC/"):
        return None  # not a record boundary: unrecoverable framing
    headers[b"__version__"] = line.strip()
    while True:
        line = stream.readline()
        if not line or line in (_CRLF, b"\n"):
            return headers
        if b":" in line:
            name, _, value = line.partition(b":")
            headers[name.strip().lower()] = value.strip()


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked transfer-encoded body (hex size
    line, CRLF, chunk bytes, CRLF, ... , 0-size terminator). Crawl
    archives store the raw wire bytes, so chunk framing would
    otherwise land inside the html. Total: any framing damage returns
    the chunks decoded so far (plus nothing), never raises."""
    out = []
    pos = 0
    while True:
        nl = body.find(b"\n", pos)
        if nl < 0:
            break
        size_tok = body[pos:nl].strip().split(b";", 1)[0]
        try:
            size = int(size_tok, 16)
        except ValueError:
            break
        if size == 0:
            break
        chunk = body[nl + 1:nl + 1 + size]
        out.append(chunk)
        if len(chunk) < size:
            break  # truncated mid-chunk
        pos = nl + 1 + size
        # skip the CRLF that terminates the chunk
        if body[pos:pos + 2] == b"\r\n":
            pos += 2
        elif body[pos:pos + 1] == b"\n":
            pos += 1
    return b"".join(out)


def _header_value(head: bytes, name: bytes) -> bytes:
    """First line-bounded value of an HTTP header in a lowercased
    header block ('' when absent)."""
    key = name + b":"
    # Anchor to line starts: a bare substring search would let e.g.
    # 'x-transfer-encoding: chunked' (or the name inside another
    # header's value) spoof the match and corrupt a non-chunked body.
    for line in head.split(b"\n"):
        line = line.strip()
        if line.startswith(key):
            return line[len(key):].strip()
    return b""


def _strip_http_headers(payload: bytes) -> bytes:
    """Response records carry an HTTP message; the body starts after
    the first blank line. The raw wire forms crawl archives store are
    undone: chunked transfer encoding is de-framed, then a gzip or
    deflate Content-Encoding is decompressed (both total — damage
    yields the bytes recovered so far / the raw body, never an
    exception)."""
    for sep in (b"\r\n\r\n", b"\n\n"):
        idx = payload.find(sep)
        if 0 <= idx < 64 * 1024:  # header blocks are small
            head = payload[:idx].lower()
            body = payload[idx + len(sep):]
            if b"chunked" in _header_value(head, b"transfer-encoding"):
                body = _dechunk(body)
            ce = _header_value(head, b"content-encoding")
            if ce in (b"gzip", b"x-gzip"):
                try:
                    body = gzip.decompress(body)
                except (OSError, EOFError):
                    pass  # mislabeled/damaged: keep raw bytes
            elif ce == b"deflate":
                import zlib

                for wbits in (zlib.MAX_WBITS, -zlib.MAX_WBITS):
                    # servers send both zlib-wrapped and raw deflate
                    # under the same label; try wrapped first
                    try:
                        body = zlib.decompress(body, wbits)
                        break
                    except zlib.error:
                        continue
            return body
    return payload


def iter_warc_records(raw, record_types=(b"response",)) -> Iterator[dict]:
    """Yield records of the requested WARC-Type(s) from WARC bytes or
    a binary stream (gz or plain). ``response`` records (the default)
    get their HTTP header block stripped; ``conversion`` records (WET
    extracted-text archives) carry a bare payload and are passed
    through as-is.

    Gz input is decompressed *incrementally* — records already parsed
    are yielded even when a later member is truncated or corrupt.
    Total: framing damage ends iteration instead of raising — at crawl
    scale truncated archives are routine and must cost rows, not jobs.
    """
    if isinstance(raw, (bytes, bytearray, memoryview)):
        raw = io.BytesIO(bytes(raw))
    buffered = io.BufferedReader(raw)
    try:
        magic = buffered.peek(2)[:2]
    except (OSError, EOFError):
        return  # source truncated before a single byte decoded
    stream = (
        gzip.GzipFile(fileobj=buffered) if magic == b"\x1f\x8b" else buffered
    )
    try:
        while True:
            headers = _read_headers(stream)
            if headers is None:
                return
            try:
                length = int(headers.get(b"content-length", b"0"))
            except ValueError:
                return
            payload = stream.read(length)
            if len(payload) < length:
                return  # truncated archive: stop cleanly
            rtype = headers.get(b"warc-type")
            if rtype in record_types:
                url = headers.get(b"warc-target-uri", b"").decode(
                    "utf-8", errors="replace"
                )
                ts = None
                date = headers.get(b"warc-date")
                if date:
                    try:
                        ts = _dt.datetime.fromisoformat(
                            date.decode("ascii").replace("Z", "+00:00")
                        ).replace(tzinfo=None)
                    except ValueError:
                        ts = None
                yield {
                    "url": url,
                    "warc_ts": ts,
                    "html": (
                        _strip_http_headers(payload)
                        if rtype == b"response" else payload
                    ),
                }
    except (OSError, EOFError):
        # BadGzipFile (a corrupt/garbage member) or a member cut mid-
        # stream: everything decoded so far has been yielded; stop.
        return


def _record_batches(
    content, flush_bytes: int = DEFAULT_FLUSH_BYTES
) -> Iterator[list[tuple]]:
    """Parse one archive into row batches of bounded payload size.

    Yields lists of (url, warc_ts, html, None, None) tuples; a batch is
    flushed as soon as its accumulated html bytes reach ``flush_bytes``,
    so the caller's peak buffer is O(flush_bytes + one record), not
    O(archive). Split out from the Spark kernel so the bound is unit-
    testable without an executor.
    """
    rows: list[tuple] = []
    pending = 0
    for r in iter_warc_records(content):
        rows.append((r["url"], r["warc_ts"], r["html"], None, None))
        pending += len(r["html"])
        if pending >= flush_bytes:
            yield rows
            rows, pending = [], 0
    if rows:
        yield rows


_GZ_MAGIC = b"\x1f\x8b\x08"


def _verify_member_at(f, off: int, probe: int = 1 << 16) -> bool:
    """True when ``off`` is a real gzip member start whose payload
    begins with a WARC version line. A bare magic-byte hit inside
    compressed data survives neither the zlib header parse nor the
    WARC/ prefix check, so scanning + verification is framing-safe."""
    import zlib

    f.seek(off)
    raw = f.read(probe)
    try:
        out = zlib.decompressobj(16 + zlib.MAX_WBITS).decompress(raw, 16)
    except zlib.error:
        return False
    return out.startswith(b"WARC/")


def _first_member_at_or_after(f, start: int, end: int) -> int | None:
    """Absolute offset of the first VERIFIED gzip member starting in
    [start, end), scanning the raw bytes windowed (1 MB + overlap) so
    the scan itself is memory-bounded."""
    win = 1 << 20
    pos = start
    while pos < end:
        f.seek(pos)
        buf = f.read(min(win + len(_GZ_MAGIC) - 1, end - pos + 2))
        i = 0
        while True:
            i = buf.find(_GZ_MAGIC, i)
            if i < 0 or pos + i >= end:
                break
            if _verify_member_at(f, pos + i):
                return pos + i
            i += 1
        pos += win
    return None


class _MemberRangeStream(io.RawIOBase):
    """Read-only stream of the DECOMPRESSED bytes of every gzip member
    whose member START lies in [first, end) of file ``f`` (members are
    back-to-back, so after the verified first boundary no scanning is
    needed: each member's ``unused_data`` begins the next). A single-
    stream gzip file is one giant member, so the chunk owning offset 0
    degrades to decoding the whole file — streaming, never buffered.
    Peak memory: one read block + zlib window + one decompressed
    block."""

    def __init__(self, f, first: int, end: int, block: int = 1 << 20):
        import zlib

        self._zlib = zlib
        self._f = f
        self._end = end
        self._block = block
        self._member_start = first
        self._raw = b""  # undecoded tail carried between members
        self._obj = None
        self._eof = False
        self._buf = b""
        f.seek(first)

    def readable(self):
        return True

    def readinto(self, b):
        if not self._buf:
            self._buf = self._read1()
        n = min(len(self._buf), len(b))
        b[:n] = self._buf[:n]
        self._buf = self._buf[n:]
        return n

    def _read1(self) -> bytes:
        z = self._zlib
        while not self._eof:
            if not self._raw:
                self._raw = self._f.read(self._block)
                if not self._raw:
                    self._eof = True
                    if self._obj is not None:
                        # file ended inside a member: surface the
                        # truncation the way GzipFile does, so the
                        # record parser stops at the damage instead of
                        # header-parsing a half-decompressed prefix
                        raise EOFError(
                            "gzip member truncated mid-stream"
                        )
                    break
            if self._obj is None:
                if self._member_start >= self._end:
                    self._eof = True
                    break
                self._obj = z.decompressobj(16 + z.MAX_WBITS)
            try:
                out = self._obj.decompress(self._raw)
            except z.error as exc:
                self._eof = True  # corrupt member: stop at the damage
                raise OSError(str(exc))
            if self._obj.eof:
                tail = self._obj.unused_data
                # next member starts where this one's bytes ended
                self._member_start = (
                    self._f.tell() - len(tail)
                )
                self._raw = tail
                self._obj = None
            else:
                self._raw = b""
            if out:
                return out
        return b""


def _open_local(path: str):
    """Binary file handle for a local path / file: URI; None when the
    scheme is non-local (caller falls back to the buffered source)."""
    from urllib.parse import urlparse, unquote

    u = urlparse(path)
    if u.scheme in ("", "file"):
        p = unquote(u.path) if u.scheme == "file" else path
        return open(p, "rb")
    return None


def read_warc(
    spark, path: str, flush_bytes: int = DEFAULT_FLUSH_BYTES,
    chunk_bytes: int = 64 << 20,
):
    """WARC archive(s) -> pages DataFrame (url, warc_ts, html, text,
    lang) via a RANGE-CHUNKED scan + Arrow-batched streaming record
    parsing.

    Peak task memory is bounded by the flush budget + fixed streaming
    buffers, independent of archive size: the scan lists (path, length)
    only — never the file contents — and each task owns the byte range
    [start, start + chunk_bytes) of one archive. Common-Crawl
    ``.warc.gz`` archives are one gzip member per record, so a task
    scans for the first VERIFIED member boundary in its range (magic
    bytes + zlib header + decompressed ``WARC/`` prefix — false
    positives are rejected) and streams members whose start lies in
    the range; a single-stream ``.gz`` or plain ``.warc`` file cannot
    be split safely, so the range at offset 0 streams the whole file
    (still through a file handle, never a whole-file buffer) and the
    other ranges find no owned boundary and emit nothing. Non-local
    URI schemes fall back to buffering one archive per task (the old
    binaryFile behavior, minus the listing).

    ``flush_bytes`` bounds the parser's in-flight row buffer per task
    (see module doc); the downstream extraction kernel re-chunks by its
    own byte budget, so the two bounds compose.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    from dce_spark.spark.schema import PAGES_SCHEMA

    meta = spark.read.format("binaryFile").load(path).select(
        "path", "length"
    )
    cb = int(chunk_bytes)
    chunks = meta.select(
        "path",
        "length",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor((F.greatest(F.col("length"), F.lit(1)) - 1) / cb),
            )
        ).alias("ci"),
    ).select(
        "path",
        (F.col("ci") * cb).alias("start"),
        F.least((F.col("ci") + 1) * cb, F.col("length")).alias("end"),
    )
    # the chunk PLAN is tiny (one row per range) and comes out of the
    # listing as a handful of partitions; spread the ranges so each
    # task owns ~one range of ~chunk_bytes of real work. The partition
    # count is explicit — AQE would otherwise coalesce the few-KB plan
    # rows into one partition, serializing the (heavy, kernel-side)
    # range reads it cannot see.
    chunks = chunks.repartition(
        spark.sparkContext.defaultParallelism,
        F.col("path"), F.col("start"),
    )
    cols = ["url", "warc_ts", "html", "text", "lang"]

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for rec in pdf.itertuples(index=False):
                start, end = int(rec.start), int(rec.end)
                f = _open_local(rec.path)
                if f is None:
                    # matches the WET sink's documented local/shared-
                    # filesystem posture: route object-store paths
                    # through a mount or an fsspec localization step
                    raise NotImplementedError(
                        "non-local WARC paths need a filesystem "
                        "mount; localize the archives first"
                    )
                with f:
                    head = f.read(len(_GZ_MAGIC))
                    is_gz_member = head == _GZ_MAGIC
                    if not is_gz_member:
                        # plain .warc (or foreign compression): not
                        # splittable — the offset-0 range streams the
                        # whole file, others own nothing
                        if start != 0:
                            continue
                        f.seek(0)
                        stream = f
                    else:
                        first = (
                            0 if start == 0
                            else _first_member_at_or_after(f, start, end)
                        )
                        if first is None:
                            continue
                        stream = io.BufferedReader(
                            _MemberRangeStream(f, first, end)
                        )
                    for rows in _record_batches(stream, flush_bytes):
                        yield pd.DataFrame(rows, columns=cols)

    return chunks.mapInPandas(kernel, PAGES_SCHEMA)


# ---------------------------------------------------------------------
# WET sink: extracted text back OUT as Common-Crawl-style archives
# ---------------------------------------------------------------------


def wet_record_bytes(url: str, ts, text: str) -> bytes:
    """One WET ``conversion`` record (WARC/1.0 framing): the standard
    interchange form for extracted text — what Common Crawl publishes
    as ``.warc.wet.gz`` alongside the raw crawl. Deterministic: the
    record id is a UUID-shaped md5 of (url, ts) — no RNG, no clock —
    so re-running a shard writes byte-identical archives (idempotent
    re-commit, and the resume story stays content-addressed)."""
    import hashlib

    payload = text.encode("utf-8")
    when = (ts or _dt.datetime(1970, 1, 1)).strftime("%Y-%m-%dT%H:%M:%SZ")
    digest = hashlib.md5(
        f"{url}\x00{when}".encode("utf-8")
    ).hexdigest()
    rid = (
        f"<urn:uuid:{digest[:8]}-{digest[8:12]}-{digest[12:16]}-"
        f"{digest[16:20]}-{digest[20:32]}>"
    )
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: conversion\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {when}\r\n"
        f"WARC-Record-ID: {rid}\r\n"
        f"Content-Type: text/plain\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode("utf-8")
    return head + payload + b"\r\n\r\n"


def write_wet_shards(
    df, out_dir: str, compress: bool = True
) -> list[dict]:
    """Extraction output -> per-partition ``.warc.wet[.gz]`` shards.

    ``df`` needs (url, warc_ts, extracted_text). One archive per
    partition, written RECORD-BY-RECORD through a streaming (gz)
    writer — peak executor memory is one record, independent of
    partition size; parallelism is the input partitioning (repartition
    upstream to size shards, exactly the many-files layout read_warc
    wants back). Returns the small per-shard lineage manifest
    [{path, records, text_bytes}] — the driver-side collect is one row
    per shard, the same control-plane grain as the pipeline's commit
    manifests. At 10^12 rows this is the WET-publishing job: shard
    count = partition count, each task owns one archive, no shuffle
    beyond the caller's partitioning.

    Filesystem posture (matches ``read_warc``): shards are written
    with plain ``open``/``gzip.open`` on each EXECUTOR, so ``out_dir``
    must be a shared filesystem visible to the driver and every
    executor (local mode, NFS, or a mounted object store) — on a
    cluster with executor-local disks the manifest would point at
    per-node files the driver cannot see. Route object-store targets
    through a mount or publish via a Hadoop-FS/fsspec sink instead.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.wet.gz" if compress else ".warc.wet"

    def write_partition(idx, rows):
        path = os.path.join(out_dir, f"part-{idx:05d}{ext}")
        n = 0
        nbytes = 0
        opener = gzip.open if compress else open
        with opener(path, "wb") as fh:
            for r in rows:
                text = r["extracted_text"]
                if text is None:
                    continue
                rec = wet_record_bytes(r["url"], r["warc_ts"], text)
                fh.write(rec)
                n += 1
                nbytes += len(text.encode("utf-8"))
        if n == 0:
            os.remove(path)  # no empty shards in the output listing
            return []
        return [{"path": path, "records": n, "text_bytes": nbytes}]

    return (
        df.select("url", "warc_ts", "extracted_text")
        .rdd.mapPartitionsWithIndex(
            lambda idx, it: write_partition(idx, it)
        )
        .collect()
    )


def read_wet(spark, path: str, flush_bytes: int = DEFAULT_FLUSH_BYTES):
    """WET archive(s) -> (url, warc_ts, text) DataFrame — the reader
    side of ``write_wet_shards`` and of Common Crawl's published
    ``.warc.wet.gz``. Same binaryFile + bounded-batch shape as
    read_warc; ``conversion`` payloads are bare text (no HTTP header
    strip)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )
    cols = ["url", "warc_ts", "text"]

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for rec in pdf.itertuples(index=False):
                rows: list[tuple] = []
                pending = 0
                for r in iter_warc_records(
                    io.BytesIO(bytes(rec.content)),
                    record_types=(b"conversion",),
                ):
                    text = r["html"].decode("utf-8", errors="replace")
                    rows.append((r["url"], r["warc_ts"], text))
                    pending += len(r["html"])
                    if pending >= flush_bytes:
                        yield pd.DataFrame(rows, columns=cols)
                        rows, pending = [], 0
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(
        kernel, "url string, warc_ts timestamp, text string"
    )

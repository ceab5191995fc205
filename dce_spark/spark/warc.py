"""WARC source: Common-Crawl-style archives -> the pages table.

Minimal-but-real WARC/1.0-1.1 reader (ISO 28500): parses record headers,
keeps ``WARC-Type: response`` records, strips the HTTP response header
block, and yields (url, warc_ts, html) rows matching PAGES_SCHEMA.
``.warc.gz`` in the Common Crawl layout (one gzip member per record) and
plain ``.warc`` both work — Python's gzip handles concatenated members.

Distributed shape: Spark's binaryFile source lists/reads the archives
(one task per file — WARC's gzip-member framing is not block-splittable,
so parallelism comes from the many-files layout Common Crawl already
has: ~1 GB per archive, tens of thousands of archives per crawl), and a
mapInPandas kernel parses records. For 100 TB the only knob that matters
is file count >= cluster cores, which the crawl layout satisfies.
"""

from __future__ import annotations

import datetime as _dt
import gzip
import io
from collections.abc import Iterator

__all__ = ["iter_warc_records", "read_warc"]

_CRLF = b"\r\n"


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


def _strip_http_headers(payload: bytes) -> bytes:
    """Response records carry an HTTP message; the body starts after the
    first blank line."""
    for sep in (b"\r\n\r\n", b"\n\n"):
        idx = payload.find(sep)
        if 0 <= idx < 64 * 1024:  # header blocks are small
            return payload[idx + len(sep):]
    return payload


def iter_warc_records(raw: bytes) -> Iterator[dict]:
    """Yield response records from WARC bytes (gz or plain).

    Total: framing damage ends iteration instead of raising — at crawl
    scale truncated archives are routine and must cost rows, not jobs.
    """
    if raw[:2] == b"\x1f\x8b":
        try:
            raw = gzip.decompress(raw)  # concatenated members supported
        except (OSError, EOFError):
            return
    stream = io.BytesIO(raw)
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
        if headers.get(b"warc-type") == b"response":
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
                "html": _strip_http_headers(payload),
            }


def read_warc(spark, path: str):
    """WARC archive(s) -> pages DataFrame (url, warc_ts, html, text,
    lang) via binaryFile scan + Arrow-batched record parsing."""
    import pandas as pd

    from dce_spark.spark.schema import PAGES_SCHEMA

    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rec in pdf.itertuples(index=False):
                for r in iter_warc_records(bytes(rec.content)):
                    rows.append(
                        (r["url"], r["warc_ts"], r["html"], None, None)
                    )
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return files.mapInPandas(kernel, PAGES_SCHEMA)

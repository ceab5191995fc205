"""Minimal-but-real PDF text extraction (the north rule's "PDF/layout
parse" leg).

Scope — the common machine-generated-PDF case, honestly bounded:

* scans all indirect objects for content streams (no xref needed —
  damaged crawl PDFs often have broken xref tables anyway);
* FlateDecode via stdlib zlib (the dominant filter); unfiltered
  streams pass through; other filters are skipped per-stream;
* tokenizes content streams and extracts text from Tj / TJ / ' / "
  operators inside BT..ET blocks, decoding literal `(..)` strings
  (escapes, octal, balanced parens) and `<hex>` strings;
* layout: TJ kerning gaps < -150/1000 em become spaces (the standard
  word-gap heuristic); Td/TD/T*/TL line moves become newlines.

NOT covered (documented, detectable): font /ToUnicode CMaps and
multi-byte CID encodings — text using them extracts as the raw string
bytes. Standard-encoding Latin text (the vast majority of simple
machine-generated PDFs) round-trips correctly; everything else degrades
to best-effort bytes rather than raising.
"""

from __future__ import annotations

import re
import zlib

__all__ = ["extract_pdf_text"]

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.S)
_ENDSTREAM = b"endstream"

# content-stream tokens we care about: strings, arrays, numbers, operators
_TOKEN_RE = re.compile(
    rb"\((?:\\.|[^\\()])*\)"  # literal string (flat; nesting handled below)
    rb"|<[0-9A-Fa-f\s]*>"  # hex string
    rb"|\[|\]"
    rb"|[-+]?\d*\.?\d+"
    rb"|/[^\s/\[\]()<>]*"
    rb"|[A-Za-z'\"*]+"
)

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _decode_literal(raw: bytes) -> bytes:
    """PDF literal string body (between parens): escapes + octal."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < n:
            nxt = raw[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt in b"01234567":  # octal \ddd (1-3 digits; \8 \9 are
                j = i + 1             # undefined escapes, not octal)
                while j < min(i + 4, n) and raw[j : j + 1] in b"01234567":
                    j += 1
                out.append(int(raw[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            if nxt == b"\n":  # line continuation
                i += 2
                continue
            i += 1
            continue
        out += c
        i += 1
    return bytes(out)


def _read_string(data: bytes, start: int) -> tuple[bytes, int]:
    """Read a literal string with balanced parens from data[start]=='('."""
    depth = 0
    i = start
    n = len(data)
    body = bytearray()
    while i < n:
        c = data[i : i + 1]
        if c == b"\\":
            body += data[i : i + 2]
            i += 2
            continue
        if c == b"(":
            depth += 1
            if depth > 1:
                body += c
        elif c == b")":
            depth -= 1
            if depth == 0:
                return bytes(body), i + 1
            body += c
        else:
            body += c
        i += 1
    return bytes(body), n


def _stream_text(content: bytes) -> list[str]:
    """Extract text chunks from one decoded content stream."""
    parts: list[str] = []
    pos = 0
    n = len(content)
    pending: list[bytes] = []  # string operands awaiting an operator
    in_array = False  # inside a TJ [..] array: numbers are kern gaps

    def flush_text(raw: bytes) -> None:
        # operands were decoded (escapes/octal/hex) when tokenized;
        # standard-encoding text maps 1:1 through latin-1
        parts.append(raw.decode("latin-1"))

    while pos < n:
        c = content[pos : pos + 1]
        if c == b"(":
            body, pos = _read_string(content, pos)
            pending.append(_decode_literal(body))
            continue
        m = _TOKEN_RE.match(content, pos)
        if not m:
            pos += 1
            continue
        tok = m.group(0)
        pos = m.end()
        if tok.startswith(b"<") and tok.endswith(b">"):
            hx = re.sub(rb"\s", b"", tok[1:-1])
            if len(hx) % 2:
                hx += b"0"
            try:
                pending.append(bytes.fromhex(hx.decode("ascii")))
            except ValueError:
                pass
            continue
        if tok in (b"Tj", b"'", b'"'):
            if tok in (b"'", b'"'):
                # ' is T* Tj and " is aw ac T* Tj: the line move happens
                # BEFORE the string is shown, so the newline precedes it.
                parts.append("\n")
            if pending:
                flush_text(pending[-1])
            pending.clear()
            continue
        if tok == b"TJ":
            # pending interleaves the array's strings with b" " markers
            # for kerning gaps < -150/1000 em (the standard word-gap
            # heuristic); plain kerning joins with nothing, which is
            # correct for generators that split mid-word.
            for s in pending:
                flush_text(s)
            pending.clear()
            in_array = False
            continue
        if tok in (b"Td", b"TD", b"T*"):
            pending.clear()
            parts.append("\n")
            continue
        if tok == b"ET":
            pending.clear()
            in_array = False
            parts.append("\n")
            continue
        if tok == b"[":
            in_array = True
            continue
        if tok == b"]":
            in_array = False
            continue
        if tok[:1] == b"/":
            continue  # name token (/F1 etc.): not an operator
        if tok[:1] in b"-+0123456789.":
            if in_array:
                try:
                    if float(tok) < -150.0:  # TJ adjustment: negative
                        pending.append(b" ")  # values widen the gap
                except ValueError:
                    pass
            continue
        # any other operator consumes its operands
        pending.clear()
    return parts


def extract_pdf_text(payload: bytes) -> str:
    """Best-effort text of a PDF binary; returns '' for non-PDF bytes."""
    if not payload or not payload.startswith(b"%PDF"):
        return ""
    parts: list[str] = []
    for m in _STREAM_RE.finditer(payload):
        meta = m.group(1)
        start = m.end()
        end = payload.find(_ENDSTREAM, start)
        if end < 0:
            continue
        raw = payload[start:end].rstrip(b"\r\n")
        if b"/FlateDecode" in meta:
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                continue
        elif b"/Filter" in meta:
            continue  # unsupported filter: skip this stream
        if b"BT" not in raw:
            continue
        parts.extend(_stream_text(raw))
    text = "".join(parts)
    # collapse layout newlines/spaces like the HTML path's normalizer
    return " ".join(text.split())

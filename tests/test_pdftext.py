"""PDF text extraction: scalar semantics + Spark plumbing.

The test PDFs are generated here by a minimal writer (uncompressed and
FlateDecode variants, Tj/TJ/quote operators, escapes, hex strings) so
the extractor is exercised against real PDF syntax with zero external
fixtures or libraries.
"""

import zlib

import pytest

from dce_spark.core.pdftext import extract_pdf_text


def make_pdf(content_stream: bytes, compress: bool = False) -> bytes:
    """Tiny single-page PDF with one content stream."""
    if compress:
        data = zlib.compress(content_stream)
        filt = b"/Filter /FlateDecode "
    else:
        data = content_stream
        filt = b""
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/MediaBox [0 0 612 792] >>",
        b"<< " + filt + b"/Length %d >>\nstream\n" % len(data)
        + data + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


CONTENT = (
    b"BT /F1 12 Tf 72 720 Td (Hello PDF world) Tj "
    b"0 -14 Td [(Sec) -20 (ond li) 5 (ne)] TJ "
    b"T* (Third \\(escaped\\) line) Tj "
    b"0 -14 Td <4865782074657874> Tj ET"
)


def test_uncompressed_pdf():
    text = extract_pdf_text(make_pdf(CONTENT))
    assert "Hello PDF world" in text
    assert "Second line" in text  # TJ kerning splits rejoined
    assert "Third (escaped) line" in text
    assert "Hex text" in text
    # layout newlines keep the lines apart
    assert text.index("Hello") < text.index("Second") < text.index("Third")


def test_flate_compressed_pdf():
    assert extract_pdf_text(make_pdf(CONTENT, compress=True)) == \
        extract_pdf_text(make_pdf(CONTENT))


def test_quote_operator_and_octal():
    content = b"BT (first) Tj (second) ' (oct\\101l) Tj ET"
    text = extract_pdf_text(make_pdf(content))
    # ' moves to the next line BEFORE showing its string (T* then Tj), so
    # "second" starts a new line (boundary after "first") and "octAl"
    # (\101 == 'A', shown by plain Tj with no move) stays glued to it.
    # Whitespace is collapsed to single spaces by the extractor tail.
    assert text == "first secondoctAl"


def test_non_pdf_and_garbage_total():
    assert extract_pdf_text(b"") == ""
    assert extract_pdf_text(b"<html>not a pdf</html>") == ""
    assert extract_pdf_text(b"%PDF-1.4 truncated garbage\xff\xfe") == ""
    # corrupt flate stream: skipped, not raised
    broken = make_pdf(b"BT (x) Tj ET", compress=True).replace(
        zlib.compress(b"BT (x) Tj ET")[:4], b"\x00\x00\x00\x00"
    )
    assert isinstance(extract_pdf_text(broken), str)


@pytest.mark.spark
def test_pdf_extract_spark_op(spark):
    from dce_spark.functions.multimodal import pdf_text

    rows = [
        (1, "pdf", make_pdf(CONTENT), None, None, None, None),
        (2, "pdf", make_pdf(CONTENT, compress=True), None, None, None, None),
        (3, "pdf", b"not a pdf", None, None, None, None),
        (4, "image", b"\x89PNG", None, None, None, None),
    ]
    from dce_spark.functions.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in pdf_text(media).collect()}
    assert "Hello PDF world" in out[1].text
    assert out[2].text == out[1].text
    assert out[3].status == "empty" and out[3].text == ""
    assert out[4].status == "skipped"


def test_tj_kerning_word_gap():
    # TJ adjustments < -150/1000 em are word gaps; smaller kerning joins
    content = b"BT [(Hello) -300 (world) -20 (!)] TJ ET"
    assert extract_pdf_text(make_pdf(content)) == "Hello world!"


def test_undefined_escapes_do_not_raise():
    # \8 \9 are undefined escapes (backslash dropped), not octal
    content = b"BT (bad\\8esc and \\9too) Tj ET"
    assert extract_pdf_text(make_pdf(content)) == "bad8esc and 9too"

"""Rule-table tests for the vendored htmd port (default options),
byte-exact on canonical turndown/htmd-family conversions. The crate
itself can't run in this sandbox; these goldens lock the vendored
port's behavior so any rule change is a deliberate diff (and the cetd
markdown parquet goldens are regenerated from the same port)."""

import pytest

from dce_spark.core.htmdport import convert_to_markdown as conv

CASES = [
    # headings: ATX (htmd HeadingStyle::Atx default)
    ("<h1>Heading</h1>", "# Heading"),
    ("<h3>Deep</h3><p>x</p>", "### Deep\n\nx"),
    # emphasis / strong
    (
        "<p>Some <strong>bold</strong> and <em>italic</em> text.</p>",
        "Some **bold** and *italic* text.",
    ),
    # whitespace-only text between blocks vanishes
    ("<div>\n  <p>a</p>\n  <p>b</p>\n</div>", "a\n\nb"),
    # lists: '*   ' items, 4-space nested indent, '\n'-attached sublist
    (
        "<ul><li>Item 1</li><li>Item 2<ul><li>Nested</li></ul></li></ul>",
        "*   Item 1\n*   Item 2\n    *   Nested",
    ),
    ("<ol start='3'><li>x</li><li>y</li></ol>", "3.  x\n4.  y"),
    # inlined links, parens escaped in href-less; title quoted
    (
        "<p>see <a href='https://e.test/a(1)' title='t'>lnk</a></p>",
        'see [lnk](https://e.test/a\\(1\\) "t")',
    ),
    ("<p><a>no href</a></p>", "no href"),
    # indented code blocks (CodeBlockStyle::Indented default)
    (
        "<pre><code>def f():\n    return 1\n</code></pre>",
        "    def f():\n        return 1",
    ),
    # inline code with backtick extension + padding
    ("<p>x <code>a `tick`</code> y</p>", "x `` a `tick` `` y"),
    # blockquote line prefixing
    ("<blockquote><p>quoted</p><p>more</p></blockquote>",
     "> quoted\n> \n> more"),
    # br: two-space line break (BrStyle::TwoSpaces default)
    ("<p>a<br>b</p>", "a  \nb"),
    # hr: '* * *'
    ("<p>q</p><hr><p>w</p>", "q\n\n* * *\n\nw"),
    # markdown escaping of text content
    (
        "<p>special *stars* _under_ [brack] `tick`</p>",
        "special \\*stars\\* \\_under\\_ \\[brack\\] \\`tick\\`",
    ),
    # blank blocks collapse
    ("<p> </p><p>real</p>", "real"),
    # flanking whitespace hoisted out of inline markers
    ("<p>a<b> spaced </b>z</p>", "a **spaced** z"),
    # images
    ("<p><img src='x.png' alt='A pic'></p>", "![A pic](x.png)"),
    ("<p><img alt='no src'></p>", ""),
    # unknown inline elements are transparent; unknown blocks break
    ("<p>t <span>s</span> u</p>", "t s u"),
    # table cells fall out as blocks (no GFM table handler in htmd 0.5)
    ("<table><tr><td>c1</td><td>c2</td></tr></table>", "c1\n\nc2"),
    # entity-decoded text is escaped for markdown
    ("<p>&amp;lt;img</p>", "&lt;img"),
]


_VECTORS = __import__("json").load(
    open(__import__("pathlib").Path(__file__).parent
         / "fixtures" / "markdown_conformance.json")
)["cases"]


@pytest.mark.parametrize(
    "case", _VECTORS, ids=[c["id"] for c in _VECTORS]
)
def test_markdown_conformance_vectors(case):
    """External conformance corpus: expectations hand-transcribed from
    the documented turndown default rule semantics (under htmd's
    option defaults) BEFORE being run against the port — independent
    of the port's own recorded goldens, so they falsify rule-table
    bugs the circular goldens cannot (see the fixture's _provenance
    note)."""
    assert conv(case["html"]) == case["md"], case["rule"]


@pytest.mark.parametrize("html,expected", CASES, ids=range(len(CASES)))
def test_htmdport_rule_table(html, expected):
    assert conv(html) == expected


def test_htmdport_total_on_garbage():
    assert isinstance(conv(""), str)
    assert conv("<<<>>>&&&") == "<<<>>>&&&"  # bogus tags become text
    assert isinstance(conv("<ul><table><li></table></ul>"), str)


def test_htmdport_pre_without_code_is_escaped_block():
    # turndown semantics: only code ancestry exempts escaping
    out = conv("<pre>a *b*</pre>")
    assert out == "a \\*b\\*"

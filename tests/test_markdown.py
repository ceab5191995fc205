"""Markdown path — the reference's own markdown test expectations
(src/markdown.rs:162-297) plus the e2e leak corpus on the md output."""

import pytest

from dce_spark.core.api import decode_html
from dce_spark.core.cetd import DensityTree
from dce_spark.core.markdown import extract_content_as_markdown
from tests.conftest import fixture_html

FORBIDDEN = [
    "data:image/", "<span", "<img", "<svg", "<script", "<style",
    "<iframe", "&lt;img", "&lt;span", "data-mce-type",
    "acf-media-credit", "acf-credit",
]


def md_for(html: str) -> str:
    dt = DensityTree.from_html(html)
    dt.calculate_density_sum()
    return extract_content_as_markdown(dt)


def test_markdown_basic_article():
    # markdown.rs:170-195
    html = """
        <html><body>
            <div class="header">Navigation</div>
            <article>
                <h1>Main Article</h1>
                <p>This is the main content with lots of text that should have high density.</p>
                <p>Another paragraph with substantial content for density analysis.</p>
            </article>
            <div class="sidebar">Sidebar content</div>
        </body></html>
    """
    md = md_for(html)
    assert md
    assert "Main Article" in md
    assert "main content" in md


def test_markdown_test_1():
    # markdown.rs:199-220
    md = md_for(fixture_html("test_1.html"))
    assert "Here is text" in md
    assert "Paragraph text" in md
    assert "huge paragraph" in md
    assert "Menu" not in md
    assert "link1" not in md


def test_markdown_test_2_links_converted():
    # markdown.rs:224-243
    md = md_for(fixture_html("test_2.html"))
    assert "Here is text" in md
    assert "long paragraph" in md
    assert "wikipedia" in md
    assert "](https://wikipedia.org)" in md  # markdown link syntax


def test_markdown_test_4_filters_scripts():
    # markdown.rs:247-268
    md = md_for(fixture_html("test_4.html"))
    assert "Lorem ipsum" in md
    assert "long paragraph" in md
    assert "wikipedia" in md
    assert "myFunction" not in md
    assert "Some comments" not in md


def test_markdown_empty_for_contentless():
    # markdown.rs:272-296
    md = md_for('<html><body><script>console.log("empty")</script></body></html>')
    assert md == ""


def test_markdown_headings_and_lists():
    md = md_for(
        "<body><article><h2>Title Here</h2><p>Body paragraph text for density"
        " purposes with enough words.</p><ul><li>alpha</li><li>beta</li></ul>"
        "<pre><code>  raw code  </code></pre></article></body>"
    )
    # htmd-default shapes: ATX heading, '*   ' bullets, 4-space
    # indented code block (pre > code)
    assert "## Title Here" in md
    assert "*   alpha\n*   beta" in md
    assert "\n\n      raw code" in md


def test_markdown_no_leaks_on_real_pages(pages):
    for name, raw in pages.items():
        md = md_for(decode_html(raw))
        assert md.strip(), name
        for pat in FORBIDDEN:
            assert pat not in md, (name, pat)


def test_markdown_sanity_substrings(pages):
    checks = {
        "theblock.co-post-402903-grayscale-hyperliquid-etf.html": "Grayscale",
        "bitcoinmagazine.com-news-cosmos-health-cosm-buys-600k-bitcoin.html": "Cosmos Health",
        "cryptoslate.com-solana-public-attack-on-starknet.html": "Starknet",
        "decrypt.co-369195-openai-foundation-pledges-250-million.html": "OpenAI",
    }
    for name, expected in checks.items():
        md = md_for(decode_html(pages[name]))
        assert expected in md, f"{name}: missing {expected!r}"


def test_filtered_inner_html_serializer():
    # reference src/utils.rs:290-342: pruned inner HTML with the exact
    # escape_html_text / escape_attr_value escapes and void handling
    from dce_spark.core.htmlparse import parse_html
    from dce_spark.core.markdown import (
        escape_attr_value,
        escape_html_text,
        filtered_inner_html,
    )

    assert escape_html_text("a<b>&c") == "a&lt;b&gt;&amp;c"
    assert escape_attr_value('a"b&<>') == "a&quot;b&amp;<>"  # < > untouched
    doc = parse_html(
        '<body><div class="a"><p>x &amp; <b>y</b></p>'
        "<script>var z=1;</script>"
        '<img src="data:image/png;base64,xx">'
        '<span data-mce-type="bookmark">hidden</span>'
        '<div data-mce-type="x">also hidden</div>'
        '<img src="real.png" alt=\'a"b\'><hr></div>tail</body>'
    )
    html = filtered_inner_html(doc)
    assert html == (
        '<div class="a"><p>x &amp; <b>y</b></p>'
        '<img src="real.png" alt="a&quot;b"><hr></div>tail'
    )
    # subtree serialization: inner HTML of the <p>
    p = next(i for i in range(len(doc)) if doc.tag[i] == "p")
    assert filtered_inner_html(doc, p) == "x &amp; <b>y</b>"

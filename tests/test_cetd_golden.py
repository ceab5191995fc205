"""Tier-1 CETD golden parity — the reference crate's own unit-test values.

Every assertion here mirrors a test the reference runs in CI
(src/cetd.rs, src/lib.rs, tests/), re-expressed over the node-table
representation. NodeId ordinals translate to content identity checks
(html5ever numbers the whole document; our table is body-rooted).
"""

import math

import numpy as np
import pytest

from dce_spark.core.api import extract_article, extract_content, extract_page
from dce_spark.core.cetd import DensityTree
from dce_spark.core.textnorm import count_graphemes
from tests.conftest import fixture_html


@pytest.fixture(scope="module")
def t1():
    dt = DensityTree.from_html(fixture_html("test_1.html"))
    dt.calculate_density_sum()
    return dt


def test_build_density_tree_node_count(t1):
    # src/cetd.rs:489-495: 55 density nodes
    assert t1.node_count() == 55


def test_densest_node_is_article_body(t1):
    # src/cetd.rs:497-511: densest node is <div class="articleBody">
    densest = int(t1.sorted_nodes()[-1])
    dom_i = int(t1.dom_index[densest])
    assert t1.doc.tag[dom_i] == "div"
    assert t1.doc.attrs[dom_i]["class"] == "articleBody"


def test_densest_node_text_graphemes(t1):
    # src/cetd.rs:513-528: densest node text = 186 graphemes
    densest = int(t1.sorted_nodes()[-1])
    assert count_graphemes(t1.node_text(densest)) == 186


def test_densest_node_links(t1):
    # src/cetd.rs:531-539: 2 links in the densest subtree
    densest = int(t1.sorted_nodes()[-1])
    assert len(t1.node_links(densest)) == 2


def test_density_sum_invariants(t1):
    # src/cetd.rs:570-626
    ds = t1.density_sum
    n = t1.node_count()
    children = [[] for _ in range(n)]
    for i in range(1, n):
        children[int(t1.parent[i])].append(i)
    for i in range(n):
        if not children[i]:
            assert ds[i] == 0.0
        else:
            expected = np.float32(0.0)
            for c in children[i]:
                expected = np.float32(expected + t1.density[c])
            assert abs(float(ds[i]) - float(expected)) < 1.2e-7 * max(
                1.0, abs(float(expected))
            )
    mx = ds.max()
    assert (ds <= mx).all()
    assert (ds == mx).any()


def test_max_density_sum_node(t1):
    mx = t1.get_max_density_sum_node()
    assert (t1.density_sum <= t1.density_sum[mx]).all()


def test_extract_content_test_1(t1):
    # src/cetd.rs:644-664
    content = t1.extract_content()
    assert content
    assert "Here is text" in content
    assert "Here is article" in content
    assert "Even more huge" in content
    assert "Menu" not in content


def test_print_tree_node_count_test_2():
    # src/cetd.rs:541-549: debug print = 18 lines = 2 braces + 16 non-root
    dt = DensityTree.from_html(fixture_html("test_2.html"))
    assert dt.node_count() == 17
    assert len(dt.debug_format().splitlines()) == 18


def test_densest_node_test_4():
    # src/cetd.rs:551-567: densest is NodeId(12) = the text node inside
    # the first <p> of articleBody ("Lorem ipsum la la la...")
    dt = DensityTree.from_html(fixture_html("test_4.html"))
    dt.calculate_density_sum()
    densest = int(dt.sorted_nodes()[-1])
    dom_i = int(dt.dom_index[densest])
    assert dt.doc.kind[dom_i] == 1  # text node
    assert dt.doc.text[dom_i].strip().startswith("Lorem ipsum la la la.")


def test_extract_content_test_4_exclusions():
    # script/comment/iframe content excluded (src/markdown.rs:247-268 analogue)
    content = extract_content(fixture_html("test_4.html"))
    assert "myFunction" not in content
    assert "Some comments" not in content
    assert "Sorry your browser" not in content


def test_composite_text_density_edges():
    # src/cetd.rs:798-842
    from dce_spark.core.htmlparse import parse_html

    def density_for(metrics, body):
        dt = DensityTree.from_html("<body></body>")
        dt.char_count = np.array([body[0], metrics[0]], dtype=np.int64)
        dt.tag_count = np.array([body[1], metrics[1]], dtype=np.int64)
        dt.link_char_count = np.array([body[2], metrics[2]], dtype=np.int64)
        dt.link_tag_count = np.array([body[3], metrics[3]], dtype=np.int64)
        dt._calculate_density()
        return float(dt.density[1])

    # (char, tag, link_char, link_tag)
    r = density_for((100, 10, 20, 4), (1000, 300, 200, 100))
    assert math.isfinite(r) and r >= 0.0

    r0 = density_for((0, 10, 20, 4), (1000, 300, 200, 100))
    assert r0 == 0.0

    rz = density_for((100, 1, 0, 0), (1000, 300, 200, 100))
    assert math.isfinite(rz) and rz < 0.0


def test_zero_link_body_gives_inf_density():
    # src/cetd.rs:96+112: lcb is deliberately NOT normalized, so a body
    # with zero link chars divides by zero -> +inf density (IEEE f32
    # semantics, same as Rust). Extraction still terminates with text.
    dt = DensityTree.from_html("<body><p>just text here</p></body>")
    assert math.isinf(float(dt.density[1]))
    dt.calculate_density_sum()
    assert "just text here" in dt.extract_content()


def test_unwrapped_script_fragment_zero_chars():
    # src/cetd.rs:720-766: JS blob in a <span> contributes zero chars
    html = """
        <html><body>
            <article>
                <p>This is the main article text with enough words to be selected by density.</p>
                <p>Another paragraph keeps the article content substantial and readable.</p>
                <span>
                    window.yaContextCb.push(function () {
                        Ya.adfoxCode.createAdaptive({
                            ownerId: 173858,
                            containerId: 'adfox_151179074300466320'
                        });
                        setTimeout(function() {
                            document.querySelector("#adfox_151179074300466320").style.display = "none";
                        }, 1000);
                    });
                </span>
            </article>
        </body></html>
    """
    dt = DensityTree.from_html(html)
    dt.calculate_density_sum()
    doc = dt.doc
    for i in range(dt.node_count()):
        dom_i = int(dt.dom_index[i])
        if doc.kind[dom_i] == 0 and doc.tag[dom_i] == "article":
            assert dt.char_count[i] > 0
        if doc.kind[dom_i] == 0 and doc.tag[dom_i] == "span":
            assert dt.char_count[i] == 0


def test_extract_article_excludes_ticker():
    # src/cetd.rs:667-718 / src/lib.rs:187-222
    html = """<html><body>
        <div class="ticker">
            <a href="/1">Breaking: Aave Labs secures UK license May 29</a>
            <a href="/2">SpaceX perps plunge 45% on Hyperliquid May 29</a>
            <a href="/3">Paxos secures SEC registration May 29</a>
        </div>
        <article>
            <h1>Treasury Secretary reiterates no CBDC commitment</h1>
            <p>U.S. Treasury Secretary Scott Bessent reiterated that the
            current administration will not allow a central bank digital
            currency (CBDC). During a White House press briefing, Bessent
            said CBDCs are clearly off the table and reaffirmed the Donald
            Trump administration's focus on making the U.S. a hub for
            digital assets. Bessent also mentioned that the GENIUS stablecoin
            legislation passed with bipartisan support, and the Clarity Act
            is gaining similar legislative momentum.</p>
        </article>
    </body></html>"""
    text = extract_article(html)
    assert "Scott Bessent" in text
    assert "CBDC" in text
    assert "Aave Labs" not in text
    assert "SpaceX" not in text
    assert "Hyperliquid" not in text


def test_contentless_returns_empty():
    # src/lib.rs:224-234
    html = "<html><body><script>var x = 1;</script></body></html>"
    assert extract_content(html) == ""
    assert extract_article(html) == ""


def test_hidden_variants_excluded():
    # src/utils.rs:557-582
    html = """
        <html><body><article>
            <p>Main article text remains.</p>
            <svg><title>Hidden icon title</title><text>SVG label</text></svg>
            <div hidden>Hidden text</div>
            <div style="display: none">Invisible text</div>
            <div class="sharedaddy">Share this: Facebook</div>
        </article></body></html>
    """
    dt = DensityTree.from_html(html)
    dt.calculate_density_sum()
    densest = int(dt.sorted_nodes()[-1])
    # article-level text (walk to the article container like get_node_text
    # on the article in the reference test)
    article_i = next(
        i for i in range(len(dt.doc)) if dt.doc.tag[i] == "article"
    )
    text = dt._dom_node_text(article_i)
    assert "Main article text remains." in text
    assert "Hidden icon title" not in text
    assert "SVG label" not in text
    assert "Hidden text" not in text
    assert "Invisible text" not in text
    assert "Share this" not in text


def test_iframe_bookmark_excluded():
    # src/utils.rs:584-615
    html = """
        <html><body><article>
            <p>Visible text before.</p>
            <p>
                <iframe loading="lazy" src="https://example.com/embed">
                    <span data-mce-type="bookmark" style="display:inline-block;width:0px;overflow:hidden;line-height:0" class="mce_SELRES_start">﻿</span>
                </iframe>
                Text after the iframe.
            </p>
            <p>A third paragraph.</p>
        </article></body></html>
    """
    dt = DensityTree.from_html(html)
    article_i = next(i for i in range(len(dt.doc)) if dt.doc.tag[i] == "article")
    text = dt._dom_node_text(article_i)
    assert "Visible text before" in text
    assert "Text after the iframe" in text
    assert "A third paragraph" in text
    assert "data-mce-type" not in text
    assert "<span" not in text
    assert "display:inline-block" not in text


def test_toy_article():
    # examples/basic.rs:4-15 shape
    html = """<html><body>
        <nav><a href="/">Home</a> <a href="/about">About</a></nav>
        <article>
            <p>First paragraph of the story with plenty of words inside it.</p>
            <p>Second paragraph continues the narrative with more detail.</p>
        </article>
        <footer>Copyright 2024 Somebody</footer>
    </body></html>"""
    content = extract_content(html)
    assert "First paragraph" in content
    assert "Second paragraph" in content


def test_windows1251_lossy_decode():
    # tests/encoding_test.rs:4-13 + examples/ce_score.rs:36-38: non-UTF-8
    # decodes lossily with U+FFFD, never crashes
    from tests.conftest import fixture_bytes

    raw = fixture_bytes("test_windows1251.html")
    result = extract_page(raw)
    assert result["status"] == "ok"


def test_lorem_and_httpbin_smoke():
    # examples/check.rs:8-17
    for name in ("lorem_ipsum.html", "httpbin_html.html"):
        content = extract_content(fixture_html(name))
        assert content


def test_extract_page_record():
    r = extract_page(fixture_html("test_1.html").encode())
    assert r["status"] == "ok"
    assert r["node_count"] == 55
    assert "Here is article" in r["extracted_text"]
    assert r["primary_script"] == "Latin"
    assert r["content_node_spans"]
    for span in r["content_node_spans"]:
        seg = r["extracted_text"][span["start"] : span["end"]]
        assert seg  # spans index into the extracted text


def test_grapheme_char_counts_unicode_page():
    # "Hello, 世界!" = 10 graphemes (src/unicode.rs:17-22) feeding char_count
    dt = DensityTree.from_html("<body><p>Hello, 世界!</p></body>")
    p_density_idx = next(
        i for i in range(dt.node_count())
        if dt.doc.tag[int(dt.dom_index[i])] == "p"
    )
    assert dt.char_count[p_density_idx] == 10


def test_article_shallow_tree_escapes_body():
    # Reference walk (src/cetd.rs:421-433) runs on the scraper tree: on a
    # shallow page the 5-step parent walk passes <body> into <html>/
    # document, and get_node_text at the document level includes <title>
    # text (scraper keeps head; title is not in the skip set).
    html = (
        "<html><head><title>Page Title</title></head>"
        "<body><p>Shallow body paragraph with plenty of article text"
        " to anchor the density walk.</p></body></html>"
    )
    dt = DensityTree.from_html(html)
    dt.calculate_density_sum()
    article = dt.extract_article()
    assert article.startswith("Page Title ")
    assert "Shallow body paragraph" in article


def test_article_deep_tree_stays_in_container():
    # With a container within 5 steps the walk anchors there and the
    # title must NOT leak into the article text.
    html = (
        "<html><head><title>Page Title</title></head>"
        "<body><div><article><p>Deep paragraph with plenty of article"
        " text to anchor the density walk.</p></article></div></body></html>"
    )
    dt = DensityTree.from_html(html)
    dt.calculate_density_sum()
    article = dt.extract_article()
    assert "Page Title" not in article
    assert "Deep paragraph" in article


def test_committed_goldens_in_sync_with_engine():
    # The committed golden parquet (driver oracle for the cetd_* queries)
    # must track the live engine: spot-check a third of the rows via the
    # scalar path. If this fails after a deliberate semantics change,
    # re-run tools/make_cetd_goldens.py and review the diff.
    import hashlib
    from pathlib import Path

    import pyarrow.parquet as pq

    from dce_spark.core.api import extract_page
    from dce_spark.spark.corpus import fixture_rows, synth_page

    repo = Path(__file__).resolve().parent.parent
    golden = {
        r["url"]: r
        for r in pq.read_table(
            repo / "testdata" / "golden_cetd_content.parquet"
        ).to_pylist()
    }
    rows = fixture_rows() + [synth_page(i) for i in range(32)]
    assert set(golden) == {r["url"] for r in rows}
    for row in rows[::3]:
        rec = extract_page(row["html"], mode="both")
        g = golden[row["url"]]
        assert g["status"] == rec["status"], row["url"]
        assert g["node_count"] == rec["node_count"], row["url"]
        assert g["text_len"] == len(rec["extracted_text"]), row["url"]
        assert g["text_md5"] == hashlib.md5(
            rec["extracted_text"].encode()
        ).hexdigest(), row["url"]

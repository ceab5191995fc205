"""Real-page regression corpus (reference html/pages.zip).

Mirrors tests/e2e_leaks.rs and tests/e2e_article.rs on the plain-text
path: output non-empty, sanity substring present, no leak signatures,
ticker excluded in article mode.
"""

import pytest

from dce_spark.core.api import extract_article, extract_content, extract_page

# tests/e2e_leaks.rs:23-36
FORBIDDEN = [
    "data:image/",
    "<span",
    "<img",
    "<svg",
    "<script",
    "<style",
    "<iframe",
    "&lt;img",
    "&lt;span",
    "data-mce-type",
    "acf-media-credit",
    "acf-credit",
]

SANITY = {
    "theblock.co-post-402903-grayscale-hyperliquid-etf.html": "Grayscale",
    "bitcoinmagazine.com-news-cosmos-health-cosm-buys-600k-bitcoin.html": "Cosmos Health",
    "cryptoslate.com-solana-public-attack-on-starknet.html": "Starknet",
    "decrypt.co-369195-openai-foundation-pledges-250-million.html": "OpenAI",
}


def test_all_pages_extract_non_empty(pages):
    for name, raw in pages.items():
        r = extract_page(raw)
        assert r["status"] == "ok", name
        assert r["extracted_text"].strip(), f"{name}: empty extraction"
        assert r["node_count"] > 100, name


def test_sanity_substrings_and_no_leaks(pages):
    for name, expected in SANITY.items():
        content = extract_content(pages[name])
        assert expected in content, f"{name}: missing {expected!r}"
        for pat in FORBIDDEN:
            assert pat not in content, f"{name}: leak {pat!r}"


def test_article_mode_excludes_ticker(pages):
    # tests/e2e_article.rs:27-64
    name = "theblock.co-post-402971-scott-bessent-reiterates-no-cbdc.html"
    article = extract_article(pages[name])
    assert article.strip()
    assert "Scott Bessent" in article
    assert "CBDC" in article
    assert "Latest Crypto News" not in article
    assert "Securitize becomes first to debut shares on NYSE" not in article


def test_no_leaks_any_page_any_mode(pages):
    for name, raw in pages.items():
        r = extract_page(raw)
        for pat in FORBIDDEN:
            assert pat not in r["extracted_text"], (name, pat)
            assert pat not in r["article_text"], (name, pat)


@pytest.mark.parametrize("name", ["sas-bankruptcy-protection.html"])
def test_sas_page_structure(pages, name):
    # benches/simple.rs:68-122 golden values predate skip-list growth
    # (CHANGELOG.md:48-51) and are stale; assert the structural facts that
    # still hold: a substantial tree and a non-empty densest-node text.
    from dce_spark.core.cetd import DensityTree
    from dce_spark.core.api import decode_html

    dt = DensityTree.from_html(decode_html(pages[name]))
    dt.calculate_density_sum()
    assert dt.node_count() > 500
    densest = int(dt.sorted_nodes()[-1])
    assert dt.node_text(densest)
    assert float(dt.density[densest]) > 50.0


def test_check_pages_example_no_leaks():
    """examples/check_pages.py --assert-leaks mirrors e2e_leaks.rs."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [sys.executable, "examples/check_pages.py", "--assert-leaks"],
        capture_output=True,
        cwd=repo,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-500:]

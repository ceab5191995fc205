"""Synthetic corpus determinism: same seed -> byte-identical rows,
independent of partitioning/parallelism (resume and reproducibility
depend on this)."""

import pytest

from dce_spark.spark.corpus import fixture_rows, synth_page

pytestmark = pytest.mark.spark


def test_synth_page_deterministic():
    a = synth_page(123)
    b = synth_page(123)
    assert a == b
    assert a["html"] == b["html"]
    assert synth_page(124)["html"] != a["html"]


def test_synth_page_seed_sensitivity():
    assert synth_page(5, seed=42) != synth_page(5, seed=43)


def test_hot_domain_share():
    hosts = [synth_page(i)["url"].split("/")[2] for i in range(500)]
    hot = sum(1 for h in hosts if h == "hotnews.example.com")
    assert 0.12 < hot / 500 < 0.30  # ~20% by construction


def test_size_distribution_spread():
    sizes = [len(synth_page(i)["html"]) for i in range(300)]
    assert min(sizes) > 1_000
    assert max(sizes) > 100_000  # log-normal tail exists
    med = sorted(sizes)[len(sizes) // 2]
    assert 10_000 < med < 150_000


def test_distributed_generation_matches_local(spark):
    from dce_spark.spark.corpus import build_pages_df

    df = build_pages_df(spark, n_synthetic=20, include_fixtures=False,
                        partitions=5)
    rows = {r.url: bytes(r.html) for r in df.collect()}
    for i in range(20):
        local = synth_page(i)
        assert rows[local["url"]] == local["html"], i


def test_fixture_rows_cover_degenerates():
    urls = {r["url"] for r in fixture_rows(include_reference=False)}
    assert "https://fixtures.test/contentless" in urls
    assert "https://fixtures.test/malformed_empty" in urls
    assert "https://fixtures.test/unicode_mixed" in urls

"""jobs/curate_job.py: the spark-submit curation CLI, smoke-driven as
a subprocess (own SparkSession, real parquet sink)."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.spark


def test_curate_job_cli_strict(tmp_path):
    repo = Path(__file__).resolve().parent.parent
    out_dir = tmp_path / "shards"
    r = subprocess.run(
        [
            sys.executable, "jobs/curate_job.py",
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", str(out_dir),
            "--strict",
        ],
        capture_output=True,
        cwd=repo,
        timeout=600,
        text=True,
    )
    assert r.returncode == 0, r.stderr[-800:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["docs_in"] == 500
    # strict run at sf0.001 keeps the 151 survivors the oracle pins
    assert stats["docs_out"] == 151
    assert stats["strict"] is True and stats["tokens_out"] > 0
    # sink is partitioned by shard id
    assert any(p.name.startswith("shard=") for p in out_dir.iterdir())


def test_curate_job_cli_url_layer(tmp_path):
    """URL hygiene flags end-to-end: a blocklisted host drops its
    docs before any text gate; the stats line reports the layer."""
    import pandas as pd

    repo = Path(__file__).resolve().parent.parent
    # every even doc_id on a blocklisted host, odds on a clean one
    pd.DataFrame({
        "doc_id": range(500),
        "url": [
            f"https://{'spam.bad' if i % 2 == 0 else 'ok.net'}/p/{i}"
            for i in range(500)
        ],
        "ts": [i % 17 for i in range(500)],
    }).to_parquet(tmp_path / "urls.parquet")
    pd.DataFrame({"host": ["spam.bad"]}).to_parquet(
        tmp_path / "bl.parquet"
    )
    out_dir = tmp_path / "shards"
    r = subprocess.run(
        [
            sys.executable, "jobs/curate_job.py",
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", str(out_dir),
            "--urls", str(tmp_path / "urls.parquet"),
            "--blocklist", str(tmp_path / "bl.parquet"),
        ],
        capture_output=True, cwd=repo, timeout=600, text=True,
    )
    assert r.returncode == 0, r.stderr[-800:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["url_layer"] is True
    assert stats["docs_in"] == 500
    # only odd doc_ids can survive; the plain pipeline at sf0.001
    # keeps 200 docs, so the url gate must land strictly below that
    assert 0 < stats["docs_out"] < 200


def test_curate_job_url_flags_require_urls(tmp_path):
    repo = Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [
            sys.executable, "jobs/curate_job.py",
            "--input", "x", "--output", "y", "--latest-only",
        ],
        capture_output=True, cwd=repo, timeout=120, text=True,
    )
    assert r.returncode != 0
    assert "require --urls" in r.stderr


def test_curate_job_empty_output_reports_zero(tmp_path):
    """A gate that removes everything must still print stats with
    docs_out=0, not crash on the empty-sink read."""
    repo = Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [
            sys.executable, "jobs/curate_job.py",
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--output", str(tmp_path / "empty"),
            "--min-tokens", "100000",
        ],
        capture_output=True, cwd=repo, timeout=600, text=True,
    )
    assert r.returncode == 0, r.stderr[-800:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["docs_out"] == 0 and stats["tokens_out"] == 0

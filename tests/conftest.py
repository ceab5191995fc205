from __future__ import annotations

import os
import sys
import zipfile
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

REFERENCE_HTML = Path("/root/reference/html")
PAGES_ZIP = REFERENCE_HTML / "pages.zip"


def fixture_html(name: str) -> str:
    return (REFERENCE_HTML / name).read_text(encoding="utf-8")


def fixture_bytes(name: str) -> bytes:
    return (REFERENCE_HTML / name).read_bytes()


@pytest.fixture(scope="session")
def pages() -> dict[str, bytes]:
    """Real-page regression corpus from the reference's pages.zip
    (macOS resource-fork entries excluded)."""
    if not PAGES_ZIP.exists():
        pytest.skip("reference pages.zip not available")
    out = {}
    with zipfile.ZipFile(PAGES_ZIP) as zf:
        for n in zf.namelist():
            if n.endswith(".html") and "/._" not in n:
                out[n.rsplit("/", 1)[-1]] = zf.read(n)
    return out


@pytest.fixture(scope="session")
def spark():
    """local Spark session for tier-2 tests."""
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("dce-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()

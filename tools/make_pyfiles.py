"""Build the --py-files artifact for spark-submit cluster runs.

    python tools/make_pyfiles.py [out.zip]

Produces a zip of the dce_spark package (sources only) that executors
unpack onto their PYTHONPATH:

    spark-submit --py-files dce_spark.zip jobs/extract_job.py ...
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build(out: str) -> None:
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for f in sorted((REPO / "dce_spark").rglob("*.py")):
            zf.write(f, f.relative_to(REPO))
    print(f"wrote {out}")


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else "dce_spark.zip")

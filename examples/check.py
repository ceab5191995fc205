#!/usr/bin/env python3
"""Mirror of the reference's examples/check.rs: run extraction over the
reference fixture files (if available) and print a summary."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dce_spark import extract_page

FIXTURES = Path("/root/reference/html")

if __name__ == "__main__":
    target = Path(sys.argv[1]) if len(sys.argv) > 1 else FIXTURES
    files = [target] if target.is_file() else sorted(target.glob("*.html"))
    for f in files:
        rec = extract_page(f.read_bytes())
        print(f"{f.name:28s} nodes={rec['node_count']:5d} "
              f"status={rec['status']:4s} "
              f"text={len(rec['extracted_text'])}B")
        print("  ", rec["extracted_text"][:100])

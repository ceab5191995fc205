#!/usr/bin/env python3
"""Mirror of the reference's examples/check_pages.rs
(/root/reference/examples/check_pages.rs:20-55): run extraction on every
page in ``html/pages.zip`` and print the output, for manual inspection
of real-world behavior.

Usage:
  python examples/check_pages.py               # text (default)
  python examples/check_pages.py --article     # ticker-clean article text
  python examples/check_pages.py --markdown    # markdown conversion

With ``--assert-leaks`` it additionally checks the FORBIDDEN leak list
from the reference's tests/e2e_leaks.rs:23-36 over the markdown output
and exits non-zero on any hit (automated-regression mode).
"""

import sys
import zipfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dce_spark import extract_page, get_article, get_content

PAGES_ZIP = Path("/root/reference/html/pages.zip")

# tests/e2e_leaks.rs:23-36 — substrings that must never appear in
# extracted markdown output.
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


def main(argv: list[str]) -> int:
    markdown_mode = "--markdown" in argv or "-m" in argv
    article_mode = "--article" in argv or "-a" in argv
    assert_leaks = "--assert-leaks" in argv

    if not PAGES_ZIP.exists():
        print(f"{PAGES_ZIP} not found", file=sys.stderr)
        return 1

    leaks: list[tuple[str, str]] = []
    with zipfile.ZipFile(PAGES_ZIP) as zf:
        names = [
            n
            for n in zf.namelist()
            if n.startswith("pages/")
            and n.endswith(".html")
            and "/._" not in n  # macOS resource forks
        ]
        for name in names:
            raw = zf.read(name)
            kb = len(raw) // 1024
            print(f"\n===== {name} ({kb} KB) =====")
            if markdown_mode:
                out = extract_page(raw, mode="markdown")["extracted_md"] or ""
            elif article_mode:
                out = get_article(raw)
            else:
                out = get_content(raw)
            print(out)
            if assert_leaks:
                # the leak scan always reads the markdown rendering
                # (attribute junk leaks there), independent of which
                # output the user asked to SEE
                md = out if markdown_mode else (
                    extract_page(raw, mode="markdown")["extracted_md"] or ""
                )
                for pat in FORBIDDEN:
                    if pat in md:
                        leaks.append((name, pat))

    if leaks:
        print("\nLEAKS FOUND:", file=sys.stderr)
        for name, pat in leaks:
            print(f"  {name}: {pat!r}", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))

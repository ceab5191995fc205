#!/usr/bin/env python3
"""Mirror of the reference's examples/basic.rs: extract main content
from a toy page with nav/article/footer."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dce_spark import get_content

HTML = """
<html><body>
    <nav><a href="/">Home</a> <a href="/about">About</a></nav>
    <article>
        <p>First paragraph of the story with plenty of words inside it.</p>
        <p>Second paragraph continues the narrative with more detail.</p>
    </article>
    <footer>Copyright 2026 Somebody</footer>
</body></html>
"""

if __name__ == "__main__":
    print(get_content(HTML))

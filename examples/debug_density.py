#!/usr/bin/env python3
"""Density-tree debug printer — the reference's examples/debug_density.rs:
parse a page, print the DensityTree Debug format plus the selected
content block and thresholds.

Usage: python examples/debug_density.py <file.html>
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dce_spark.core.api import decode_html  # noqa: E402
from dce_spark.core.cetd import DensityTree  # noqa: E402


def main() -> None:
    if len(sys.argv) != 2:
        print(__doc__)
        raise SystemExit(2)
    raw = Path(sys.argv[1]).read_bytes()
    dtree = DensityTree.from_html(decode_html(raw))
    dtree.calculate_density_sum()
    print(dtree.debug_format())
    max_idx = dtree.get_max_density_sum_node()
    print(f"\nmax density_sum node: density_idx={max_idx} "
          f"dom_idx={int(dtree.dom_index[max_idx])} "
          f"density_sum={float(dtree.density_sum[max_idx]):.5g}")
    selected = dtree.content_node_indices()
    print(f"selected block: {len(selected)} nodes "
          f"[{selected[0] if len(selected) else '-'}"
          f"..{selected[-1] if len(selected) else '-'}]")
    text = dtree.extract_content()
    print(f"\nextracted ({len(text)} chars):\n{text[:400]}")


if __name__ == "__main__":
    main()

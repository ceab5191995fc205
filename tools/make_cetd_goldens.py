"""Generate the committed golden tables for the 4 cetd_* queries.

The CETD engine is not SQL-expressible, so the driver's DuckDB oracle
for those queries SELECTs from golden parquet committed in testdata/.
This tool produces them from the TIER-1 SCALAR path (dce_spark.core.api,
no Spark involved) over the deterministic corpus (seed 42) — the same
row sets the Spark queries in __spark_entry__.py compute distributed.
The scalar path itself is locked to the reference's own assertions by
tests/ (55 nodes + 186 graphemes on test_1, NodeId(12) on test_4,
pages.zip leak lists), so a Spark-side regression OR an engine-semantics
regression trips the oracle hash.

Run after any deliberate extraction-semantics change, then review the
diff of REPORT lines before committing:

    python tools/make_cetd_goldens.py
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dce_spark.core.api import extract_page  # noqa: E402
from dce_spark.spark.corpus import fixture_rows, synth_page  # noqa: E402

OUT_DIR = Path(__file__).resolve().parent.parent / "testdata"

# Must mirror the corpus sizes used by the queries in __spark_entry__.py.
N_SYNTH_CONTENT = 32  # cetd_extract_content / cetd_extract_article
N_SYNTH_MD = 16  # cetd_extract_markdown
N_SYNTH_EVAL = 24  # cetd_eval_scores
EVAL_MAX_LEN = 8000  # eval keeps extracted texts with 0 < len < 8000


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def corpus(n_synth: int) -> list[dict]:
    return fixture_rows() + [synth_page(i) for i in range(n_synth)]


def build_content_and_article() -> tuple[pa.Table, pa.Table]:
    content, article = [], []
    for row in corpus(N_SYNTH_CONTENT):
        rec = extract_page(row["html"], mode="both")
        content.append(
            {
                "url": row["url"],
                "status": rec["status"],
                "node_count": rec["node_count"],
                "primary_script": detect_script_content(rec),
                "text_len": len(rec["extracted_text"]),
                "text_md5": _md5(rec["extracted_text"]),
            }
        )
        article.append(
            {
                "url": row["url"],
                "status": rec["status"],
                "node_count": rec["node_count"],
                "article_len": len(rec["article_text"]),
                "article_md5": _md5(rec["article_text"]),
            }
        )
    return pa.Table.from_pylist(content), pa.Table.from_pylist(article)


def detect_script_content(rec: dict) -> str:
    # mode="both" sets primary_script from the CONTENT text, matching
    # the pipeline's default extraction record
    return rec["primary_script"]


def build_markdown() -> pa.Table:
    rows = []
    for row in corpus(N_SYNTH_MD):
        rec = extract_page(row["html"], mode="all")
        md = rec["extracted_md"]
        rows.append(
            {
                "url": row["url"],
                "status": rec["status"],
                # F.length(NULL) is NULL; md5(coalesce(md, '')) on NULL
                "md_len": None if md is None else len(md),
                "md_md5": _md5(md if md is not None else ""),
            }
        )
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("status", pa.string()),
            ("md_len", pa.int64()),
            ("md_md5", pa.string()),
        ]
    )
    return pa.Table.from_pylist(rows, schema=schema)


def build_links() -> pa.Table:
    """get_node_links of the selected content node, per url — the
    power-user link surface (reference src/lib.rs:49-65 +
    utils.rs:407-421) exposed through the driver gate. links_md5 is an
    ORDER-SENSITIVE hash of the doc-order hrefs (newline-joined), so
    any change to link enumeration order trips the oracle."""
    rows = []
    for row in corpus(N_SYNTH_CONTENT):
        rec = extract_page(row["html"], mode="content")
        links = rec.get("content_links") or []
        rows.append(
            {
                "url": row["url"],
                "status": rec["status"],
                "n_links": len(links),
                "links_md5": _md5("\n".join(links)),
            }
        )
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("status", pa.string()),
            ("n_links", pa.int64()),
            ("links_md5", pa.string()),
        ]
    )
    return pa.Table.from_pylist(rows, schema=schema)


def build_eval_gold() -> pa.Table:
    """Committed gold texts (CleanEval file format: URL line + content).

    A COMMITTED SNAPSHOT of the scalar path's extraction. Snapshotting
    breaks the round-1 circularity: the live query re-extracts and
    scores against this frozen gold, so any extraction regression moves
    the means and trips the oracle. Fixture entries carry
    reference-asserted texts (test_1's densest-node golden etc.) via
    the locked scalar path.
    """
    gold_rows = []
    for row in corpus(N_SYNTH_EVAL):
        rec = extract_page(row["html"], mode="content")
        text = rec["extracted_text"]
        if not (0 < len(text) < EVAL_MAX_LEN):
            continue
        gold_rows.append(
            {"stem": row["url"], "gold_text": "http://gold.url/line\n" + text}
        )
    # realistic template corpus: gold is the GENERATOR's content model,
    # independent of the extractor (non-circular measurement; see
    # dce_spark/spark/evalcorpus.py)
    from dce_spark.spark.evalcorpus import eval_rows

    for row in eval_rows(144):
        gold_rows.append({"stem": row["url"], "gold_text": row["gold_text"]})
    return pa.Table.from_pylist(gold_rows)


def snapshot_eval_scores() -> None:
    """Run the ACTUAL Spark eval query once and freeze its result.

    The query aggregates decimal(18,9)-cast scores, so the result is
    order-independent — re-running under any parallelism reproduces it
    bit-for-bit while extraction semantics are unchanged.
    """
    import __spark_entry__ as entrymod
    from dce_spark.spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    df = entrymod.queries()["cetd_eval_scores"](spark, "")
    rows = [r.asDict() for r in df.collect()]
    spark.stop()
    pq.write_table(
        pa.Table.from_pylist(rows), OUT_DIR / "golden_eval_scores.parquet"
    )
    print("REPORT golden_eval_scores:", rows[0])


def main() -> None:
    OUT_DIR.mkdir(exist_ok=True)
    content, article = build_content_and_article()
    md = build_markdown()
    gold = build_eval_gold()
    for name, table in (
        ("golden_cetd_content", content),
        ("golden_cetd_article", article),
        ("golden_cetd_markdown", md),
        ("golden_cetd_links", build_links()),
        ("eval_gold", gold),
    ):
        pq.write_table(table, OUT_DIR / f"{name}.parquet")
        print(f"REPORT {name}: {table.num_rows} rows")
    snapshot_eval_scores()


if __name__ == "__main__":
    main()

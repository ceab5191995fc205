"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship CETD extraction over the deterministic pages
corpus (fixtures + seeded synthetic rows, seed 42).

`queries()` — one entry per implemented operator family:
  * cetd_* : the extraction engine itself (per-row map; not
    SQL-expressible, driver records rows-only checks; byte-level
    correctness is locked by tests/ against the reference's goldens);
  * doc_*  : dedup / text-analysis operators over `documents`;
  * emb_*  : similarity search over `embeddings`;
  * events_*: window/sessionization analogues of the selection ops;
  * tpch_* : join/aggregation parity on the TPC-H-ish tables.

`oracle_sql()` — DuckDB-dialect equivalents. Aggregates use
decimal-cast sums (exact across engines); cosines are rounded to 6
decimals to absorb summation-order ULPs.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the dce_spark package lives next to this file; make imports work no
# matter which cwd the driver loads us from
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Extraction over the deterministic pages corpus at tiny scale."""
    from dce_spark.spark.corpus import build_pages_df
    from dce_spark.spark.pipeline import extract_pages

    pages = build_pages_df(spark, n_synthetic=32, include_fixtures=True)
    out = extract_pages(pages, num_partitions=4, salt_factor=2)
    return out.select(
        "url", "status", "node_count", "primary_script",
        F.length("extracted_text").alias("text_len"),
        F.md5(F.coalesce(F.col("extracted_text"), F.lit(""))).alias("text_md5"),
    )


# ---------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------


def _q_cetd_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    return entry(spark)


def _q_cetd_article(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dce_spark.spark.corpus import build_pages_df
    from dce_spark.spark.pipeline import extract_pages

    pages = build_pages_df(spark, n_synthetic=32, include_fixtures=True)
    out = extract_pages(pages, mode="article", num_partitions=4, salt_factor=2)
    return out.select(
        "url", "status", "node_count",
        F.length("article_text").alias("article_len"),
        F.md5(F.coalesce(F.col("article_text"), F.lit(""))).alias("article_md5"),
    )


def _q_cetd_markdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dce_spark.spark.corpus import build_pages_df
    from dce_spark.spark.pipeline import extract_pages

    pages = build_pages_df(spark, n_synthetic=16, include_fixtures=True)
    out = extract_pages(pages, mode="all", num_partitions=4, salt_factor=2)
    return out.select(
        "url", "status",
        F.length("extracted_md").alias("md_len"),
        F.md5(F.coalesce(F.col("extracted_md"), F.lit(""))).alias("md_md5"),
    )


def _q_cetd_eval_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CleanEval-style scoring pipeline (reference examples/ce_score.rs):
    extraction vs a synthetic gold table built from the same corpus —
    scores must be ~perfect by construction, evidencing the whole
    join -> applyInPandas -> agg pipeline."""
    from dce_spark.spark.corpus import build_pages_df
    from dce_spark.spark.evaljob import mean_scores, score_pairs
    from dce_spark.spark.pipeline import extract_pages

    pages = build_pages_df(spark, n_synthetic=24, include_fixtures=True)
    extracted = (
        extract_pages(pages, mode="content", num_partitions=4)
        .select(F.col("url").alias("stem"), "extracted_text")
        # score CleanEval-sized documents (the reference's corpus is a
        # few KB per file); word-LCS is O(m*n) per pair by design
        .filter(
            (F.length("extracted_text") > 0)
            & (F.length("extracted_text") < 8000)
        )
    )
    gold = extracted.select(
        "stem",
        F.concat(F.lit("http://gold.url/line\n"), F.col("extracted_text")).alias(
            "gold_text"
        ),
    )
    scores = score_pairs(extracted, gold)
    return mean_scores(scores).select(
        "files",
        F.round("avg_precision", 2).alias("avg_precision_r"),
        F.round("avg_recall", 2).alias("avg_recall_r"),
        F.round("avg_f1", 2).alias("avg_f1_r"),
        F.round("avg_dice", 2).alias("avg_dice_r"),
    )


def _q_doc_exact_dedup(spark, sf_dir):
    from dce_spark.functions.textops import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "documents"))


def _q_doc_token_count(spark, sf_dir):
    from dce_spark.functions.textops import token_count

    return token_count(_t(spark, sf_dir, "documents"))


def _q_doc_token_count_bpe(spark, sf_dir):
    from dce_spark.functions.textops import token_count_bpe

    return token_count_bpe(_t(spark, sf_dir, "documents"))


def _q_doc_quality(spark, sf_dir):
    from dce_spark.functions.textops import quality_score

    return quality_score(_t(spark, sf_dir, "documents"))


def _q_doc_lang_distribution(spark, sf_dir):
    from dce_spark.functions.textops import lang_distribution

    return lang_distribution(_t(spark, sf_dir, "documents"))


def _q_doc_fingerprint(spark, sf_dir):
    from dce_spark.functions.textops import fingerprint

    return fingerprint(_t(spark, sf_dir, "documents"))


def _q_doc_lang_id(spark, sf_dir):
    from dce_spark.functions.textops import lang_id

    return lang_id(_t(spark, sf_dir, "documents"))


def _q_doc_ngram_jaccard(spark, sf_dir):
    from dce_spark.functions.textops import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), k=3, threshold=0.1)


def _q_doc_minhash_bands(spark, sf_dir):
    from dce_spark.functions.textops import minhash_bands

    return minhash_bands(_t(spark, sf_dir, "documents"))


def _q_doc_minhash_dedup(spark, sf_dir):
    from dce_spark.functions.textops import minhash_dedup

    return minhash_dedup(_t(spark, sf_dir, "documents"))


def _q_doc_simhash(spark, sf_dir):
    from dce_spark.functions.textops import simhash64

    return simhash64(_t(spark, sf_dir, "documents"))


def _q_emb_cosine_threshold(spark, sf_dir):
    from dce_spark.functions.simsearch import cosine_pairs_threshold

    return cosine_pairs_threshold(
        _t(spark, sf_dir, "embeddings"), n_queries=10, threshold=0.25
    )


def _q_emb_brute_topk(spark, sf_dir):
    from dce_spark.functions.simsearch import brute_force_topk

    return brute_force_topk(_t(spark, sf_dir, "embeddings"), n_queries=10, k=5)


def _q_emb_lsh_topk(spark, sf_dir):
    from dce_spark.functions.simsearch import lsh_topk

    return lsh_topk(_t(spark, sf_dir, "embeddings"), n_queries=10, k=5)


def _q_events_sessionize(spark, sf_dir):
    from pyspark.sql.window import Window

    # ts is TIMESTAMP_NTZ in the parquet; interpret as UTC instants
    # (session tz pinned to UTC) so epoch micros match DuckDB's epoch_us.
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = e.withColumn(
        "new_s",
        F.when(
            F.col("ts_us") - F.lag("ts_us").over(w) > 1_800_000_000, 1
        ).otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_session = flagged.groupBy("user_id", "session_id").agg(
        F.count("*").alias("events_in_session")
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").cast("long").alias("session_cnt"),
        F.max("events_in_session").cast("long").alias("max_session_events"),
    ).select(F.col("user_id").cast("long").alias("user_id"),
             "session_cnt", "max_session_events")


def _q_events_json_props(spark, sf_dir):
    """Semi-structured parsing: extract a JSON field from the props
    column and aggregate — the crawl-metadata (WARC headers, page
    metadata) handling pattern."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("events"),
            F.sum("k").cast("long").alias("k_sum"),
            F.min("k").cast("long").alias("k_min"),
            F.max("k").cast("long").alias("k_max"),
        )
    )


def _q_events_last_max(spark, sf_dir):
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("value").alias("max_value"),
            F.col("event_id").cast("long").alias("last_event_id"),
        )
    )


def _q_tpch_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    d = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(d("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(d("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.count("*").cast("long").alias("count_order"),
            (
                F.sum(d("l_quantity")).cast("double")
                / F.count("*").cast("double")
            ).alias("avg_qty"),
        )
    )


def _q_tpch_revenue_by_nation(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("orders_cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cetd_extract_content": _q_cetd_content,
        "cetd_extract_article": _q_cetd_article,
        "cetd_extract_markdown": _q_cetd_markdown,
        "cetd_eval_scores": _q_cetd_eval_scores,
        "doc_exact_dedup": _q_doc_exact_dedup,
        "doc_token_count": _q_doc_token_count,
        "doc_token_count_bpe": _q_doc_token_count_bpe,
        "doc_quality_score": _q_doc_quality,
        "doc_lang_distribution": _q_doc_lang_distribution,
        "doc_fingerprint": _q_doc_fingerprint,
        "doc_lang_id": _q_doc_lang_id,
        "doc_ngram_jaccard": _q_doc_ngram_jaccard,
        "doc_minhash_bands": _q_doc_minhash_bands,
        "doc_minhash_dedup": _q_doc_minhash_dedup,
        "doc_simhash": _q_doc_simhash,
        "emb_cosine_threshold": _q_emb_cosine_threshold,
        "emb_brute_topk": _q_emb_brute_topk,
        "emb_lsh_topk": _q_emb_lsh_topk,
        "events_sessionize": _q_events_sessionize,
        "events_json_props": _q_events_json_props,
        "events_last_max": _q_events_last_max,
        "tpch_pricing_summary": _q_tpch_pricing_summary,
        "tpch_revenue_by_nation": _q_tpch_revenue_by_nation,
    }


# ---------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------

_STOP = "('the','and','of','to','a','in','is','it','for','on')"

_SHINGLES_CTE = """
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents
), sh AS (
  SELECT DISTINCT doc_id, source,
         array_to_string(tk[i:i+2], ' ') AS shingle
  FROM toks, UNNEST(CASE WHEN len(tk) >= 3
                         THEN range(1, len(tk) - 1)
                         ELSE [] END) AS u(i)
)
"""


def _cosine_sql(q_filter: str, c_filter: str, extra_q: str = "", extra_c: str = "",
                join_cond: str = "") -> str:
    return f"""
        WITH q AS (
          SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q{extra_q}
          FROM embeddings WHERE {q_filter}
        ), c AS (
          SELECT vec_id AS cand_id, CAST(embedding AS DOUBLE[]) AS c{extra_c}
          FROM embeddings WHERE {c_filter}
        ), scored AS (
          SELECT query_id, cand_id,
                 round(list_dot_product(q.q, c.c)
                   / (sqrt(list_dot_product(q.q, q.q))
                      * sqrt(list_dot_product(c.c, c.c))), 6) AS cosine_r
          FROM c JOIN q ON {join_cond or 'true'}
        )
        SELECT CAST(query_id AS BIGINT) AS query_id,
               CAST(cand_id AS BIGINT) AS cand_id,
               CAST(rn AS BIGINT) AS rank, cosine_r
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine_r DESC, cand_id) AS rn FROM scored)
        WHERE rn <= 5
    """


def _lsh_bucket_sql_expr(col: str, n_planes: int = 6, dim: int = 64) -> str:
    """DuckDB expression computing the same deterministic integer-
    hyperplane bucket as simsearch.lsh_bucket_col."""
    from dce_spark.functions.simsearch import _hyperplane_weights

    planes = _hyperplane_weights(n_planes, dim)
    bits = []
    for p, w in enumerate(planes):
        lst = "[" + ", ".join(f"{x:.1f}" for x in w) + "]"
        bits.append(
            f"(CASE WHEN list_dot_product({col}, {lst}) >= 0"
            f" THEN {1 << p} ELSE 0 END)"
        )
    return "(" + " + ".join(bits) + ")"


def _simhash_sql() -> str:
    """DuckDB mirror of textops.simhash64 (md5-hex-digit bits)."""
    digit_cols = ",\n                ".join(
        f"instr('0123456789abcdef', substr(hx, {k + 1}, 1)) - 1 AS d{k}"
        for k in range(16)
    )
    bit_sums = ",\n                ".join(
        f"sum(CASE WHEN (d{b // 4} & {1 << (b % 4)}) != 0 THEN 1 ELSE -1 END)"
        f" AS b{b}"
        for b in range(64)
    )
    fold_terms = []
    for b in range(64):
        if b == 63:
            fold_terms.append(
                f"(CASE WHEN b63 > 0 THEN CAST(-9223372036854775808 AS BIGINT)"
                f" ELSE 0 END)"
            )
        else:
            fold_terms.append(
                f"(CASE WHEN b{b} > 0 THEN (CAST(1 AS BIGINT) << {b})"
                f" ELSE 0 END)"
            )
    fold = " + ".join(fold_terms)
    return f"""
        WITH toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        ), h AS (
          SELECT doc_id, md5(tok) AS hx FROM toks
        ), d AS (
          SELECT doc_id,
                {digit_cols}
          FROM h
        ), s AS (
          SELECT doc_id,
                {bit_sums}
          FROM d GROUP BY doc_id
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST({fold} AS BIGINT) AS simhash
        FROM s
    """


def oracle_sql() -> dict[str, str]:
    return {
        "doc_exact_dedup": """
            SELECT CAST(min(doc_id) AS BIGINT) AS keep_id,
                   CAST(count(*) AS BIGINT) AS dup_count
            FROM documents GROUP BY text
        """,
        "doc_token_count": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS token_count
            FROM documents
        """,
        "doc_token_count_bpe": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(len(regexp_extract_all(text,
                        '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT)
                     AS bpe_token_count
            FROM documents
        """,
        "doc_quality_score": """
            WITH t AS (
              SELECT doc_id, length(text) AS n_chars,
                     string_split(text, ' ') AS tk
              FROM documents
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(n_chars AS BIGINT) AS n_chars,
                   CAST(len(tk) AS BIGINT) AS n_tokens,
                   CAST(n_chars AS DOUBLE) / CAST(len(tk) AS DOUBLE)
                     AS avg_token_len,
                   CAST(len(list_filter(tk, x -> x IN %s)) AS DOUBLE)
                     / CAST(len(tk) AS DOUBLE) AS stopword_ratio
            FROM t
        """ % _STOP,
        "doc_lang_distribution": """
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS doc_count,
                   CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                     AS avg_chars
            FROM documents GROUP BY lang
        """,
        "doc_fingerprint": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   md5(lower(regexp_replace(text, '\\s+', ' ', 'g')))
                     AS fingerprint
            FROM documents
        """,
        "doc_lang_id": """
            WITH t AS (
              SELECT doc_id, string_split(text, ' ') AS tk FROM documents
            ), s AS (
              SELECT doc_id,
                len(list_filter(tk, x -> x IN ('the','and','of','to','in','is'))) AS en,
                len(list_filter(tk, x -> x IN ('el','la','de','que','y','los'))) AS es,
                len(list_filter(tk, x -> x IN ('der','die','und','das','ist','von'))) AS de,
                len(list_filter(tk, x -> x IN ('le','la','et','les','des','est'))) AS fr
              FROM t
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CASE WHEN en >= es AND en >= de AND en >= fr THEN 'en'
                        WHEN es >= de AND es >= fr THEN 'es'
                        WHEN de >= fr THEN 'de'
                        ELSE 'fr' END AS pred_lang
            FROM s
        """,
        "doc_ngram_jaccard": _SHINGLES_CTE + """
            , sizes AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
              FROM sh GROUP BY doc_id
            ), rare AS (
              -- df-cap mirror of textops.ngram_jaccard_pairs(max_df=64)
              SELECT sh.* FROM sh
              JOIN (SELECT source, shingle FROM sh
                    GROUP BY source, shingle HAVING count(*) <= 64) ok
              USING (source, shingle)
            ), inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     CAST(count(*) AS BIGINT) AS i
              FROM rare a JOIN rare b
                ON a.shingle = b.shingle AND a.source = b.source
               AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT CAST(doc_a AS BIGINT) AS doc_a,
                   CAST(doc_b AS BIGINT) AS doc_b,
                   CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE)
                     AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.1
        """,
        "doc_minhash_bands": _SHINGLES_CTE + """
            , sig AS (
              SELECT doc_id,
                     min(md5('0:' || shingle)) AS m0,
                     min(md5('1:' || shingle)) AS m1,
                     min(md5('2:' || shingle)) AS m2,
                     min(md5('3:' || shingle)) AS m3,
                     min(md5('4:' || shingle)) AS m4,
                     min(md5('5:' || shingle)) AS m5,
                     min(md5('6:' || shingle)) AS m6,
                     min(md5('7:' || shingle)) AS m7
              FROM sh GROUP BY doc_id
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   md5(m0 || m1 || m2 || m3) AS band_a,
                   md5(m4 || m5 || m6 || m7) AS band_b
            FROM sig
        """,
        "doc_simhash": _simhash_sql(),
        "doc_minhash_dedup": _SHINGLES_CTE + """
            , sig AS (
              SELECT doc_id,
                     min(md5('0:' || shingle)) AS m0,
                     min(md5('1:' || shingle)) AS m1,
                     min(md5('2:' || shingle)) AS m2,
                     min(md5('3:' || shingle)) AS m3,
                     min(md5('4:' || shingle)) AS m4,
                     min(md5('5:' || shingle)) AS m5,
                     min(md5('6:' || shingle)) AS m6,
                     min(md5('7:' || shingle)) AS m7
              FROM sh GROUP BY doc_id
            ), bands AS (
              SELECT doc_id, md5(m0 || m1 || m2 || m3) AS band FROM sig
              UNION ALL
              SELECT doc_id, md5(m4 || m5 || m6 || m7) AS band FROM sig
            ), keeper AS (
              SELECT band, min(doc_id) AS keep_id FROM bands GROUP BY band
            ), decided AS (
              SELECT b.doc_id, min(k.keep_id) AS keep_id
              FROM bands b JOIN keeper k USING (band)
              GROUP BY b.doc_id
            )
            -- total over documents: shingle-less docs keep themselves
            SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
                   CAST(COALESCE(dec.keep_id, d.doc_id) AS BIGINT) AS keep_id,
                   d.doc_id = COALESCE(dec.keep_id, d.doc_id) AS is_kept
            FROM documents d LEFT JOIN decided dec ON dec.doc_id = d.doc_id
        """,
        "emb_cosine_threshold": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding AS q FROM embeddings
              WHERE vec_id < 10
            ), c AS (
              SELECT vec_id AS cand_id, embedding AS c FROM embeddings
              WHERE vec_id >= 10
            ), scored AS (
              SELECT query_id, cand_id,
                     list_dot_product(CAST(q.q AS DOUBLE[]), CAST(c.c AS DOUBLE[]))
                       / (sqrt(list_dot_product(CAST(q.q AS DOUBLE[]), CAST(q.q AS DOUBLE[])))
                          * sqrt(list_dot_product(CAST(c.c AS DOUBLE[]), CAST(c.c AS DOUBLE[])))) AS cosine
              FROM c CROSS JOIN q
            )
            SELECT CAST(query_id AS BIGINT) AS query_id,
                   CAST(cand_id AS BIGINT) AS cand_id,
                   round(cosine, 6) AS cosine_r
            FROM scored WHERE cosine >= 0.25
        """,
        "emb_brute_topk": _cosine_sql("vec_id < 10", "vec_id >= 10"),
        "emb_lsh_topk": _cosine_sql(
            "vec_id < 10",
            "vec_id >= 10",
            extra_q=", " + _lsh_bucket_sql_expr("CAST(embedding AS DOUBLE[])")
            + " AS bucket",
            extra_c=", " + _lsh_bucket_sql_expr("CAST(embedding AS DOUBLE[])")
            + " AS bucket",
            join_cond="q.bucket = c.bucket",
        ),
        "events_sessionize": """
            WITH e AS (
              SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events
            ), flagged AS (
              SELECT user_id, ts_us, event_id,
                CASE WHEN ts_us - lag(ts_us) OVER w > 1800000000
                     THEN 1 ELSE 0 END AS new_s
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
            ), sess AS (
              SELECT user_id,
                sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
              FROM flagged
            ), per AS (
              SELECT user_id, session_id, count(*) AS n
              FROM sess GROUP BY 1, 2
            )
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   CAST(count(*) AS BIGINT) AS session_cnt,
                   CAST(max(n) AS BIGINT) AS max_session_events
            FROM per GROUP BY 1
        """,
        "events_json_props": """
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS events,
                   CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                        AS BIGINT) AS k_sum,
                   CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT))
                        AS BIGINT) AS k_min,
                   CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                        AS BIGINT) AS k_max
            FROM events GROUP BY event_type
        """,
        "events_last_max": """
            SELECT event_type, max_value, CAST(event_id AS BIGINT) AS last_event_id
            FROM (
              SELECT event_type, event_id,
                     max(value) OVER (PARTITION BY event_type) AS max_value,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY value DESC, event_id DESC) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "tpch_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                     AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                     AS sum_base_price,
                   CAST(count(*) AS BIGINT) AS count_order,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE) AS avg_qty
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "tpch_revenue_by_nation": """
            SELECT n_name,
                   CAST(count(*) AS BIGINT) AS orders_cnt,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     AS total_price
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
    }

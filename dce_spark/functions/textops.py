"""Text-analysis + deduplication operators over a documents table.

All operators are pure Catalyst expressions (split/transform/aggregate/
md5/window) — whole-stage-codegen-friendly, no Python on the hot path.
Each has a matching ANSI-SQL oracle in __spark_entry__.py.

Scale notes:
* exact_dedup / fingerprint: one hash-shuffle on the group key; at
  10^12 rows group by md5(text) (fixed 32-byte key) rather than raw
  text to keep shuffle rows small.
* minhash: shingle explode -> 8 per-seed min-aggregations in ONE
  groupBy pass (map-side partial aggregation does the heavy lifting);
  band hashes then bucket candidates without any pairwise join.
* ngram_jaccard: pairwise join restricted to a blocking key (source)
  so the candidate space stays bounded; the general path is
  minhash-band blocking first, exact jaccard only within buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STOPWORDS_EN = (
    "the", "and", "of", "to", "a", "in", "is", "it", "for", "on",
)

# tiny per-language function-word profiles for the lang-id heuristic
LANG_PROFILES = {
    "en": ("the", "and", "of", "to", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "los"),
    "de": ("der", "die", "und", "das", "ist", "von"),
    "fr": ("le", "la", "et", "les", "des", "est"),
}


def tokens_col(col="text"):
    return F.split(F.col(col), " ")


def ensure_scan_parallelism(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Input-skew guard ahead of a compute-heavy Arrow kernel (guide
    §2.5: one huge unsplittable file -> repartition right after the
    read). A single-row-group parquet file yields a 1-partition scan,
    which would serialize a map-only kernel no matter how many cores
    the session has. When the scan has fewer partitions than the
    session's default parallelism, hash-repartition on the row key up
    to it (hash, not round-robin: deterministic placement under task
    retry, no sort-before-repartition pass); with healthily split
    inputs — the 100 TB layout — the condition is false and the plan
    is untouched. Costs one exchange of exactly the columns the kernel
    needs, which the caller has already projected (guide §2.3)."""
    try:
        n = df.rdd.getNumPartitions()
        target = df.sparkSession.sparkContext.defaultParallelism
    except Exception:
        return df
    if 0 < n < target:
        return df.repartition(target, F.col(key))
    return df


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact dedup: keep the smallest doc_id per identical text."""
    return (
        documents.groupBy("text")
        .agg(
            F.min("doc_id").cast("long").alias("keep_id"),
            F.count("*").cast("long").alias("dup_count"),
        )
        .select("keep_id", "dup_count")
    )


# Worker-resident hash caches for the Arrow kernels. Module-level on
# purpose: with spark.python.worker.reuse (the default) a worker
# process survives across tasks, so Zipf-repeated shingles/tokens/
# grams hash ONCE per worker instead of once per occurrence (the
# bench corpus measures ~93%% duplicate 3-shingles; real crawls are
# also heavily Zipf). Bounded: cleared wholesale past the cap —
# deterministic values, so eviction can never change a result.
_MINHASH_SIG_CACHE: dict = {}
_SIMHASH_MASK_CACHE: dict = {}
_DSIR_BUCKET_CACHE: dict = {}
_HASH_CACHE_MAX = 1_000_000


_BLOOM_BITS_PER_WORD = 63  # bits 0..62 only: bit 63 is the BIGINT
# sign bit, and arithmetic-shift semantics on negative values differ
# subtly across engines — wasting one bit per word buys bit-exact
# cross-engine parity for the packed filter


def _bloom_positions(text, n_hashes: int, n_bits: int):
    """Array of n_hashes deterministic bit positions for one text:
    seeded md5 -> 60-bit int -> pmod n_bits. Same construction as the
    minhash seeds — engine-independent, no native hash functions."""
    if n_hashes < 1 or n_bits < 1:
        # n_hashes=0 would make every probe vacuously a member (the
        # fold over zero positions), silently flagging ALL docs seen
        raise ValueError("n_hashes and n_bits must be >= 1")
    return F.array(*[
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"bl{i}:"), text)), 1, 15
                ),
                16, 10,
            ).cast("long"),
            F.lit(n_bits).cast("long"),
        )
        for i in range(n_hashes)
    ])


def bloom_filter_words(
    documents: DataFrame, n_hashes: int = 5, n_bits: int = 1 << 20,
    text_col: str = "text",
) -> DataFrame:
    """Distributed Bloom filter over the corpus texts, AS A DATAFRAME:
    (word: long, bits: long) — word w holds bits [w*63, w*63+62] of
    the filter, OR-folded with a map-side-partial bit_or aggregate.
    At most ceil(n_bits/63) rows regardless of corpus size, so the
    filter for 10^9 bits is ~16M rows / ~250 MB — broadcastable; the
    build itself is explode -> one hash shuffle on the word key.

    Spark's internal BloomFilterAggregate is not a public function;
    this formulation is, and unlike an opaque binary blob it is
    deterministic, mergeable (bit_or of two filters' rows), prunable,
    and oracle-checkable cross-engine."""
    p = F.col("p")
    return (
        documents.select(
            F.explode(
                _bloom_positions(F.col(text_col), n_hashes, n_bits)
            ).alias("p")
        )
        .select(
            F.expr(f"p div {_BLOOM_BITS_PER_WORD}").alias("word"),
            F.pmod(p, _BLOOM_BITS_PER_WORD).cast("int").alias("bit"),
        )
        .groupBy("word")
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
            ).alias("bits")
        )
    )


def bloom_dedup(
    new_docs: DataFrame, seen_docs: DataFrame, n_hashes: int = 5,
    n_bits: int = 1 << 20, id_col: str = "doc_id",
    text_col: str = "text", broadcast_filter: bool = True,
) -> DataFrame:
    """Incremental corpus dedup: flag docs in ``new_docs`` whose text
    is (probably) already in ``seen_docs`` — the new-crawl-batch vs
    historical-corpus membership pass. An exact anti-join dedup against
    a 100 TB historical corpus shuffles BOTH sides on every ingest;
    here the history collapses once into the packed filter table
    (bloom_filter_words) and each batch probes it with a broadcast
    join on the word key — the history is never re-shuffled.

    Asymmetric error, the right direction for dedup: might-contain has
    NO false negatives (every true duplicate is flagged), and false
    positives (a novel doc flagged seen, rate ~(1-e^(-kn/m))^k) only
    cost a few novel docs. Size ``n_bits`` ~10 bits/doc for ~1% FP at
    k=5; past ~10^10 bits set ``broadcast_filter=False`` and the probe
    becomes a shuffled join on the same key.

    Returns (id_col, probably_seen) — total over new_docs."""
    flt = bloom_filter_words(seen_docs, n_hashes, n_bits, text_col)
    if broadcast_filter:
        flt = F.broadcast(flt)
    probes = new_docs.select(
        F.col(id_col).cast("long").alias(id_col),
        F.explode(
            _bloom_positions(F.col(text_col), n_hashes, n_bits)
        ).alias("p"),
    ).withColumn("word", F.expr(f"p div {_BLOOM_BITS_PER_WORD}"))
    hit = F.when(F.col("bits").isNull(), F.lit(0)).otherwise(
        F.expr(
            f"CAST(shiftright(bits, CAST(pmod(p,"
            f" {_BLOOM_BITS_PER_WORD}) AS INT)) & 1 AS INT)"
        )
    )
    return (
        probes.join(flt, "word", "left")
        .groupBy(id_col)
        .agg((F.min(hit) == 1).alias("probably_seen"))
    )


def token_count(documents: DataFrame) -> DataFrame:
    # input-split guard: parallelize the text-heavy work when
    # the scan is a single unsplittable partition (guide §2.5)
    documents = ensure_scan_parallelism(documents)
    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(tokens_col()).cast("long").alias("token_count"),
    )


# BPE-ish pre-tokenization pattern (GPT-2 family shape, restricted to
# constructs whose semantics are identical in Java regex and RE2):
# letter runs, digit runs, single non-alphanumeric non-space chars.
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def token_count_bpe(documents: DataFrame) -> DataFrame:
    """Subword-style token counting via regex pre-tokenization — the
    cheap cross-engine-deterministic stand-in for a real BPE pass."""
    # input-split guard: parallelize the text-heavy work when
    # the scan is a single unsplittable partition (guide §2.5)
    documents = ensure_scan_parallelism(documents)
    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), 0))
        .cast("long")
        .alias("bpe_token_count"),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Length / punctuation / stopword-ratio quality features."""
    # input-split guard: parallelize the text-heavy work when
    # the scan is a single unsplittable partition (guide §2.5)
    documents = ensure_scan_parallelism(documents)
    toks = tokens_col()
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    n_tok = F.size(toks).cast("long")
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast(
        "long"
    )
    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.length("text").cast("long").alias("n_chars"),
        n_tok.alias("n_tokens"),
        (F.length("text").cast("double") / n_tok.cast("double")).alias(
            "avg_token_len"
        ),
        (n_stop.cast("double") / n_tok.cast("double")).alias("stopword_ratio"),
    )


def lang_distribution(documents: DataFrame) -> DataFrame:
    return (
        documents.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("doc_count"),
            (
                F.sum("n_chars").cast("double") / F.count("*").cast("double")
            ).alias("avg_chars"),
        )
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """Exact-document fingerprint: md5 over the normalized text."""
    # input-split guard: parallelize the text-heavy work when
    # the scan is a single unsplittable partition (guide §2.5)
    documents = ensure_scan_parallelism(documents)
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5(norm).alias("fingerprint"),
    )


def rolling_fingerprint(documents: DataFrame) -> DataFrame:
    """Order-sensitive document fingerprint: polynomial rolling hash over
    the token stream, h = fold(tokens, (h*31 + v(tok)) mod (2^31-1)),
    v(tok) = first 8 md5 hex digits as an integer.

    Unlike the md5-of-normalized-text fingerprint this is a sequential
    fold (token order matters, token substitutions shift everything
    after them) — the rolling-hash family used for shift-resistant
    chunk fingerprinting. Values stay < 2^31 so the fold arithmetic
    (< 2^36) is exact in 64-bit on any engine; the DuckDB oracle
    mirrors it with list_reduce."""
    # input-split guard: parallelize the text-heavy work when
    # the scan is a single unsplittable partition (guide §2.5)
    documents = ensure_scan_parallelism(documents)
    toks = tokens_col()
    m = F.lit(2147483647).cast("long")
    vals = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
    )
    h = F.aggregate(
        vals,
        F.lit(0).cast("long"),
        lambda acc, v: (acc * F.lit(31).cast("long") + v) % m,
    )
    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        h.alias("rolling_hash"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Function-word-profile language ID (n-gram-heuristic family)."""
    # input-split guard: parallelize the text-heavy work when
    # the scan is a single unsplittable partition (guide §2.5)
    documents = ensure_scan_parallelism(documents)
    toks = tokens_col()

    def _contains(arr):
        # closure (NOT a 2-arg lambda: PySpark would bind arg 2 as the
        # element index)
        return lambda t: F.array_contains(arr, t)

    scores = {}
    for lang, words in LANG_PROFILES.items():
        arr = F.array(*[F.lit(w) for w in words])
        scores[lang] = F.size(F.filter(toks, _contains(arr)))
    pred = (
        F.when(
            (scores["en"] >= scores["es"])
            & (scores["en"] >= scores["de"])
            & (scores["en"] >= scores["fr"]),
            F.lit("en"),
        )
        .when(
            (scores["es"] >= scores["de"]) & (scores["es"] >= scores["fr"]),
            F.lit("es"),
        )
        .when(scores["de"] >= scores["fr"], F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"), pred.alias("pred_lang")
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# Gopher gate thresholds (Rae et al. 2021, §A1.1) — module constants so
# gopher_quality, filter_funnel and the streaming quality gate all read
# the SAME numbers; tune here, not at one call site
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOP_HITS = 2


def _gopher_signal_cols(col: str = "text"):
    """The four Gopher §A1.1 signal columns over `col` — shared by
    gopher_quality (per-doc signals), filter_funnel (per-source
    telemetry) and the streaming quality gate so the rules cannot
    diverge."""
    toks = tokens_col(col)
    n_words = F.size(toks).cast("long")
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    mean_word_len = sum_len.cast("double") / n_words.cast("double")
    alpha_cnt = F.size(
        F.filter(toks, lambda t: t.rlike("[A-Za-z]"))
    ).cast("long")
    alpha_frac = alpha_cnt.cast("double") / n_words.cast("double")
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    stop_hits = F.size(
        F.filter(toks, lambda t: F.array_contains(stop_arr, t))
    ).cast("long")
    return n_words, mean_word_len, alpha_frac, stop_hits


def gopher_quality(
    documents: DataFrame,
    min_words: int = GOPHER_MIN_WORDS,
    max_words: int = GOPHER_MAX_WORDS,
    min_mean_word_len: float = GOPHER_MIN_MEAN_WORD_LEN,
    max_mean_word_len: float = GOPHER_MAX_MEAN_WORD_LEN,
    min_alpha_frac: float = GOPHER_MIN_ALPHA_FRAC,
    min_stop_hits: int = GOPHER_MIN_STOP_HITS,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, §A1.1):
    word-count bounds, mean-word-length bounds, fraction of words with
    an alphabetic character, and a required minimum of canonical
    stopword hits. Emits the signals plus the combined keep flag — all
    pure Catalyst array expressions, one projection, no shuffle."""
    # input-split guard: parallelize the text-heavy work when
    # the scan is a single unsplittable partition (guide §2.5)
    documents = ensure_scan_parallelism(documents)
    n_words, mean_word_len, alpha_frac, stop_hits = _gopher_signal_cols()
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_word_len >= min_mean_word_len)
        & (mean_word_len <= max_mean_word_len)
        & (alpha_frac >= min_alpha_frac)
        & (stop_hits >= min_stop_hits)
    )
    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        alpha_frac.alias("alpha_frac"),
        stop_hits.alias("stop_hits"),
        keep.alias("keep"),
    )


def repetition_signals(documents: DataFrame) -> DataFrame:
    """Gopher-style repetition signals: duplicate-token fraction and the
    share of the token stream covered by the most frequent 2-gram
    (ties broken by lexicographically smallest bigram, so the mode is
    deterministic across engines). Every signal is per-document, so
    the whole operator is ONE map-only Arrow kernel — no explode, no
    aggregate shuffles (see the kernel comment below)."""
    # One map-only Arrow kernel per document (guide §4.2): the former
    # shape exploded every bigram and ran TWO aggregate shuffles
    # (per-(doc, bigram) counts, then the per-doc struct-min mode);
    # every signal here is per-document, so the kernel computes the
    # identical values with zero exchanges. Bit-exact notes:
    # dup_token_frac = 1.0 - n_dist/n_tok in the same f64 op order;
    # the mode is min over (-count, bigram) — Python tuple min over
    # (int, str) matches the struct-min, and Python str ordering
    # equals Spark's UTF8String byte ordering because UTF-8 is
    # code-point-order-preserving; top_bigram_frac = (cnt * 2.0) / n
    # in the same op order (a null-text doc reproduces the Catalyst
    # size(null) = -1 row: n_tokens -1, frac -0.0).
    import pyarrow as pa

    def kernel(batches):
        for tbl in batches:
            ids = tbl.column("doc_id").to_pylist()
            texts = tbl.column("text").to_pylist()
            out = {
                "doc_id": [], "n_tokens": [], "dup_token_frac": [],
                "top_bigram": [], "top_bigram_cnt": [],
                "top_bigram_frac": [],
            }
            for doc_id, t in zip(ids, texts):
                if t is None:
                    out["doc_id"].append(doc_id)
                    out["n_tokens"].append(-1)
                    out["dup_token_frac"].append(0.0)
                    out["top_bigram"].append(None)
                    out["top_bigram_cnt"].append(0)
                    out["top_bigram_frac"].append(0.0 * 2.0 / -1.0)
                    continue
                toks = t.split(" ")
                n = len(toks)
                n_dist = len(set(toks))
                counts: dict = {}
                for a, b in zip(toks, toks[1:]):
                    bg = a + " " + b
                    counts[bg] = counts.get(bg, 0) + 1
                if counts:
                    neg, bg = min(
                        (-c, g) for g, c in counts.items()
                    )
                    cnt = -neg
                else:
                    bg, cnt = None, 0
                out["doc_id"].append(doc_id)
                out["n_tokens"].append(n)
                out["dup_token_frac"].append(
                    1.0 - float(n_dist) / float(n)
                )
                out["top_bigram"].append(bg)
                out["top_bigram_cnt"].append(cnt)
                out["top_bigram_frac"].append(
                    (float(cnt) * 2.0) / float(n)
                )
            yield pa.record_batch({
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "n_tokens": pa.array(out["n_tokens"], type=pa.int64()),
                "dup_token_frac": pa.array(
                    out["dup_token_frac"], type=pa.float64()
                ),
                "top_bigram": pa.array(
                    out["top_bigram"], type=pa.string()
                ),
                "top_bigram_cnt": pa.array(
                    out["top_bigram_cnt"], type=pa.int64()
                ),
                "top_bigram_frac": pa.array(
                    out["top_bigram_frac"], type=pa.float64()
                ),
            })

    return ensure_scan_parallelism(
        documents.select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        )
    ).mapInArrow(
        kernel,
        "doc_id long, n_tokens long, dup_token_frac double,"
        " top_bigram string, top_bigram_cnt long, top_bigram_frac double",
    )


def deterministic_sample(
    documents: DataFrame, rates: dict[str, float], salt: str = "s1"
) -> DataFrame:
    """Reproducible stratified sampling by language: keep a row iff the
    md5-derived uniform of (salt, doc_id) falls under its stratum's
    rate. Hash-based (not RNG-based like sampleBy), so the SAME rows
    are kept on every engine, every run, any partitioning — the
    property training-data pipelines need for resumable sampling.
    Unknown strata default to rate 0."""
    u = (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit(salt), F.col("doc_id"))), 1, 15),
            16, 10,
        ).cast("double")
        / float(16**15)
    )
    rate = None
    for lang, r in sorted(rates.items()):
        clause = (F.when if rate is None else rate.when)
        rate = clause(F.col("lang") == lang, F.lit(float(r)))
    rate = rate.otherwise(F.lit(0.0)) if rate is not None else F.lit(0.0)
    return documents.filter(u < rate).select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang"
    )


def pack_shards(documents: DataFrame, token_budget: int = 4096) -> DataFrame:
    """Deterministic training-shard assignment: within each source,
    documents in doc_id order are packed contiguously into shards of
    ~token_budget tokens (a doc opens a new shard when its tokens would
    cross the budget boundary — floor((cumsum - tokens) / budget), the
    streaming analogue of sequence packing).

    The cumulative sum is PARTITIONED by source: a global-order window
    would funnel every row through one task at 10^12 rows, while
    per-source packing parallelizes across sources and matches how
    sharding pipelines actually stream per corpus. Shard ids are stable
    under any partitioning because (source, doc_id) is a total order."""
    from pyspark.sql.window import Window

    n_tok = F.size(tokens_col()).cast("long")
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_cum = documents.select(
        "source",
        F.col("doc_id").cast("long").alias("doc_id"),
        n_tok.alias("n_tokens"),
    ).withColumn("cum", F.sum("n_tokens").over(w))
    return with_cum.select(
        "source",
        "doc_id",
        "n_tokens",
        F.floor(
            (F.col("cum") - F.col("n_tokens"))
            / F.lit(token_budget).cast("double")
        ).cast("long").alias("shard"),
    )


# 12 high-signal character classes + implicit 'other': the most frequent
# English letters individually, the remaining letters pooled, digits,
# space. Small enough that the fused projection stays within the JVM's
# generated-method limits (a per-letter alphabet blew the 64KB cap and
# pushed Spark into interpreted fallback).
# each class is a literal character SET (regex ranges expanded), so the
# per-class count can use translate() — straight codegen'd char-set
# removal, no regex engine on the hot path
_ENTROPY_CLASSES = (
    "e", "t", "a", "o", "i", "n", "s", "r",
    "bcdfghjklmpquvwxyz", "0123456789", " ",
)


def char_entropy(documents: DataFrame) -> DataFrame:
    """Shannon entropy (bits) of the lowercased character distribution
    over FIXED classes (top English letters, pooled other letters,
    digits, space, other) — a classic machine-text/quality signal
    (gibberish and encoded blobs sit far from prose entropy).

    The fixed, ordered class list makes the floating-point fold
    DETERMINISTIC (same summation order on every engine/partitioning),
    so the value itself is oracle-checkable — unlike an explode+groupBy
    entropy whose sum order varies. Per-class counts via translate()
    char-set removal (codegen, no regex engine); all pure Catalyst, no
    shuffle.

    Staged projections are load-bearing: lowered text, then the class
    counts, then the entropy arithmetic each materialize as CONCRETE
    columns. Inlining instead duplicates every count 3-4x inside the
    entropy terms (and `other` re-inlines all of them), exploding the
    expression tree past the codegen method limit into interpreted
    eval with no subexpression reuse — measured ~40x slower.
    CollapseProject keeps the stages separate because each column is
    expensive and multiply-referenced."""
    # input-split guard: parallelize the text-heavy work when
    # the scan is a single unsplittable partition (guide §2.5)
    documents = ensure_scan_parallelism(documents)
    with_lower = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.lower(F.col("text")).alias("_lt"),
    )
    cnt_cols = [
        (
            F.length("_lt") - F.length(F.translate(F.col("_lt"), cls, ""))
        ).cast("double").alias(f"_c{i}")
        for i, cls in enumerate(_ENTROPY_CLASSES)
    ]
    with_counts = with_lower.select(
        "doc_id",
        F.length("_lt").cast("double").alias("_total"),
        *cnt_cols,
    )
    counts = [F.col(f"_c{i}") for i in range(len(_ENTROPY_CLASSES))]
    total = F.col("_total")
    other = total - sum(counts[1:], counts[0])
    with_other = with_counts.select(
        "doc_id", "_total", *[f"_c{i}" for i in range(len(counts))],
        other.alias(f"_c{len(counts)}"),
    )
    log2 = F.log(F.lit(2.0))
    entropy = None
    for i in range(len(_ENTROPY_CLASSES) + 1):
        c = F.col(f"_c{i}")
        p = c / total
        term = F.when(c > 0, -p * F.log(p) / log2).otherwise(F.lit(0.0))
        entropy = term if entropy is None else entropy + term
    return with_other.select(
        "doc_id",
        F.when(total > 0, F.round(entropy, 6)).otherwise(F.lit(0.0))
        .alias("char_entropy"),
    )


def compression_ratio(documents: DataFrame) -> DataFrame:
    """zlib compressibility quality signal (CCNet-style): highly
    repetitive/boilerplate text compresses far below prose. No SQL
    analogue exists (DuckDB has no zlib), so this is a library op with
    pytest coverage rather than a driver-oracled query. Arrow-batched
    mapInPandas; level 6 to match the usual pipeline setting."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("raw_bytes", T.LongType()),
            T.StructField("compressed_bytes", T.LongType()),
            T.StructField("ratio", T.DoubleType()),
        ]
    )

    def kernel(it):
        import zlib

        for pdf in it:
            rows = []
            for rec in pdf.itertuples(index=False):
                raw = (rec.text or "").encode("utf-8")
                comp = len(zlib.compress(raw, 6))
                rows.append(
                    (
                        int(rec.doc_id),
                        len(raw),
                        comp,
                        (comp / len(raw)) if raw else 1.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "raw_bytes", "compressed_bytes", "ratio"],
            )

    return documents.select("doc_id", "text").mapInPandas(kernel, schema)


def kmv_distinct_sketch(documents: DataFrame, k: int = 64) -> DataFrame:
    """K-minimum-values distinct-token estimator per source.

    The KMV sketch keeps the k smallest hash values of the stream; with
    h uniform on [0,1), E[distinct] = (k-1)/h_(k). Unlike HLL(++) whose
    register layouts differ per engine, KMV over md5 (first 15 hex
    digits -> uniform in [0, 16^15)) is DETERMINISTIC and bit-identical
    in ANSI SQL, so the estimate itself is oracle-checkable. Mergeable
    (union of sketches = sketch of union) -> map-side partials apply;
    the exact distinct rides along to show the estimation error.
    """
    # input-split guard: parallelize the text-heavy work when
    # the scan is a single unsplittable partition (guide §2.5)
    documents = ensure_scan_parallelism(documents)
    m = float(16**15)
    toks = documents.select(
        "source", F.explode(tokens_col()).alias("tok")
    ).withColumn(
        "h",
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("double") / m,
    )
    distinct_h = toks.select("source", "h").distinct()
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy("h")
    kth = (
        distinct_h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("source")
        .agg(F.max("h").alias("h_k"), F.count("*").alias("got"))
    )
    exact = (
        documents.select("source", F.explode(tokens_col()).alias("tok"))
        .groupBy("source")
        .agg(F.countDistinct("tok").cast("long").alias("exact_distinct"))
    )
    est = F.when(
        F.col("got") < k, F.col("got").cast("double")  # fewer than k: exact
    ).otherwise((F.lit(float(k - 1))) / F.col("h_k"))
    return (
        kth.join(exact, "source")
        .select(
            "source",
            "exact_distinct",
            F.round(est, 2).alias("kmv_estimate"),
        )
    )


def unigram_stats(documents: DataFrame) -> DataFrame:
    """Corpus-frequency language-model proxy (the CCNet-style idea of
    scoring documents under a corpus LM, with exact cross-engine math):
    per document, the mean corpus frequency of its tokens and the
    hapax fraction (tokens occurring exactly once in the whole source).
    Fluent in-domain text has high mean frequency / low hapax share;
    gibberish, encoded blobs, and OOV-heavy text sit at the other end.

    All aggregations are INTEGER (sum of counts, token counts), with a
    single final division — deterministic on every engine and
    partitioning, unlike a -log p sum whose f64 order varies. Shape:
    one explode, one (source, token) vocab count with map-side
    partials, one co-partitioned join back, one per-doc groupBy. The
    vocab side is Zipf-small relative to the token stream; AQE
    broadcasts it at small scale and shuffles both sides on the token
    key at corpus scale. Total over documents."""
    # stays Catalyst: the vocab side broadcasts, so the occurrence
    # stream is never shuffled — measured FASTER than the per-doc
    # count kernel here, whose output is re-evaluated once per plan
    # reference (opaque Python stages get no cross-branch reuse)
    documents = ensure_scan_parallelism(documents)
    toks = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.explode(tokens_col()).alias("tok"),
    )
    vocab = toks.groupBy("source", "tok").agg(
        F.count("*").cast("long").alias("cnt")
    )
    per_doc = (
        toks.join(vocab, ["source", "tok"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("cnt").cast("long").alias("_sum_cnt"),
            F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
            .cast("long")
            .alias("_hapax"),
        )
    )
    return (
        documents.select(F.col("doc_id").cast("long").alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .na.fill({"n_tokens": 0, "_sum_cnt": 0, "_hapax": 0})
        .select(
            "doc_id",
            "n_tokens",
            F.when(
                F.col("n_tokens") > 0,
                F.round(
                    F.col("_sum_cnt").cast("double")
                    / F.col("n_tokens").cast("double"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("mean_token_freq"),
            F.when(
                F.col("n_tokens") > 0,
                F.round(
                    F.col("_hapax").cast("double")
                    / F.col("n_tokens").cast("double"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("hapax_frac"),
        )
    )


def decontaminate(
    documents: DataFrame, benchmark: DataFrame, k: int = 3
) -> DataFrame:
    """Benchmark decontamination — the standard training-data hygiene
    op: flag every document sharing ANY word k-gram with a held-out
    benchmark/test set, so eval data can be excluded from training
    corpora.

    Spark shape: the benchmark's distinct shingles are the small side
    — broadcast them against the corpus shingle table (scan-side probe,
    no shuffle of the big side). At a 10^8-ngram benchmark, drop the
    hint: AQE falls back to a shuffled hash join on the shingle key,
    still linear. Output is TOTAL over documents (hit_shingles = number
    of distinct contaminated shingles in the doc, 0 when clean).
    """
    bench_sh = (
        benchmark.select(F.explode(_shingles(k)).alias("shingle")).distinct()
    )
    # corpus-side shingles via the Arrow kernel (guide §4.2): the
    # broadcast probe and the per-doc hit count are unchanged, only
    # the shingle generation moves off the Catalyst transform chain
    doc_sh = _doc_shingles_arrow(documents, k, with_source=False).select(
        "doc_id", F.explode("shingles").alias("shingle")
    )
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("hit_shingles"))
    )
    return (
        documents.select(F.col("doc_id").cast("long").alias("doc_id"))
        .join(hits, "doc_id", "left")
        .na.fill({"hit_shingles": 0})
        .select(
            "doc_id",
            "hit_shingles",
            (F.col("hit_shingles") > 0).alias("contaminated"),
        )
    )


# PII patterns written to the common subset of Java regex (Spark) and
# RE2 (DuckDB/Go scanners): no lookaround, no backrefs.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b"),
    ("phone", r"\+\d[\d\-]{7,14}\d"),
)


def pii_redact(documents: DataFrame, text_col="text") -> DataFrame:
    """PII scrubbing for training text: count and redact emails, IPv4
    addresses, and international-format phone numbers. Pure projection
    (regexp_count + chained regexp_replace — whole-stage codegen, no
    shuffle, no Python). Redaction order is part of the contract:
    emails first (their local parts can contain digits), then IPs,
    then phones."""
    # input-split guard: parallelize the text-heavy work when
    # the scan is a single unsplittable partition (guide §2.5)
    documents = ensure_scan_parallelism(documents)
    text = F.col(text_col)
    counts = [
        F.regexp_count(text, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat in PII_PATTERNS
    ]
    red = text
    for name, pat in PII_PATTERNS:
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        *counts,
        red.alias("redacted_text"),
    )


def kmv_minima(documents: DataFrame, k: int = 64) -> DataFrame:
    """The KMV sketch itself: the k smallest distinct token-hash values
    per source, as a sorted ``array<double>``.

    This is the mergeable object (union two sketches' arrays, sort,
    keep the k smallest = sketch of the union), and the production
    path: a cheap ``approx_count_distinct`` pre-pass (HLL — map-side
    mergeable, JVM-side) derives a per-source hash threshold keeping
    ~8k candidates, so the k-th-smallest selection sorts a BOUNDED set
    instead of every distinct hash — no exact countDistinct anywhere.
    With HLL rsd 5% and 8x headroom the probability of the filter
    starving the sketch (<k survivors when distinct >= k) is nil; when
    distinct < 8k the threshold clamps to 1.0 and every hash survives.
    """
    m = float(16**15)
    toks = documents.select(
        "source", F.explode(tokens_col()).alias("tok")
    ).withColumn(
        "h",
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("double") / m,
    )
    acd = toks.groupBy("source").agg(
        F.approx_count_distinct("tok", 0.05).alias("acd")
    )
    cand = (
        toks.join(F.broadcast(acd), "source")
        .filter(
            F.col("h")
            <= F.least(F.lit(1.0), F.lit(8.0 * k) / F.col("acd"))
        )
        .select("source", "h")
        .distinct()
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy("h")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("source")
        .agg(F.array_sort(F.collect_list("h")).alias("minima"))
    )


def kmv_estimate_from_minima(minima_col, k: int = 64):
    """Column expression: the KMV estimate from a sorted minima array."""
    got = F.size(minima_col)
    return F.when(got < k, got.cast("double")).otherwise(
        F.lit(float(k - 1)) / F.element_at(minima_col, k)
    )


def kmv_sketch_only(documents: DataFrame, k: int = 64) -> DataFrame:
    """Production KMV estimate: sketch only, NO exact countDistinct
    rider (the rider in :func:`kmv_distinct_sketch` is an O(distinct)
    full pass kept solely so the oracle query can show the estimation
    error; at 10^12 tokens it costs what the sketch exists to avoid).
    """
    return kmv_minima(documents, k).select(
        "source",
        F.round(kmv_estimate_from_minima(F.col("minima"), k), 2).alias(
            "kmv_estimate"
        ),
    )


def _shingles(k: int = 3):
    """Distinct k-word shingles of the text column."""
    toks = tokens_col()
    n = F.size(toks)
    idx = F.sequence(F.lit(1), n - (k - 1))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    # guard: sequence() descends when n < k, so emit no shingles there
    return F.when(n >= k, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


def _doc_shingles_arrow(
    documents: DataFrame, k: int, with_source: bool = False
) -> DataFrame:
    """One (doc_id[, source], shingles array<string>) row per document
    via mapInArrow — the per-doc distinct k-shingle list built in the
    Python worker (C-speed split/join/dict) instead of the Catalyst
    transform+slice+concat_ws+array_distinct chain (guide §4.2). The
    array stays unexploded, so consumers that only need per-doc COUNTS
    read ``size(shingles)`` map-only with no explode and no shuffle.

    Bit-identical values: Python ``str.split(" ")`` matches Java
    ``Pattern.split`` (limit -1) for the literal single-space pattern;
    ``" ".join`` is concat_ws; dict.fromkeys preserves the
    first-occurrence order of array_distinct; null text or < k tokens
    yields an empty array exactly like the guarded sequence()."""
    import pyarrow as pa

    cols = [F.col("doc_id").cast("long").alias("doc_id")]
    schema = "doc_id long"
    if with_source:
        cols.append(F.col("source"))
        schema += ", source string"
    cols.append(F.col("text"))
    schema += ", shingles array<string>"

    def kernel(batches):
        for tbl in batches:
            ids = tbl.column("doc_id").to_pylist()
            texts = tbl.column("text").to_pylist()
            srcs = (
                tbl.column("source").to_pylist() if with_source else None
            )
            join = " ".join
            out: list = []
            for t in texts:
                if t is None:
                    out.append([])
                    continue
                toks = t.split(" ")
                n = len(toks)
                if n < k:
                    out.append([])
                    continue
                out.append(list(dict.fromkeys(
                    join(toks[j:j + k]) for j in range(n - k + 1)
                )))
            data = {"doc_id": pa.array(ids, type=pa.int64())}
            if with_source:
                data["source"] = pa.array(srcs, type=pa.string())
            data["shingles"] = pa.array(out, type=pa.list_(pa.string()))
            yield pa.record_batch(data)

    return ensure_scan_parallelism(
        documents.select(*cols)
    ).mapInArrow(kernel, schema)


def shingle_table(documents: DataFrame, k: int = 3) -> DataFrame:
    return _doc_shingles_arrow(documents, k, with_source=True).select(
        "doc_id", "source", F.explode("shingles").alias("shingle")
    )


def ngram_jaccard_pairs(
    documents: DataFrame, k: int = 3, threshold: float = 0.1,
    max_df: int = 64,
) -> DataFrame:
    """Pairwise k-shingle Jaccard within a blocking key (source).

    Hot-shingle guard: a shingle shared by d docs within one source
    produces d^2 pre-aggregation join rows, so stop-phrase shingles
    ("of the and") are a quadratic skew bomb at corpus scale. Standard
    practice is a document-frequency cap: shingles with df > max_df
    carry ~no similarity signal and are dropped BEFORE pair generation
    (sizes stay full-set, so the score is a lower bound for pairs whose
    overlap was mostly stop-shingles). The hot-set anti-join is left
    unhinted: at bench scale AQE broadcasts it (the set is the
    vocabulary head), while at 10^12 rows — where the Zipf mid-tail
    makes df>max_df shingles too numerous to broadcast — it falls back
    to a shuffle join on the same (source, shingle) key the pair
    groupBy needs anyway.
    """
    docsh = _doc_shingles_arrow(documents, k, with_source=True)
    # per-doc distinct-shingle counts map-only off the unexploded
    # array: the former sh.groupBy(doc_id) shuffled every shingle row
    # just to count them (guide §2.4 — remove the exchange outright)
    sizes = docsh.select(
        "doc_id", F.size("shingles").cast("long").alias("sz")
    ).filter(F.col("sz") > 0)
    sh = docsh.select(
        "doc_id", "source", F.explode("shingles").alias("shingle")
    )
    hot = (
        sh.groupBy("source", "shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_df)
        .select("source", "shingle")
    )
    rare = sh.join(hot, ["source", "shingle"], "left_anti")
    # Inverted-index pair generation instead of a string-keyed self-join:
    # one groupBy collects each shingle's doc list (bounded <= max_df by
    # the anti-join, so agg-buffer memory is bounded), then the i<j
    # combinations explode in-memory — the same pair multiset the
    # self-join produced, without shuffling the shingle table twice.
    posting = rare.groupBy("source", "shingle").agg(
        F.array_sort(F.collect_list("doc_id")).alias("ids")
    )
    n = F.size("ids")
    pair_arrays = posting.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda x, i: F.transform(
                        F.slice(F.col("ids"), i + 2, n),
                        lambda y: F.struct(
                            x.alias("doc_a"), y.alias("doc_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    )
    inter = (
        pair_arrays.select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("sz", "sz_a")
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "sz", "sz_b"
            ),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def _minhash_bands_arrow(
    documents: DataFrame, n_seeds: int, n_bands: int, k: int
) -> DataFrame:
    """(doc_id, bands array<string>) via one mapInArrow pass — the
    portable-hash (md5) MinHash signature computed per document in the
    Python worker instead of explode + 8 Catalyst md5 calls per
    shingle row + a groupBy shuffle of the hash strings (guide §4.2:
    map-only, C-speed OpenSSL md5, zero exchanges).

    Bit-identical to the Catalyst formulation: Python ``str.split(" ")``
    matches Java ``Pattern.split`` (limit -1) for the literal
    single-space pattern incl. leading/trailing empties; md5 runs over
    the same UTF-8 bytes; the per-seed min is the same byte-wise
    lexicographic min over lowercase hex strings; duplicate shingles
    cannot change a min, so skipping array_distinct is value-neutral.
    Docs that produce no shingle (null text or < k tokens) emit no row,
    exactly like the groupBy over an empty explode."""
    import pyarrow as pa

    r = n_seeds // n_bands

    def kernel(batches):
        from hashlib import md5

        bases = [md5(f"{s}:".encode()) for s in range(n_seeds)]
        cache = _MINHASH_SIG_CACHE.setdefault(n_seeds, {})
        for tbl in batches:
            ids = tbl.column("doc_id").to_pylist()
            texts = tbl.column("text").to_pylist()
            out_ids: list = []
            out_bands: list = []
            join = " ".join
            for doc_id, t in zip(ids, texts):
                if t is None:
                    continue
                toks = t.split(" ")
                n = len(toks)
                if n < k:
                    continue
                # compare raw digests: hex encoding is byte-order-
                # preserving, so the min digest IS the min hex string
                mins: list = [None] * n_seeds
                for j in range(n - k + 1):
                    sh = join(toks[j:j + k])
                    digs = cache.get(sh)
                    if digs is None:
                        if len(cache) > _HASH_CACHE_MAX:
                            cache.clear()
                        b = sh.encode("utf-8")
                        digs = []
                        for s in range(n_seeds):
                            d = bases[s].copy()
                            d.update(b)
                            digs.append(d.digest())
                        cache[sh] = digs
                    for s in range(n_seeds):
                        h = digs[s]
                        if mins[s] is None or h < mins[s]:
                            mins[s] = h
                out_ids.append(doc_id)
                hexes = [m.hex() for m in mins]
                out_bands.append([
                    md5("".join(hexes[b * r:(b + 1) * r]).encode())
                    .hexdigest()
                    for b in range(n_bands)
                ])
            yield pa.record_batch({
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "bands": pa.array(
                    out_bands, type=pa.list_(pa.string())
                ),
            })

    return ensure_scan_parallelism(
        documents.select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        )
    ).mapInArrow(kernel, "doc_id long, bands array<string>")


def minhash_bands(
    documents: DataFrame, n_seeds: int = 8, k: int = 3,
    portable_hash: bool = True,
) -> DataFrame:
    """MinHash signature (lexicographic/numeric min per seed) + 2 LSH
    band hashes of 4 rows each. Candidate duplicate groups share a band.

    ``portable_hash=True`` (the oracled default) derives hashes from md5
    hex digests so the exact same values are computable in ANSI SQL.
    ``portable_hash=False`` is the production path: xxhash64 (JVM
    intrinsic, no string materialization) — same algorithm, different
    hash family, ~2x cheaper per token at corpus scale."""
    if portable_hash:
        # map-only Arrow kernel (see _minhash_bands_arrow): no explode,
        # no groupBy shuffle, md5 at C speed — identical values
        sig = _minhash_bands_arrow(documents, n_seeds, 2, k)
        return sig.select(
            "doc_id",
            F.element_at("bands", 1).alias("band_a"),
            F.element_at("bands", 2).alias("band_b"),
        )
    sh = shingle_table(documents, k)
    seed_hash = lambda s: F.xxhash64(  # noqa: E731
        F.lit(f"{s}:"), F.col("shingle")
    )
    band_hash = lambda cols: F.xxhash64(*cols)  # noqa: E731
    cast = lambda c: c.cast("string")  # noqa: E731
    aggs = [F.min(seed_hash(s)).alias(f"m{s}") for s in range(n_seeds)]
    sig = sh.groupBy("doc_id").agg(*aggs)
    half = n_seeds // 2
    band_a = band_hash([F.col(f"m{s}") for s in range(0, half)])
    band_b = band_hash([F.col(f"m{s}") for s in range(half, n_seeds)])
    return sig.select(
        "doc_id", cast(band_a).alias("band_a"), cast(band_b).alias("band_b")
    )


def minhash_band_table(
    documents: DataFrame, n_seeds: int = 8, n_bands: int = 2,
    k: int = 3, portable_hash: bool = True,
) -> DataFrame:
    """General (bands x rows) MinHash LSH in LONG form: one
    (doc_id, band) row per band — the tunable API behind the fixed
    2-band ``minhash_bands`` (whose wide schema the oracles pin).
    More bands with fewer rows each = higher candidate recall at
    lower similarity (the standard S-curve trade:
    P(candidate) = 1-(1-j^r)^b); n_seeds must divide into n_bands.
    At n_bands=2 the band values are bit-identical to
    minhash_bands' band_a/band_b."""
    if n_seeds % n_bands != 0:
        raise ValueError("n_bands must divide n_seeds")
    r = n_seeds // n_bands
    if portable_hash:
        # map-only Arrow kernel (see _minhash_bands_arrow): no explode,
        # no groupBy shuffle, md5 at C speed — identical values
        sig = _minhash_bands_arrow(documents, n_seeds, n_bands, k)
        return sig.select("doc_id", F.explode("bands").alias("band"))
    sh = shingle_table(documents, k)
    seed_hash = lambda s: F.xxhash64(  # noqa: E731
        F.lit(f"{s}:"), F.col("shingle")
    )
    band_hash = lambda cols: F.xxhash64(*cols)  # noqa: E731
    cast = lambda c: c.cast("string")  # noqa: E731
    aggs = [F.min(seed_hash(s)).alias(f"m{s}") for s in range(n_seeds)]
    sig = sh.groupBy("doc_id").agg(*aggs)
    bands = F.array(*[
        cast(band_hash([F.col(f"m{s}")
                        for s in range(b * r, (b + 1) * r)]))
        for b in range(n_bands)
    ])
    return sig.select("doc_id", F.explode(bands).alias("band"))


def minhash_dedup(
    documents: DataFrame, n_seeds: int = 8, k: int = 3,
    n_bands: int = 2,
) -> DataFrame:
    """Near-dup dedup decision: among docs sharing an LSH band, keep the
    smallest doc_id (the standard minhash-band dedup pass; at scale the
    exact-jaccard verify runs only within these buckets).
    ``n_bands`` tunes candidate recall (see minhash_band_table); the
    default 2 matches the oracled minhash_bands layout exactly.

    The decision table is TOTAL over the input: documents too short to
    shingle (< k tokens) produce no bands, so they are left-joined back
    and kept as their own keepers — a consumer can treat this as a
    complete keep/drop decision."""
    both = minhash_band_table(documents, n_seeds, n_bands, k)
    keeper = both.groupBy("band").agg(F.min("doc_id").alias("keep_id"))
    decided = (
        both.join(keeper, "band")
        .groupBy("doc_id")
        .agg(F.min("keep_id").alias("keep_id"))
    )
    all_docs = documents.select(F.col("doc_id").cast("long").alias("doc_id"))
    total = all_docs.join(decided, "doc_id", "left")
    return total.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.coalesce(F.col("keep_id"), F.col("doc_id")).cast("long").alias("keep_id"),
        (
            F.col("doc_id")
            == F.coalesce(F.col("keep_id"), F.col("doc_id"))
        ).alias("is_kept"),
    )


def dsir_weights(
    raw: DataFrame, target: DataFrame, n_buckets: int = 4096,
    salt: str = "ds1",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score each raw
    document by the log-likelihood ratio of its hashed n-gram features
    (unigram + bigram occurrences hashed into ``n_buckets``) under the
    TARGET distribution vs the RAW distribution. Resampling keeps the
    highest-weight documents, tilting a crawl toward a target domain
    without training a classifier — the standard lightweight
    data-selection pass ahead of quality models.

    Exact, portable arithmetic: bucket probabilities are add-one
    smoothed; each bucket's log ratio
    log2((cnt_t+1)/(N_t+B)) - log2((cnt_r+1)/(N_r+B)) is rounded to
    1e-6 fixed point ONCE per bucket, and a document's weight is the
    INTEGER sum of its features' fixed-point ratios — associative, so
    identical under any partitioning, and exactly what the ANSI-SQL
    oracle computes. No per-doc division: (weight_micro, n_features)
    lets the consumer normalize (or Gumbel-sample) as it likes.

    Scale shape: both distribution builds are feature-explode ->
    groupBy(bucket) with map-side partials collapsing into at most
    ``n_buckets`` rows; the per-bucket ratio table (<= n_buckets rows)
    broadcasts to the raw side's feature stream; one integer agg per
    doc. No windows, and no joins on Zipf-heavy token keys — the
    bucket key is uniform by construction, which is the whole point of
    the hashing trick at 10^12 documents.
    """
    B = int(n_buckets)

    def feats(df: DataFrame) -> DataFrame:
        """(doc_id, bucket, c) — per-doc hashed-feature COUNTS via one
        mapInArrow pass (guide §4.2 + §2.3 map-side pre-aggregation):
        the former Catalyst shape exploded every unigram/bigram
        occurrence and paid an md5 + base-16 conv per row; the kernel
        hashes each distinct gram once per batch (C-speed md5, Zipf
        cache) and emits per-(doc, bucket) counts, so every downstream
        aggregate sums ``c`` instead of counting occurrence rows —
        identical integers, far fewer rows through the exchanges."""
        import pyarrow as pa

        def kernel(batches):
            from hashlib import md5

            pre = f"{salt}:".encode()
            cache = _DSIR_BUCKET_CACHE.setdefault((salt, B), {})

            def bucket_of(g: str):
                b = cache.get(g)
                if b is None:
                    if len(cache) > _HASH_CACHE_MAX:
                        cache.clear()
                    h = md5(pre + g.encode("utf-8")).hexdigest()
                    b = int(h[:8], 16) % B
                    cache[g] = b
                return b

            for tbl in batches:
                ids = tbl.column("doc_id").to_pylist()
                texts = tbl.column("text").to_pylist()
                out_id: list = []
                out_b: list = []
                out_c: list = []
                for doc_id, t in zip(ids, texts):
                    if t is None:
                        continue
                    toks = t.split(" ")
                    counts: dict = {}
                    for g in toks:
                        b = bucket_of(g)
                        counts[b] = counts.get(b, 0) + 1
                    for a, b2 in zip(toks, toks[1:]):
                        b = bucket_of(a + " " + b2)
                        counts[b] = counts.get(b, 0) + 1
                    out_id.extend([doc_id] * len(counts))
                    out_b.extend(counts.keys())
                    out_c.extend(counts.values())
                yield pa.record_batch({
                    "doc_id": pa.array(out_id, type=pa.int64()),
                    "bucket": pa.array(out_b, type=pa.int64()),
                    "c": pa.array(out_c, type=pa.int64()),
                })

        return ensure_scan_parallelism(
            df.select(
                F.col("doc_id").cast("long").alias("doc_id"), "text"
            )
        ).mapInArrow(kernel, "doc_id long, bucket long, c long")

    raw_feats = feats(raw)
    raw_cnt = raw_feats.groupBy("bucket").agg(
        F.sum("c").cast("long").alias("cnt_r")
    )
    tgt_cnt = feats(target).groupBy("bucket").agg(
        F.sum("c").cast("long").alias("cnt_t")
    )
    # raw docs only ever hit raw-side buckets, so the ratio domain is
    # the raw bucket table; totals ride a 1-row broadcast cross join
    joined = raw_cnt.join(tgt_cnt, "bucket", "left").na.fill(
        {"cnt_t": 0}
    )
    # totals from the FULL count tables: N_t includes target buckets
    # no raw feature hashes into (they still carry probability mass)
    totals = raw_cnt.agg(F.sum("cnt_r").alias("n_r")).crossJoin(
        tgt_cnt.agg(F.sum("cnt_t").alias("n_t"))
    )
    ratio = joined.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.round(
            (
                F.log2(F.col("cnt_t") + 1)
                - F.log2(F.col("n_t") + F.lit(B))
                - F.log2(F.col("cnt_r") + 1)
                + F.log2(F.col("n_r") + F.lit(B))
            )
            * 1e6
        ).cast("long").alias("lr_micro"),
    )
    return (
        raw_feats.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("c") * F.col("lr_micro")).cast("long")
            .alias("weight_micro"),
            F.sum("c").cast("long").alias("n_features"),
        )
    )


def minhash_incremental_dedup(
    new_docs: DataFrame, stored_bands: DataFrame,
    n_seeds: int = 8, n_bands: int = 2, k: int = 3,
    portable_hash: bool = True,
) -> DataFrame:
    """Cross-crawl incremental near-dup gate — the MinHash analogue of
    the historical Bloom gate (streaming/stream.py): a NEW crawl batch
    is deduped against an already-signed history WITHOUT recomputing
    history signatures. ``stored_bands`` is the persisted
    minhash_band_table output for the historical corpus ((doc_id, band)
    long form; must be built with the same n_seeds/n_bands/k/hash
    family, and doc_ids must be unique across history + new — monotone
    crawl ids satisfy both).

    Decision semantics are EXACTLY batch minhash_dedup over the union
    corpus restricted to the new batch's rows (when historical ids
    precede new ids): per band the keeper is the smallest doc_id across
    history + new, and each new doc adopts the smallest keeper across
    its bands. Only the new batch is shingled; history costs one scan
    of its stored band table — at crawl scale that is the difference
    between re-shingling 10^12 historical docs per batch and reading a
    compact (doc_id, band) parquet.

    Returns (doc_id, keep_id, is_kept, dup_of_history), total over
    new_docs (shingle-less docs keep themselves). dup_of_history marks
    docs whose keeper lives in history; the winner's provenance rides
    the min-struct through both aggregations, so the flag costs no
    extra join.
    """
    new_bands = minhash_band_table(
        new_docs, n_seeds=n_seeds, n_bands=n_bands, k=k,
        portable_hash=portable_hash,
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "band",
        F.lit(False).alias("is_hist"),
    )
    hist = stored_bands.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("band").cast("string").alias("band"),
        F.lit(True).alias("is_hist"),
    )
    both = new_bands.unionByName(hist)
    keeper = both.groupBy("band").agg(
        F.min(F.struct("doc_id", "is_hist")).alias("kw")
    )
    decided = (
        new_bands.select("doc_id", "band")
        .join(keeper, "band")
        .groupBy("doc_id")
        .agg(F.min("kw").alias("kw"))
    )
    all_new = new_docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    return (
        all_new.join(decided, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("kw.doc_id"), F.col("doc_id"))
            .cast("long").alias("keep_id"),
            (
                F.col("doc_id")
                == F.coalesce(F.col("kw.doc_id"), F.col("doc_id"))
            ).alias("is_kept"),
            F.coalesce(F.col("kw.is_hist"), F.lit(False))
            .alias("dup_of_history"),
        )
    )


def minhash_dedup_best(
    documents: DataFrame, score_col: str = "n_chars",
    n_seeds: int = 8, k: int = 3, n_bands: int = 2,
) -> DataFrame:
    """Quality-aware near-dup keeper selection: like minhash_dedup,
    but each LSH band keeps its BEST-scoring document (``score_col``
    descending, doc_id ascending on ties) instead of the smallest id —
    what production corpus dedup actually wants (keep the longest /
    cleanest copy of a template family, not whichever crawled first).
    A document adopts the best-scoring keeper across its bands (same
    tie-break); ties are broken deterministically, so the decision is
    partitioning-independent.

    Same scale shape as minhash_dedup: bucketed band aggregation with
    map-side partials (max(struct) instead of min), join back on the
    band key, one agg per doc, left-join totalization for
    shingle-less docs. No windows, no pair joins.

    Returns (doc_id, keep_id, keep_score, is_kept), total over input.
    """
    score = F.col(score_col).cast("long")
    docs = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        score.alias("_score"),
    )
    bands = minhash_band_table(documents, n_seeds, n_bands, k).select(
        F.col("doc_id").cast("long").alias("doc_id"), "band"
    ).join(docs, "doc_id")
    # winner rides a max(struct): (score, -doc_id) so the tie-break is
    # the SMALLEST id among equal scores
    winner = F.struct(
        F.col("_score").alias("s"),
        (-F.col("doc_id")).alias("neg_id"),
    )
    keeper = bands.groupBy("band").agg(F.max(winner).alias("kw"))
    decided = (
        bands.select("doc_id", "band")
        .join(keeper, "band")
        .groupBy("doc_id")
        .agg(F.max("kw").alias("kw"))
        .select(
            "doc_id",
            (-F.col("kw.neg_id")).cast("long").alias("keep_id"),
            F.col("kw.s").cast("long").alias("keep_score"),
        )
    )
    return (
        docs.join(decided, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("keep_id", "doc_id").cast("long").alias("keep_id"),
            F.coalesce("keep_score", "_score").cast("long")
            .alias("keep_score"),
            (
                F.col("doc_id") == F.coalesce("keep_id", "doc_id")
            ).alias("is_kept"),
        )
    )


def simhash64(documents: DataFrame) -> DataFrame:
    """64-bit SimHash over tokens: per bit, sign of the sum of token
    weights (+1/-1 per md5-derived bit).

    Token bits come from the md5 hex digest (digit k, bit k%4) rather
    than xxhash64 so the exact same hash is computable in ANSI SQL —
    the DuckDB oracle in __spark_entry__ mirrors it digit for digit.

    Computed per document in ONE mapInArrow pass (guide §4.2): the
    former Catalyst shape exploded every token and shuffled 16 digit
    columns per token into a 64-conditional-sum groupBy; the kernel
    hashes each DISTINCT token once per batch (md5 at C speed, Zipf
    cache), accumulates the 64 per-bit counts in NumPy, and emits one
    row per doc with zero exchanges. Bit-exact: the first 16 hex
    digits map to bits via mask = int(hex[:16][::-1], 16) — digit k
    contributes its 4 low bits at positions 4k..4k+3, exactly the
    instr()-derived digit/bit layout — and ``bit set iff
    sum(+-1) > 0`` is ``2 * ones > n_tokens``. A doc with null text
    emits nothing (explode of a null array), matching the groupBy."""
    import numpy as np
    import pyarrow as pa

    def kernel(batches):
        from hashlib import md5

        cache = _SIMHASH_MASK_CACHE  # worker-resident, see above
        shifts = np.arange(64, dtype=np.uint64)
        weights = (np.uint64(1) << shifts)

        def mask_of(tok: str):
            m = cache.get(tok)
            if m is None:
                if len(cache) > _HASH_CACHE_MAX:
                    cache.clear()
                m = int(md5(tok.encode("utf-8")).hexdigest()[15::-1], 16)
                cache[tok] = m
            return m

        def flush(out_ids, masks, starts, n_toks):
            marr = np.array(masks, dtype=np.uint64)
            bits = (
                (marr[:, None] >> shifts[None, :]) & np.uint64(1)
            ).astype(np.int32)
            ones = np.add.reduceat(bits, np.array(starts), axis=0)
            n = np.array(n_toks, dtype=np.int32)
            set_bits = (2 * ones) > n[:, None]
            sim = (set_bits.astype(np.uint64) * weights[None, :]).sum(
                axis=1, dtype=np.uint64
            ).view(np.int64)
            return pa.record_batch({
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "simhash": pa.array(sim, type=pa.int64()),
            })

        for tbl in batches:
            ids = tbl.column("doc_id").to_pylist()
            texts = tbl.column("text").to_pylist()
            out_ids: list = []
            masks: list = []
            starts: list = []
            n_toks: list = []
            got_any = False
            for doc_id, t in zip(ids, texts):
                if t is None:
                    continue
                toks = t.split(" ")
                out_ids.append(doc_id)
                starts.append(len(masks))
                n_toks.append(len(toks))
                masks.extend(mask_of(tok) for tok in toks)
                # bound the bit matrix: ~200k tokens x 64 x int32
                if len(masks) >= 200_000:
                    yield flush(out_ids, masks, starts, n_toks)
                    got_any = True
                    out_ids, masks, starts, n_toks = [], [], [], []
            if out_ids:
                yield flush(out_ids, masks, starts, n_toks)
            elif not got_any:
                yield pa.record_batch({
                    "doc_id": pa.array([], type=pa.int64()),
                    "simhash": pa.array([], type=pa.int64()),
                })

    return ensure_scan_parallelism(
        documents.select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        )
    ).mapInArrow(kernel, "doc_id long, simhash long")


def label_components(
    membership: DataFrame, max_iter: int = 30
) -> DataFrame:
    """Connected components of a bipartite membership graph
    (``id`` <-> ``grp``): returns (id, component) where component is
    the smallest id in the id's connected component (two ids are
    connected when they share a grp, transitively).

    Min-label propagation in its alternating-aggregation form (the
    MapReduce-CC family of Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14): each round a grp takes the min
    label of its members (groupBy grp) and an id takes the min over
    its grps (groupBy id), then one pointer-jumping hop
    (lbl <- lbl[lbl], a self-join on the label) halves remaining
    chain depth, giving O(log diameter) rounds instead of
    O(diameter). Every round is a fixed number of key-partitioned
    shuffles; labels monotonically decrease, so the fixed point — all
    members of a grp share one label, every label is a root — is the
    exact component minimum. The loop localCheckpoints each round: an
    iterative plan otherwise grows multiplicatively and re-executes
    from the scan every round (on a cluster, set a reliable
    checkpoint dir and use checkpoint() for executor-loss safety).

    Termination is by convergence (zero labels changed, one scalar
    count per round) with ``max_iter`` as the adversarial-diameter
    backstop; 30 doubling rounds cover any component a shuffle can
    hold.
    """
    memb = membership.select(
        F.col(membership.columns[0]).cast("long").alias("id"),
        F.col(membership.columns[1]).alias("grp"),
    ).distinct()
    # lazy cuts: materialization fuses into the first consumer's job
    # (the convergence count below) instead of costing a scheduled
    # job per round
    memb = memb.localCheckpoint(eager=False)
    labels = memb.select("id").distinct().select(
        "id", F.col("id").alias("lbl")
    ).localCheckpoint(eager=False)
    for _ in range(max_iter):
        grp_min = (
            memb.join(labels, "id")
            .groupBy("grp")
            .agg(F.min("lbl").alias("grp_lbl"))
        )
        via_grp = (
            memb.join(grp_min, "grp")
            .groupBy("id")
            .agg(F.min("grp_lbl").alias("new_lbl"))
        )
        stepped = labels.join(via_grp, "id", "left").select(
            "id",
            F.col("lbl").alias("old"),
            F.least(
                F.col("lbl"), F.coalesce(F.col("new_lbl"), F.col("lbl"))
            ).alias("lbl"),
        )
        # pointer jumping: follow the label one hop (labels always
        # reference ids, min includes self, so the hop stays inside
        # the component and is monotone)
        roots = stepped.select(
            F.col("id").alias("r_id"), F.col("lbl").alias("r_lbl")
        )
        # the change flag rides INSIDE the checkpointed frame, so the
        # convergence probe below is a filter over the fresh cache —
        # the former separate jumped-join-labels count job (one more
        # shuffle per round) is gone
        jumped = (
            stepped.join(roots, stepped.lbl == roots.r_id, "left")
            .select(
                "id",
                F.coalesce(F.col("r_lbl"), F.col("lbl")).alias("lbl"),
                (
                    F.coalesce(F.col("r_lbl"), F.col("lbl"))
                    < F.col("old")
                ).alias("chg"),
            )
            .localCheckpoint(eager=False)
        )
        changed = jumped.filter(F.col("chg")).limit(1).count()
        labels = jumped.select("id", "lbl")
        if changed == 0:
            break
    return labels.select("id", F.col("lbl").alias("component"))


def minhash_dedup_cc(
    documents: DataFrame, n_seeds: int = 8, k: int = 3,
    n_bands: int = 2,
) -> DataFrame:
    """Transitive-closure dedup decision: cluster_id is the smallest
    doc_id in the doc's CONNECTED COMPONENT of the band-sharing graph.

    minhash_dedup's single-pass rule is intentionally one shuffle
    deep; on a chain A~B~C (A shares a band with B, B with C, A NOT
    with C) it can emit keep(C)=B while B itself is dropped for A — a
    consumer keeping only is_kept rows then drops B AND C but keeps a
    near-dup pair (A, C-cluster) split across keepers. This operator
    closes the relation: every chained group collapses to one
    canonical doc. Costs O(log diameter) shuffle rounds via
    label_components; run it on the dup-dense slice at 10^12 scale,
    the one-pass decision everywhere else.

    Total over the input: shingle-less docs are their own clusters.
    """
    memb = minhash_band_table(documents, n_seeds, n_bands, k)
    comp = label_components(memb)
    all_docs = documents.select(F.col("doc_id").cast("long").alias("doc_id"))
    total = all_docs.join(
        comp.withColumnRenamed("id", "doc_id"), "doc_id", "left"
    )
    cluster = F.coalesce(F.col("component"), F.col("doc_id"))
    return total.select(
        "doc_id",
        cluster.cast("long").alias("cluster_id"),
        (F.col("doc_id") == cluster).alias("is_canonical"),
    )


def line_dedup(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level line deduplication (the CCNet-style pass: crawl
    boilerplate — cookie banners, nav rows, footers — repeats across
    MILLIONS of pages, so dedup below document granularity is what
    actually removes it). A line survives only at its FIRST corpus
    occurrence, ordered by (doc_id, position); every later copy in any
    document is dropped, and documents are reassembled from their
    surviving lines in order. Blank (whitespace-only) lines are exempt
    — they are paragraph STRUCTURE, not repeatable content, and always
    survive in place.

    Plan shape: posexplode -> one groupBy(line) with a min(struct)
    partial aggregate (the first-owner table; map-side combine eats
    the heavy hitters, so a banner line occurring 10^8 times ships one
    row per map task, not 10^8 shuffle rows) -> one groupBy(doc_id)
    reassembly with sort_array (no window, no per-doc ordering shuffle
    beyond the agg itself). There is NO join back on the line key: the
    min(struct(doc_id, pos)) winner rows ARE the kept occurrences, so
    the kept set is a pure projection of the aggregate — the Zipf-head
    banner line can never concentrate a join partition because no
    line-keyed join exists. Total over the input: a document whose
    every line is owned elsewhere comes back with text_dedup = ''.
    """
    lines = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    # blank lines are STRUCTURE (paragraph boundaries), not content —
    # deduping them would merge paragraphs corpus-wide after the first
    # document; they bypass the first-owner pass entirely
    blank = F.trim(F.col("line")) == F.lit("")
    content = lines.filter(~blank)
    first_owner = content.groupBy("line").agg(
        F.min(F.struct("doc_id", "pos")).alias("first")
    )
    # (doc_id, pos) identifies exactly one line, so projecting the
    # winner struct reconstructs the kept occurrence — no join back
    kept = (
        first_owner.select(
            F.col("first.doc_id").alias("doc_id"),
            F.col("first.pos").alias("pos"),
            "line",
        )
        .unionByName(lines.filter(blank).select("doc_id", "pos", "line"))
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("text_dedup"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(F.split(F.col(text_col), "\n")).alias("n_lines"),
    )
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.col("n_lines").cast("long").alias("n_lines"),
    )


def mixture_sample(
    documents: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    salt: str = "mix1",
) -> DataFrame:
    """Data mixing: draw a per-source token budget
    (``weight * total_tokens``) from each corpus — the pretraining
    step that turns N heterogeneous corpora into one mixture with
    chosen proportions. Within a source, documents are taken in a
    reproducible SHUFFLED order (md5(salt:doc_id) — prefix-by-doc_id
    would bias the sample toward whatever the upstream writer emitted
    first) until the running token count crosses the budget; the
    boundary document is included, so every non-empty source meets
    its budget. Sources without a weight contribute nothing.

    Same scale shape as pack_shards: the cumulative sum is partitioned
    by source, so no global-order window funnels 10^12 rows through
    one task; determinism is total because (md5 key, doc_id) is a
    total order and the hash is engine-independent.
    """
    from pyspark.sql.window import Window

    budget = None
    for src, wt in sorted(weights.items()):
        clause = F.when if budget is None else budget.when
        budget = clause(
            F.col("source") == src,
            # round, don't truncate: 0.7*350 is 244.9999... in
            # binary floating point; int() would lose the boundary
            # document the stated weight*total contract includes
            F.lit(int(round(wt * total_tokens))).cast("long"),
        )
    budget = (
        budget.otherwise(F.lit(0).cast("long"))
        if budget is not None
        else F.lit(0).cast("long")
    )
    w = Window.partitionBy("source").orderBy("mix_key", "doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_cum = documents.select(
        "source",
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(tokens_col()).cast("long").alias("n_tokens"),
        F.md5(
            F.concat_ws(":", F.lit(salt), F.col("doc_id"))
        ).alias("mix_key"),
        budget.alias("budget"),
    ).withColumn("cum", F.sum("n_tokens").over(w))
    return with_cum.filter(
        F.col("cum") - F.col("n_tokens") < F.col("budget")
    ).select("source", "doc_id", "n_tokens")


def linear_quality_score(
    documents: DataFrame,
    weights: list[int] | None = None,
    bias: int = 0,
) -> DataFrame:
    """Model-based quality scoring plumbing (the fastText-classifier
    shape used by LLM data pipelines: hashed bag-of-words -> linear
    score -> threshold). Each token hashes to a feature bucket (first
    8 md5 hex digits mod n_buckets — engine-independent); the document
    score is the mean bucket weight plus a bias.

    ``weights`` are INTEGER tenths (e.g. 7 = 0.7): the per-document
    accumulation is then an exact integer sum — order-independent and
    identical on every engine and partitioning — with ONE final f64
    division, the same determinism discipline as unigram_stats. A real
    deployment broadcasts its trained weights as this literal array
    (any size; the array lives in the plan, not in a join); the
    default is a deterministic stand-in so the plumbing is testable
    without a trained model.

    Shape: one projection (no explode — the per-token work happens
    inside array transform/aggregate on the row), no shuffle, no
    Python. Empty documents score exactly bias/10."""
    # input-split guard: parallelize the text-heavy work when
    # the scan is a single unsplittable partition (guide §2.5)
    documents = ensure_scan_parallelism(documents)
    if weights is None:
        # stand-in weights in [-10, 10] tenths, fixed by bucket index
        weights = [((b * 37) % 21) - 10 for b in range(64)]
    n_buckets = len(weights)
    toks = tokens_col()
    warr = F.array(*[F.lit(int(w)).cast("long") for w in weights])
    tok_w = F.transform(
        toks,
        lambda t: F.element_at(
            warr,
            (
                F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
                % n_buckets
                + 1
            ).cast("int"),
        ),
    )
    n_tok = F.size(toks).cast("long")
    s = F.aggregate(
        tok_w, F.lit(0).cast("long"), lambda acc, w: acc + w
    )
    score = F.when(n_tok == 0, F.lit(float(bias) / 10.0)).otherwise(
        F.round(
            (s.cast("double") / n_tok.cast("double") + F.lit(float(bias)))
            / F.lit(10.0),
            6,
        )
    )
    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        score.alias("quality_score"),
    )


def length_quantiles(documents: DataFrame) -> DataFrame:
    """Per-language length-distribution telemetry: exact p50/p90/p99
    of n_chars plus the doc count — the dashboard numbers curation
    jobs watch to catch a broken extractor or a crawl-mix shift (a
    p99 collapse means truncation upstream; a p50 collapse means
    boilerplate won).

    EXACT percentiles (Spark's `percentile`, linear interpolation —
    bit-identical to DuckDB's quantile_cont) — one per-group sort of
    n_chars values. That is fine for the ~10^2-cardinality lang key
    whose groups are telemetry-sized; at 10^12 rows switch the call
    site to approx_percentile(n_chars, ...) (t-digest family, no full
    sort) and accept the documented error bound — same schema, same
    query shape."""
    q = F.expr("percentile(n_chars, array(0.5, 0.9, 0.99))")
    agg = documents.groupBy("lang").agg(
        q.alias("_q"), F.count("*").cast("long").alias("n_docs")
    )
    return agg.select(
        "lang",
        F.col("_q")[0].alias("p50_chars"),
        F.col("_q")[1].alias("p90_chars"),
        F.col("_q")[2].alias("p99_chars"),
        "n_docs",
    )


def unigram_cross_entropy(documents: DataFrame) -> DataFrame:
    """CCNet-style LM quality bucketing (Wenzek et al., "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl
    Data"): score each document by its cross-entropy under a corpus
    unigram model, then split every source into head/middle/tail
    buckets at the per-source quartiles — head (lowest cross-entropy,
    most in-domain) is what a pretraining mix keeps first.

    H(d) = log2(N_source) - (1/n_d) * sum_t log2(cnt(t)); cnt comes
    from the corpus itself so there is no OOV mass (cnt >= 1).

    Cross-engine determinism: a raw f64 sum of logs is ordering-
    dependent, so each token's log2(cnt) is first rounded to 1e-6
    fixed point and summed as INTEGERS (associative, partitioning-
    independent); the per-doc score stays an integer (truncating
    division by n_d). Bucket thresholds are the sorted per-source
    score elements at ranks ceil(n/4) and ceil(3n/4) — integer rank
    selection, NOT interpolated percentiles: Spark's `percentile`
    and DuckDB's quantile_cont interpolate with different float
    expressions (lower*(1-f)+upper*f vs lower+(upper-lower)*f),
    which can disagree by 1 ulp exactly when tied values straddle a
    quartile and flip a bucket; element-at-rank on integers cannot.

    Scale shape: explode -> vocab groupBy (map-side partials; Zipf-
    small vs the token stream) -> join back on (source, tok) -> one
    integer per-doc agg -> two tiny broadcast joins (per-source token
    totals, per-source thresholds). No windows, no low-cardinality
    window keys. The threshold agg collects per-source doc scores
    (fine to ~10^8 docs/source); at 10^12 docs derive thresholds
    from a deterministic_sample (hash filter) — same query shape."""
    documents = ensure_scan_parallelism(documents)
    toks = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.explode(tokens_col()).alias("tok"),
    )
    vocab = toks.groupBy("source", "tok").agg(
        F.count("*").cast("long").alias("cnt")
    )
    # per-type fixed-point log2(cnt), computed once per vocab entry
    vocab = vocab.withColumn(
        "lp_micro",
        F.round(F.log2(F.col("cnt")) * F.lit(1e6), 0).cast("long"),
    )
    totals = vocab.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("n_total")
    ).withColumn(
        "logN_micro",
        F.round(F.log2(F.col("n_total")) * F.lit(1e6), 0).cast("long"),
    )
    per_doc = (
        toks.join(vocab, ["source", "tok"])
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("lp_micro").cast("long").alias("_sum_lp"),
        )
    )
    scored = per_doc.join(F.broadcast(totals), "source").select(
        "doc_id",
        "source",
        "n_tokens",
        (
            F.col("logN_micro")
            - F.expr("_sum_lp div n_tokens")
        ).cast("long").alias("_h_micro"),
    )
    # one collect + ONE sort per source; rank extraction happens in
    # the post-agg projection so the broadcast carries only two longs
    thresholds = (
        scored.groupBy("source")
        .agg(
            F.array_sort(F.collect_list("_h_micro")).alias("_sorted"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            "source",
            F.expr(
                "element_at(_sorted, cast(ceil(0.25 * _n) as int))"
            ).alias("_q25"),
            F.expr(
                "element_at(_sorted, cast(ceil(0.75 * _n) as int))"
            ).alias("_q75"),
        )
    )
    return scored.join(F.broadcast(thresholds), "source").select(
        "doc_id",
        "source",
        "n_tokens",
        F.round(F.col("_h_micro").cast("double") / F.lit(1e6), 6).alias(
            "cross_entropy"
        ),
        F.when(F.col("_h_micro") <= F.col("_q25"), F.lit("head"))
        .when(F.col("_h_micro") > F.col("_q75"), F.lit("tail"))
        .otherwise(F.lit("middle"))
        .alias("bucket"),
    )


def dup_ngram_fraction(
    documents: DataFrame, k: int = 5, threshold: float = 0.3
) -> DataFrame:
    """RefinedWeb/Gopher-style corpus-duplicate n-gram filter
    (Penedo et al. 2023 §3.3): for each document, the fraction of its
    DISTINCT word k-grams that also occur in at least one OTHER
    document. High fractions mark boilerplate/template pages that
    survive exact and near-dup passes because the novel remainder
    differs.

    Integer math end to end (counts, one final division, round 6) —
    deterministic under any partitioning.

    Scale shape: shingle explode (distinct per doc already, see
    _shingles) -> one groupBy on the shingle key for document
    frequency (map-side partials; Zipf head is the hot key but the
    agg is a count, not a pair join — no d^2 blowup, unlike
    ngram_jaccard which needs the df cap). There is NO join back on
    the shingle key: a shingle with df == 1 occurs in exactly one
    document, so min(doc_id) in the same aggregate names its sole
    owner, and a doc's duplicated-shingle count is just
    n_ngrams - (its unique-shingle count) — both per-doc aggregates
    keyed on doc_id, whose multiplicity is bounded by document length,
    never by corpus-wide shingle popularity. Final left join for
    totality over input docs (docs shorter than k words have no
    shingles, frac 0)."""
    # no source column here: the df aggregate keys on the shingle
    # alone, so projecting source out before the explode sheds bytes
    # from the exchange (guide §2.3)
    docsh = _doc_shingles_arrow(documents, k, with_source=False)
    sh = docsh.select("doc_id", F.explode("shingles").alias("shingle"))
    uniq_per_doc = (
        sh.groupBy("shingle")
        .agg(
            F.count("*").cast("long").alias("_df"),
            F.min("doc_id").alias("_owner"),
        )
        .filter(F.col("_df") == 1)
        .groupBy(F.col("_owner").alias("doc_id"))
        .agg(F.count("*").cast("long").alias("_n_uniq"))
    )
    # per-doc distinct-shingle counts map-only off the unexploded
    # array (the former groupBy shuffled every shingle row to count
    # them); docs with zero shingles surface as n_ngrams = 0 exactly
    # like the missing-row + na.fill path did
    per_doc = (
        docsh.select(
            "doc_id", F.size("shingles").cast("long").alias("n_ngrams")
        )
        .join(uniq_per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_ngrams",
            (F.col("n_ngrams") - F.coalesce(F.col("_n_uniq"), F.lit(0)))
            .cast("long")
            .alias("_n_dup"),
        )
    )
    return (
        documents.select(F.col("doc_id").cast("long").alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .na.fill({"n_ngrams": 0, "_n_dup": 0})
        .select(
            "doc_id",
            "n_ngrams",
            F.when(
                F.col("n_ngrams") > 0,
                F.round(
                    F.col("_n_dup").cast("double")
                    / F.col("n_ngrams").cast("double"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_ngram_frac"),
            (
                F.when(
                    F.col("n_ngrams") > 0,
                    F.col("_n_dup").cast("double")
                    / F.col("n_ngrams").cast("double"),
                ).otherwise(F.lit(0.0))
                > F.lit(float(threshold))
            ).alias("flagged"),
        )
    )


_C4_TERMINALS = (".", "!", "?", '"')


def c4_filter(documents: DataFrame, min_words: int = 5,
              min_sentences: int = 3) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020, §2.2) as one fused
    projection — entirely inside whole-stage codegen, no shuffle:

    line level — keep only lines that (a) end in a terminal
    punctuation mark, (b) contain >= min_words words, (c) do not
    mention 'javascript';
    page level — drop the page when the raw text contains
    'lorem ipsum' or a curly brace (code), or when fewer than
    min_sentences sentences survive line cleaning.

    Output is total over input docs: cleaned_text plus the keep
    decision and the counters a curation dashboard tracks. At 10^12
    rows this is a pure map — partitioning-independent, no state.

    Staged projections on purpose: the line-filter lambda and the
    regexp sentence count are expensive, and naming each intermediate
    in its own select means every downstream column references the
    alias instead of re-inlining the expression (CollapseProject
    keeps stages apart when a non-cheap alias is referenced more
    than once) — one lambda evaluation per row, not five."""
    # input-split guard: parallelize the text-heavy work when
    # the scan is a single unsplittable partition (guide §2.5)
    documents = ensure_scan_parallelism(documents)
    keep_line = lambda ln: (
        F.right(F.rtrim(ln), F.lit(1)).isin(*_C4_TERMINALS)
        & (F.size(F.split(F.trim(ln), " ")) >= F.lit(min_words))
        & ~F.contains(F.lower(ln), F.lit("javascript"))
    )
    staged = (
        documents.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "text",
            F.split(F.col("text"), "\n").alias("_lines"),
        )
        .withColumn("_kept", F.filter(F.col("_lines"), keep_line))
        .withColumn("_cleaned", F.array_join(F.col("_kept"), "\n"))
        .withColumn(
            "_n_sent",
            F.regexp_count(F.col("_cleaned"), F.lit(r"[.!?]")),
        )
        .withColumn(
            "_drop",
            F.contains(F.lower(F.col("text")), F.lit("lorem ipsum"))
            | F.contains(F.col("text"), F.lit("{"))
            | (F.col("_n_sent") < F.lit(min_sentences)),
        )
    )
    return staged.select(
        "doc_id",
        F.size(F.col("_lines")).cast("long").alias("n_lines"),
        F.size(F.col("_kept")).cast("long").alias("n_kept_lines"),
        F.col("_n_sent").cast("long").alias("n_sentences"),
        (~F.col("_drop")).alias("kept"),
        F.when(~F.col("_drop"), F.col("_cleaned"))
        .otherwise(F.lit(None).cast("string"))
        .alias("cleaned_text"),
    )


def filter_funnel(
    documents: DataFrame,
    min_words: int = GOPHER_MIN_WORDS,
    max_words: int = GOPHER_MAX_WORDS,
    min_mean_word_len: float = GOPHER_MIN_MEAN_WORD_LEN,
    max_mean_word_len: float = GOPHER_MAX_MEAN_WORD_LEN,
    min_alpha_frac: float = GOPHER_MIN_ALPHA_FRAC,
    min_stop_hits: int = GOPHER_MIN_STOP_HITS,
) -> DataFrame:
    """Per-source filter-funnel telemetry: for each Gopher gate, how
    many documents pass it independently AND how many survive the
    gates applied in order — the dashboard numbers a curation job
    watches to see WHICH rule is eating the corpus (a pass-rate
    collapse on one gate after a crawl-mix shift is the first alarm).

    One projection of boolean flags (the exact _gopher_signal_cols
    rules) followed by one integer groupBy on source — map-side
    partials, output rows = |sources|. Pure counts, deterministic
    under any partitioning; linear at 10^12 rows."""
    n_words, mean_word_len, alpha_frac, stop_hits = _gopher_signal_cols()
    p_words = (n_words >= min_words) & (n_words <= max_words)
    p_wordlen = (mean_word_len >= min_mean_word_len) & (
        mean_word_len <= max_mean_word_len
    )
    p_alpha = alpha_frac >= min_alpha_frac
    p_stop = stop_hits >= min_stop_hits

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    flags = documents.select(
        "source",
        p_words.alias("_pw"),
        p_wordlen.alias("_pl"),
        p_alpha.alias("_pa"),
        p_stop.alias("_ps"),
    )
    return flags.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        cnt(F.col("_pw")).alias("pass_words"),
        cnt(F.col("_pl")).alias("pass_wordlen"),
        cnt(F.col("_pa")).alias("pass_alpha"),
        cnt(F.col("_ps")).alias("pass_stopwords"),
        cnt(F.col("_pw") & F.col("_pl")).alias("surv_wordlen"),
        cnt(F.col("_pw") & F.col("_pl") & F.col("_pa")).alias(
            "surv_alpha"
        ),
        cnt(
            F.col("_pw") & F.col("_pl") & F.col("_pa") & F.col("_ps")
        ).alias("surv_all"),
    )


def span_dedup(
    documents: DataFrame, n: int = 3, text_col: str = "text",
    hot_min_count: int = 1024, hot_max_keys: int = 100_000,
) -> DataFrame:
    """C4 three-sentence-span deduplication (Raffel et al. 2020 §2.2:
    "we discarded all but one of any three-sentence span occurring
    more than once in the data set") — the sub-document dedup that
    removes syndicated article bodies and licence blurbs which
    line-level dedup misses because surrounding lines differ.

    Sentences split on the RE2/Java-common '[.!?] ' boundary (RE2 has
    no lookbehind, so the terminator is consumed; the rebuilt text
    joins surviving sentences with ' | ' — this operator feeds dedup
    decisions and span stats, not byte-preserving reconstruction).
    A span survives only at its FIRST corpus occurrence ordered by
    (doc_id, pos); every later occurrence drops its n sentences.

    Plan shape: one span groupBy with a min(struct) partial (map-side
    combine eats the 10^8-occurrence syndicated span), then the
    duplicate occurrences are found with a SKEW-PROOF two-phase
    join-back — unlike line_dedup, the duplicates themselves are
    needed here, so the occurrence table must be probed. The heaviest
    keys (count >= ``hot_min_count``, top ``hot_max_keys`` by count,
    deterministically ordered) are broadcast, so their occurrences
    resolve map-side and never enter a shuffled join; everything else
    goes through the equi-join whose per-key multiplicity is bounded
    below hot_min_count (or by the hot_max_keys-th hottest count) by
    construction — no reliance on AQE skew splitting. With no key
    over the threshold the hot table is empty and the plan degenerates
    to the plain join. Duplicate occurrences explode to their covered
    sentence positions, one anti-join removes them, one groupBy(doc)
    reassembles with sort_array — no windows anywhere. Total over
    input docs; a doc with fewer than n sentences has no spans and
    passes through unchanged."""
    # input-split guard: parallelize the text-heavy work when
    # the scan is a single unsplittable partition (guide §2.5)
    documents = ensure_scan_parallelism(documents)
    arr = F.split(F.col(text_col), r"[.!?] ")
    m = F.size(arr)
    span_struct = f"array<struct<pos:int,span:string>>"
    spans_arr = F.when(
        m >= n,
        F.transform(
            F.sequence(F.lit(1), m - (n - 1)),
            lambda i: F.struct(
                (i - 1).alias("pos"),
                F.concat_ws(" | ", F.slice(arr, i, n)).alias("span"),
            ),
        ),
    ).otherwise(F.array().cast(span_struct))
    spans = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(spans_arr).alias("s"),
    ).select("doc_id", F.col("s.pos").alias("pos"),
             F.col("s.span").alias("span"))
    first_owner = spans.groupBy("span").agg(
        F.min(F.struct("doc_id", "pos")).alias("first"),
        F.count(F.lit(1)).alias("_n"),
    )
    hot = (
        first_owner.filter(F.col("_n") >= hot_min_count)
        .orderBy(F.desc("_n"), "span")
        .limit(hot_max_keys)
        .select("span", F.col("first").alias("_hot_first"))
    )
    not_winner = lambda w: ~(
        (F.col("doc_id") == w["doc_id"]) & (F.col("pos") == w["pos"])
    )
    tagged = spans.join(F.broadcast(hot), "span", "left")
    hot_dups = tagged.filter(
        F.col("_hot_first").isNotNull()
        & not_winner(F.col("_hot_first"))
    ).select("doc_id", "pos")
    cold_dups = (
        tagged.filter(F.col("_hot_first").isNull())
        .select("doc_id", "pos", "span")
        .join(first_owner.select("span", "first"), "span")
        .filter(not_winner(F.col("first")))
        .select("doc_id", "pos")
    )
    covered = (
        hot_dups.unionByName(cold_dups)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (n - 1))
            ).alias("spos"),
        )
        .distinct()
    )
    sentences = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(arr).alias("spos", "sent"),
    )
    kept = sentences.join(covered, ["doc_id", "spos"], "anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("spos", "sent"))),
                lambda x: x["sent"],
            ),
            " | ",
        ).alias("text_dedup"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        m.alias("n_sentences"),
    )
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.col("n_sentences").cast("long").alias("n_sentences"),
    )


def tfidf_keywords(
    documents: DataFrame, top_k: int = 5, max_df_frac: float = 0.3,
    text_col: str = "text", broadcast_idf: bool = True,
) -> DataFrame:
    """Per-document TF-IDF keyword extraction: the standard corpus
    summarization / topic-tagging primitive. Returns one row per
    (doc_id, rank) with the token and its integer score.

    Determinism: idf is the fixed-point integer
    round(log2(n_docs / df) * 1e6) computed ONCE per vocab entry (the
    unigram_cross_entropy discipline — a raw f64 sum of logs is
    ordering-dependent; the 1e-6 rounding absorbs libm/JVM ULPs), and
    the per-doc score tf * idf_micro is BIGINT, so ranking is
    bit-exact under any partitioning. Ties break by token text.

    Scale shape: one (doc_id, tok) count aggregate (map-side
    partials), one df aggregate over it, a broadcast join to attach
    idf (vocab-sized — fits comfortably to ~10^8 entries; set
    ``broadcast_idf=False`` past that and the join shuffles on tok,
    where the ``max_df_frac`` cap has already REMOVED the Zipf head:
    a token in more than that fraction of docs is a stopword, not a
    keyword, so the hot keys never reach the join), then one per-doc
    top-k via sort+slice inside an aggregate — no Window, no global
    sort. Docs whose every token was df-capped yield no rows."""
    # input-split guard: parallelize the text-heavy work when
    # the scan is a single unsplittable partition (guide §2.5)
    documents = ensure_scan_parallelism(documents)
    toks = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(tokens_col(text_col)).alias("tok"),
    ).filter(F.col("tok") != "")
    tf = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    n_docs = documents.select(
        F.countDistinct("doc_id").alias("n_docs")
    )
    idf = (
        tf.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(
            F.col("df").cast("double")
            <= F.lit(float(max_df_frac)) * F.col("n_docs").cast("double")
        )
        .select(
            "tok",
            F.round(
                F.log2(
                    F.col("n_docs").cast("double")
                    / F.col("df").cast("double")
                ) * F.lit(1e6),
                0,
            ).cast("long").alias("idf_micro"),
        )
    )
    if broadcast_idf:
        idf = F.broadcast(idf)
    scored = tf.join(idf, "tok").select(
        "doc_id", "tok",
        (F.col("tf") * F.col("idf_micro")).alias("score_micro"),
    )
    ranked = (
        scored.groupBy("doc_id")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("score_micro")).alias("neg"),
                            F.col("tok").alias("tok"),
                        )
                    )
                ),
                1, top_k,
            ).alias("top")
        )
        .select("doc_id", F.posexplode("top").alias("idx", "t"))
        .select(
            "doc_id",
            (F.col("idx") + 1).cast("long").alias("rank"),
            F.col("t.tok").alias("token"),
            (-F.col("t.neg")).cast("long").alias("score_micro"),
        )
    )
    return ranked


def chunk_documents(
    documents: DataFrame, chunk_tokens: int = 2048, overlap: int = 128,
    text_col: str = "text",
) -> DataFrame:
    """Split each document into fixed-size token windows with overlap
    — the pretraining prep step between extraction and shard packing
    (a 200k-token page must become ~2k-token training rows; the
    overlap preserves context across the cut).

    Pure projection: tokens array -> sequence of window starts
    (stride = chunk_tokens - overlap) -> per-start slice + join. No
    shuffle, no state — at 10^12 docs this is map-only and the output
    rows inherit the input partitioning. The final window is the
    remainder (>= 1 token); a document shorter than chunk_tokens
    yields exactly one chunk equal to itself (empty text yields one
    empty chunk — totality over input rows). Deterministic chunk ids
    (doc_id, chunk_id ascending from 0)."""
    # input-split guard: parallelize the text-heavy work when
    # the scan is a single unsplittable partition (guide §2.5)
    documents = ensure_scan_parallelism(documents)
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    tk = tokens_col(text_col)
    n = F.size(tk)
    # starts: 0, stride, 2*stride, ... while start < max(n - overlap, 1)
    # (the last window covers the tail; a start that would yield only
    # already-covered overlap tokens is not emitted)
    last = F.greatest(n - F.lit(overlap), F.lit(1))
    starts = F.sequence(
        F.lit(0),
        ((last - 1) - F.pmod(last - 1, F.lit(stride))).cast("int"),
        F.lit(stride),
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.array_join(
                F.slice(tk, s + 1, chunk_tokens), " "
            ).alias("chunk"),
            F.least(
                F.lit(chunk_tokens).cast("long"),
                (n - s).cast("long"),
            ).alias("n_tok"),
        ),
    )
    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(chunks).alias("chunk_id", "c"),
    ).select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("c.chunk").alias("chunk_text"),
        F.col("c.n_tok").alias("n_tokens"),
    )


def exact_k_sample(
    documents: DataFrame, n: int, id_col: str = "doc_id",
    salt: str = "ek1",
) -> DataFrame:
    """EXACT-size deterministic sample: the n documents with the
    smallest md5(salt:id) draw — the eval-set / holdout carve-out
    where "about 10%" (rate-based deterministic_sample) isn't
    acceptable and the set must be stable across engines, runs, and
    partitionings.

    Scale shape: orderBy(draw).limit(n) plans as TakeOrderedAndProject
    — per-partition top-n heaps merged at the driver, NO global sort
    shuffle; memory is O(n) per task. Ties are impossible (md5 of
    distinct ids), so the selection is total-order-deterministic."""
    draw = F.md5(
        F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
    )
    return (
        documents.withColumn("_draw", draw)
        .orderBy("_draw")
        .limit(n)
        .drop("_draw")
    )


def merge_bloom_filters(*filters: DataFrame) -> DataFrame:
    """OR-fold packed Bloom tables (bloom_filter_words outputs built
    with the SAME n_hashes/n_bits) into one: union + one bit_or
    aggregate on the word key. This is how the historical filter
    accumulates across crawls WITHOUT ever re-scanning old corpora —
    crawl N's filter merges with the batch-N+1 filter in
    O(filter size), and might-contain over the merge behaves exactly
    as if built from the concatenated corpora (bitwise OR is the
    Bloom union)."""
    if not filters:
        raise ValueError("need at least one filter")
    out = filters[0]
    for f in filters[1:]:
        out = out.unionByName(f)
    return out.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def boilerplate_lines(
    documents: DataFrame,
    min_docs: int = 3,
    text_col: str = "text",
    host_col: str = "source",
) -> DataFrame:
    """Per-SITE template-line removal — the CCNet-style boilerplate
    strip that complements ``line_dedup``: a line occurring on
    >= ``min_docs`` DISTINCT documents of the same host is template
    chrome (navigation rows, cookie banners, footers) and is removed
    from EVERY page of that host — unlike line_dedup's first-owner
    rule, because a nav row is not content on the first page that
    shipped it either. Lines below the threshold survive everywhere,
    so page-specific text is never touched. Blank (whitespace-only)
    lines are paragraph STRUCTURE and always survive in place.

    Plan shape: posexplode -> distinct(line-key, doc) with map-side
    partials (per-page repetition of a line collapses before the
    shuffle) -> groupBy(line-key) count -> the boiler set joins back
    MANY-TO-ONE on the line key (the build side is duplicate-free, so
    a Zipf-head banner fans out without blowup and the key carries the
    host, so a global banner spreads across host keys; AQE skew-join
    covers a mega-host) -> one groupBy(doc_id) reassembly with
    sort_array, no window anywhere. Total over the input: a page that
    is 100% template comes back with text_clean = ''.

    The line key is ``xxhash64(host, line)`` — 8 bytes — so neither
    the distinct/count aggregation nor the join-back shuffles raw
    line text as a KEY; at corpus scale that is the difference between
    exchanging the corpus bytes twice through wide string comparisons
    and exchanging fixed-width ints (guide §2.3, §8: decide on a
    lightweight proxy). Accepted 64-bit risk, documented: two distinct
    lines of one host colliding could miscount or misstrip — at 10^12
    lines the per-host birthday bound keeps this ~0, and no false
    NEGATIVES exist (a boiler line always matches itself).

    Returns (doc_id, text_clean, n_lines, n_boiler).
    """
    # input-split guard: parallelize the text-heavy work when
    # the scan is a single unsplittable partition (guide §2.5)
    documents = ensure_scan_parallelism(documents)
    lines = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col(host_col).alias("_host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("_lh", F.xxhash64(F.col("_host"), F.col("line")))
    blank = F.trim(F.col("line")) == ""
    boiler = (
        lines.filter(~blank)
        .select("_lh", "doc_id")
        .distinct()
        .groupBy("_lh")
        .agg(F.count("*").alias("_docs"))
        .filter(F.col("_docs") >= min_docs)
        .select("_lh", F.lit(True).alias("_boiler"))
    )
    marked = lines.join(boiler, ["_lh"], "left")
    keep = blank | F.col("_boiler").isNull()
    return (
        marked.groupBy("doc_id")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                keep,
                                F.struct(F.col("pos"), F.col("line")),
                            )
                        )
                    ),
                    lambda x: x.line,
                ),
            ).alias("text_clean"),
            F.count("*").cast("long").alias("n_lines"),
            F.sum(F.when(keep, 0).otherwise(1)).cast("long").alias(
                "n_boiler"
            ),
        )
    )


def split_assign(
    documents: DataFrame,
    val_permille: int = 10,
    test_permille: int = 10,
    salt: str = "split1",
    by: str = "content",
) -> DataFrame:
    """Deterministic train/validation/test assignment — the step every
    training-data pipeline runs last, with the leakage hygiene most
    get wrong: ``by="content"`` (default) keys the hash on the md5 of
    the TEXT, so byte-identical duplicates land in the SAME split by
    construction (an exact dup straddling train and test silently
    inflates eval; run near-dup dedup upstream for the fuzzy version
    of the same guarantee). ``by="doc_id"`` keys on the id (pure
    random-but-reproducible assignment). ``salt`` re-draws the whole
    assignment without touching data — bump it to rotate holdouts.

    Map-only projection (no shuffle, no state): bucket = the first 8
    md5 hex digits of (salt + key) as an integer mod 1000, compared to
    the permille thresholds — engine-exact in any SQL dialect, stable
    across runs, partitionings and cluster sizes. Returns
    (doc_id, split) with split in {'train', 'validation', 'test'}.
    """
    if val_permille + test_permille >= 1000:
        raise ValueError("holdout permilles must sum below 1000")
    if by not in ("content", "doc_id"):
        raise ValueError(f"unknown split key {by!r}")
    key = (
        F.md5(F.col("text")) if by == "content"
        else F.col("doc_id").cast("string")
    )
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.lit(":"), key)), 1, 8),
        16, 10,
    ).cast("long") % 1000
    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.when(bucket < test_permille, F.lit("test"))
        .when(bucket < test_permille + val_permille, F.lit("validation"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )

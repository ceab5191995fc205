"""Similarity search over an embedding column (array<float/double>).

Two paths, both pure Catalyst:

* Brute-force cosine: zip_with product + sequential aggregate fold
  (deterministic left-to-right f64 summation — matters for oracle
  parity AND for reproducible thresholds across engines);
* LSH-bucketed: deterministic integer hyperplanes (no RNG) bucket
  vectors by sign pattern; candidate pairs share a bucket, exact
  cosine is computed only within buckets. At 10^12 scale the bucket
  join replaces the O(N*Q) crossJoin with a shuffle on bucket id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _f64(a):
    """Embeddings are stored float32; promote exactly to float64 so the
    similarity math is engine-independent f64."""
    return a.cast("array<double>")


def _dot(a, b):
    """Deterministic sequential dot product (left-to-right fold)."""
    return F.aggregate(
        F.zip_with(_f64(a), _f64(b), lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(_f64(a), F.lit(0.0).cast("double"), lambda acc, x: acc + x * x)
    )


def cosine_similarity_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    n_queries: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for the query vectors.

    The query side is tiny -> broadcast crossJoin; candidates stream
    through one whole-stage-codegen projection; top-k via a window on
    the (small) query partition count.
    """
    from pyspark.sql.window import Window

    if query_ids is not None:
        queries = embeddings.filter(F.col("vec_id").isin(query_ids))
    else:
        queries = embeddings.filter(F.col("vec_id") < n_queries)
    queries = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    cands = embeddings.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb")
    ).filter(
        ~F.col("cand_id").isin(query_ids)
        if query_ids is not None
        else F.col("cand_id") >= n_queries
    )
    scored = (
        cands.crossJoin(F.broadcast(queries))
        .withColumn(
            "cosine_r",
            F.round(cosine_similarity_col(F.col("q_emb"), F.col("c_emb")), 6),
        )
        .select("query_id", "cand_id", "cosine_r")
    )
    # rank on the ROUNDED score (ties then by cand_id): deterministic
    # and engine-independent, unlike raw-f64 ordering at ULP distance
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_r").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("cand_id").cast("long").alias("cand_id"),
            F.col("rank").cast("long").alias("rank"),
            F.col("cosine_r"),
        )
    )


def cosine_pairs_threshold(
    embeddings: DataFrame, n_queries: int = 10, threshold: float = 0.5
) -> DataFrame:
    """Set-semantics variant (oracle-friendly: no rank instability):
    all (query, candidate) pairs with cosine >= threshold."""
    queries = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    cands = embeddings.filter(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb")
    )
    return (
        cands.crossJoin(F.broadcast(queries))
        .withColumn("cosine", cosine_similarity_col(F.col("q_emb"), F.col("c_emb")))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("cand_id").cast("long").alias("cand_id"),
            F.round("cosine", 6).alias("cosine_r"),
        )
    )


def embedding_dedup(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int | None = None,
    dim: int = 64,
    n_tables: int | None = None,
    n_candidates: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate dedup decision.

    LSH buckets generate the candidate pairs (equi-join on
    (table, bucket) id — no crossJoin anywhere), exact cosine filters
    them, and each vector keeps the smallest vec_id among itself and
    its >= threshold neighbors — the same single-pass keeper rule as
    minhash_dedup (a transitive closure would need iteration; one pass
    is the standard streaming-friendly decision). The output is TOTAL
    over the input: vectors with no qualifying neighbors keep
    themselves.

    Banded multi-table LSH (``n_tables`` > 1, the 10^12-scale path):
    occupancy is controlled by ``n_planes`` ALONE (expected bucket size
    N/2^planes per table), so the plane count can grow with the corpus
    without a recall cliff — each of the L independent tables re-draws
    the hyperplanes, and a true neighbor pair is a candidate if it
    collides in ANY table (P[hit] = 1-(1-p^b)^L, the classic
    Indyk-Motwani amplification). Duplicate cross-table edges are
    deduped before the keeper aggregation.
    """
    if n_planes is None:
        # derive occupancy from a caller-supplied corpus size when
        # available: at scale the count is already known (catalog
        # stats, the ingest manifest), and launching a count job per
        # dedup call is a driver action the pipeline shouldn't pay
        n_planes = derive_n_planes(
            n_candidates if n_candidates is not None
            else embeddings.count()
        )
    if n_tables is None:
        # derive amplification from the planes actually IN USE: a
        # caller-pinned long code needs its multi-table recall restore
        # just as much as a derived one
        n_tables = tables_for_planes(n_planes)
    with_bucket = _with_table_buckets(embeddings, n_planes, dim, n_tables)
    a = with_bucket.select(
        F.col("vec_id").alias("a"), F.col("embedding").alias("ea"),
        "tbl", "bucket",
    )
    b = with_bucket.select(
        F.col("vec_id").alias("b"), F.col("embedding").alias("eb"),
        "tbl", "bucket",
    )
    edges = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .filter(cosine_similarity_col(F.col("ea"), F.col("eb")) >= threshold)
        .select("a", "b")
    )
    if n_tables > 1:
        # a pair colliding in several tables yields duplicate edges;
        # they must not double-count in the keeper min (harmless) but
        # would inflate the shuffle — dedup once, right after the
        # cheap (a, b) projection
        edges = edges.distinct()
    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    nbr_min = sym.groupBy("a").agg(F.min("b").alias("nbr"))
    # totalization reads the INPUT, not the bucket projection: listing
    # ids through with_bucket would re-evaluate n_tables*n_planes
    # hyperplane dot products per vector (plus a distinct shuffle of
    # the exploded id stream) just to enumerate ids, and its
    # distinct() would collapse repeated vec_ids only when n_tables>1
    # (output cardinality changing with a tuning knob)
    ids = embeddings.select(F.col("vec_id").cast("long").alias("vec_id"))
    total = ids.join(nbr_min, ids.vec_id == nbr_min.a, "left")
    keep = F.least(F.col("vec_id"), F.coalesce(F.col("nbr"), F.col("vec_id")))
    return total.select(
        F.col("vec_id"),
        keep.cast("long").alias("keep_id"),
        (F.col("vec_id") == keep).alias("is_kept"),
    )


def derive_n_planes(
    n_candidates: int,
    target_bucket: int = 256,
    min_planes: int = 6,
    max_planes: int = 48,
) -> int:
    """Plane count must grow with the corpus: 2^planes buckets sized so
    the EXPECTED bucket holds ~target_bucket candidates (at 10^9 vectors
    a fixed 64-bucket table degenerates to ~10^7-candidate buckets).
    At 10^12 vectors this returns 32 — the recall cost of long codes is
    paid back by multi-table amplification (see derive_lsh_params), NOT
    by clamping occupancy into the quadratic regime (the round-2
    max_planes=24 clamp meant ~60k-vector buckets at 10^12). The 48 cap
    only guards the int64 bucket id."""
    import math

    if n_candidates <= 0:
        return min_planes
    need = math.ceil(math.log2(max(n_candidates / target_bucket, 1.0)))
    return max(min_planes, min(max_planes, need))


def tables_for_planes(n_planes: int) -> int:
    """Table count that restores the recall a code length costs: one
    extra table per ~8 planes past 16, capped at 8. Applies whether
    the plane count was derived OR pinned by the caller — a pinned
    32-plane code has the same single-table recall cliff as a derived
    one. <=16 planes is the short-code regime: one table suffices, so
    every sandbox-scale plan (and pinned oracle) stays single-table."""
    if n_planes <= 16:
        return 1
    return min(1 + ((n_planes - 16) + 7) // 8, 8)


def derive_lsh_params(n_candidates: int) -> tuple[int, int]:
    """(n_planes, n_tables) for a corpus size: planes keep expected
    bucket occupancy ~256 (linear candidate generation at any N);
    tables restore the recall that longer codes cost. At sandbox
    scales this is (6, 1), so every pinned oracle is untouched; at
    10^12 it is (32, 3)."""
    n_planes = derive_n_planes(n_candidates)
    return n_planes, tables_for_planes(n_planes)


def _with_table_buckets(
    embeddings: DataFrame, n_planes: int, dim: int, n_tables: int
) -> DataFrame:
    """(vec_id, embedding, tbl, bucket) — one row per (vector, table).
    n_tables=1 keeps the original single-bucket projection (no explode)
    so pinned-plane plans and oracles are byte-identical to round 2."""
    vid = F.col("vec_id").cast("long").alias("vec_id")
    if n_tables <= 1:
        return embeddings.select(
            vid,
            "embedding",
            F.lit(0).alias("tbl"),
            lsh_bucket_col(F.col("embedding"), n_planes, dim).alias("bucket"),
        )
    tb = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                lsh_bucket_col(
                    F.col("embedding"), n_planes, dim, table=t
                ).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )
    return embeddings.select(vid, "embedding", F.explode(tb).alias("_tb")).select(
        "vec_id", "embedding", F.col("_tb.tbl").alias("tbl"),
        F.col("_tb.bucket").alias("bucket"),
    )


def _hyperplane_weights(n_planes: int, dim: int, table: int = 0):
    """Deterministic integer 'hyperplanes':
    w(p, d, t) = ((p*73 + d*37 + t*7919) % 19) - 9.
    Integer weights keep sign(dot) exactly reproducible across engines;
    table=0 reproduces the round-2 family exactly (oracle-pinned), each
    further table re-draws an independent sign pattern."""
    off = table * 7919
    return [
        [((p * 73 + d * 37 + off) % 19) - 9 for d in range(dim)]
        for p in range(n_planes)
    ]


def lsh_bucket_col(emb_col, n_planes: int, dim: int, table: int = 0):
    planes = _hyperplane_weights(n_planes, dim, table)
    bits = []
    for p in range(n_planes):
        w = F.array(*[F.lit(float(x)) for x in planes[p]])
        bits.append(F.when(_dot(emb_col, w) >= 0, F.lit(1)).otherwise(F.lit(0)))
    # bigint bucket: plane counts up to 48 exceed int32
    bucket = F.lit(0).cast("long")
    for i, b in enumerate(bits):
        bucket = bucket + (b.cast("long") * F.lit(1 << i).cast("long"))
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_planes: int | None = None,
    dim: int = 64,
    probes: int = 1,
    n_tables: int | None = None,
    n_candidates: int | None = None,
) -> DataFrame:
    """LSH-bucketed ANN: candidates join queries on bucket id only.

    At scale this is the path: the crossJoin becomes an equi-join on
    bucket (shuffle on an int key), trading recall for a 1/2^planes
    candidate reduction.

    * ``n_planes=None`` derives the plane count from the corpus size
      via derive_n_planes, so bucket occupancy stays ~constant as the
      corpus grows. Pass ``n_candidates`` (catalog/manifest row count)
      to avoid the count() driver action; it is only consulted when
      n_planes is underived.
    * ``probes`` enables multi-probe: each query additionally searches
      the buckets at Hamming distance 1 (bit p flipped, for the first
      ``probes - 1`` planes), recovering neighbors that fell across a
      single hyperplane. probes=1 is exactly the single-bucket search
      (oracle-identical).
    * ``n_tables`` > 1 (banded multi-table LSH, the 10^12-scale path):
      L independent hyperplane families; candidates occupy one bucket
      PER table and a (query, cand) pair is scored if it collides in
      any table (cross-table duplicates deduped before ranking). This
      is what lets ``n_planes`` track the corpus size — occupancy stays
      N/2^planes linear while recall is amplified 1-(1-p^b)^L.
    """
    from pyspark.sql.window import Window

    if n_planes is None:
        n_planes = derive_n_planes(
            n_candidates if n_candidates is not None
            else embeddings.count()
        )
    if n_tables is None:
        # amplification follows the planes in use, pinned or derived
        n_tables = tables_for_planes(n_planes)
    with_bucket = _with_table_buckets(embeddings, n_planes, dim, n_tables)
    queries = with_bucket.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("tbl"),
        F.col("bucket"),
    )
    if probes > 1:
        # probe buckets: the home bucket + single-bit flips; within one
        # table a candidate occupies exactly one bucket, so no pair is
        # produced twice by probing (cross-TABLE dups handled below)
        probe_buckets = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << p).cast("long"))
                for p in range(min(probes - 1, n_planes))
            ],
        )
        queries = queries.withColumn("bucket", F.explode(probe_buckets))
    cands = with_bucket.filter(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        F.col("tbl"),
        F.col("bucket"),
    )
    scored = (
        cands.join(F.broadcast(queries), ["tbl", "bucket"])
        .withColumn(
            "cosine_r",
            F.round(cosine_similarity_col(F.col("q_emb"), F.col("c_emb")), 6),
        )
        .select("query_id", "cand_id", "cosine_r")
    )
    if n_tables > 1:
        # same pair found via several tables: the score is identical
        # (deterministic f64 fold + round), so a plain distinct dedups
        scored = scored.distinct()
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_r").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("cand_id").cast("long").alias("cand_id"),
            F.col("rank").cast("long").alias("rank"),
            F.col("cosine_r"),
        )
    )


def kmeans_embeddings(
    embeddings: DataFrame, k: int = 4, n_iters: int = 2, dim: int = 64,
) -> DataFrame:
    """Lloyd's k-means over the embedding column — the clustering pass
    behind SemDeDup-style semantic dedup sharding and corpus domain
    analysis (cluster first, then run within-cluster near-dup /
    pruning where the candidates actually live).

    Deterministic and engine-exact by construction:

    * vectors are quantized ONCE to 1e-6 fixed point (integer
      micro-coordinates), so distances are exact integer sums — no
      float accumulation order anywhere;
    * initial centroids are the ``k`` lowest-vec_id vectors (j = rank);
    * assignment is argmin of squared distance with ties to the lower
      cluster id (encoded min over dist*100 + j);
    * centroid updates take floor(sum/count) per coordinate (computed
      in double, exact below 2^53), and a cluster that loses all its
      members keeps its previous centroid.

    Scale shape: per iteration one broadcast of k*dim integers into
    the assignment expression (pure Catalyst: zip_with + aggregate —
    no UDF), one posexplode + (cluster, pos) hash aggregation with
    map-side partials, and a k*dim-row collect — the standard k-means
    control-plane scalar (MLlib's runs the same loop). k and
    n_iters are fixed, so the job is n_iters scans; at 10^12 rows use
    a deterministic_sample for the update phase (same shape).
    """
    import math

    if not 1 <= k <= 99:
        raise ValueError("k must be in [1, 99] (argmin encoding)")
    em = embeddings.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.expr(
            "transform(embedding,"
            " x -> cast(round(cast(x as double) * 1000000) as bigint))"
        ).alias("em"),
    )
    init = (
        em.orderBy("vec_id").limit(k).collect()
    )
    centroids = {j: list(r.em) for j, r in enumerate(init)}

    def assign(df: DataFrame) -> DataFrame:
        out = df
        for j in range(k):
            out = out.withColumn(
                f"c{j}", F.array(*[F.lit(int(v)) for v in centroids[j]])
            )
        key = F.least(*[
            (F.expr(
                f"aggregate(zip_with(em, c{j}, (a, b) -> (a - b) * (a - b)),"
                " cast(0 as bigint), (acc, x) -> acc + x)"
            ) * 100 + F.lit(j))
            for j in range(k)
        ])
        return out.select(
            "vec_id", "em", F.pmod(key, F.lit(100)).alias("cluster")
        )

    for _ in range(n_iters):
        assigned = assign(em)
        sums = (
            assigned.select(
                "cluster", F.posexplode("em").alias("pos", "v")
            )
            .groupBy("cluster", "pos")
            .agg(F.sum("v").alias("s"), F.count("*").alias("c"))
            .collect()
        )
        nxt: dict = {}
        for r in sums:
            nxt.setdefault(int(r.cluster), [0] * dim)[int(r.pos)] = (
                math.floor(r.s / r.c)
            )
        for j in range(k):  # empty cluster keeps its previous centroid
            centroids[j] = nxt.get(j, centroids[j])

    return assign(em).select("vec_id", F.col("cluster").cast("long"))


def semdedup(
    embeddings: DataFrame, k: int = 4, n_iters: int = 1, dim: int = 64,
    threshold: float = 0.95,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): k-means shards the
    embedding space, then cosine pruning runs WITHIN clusters only —
    each vector keeps the lowest vec_id among itself and its
    >= threshold same-cluster neighbors. The clustering is what makes
    the pairwise step tractable: pair candidates are bounded by
    cluster size, so ``k`` should scale with N / target-cluster-size
    at corpus scale (the paper uses tens of thousands of clusters for
    billions of docs; the equi-join on cluster id is the same
    bucketed shape as the LSH path, never a crossJoin).

    Deterministic end to end: kmeans_embeddings is integer-exact and
    the cosine is the sequential f64 fold. Returns
    (vec_id, cluster, keep_id, is_kept), total over input.
    """
    assigned = kmeans_embeddings(embeddings, k, n_iters, dim)
    withv = assigned.join(
        embeddings.select(
            F.col("vec_id").cast("long").alias("vec_id"), "embedding"
        ),
        "vec_id",
    )
    a = withv.select(
        F.col("vec_id").alias("a"), F.col("embedding").alias("ea"),
        "cluster",
    )
    b = withv.select(
        F.col("vec_id").alias("b"), F.col("embedding").alias("eb"),
        "cluster",
    )
    edges = (
        a.join(b, "cluster")
        .filter(F.col("a") < F.col("b"))
        .filter(
            cosine_similarity_col(F.col("ea"), F.col("eb"))
            >= threshold
        )
        .select("a", "b")
    )
    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    nbr_min = sym.groupBy("a").agg(F.min("b").alias("nbr"))
    return (
        assigned.join(nbr_min, assigned.vec_id == nbr_min.a, "left")
        .select(
            "vec_id",
            F.col("cluster").cast("long").alias("cluster"),
            F.least(
                F.col("vec_id"), F.coalesce("nbr", F.col("vec_id"))
            ).cast("long").alias("keep_id"),
            (
                F.col("vec_id")
                <= F.coalesce("nbr", F.col("vec_id"))
            ).alias("is_kept"),
        )
    )

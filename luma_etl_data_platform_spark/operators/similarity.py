"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k against one query vector.
  The baseline: a single scan, dot products via higher-order array
  functions (JVM-side), TakeOrdered for the top-k — no shuffle of the
  corpus.
- ``ivf_topk``: IVF-style two-stage search — coarse quantization by a
  cluster column (here the pre-assigned ``label``; at scale the
  output of any clustering/PQ step), probe the ``nprobe`` nearest
  centroids, exact search within probed partitions only. This is the
  100-TB path: the scan prunes to ~nprobe/nlist of the corpus, and
  with the table partitioned by cluster id the pruning happens at the
  file level.
- ``neardup_pairs_blocked``: all-pairs cosine within blocks (cluster
  column) — embedding near-dup detection without the n² cross join.

Float determinism: inputs are cast to double and reduced sequentially
(left fold) so a DuckDB oracle using list_dot_product on DOUBLE[]
reproduces the same values; scores are rounded to 6dp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..core.partitioning import spread as _spread


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn(vec_col, F.col(vec_col).cast("array<double>"))


def cosine_topk(df: DataFrame, query, k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact top-k by cosine against a query vector. ``query`` is
    either a literal vector (list/tuple of floats — preferred: no
    driver round-trip, the vector folds into the plan as a constant)
    or a 1-row DataFrame with the same vec_col (broadcast). Ordering
    ties break on id for determinism."""
    corpus = _as_double(_spread(df), vec_col)
    if isinstance(query, (list, tuple)):
        qcol = F.array(*[F.lit(float(x)) for x in query]).cast("array<double>")
        scored = corpus.select(
            F.col(id_col), F.round(cosine(F.col(vec_col), qcol), 6).alias("score"))
    else:
        q = _as_double(query.select(F.col(vec_col).alias("_qv")), "_qv")
        scored = (
            corpus.crossJoin(F.broadcast(q))
            .select(F.col(id_col),
                    F.round(cosine(F.col(vec_col), F.col("_qv")), 6).alias("score"))
        )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def batch_cosine_topk(df: DataFrame, queries: DataFrame, k: int = 10,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      query_id_col: str = "query_id") -> DataFrame:
    """Exact top-k by cosine for a BATCH of query vectors in one
    corpus scan — the retrieval shape real pipelines run (score a
    training batch / evaluation set, not one vector at a time).

    ``queries`` is a small DataFrame (query_id_col, vec_col);
    it is broadcast, the corpus is scanned once, and per-query top-k
    comes from a rank-filtered window partitioned by the query id —
    Spark's WindowGroupLimit pushes the k-filter to the map side, so
    shuffled state is O(|queries| · k), never corpus-sized.  Wall-
    clock amortization vs Q single-query scans: one scan instead of Q.

    Self-matches (corpus id == query id) are excluded.  Returns
    (query_id, rnk, id, score), rnk dense over (score desc, id).
    """
    from pyspark.sql.window import Window as W
    corpus = _as_double(_spread(df), vec_col)
    q = _as_double(
        queries.select(F.col(query_id_col).alias("_qid"),
                       F.col(vec_col).alias("_qv")), "_qv")
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("_qid"))
        .select(F.col("_qid").alias(query_id_col), F.col(id_col),
                F.round(cosine(F.col(vec_col), F.col("_qv")), 6).alias("score"))
    )
    win = W.partitionBy(query_id_col).orderBy(F.col("score").desc(),
                                              F.col(id_col))
    return (scored.withColumn("rnk", F.row_number().over(win))
            .filter(F.col("rnk") <= k)
            .select(query_id_col, "rnk", id_col, "score"))


def centroids(df: DataFrame, cluster_col: str = "label",
              vec_col: str = "embedding") -> DataFrame:
    """Element-wise mean vector per cluster: posexplode → avg per
    (cluster, dim) → re-assemble ordered by dim. Two narrow shuffles
    over (cluster, dim) — cardinality nlist × dims, tiny at any data
    scale."""
    exploded = (
        _as_double(_spread(df), vec_col)
        .select(F.col(cluster_col), F.posexplode(F.col(vec_col)).alias("dim", "v"))
    )
    per_dim = exploded.groupBy(cluster_col, "dim").agg(F.avg("v").alias("m"))
    return (
        per_dim.groupBy(cluster_col)
        .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("pairs"))
        .select(F.col(cluster_col),
                F.transform(F.col("pairs"), lambda p: p["m"]).alias("centroid"))
    )


def ivf_topk(df: DataFrame, query: DataFrame, k: int = 10, nprobe: int = 2,
             cluster_col: str = "label", vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """Two-stage ANN: rank cluster centroids by cosine to the query,
    keep the ``nprobe`` best, exact-search only those clusters."""
    cents = centroids(df, cluster_col, vec_col)
    q = _as_double(query.select(F.col(vec_col).alias("_qv")), "_qv")
    probed = (
        cents.crossJoin(F.broadcast(q))
        .select(F.col(cluster_col),
                F.round(cosine(F.col("centroid"), F.col("_qv")), 6).alias("cscore"))
        .orderBy(F.col("cscore").desc(), F.col(cluster_col))
        .limit(nprobe)
        .select(cluster_col)
    )
    narrowed = _as_double(_spread(df), vec_col).join(F.broadcast(probed), cluster_col)
    scored = (
        narrowed.crossJoin(F.broadcast(q))
        .select(F.col(id_col),
                F.round(cosine(F.col(vec_col), F.col("_qv")), 6).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def _sign_planes(n_planes: int, dims: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, d) is the
    portable md5 hash of "p:d" mapped to [-1, 1). No RNG state — any
    worker, any engine, any run derives the same planes."""
    import hashlib
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dims):
            h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16)
            row.append(h / 2147483648.0 - 1.0)
        planes.append(row)
    return planes


def signlsh_neardup_pairs(df: DataFrame, threshold: float = 0.99,
                          n_planes: int = 32, bands: int = 2,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id") -> DataFrame:
    """Label-free vector near-dup via sign-LSH: bit p of a vector's
    sketch is sign(v · plane_p); vectors agreeing on ALL bits of any
    band (n_planes/bands bits) are candidates; candidates are verified
    with exact cosine ≥ threshold.

    This is the blocking-column-free scale path (neardup_pairs_blocked
    needs a precomputed cluster id): candidates are generated by a
    bucket equi-join — no cross product — and high-cosine pairs agree
    on most plane signs, so recall at cos→1 approaches 1 (exact
    duplicates collide in every band by construction).

    Scale shape: 16 bits per band (65,536 buckets) keeps the candidate
    self-join near-linear, and the bucket join shuffles only
    (id, band, bkey) — raw vectors are joined back by id ONLY for the
    verification of surviving candidate pairs, so shuffle volume is
    O(candidates · dims), not O(rows · bands · dims)."""
    first = df.select(vec_col).first()
    if first is None:  # empty corpus → empty result, not a TypeError
        from ..core.localframe import local_frame
        return local_frame(df.sparkSession,
                           [], "id_a long, id_b long, score double")
    dims = len(first[0])
    planes = _sign_planes(n_planes, dims)
    v = _as_double(_spread(df), vec_col)
    bit_cols = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(x) for x in planes[p]])
        bit_cols.append((_dot(F.col(vec_col), plane) >= 0).cast("int").alias(f"bit_{p}"))
    sk = v.select(F.col(id_col), *bit_cols)
    rows = n_planes // bands
    band_structs = []
    for bnd in range(bands):
        key = F.concat_ws("", *[F.col(f"bit_{bnd * rows + r}") for r in range(rows)])
        band_structs.append(F.struct(F.lit(bnd).alias("band"), key.alias("bkey")))
    buckets = (sk.select(id_col, F.explode(F.array(*band_structs)).alias("bb"))
               .select(id_col, "bb.band", "bb.bkey"))
    a = buckets.select(F.col("band"), F.col("bkey"), F.col(id_col).alias("id_a"))
    b = buckets.select(F.col("band"), F.col("bkey"), F.col(id_col).alias("id_b"))
    candidates = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = v.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = v.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        candidates.join(va, "id_a").join(vb, "id_b")
        .select("id_a", "id_b",
                F.round(cosine(F.col("_va"), F.col("_vb")), 6).alias("score"))
        .filter(F.col("score") >= threshold)
    )


def semantic_dedup_summary(df: DataFrame, k: int | None = None,
                           threshold: float = 0.30,
                           vec_col: str = "embedding",
                           id_col: str = "vec_id",
                           target_cluster_size: int = 10_000,
                           min_k: int = 8) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023),
    label-free: cluster the corpus around ``k`` deterministic seed
    vectors, then inside each cluster drop every vector that has a
    more-similar-than-``threshold`` smaller-id neighbor. Returns the
    per-cluster summary (cluster, n_vecs, n_dropped, n_kept).

    Determinism without RNG: the seeds are the ``k`` vectors with the
    smallest portable md5 hash of their id — any engine derives the
    same seeds — and assignment is argmax cosine with ties broken on
    the smaller seed id, so a SQL oracle reproduces the clustering
    exactly. The drop rule is the greedy keep-smallest-id rule applied
    non-sequentially (x is dropped iff SOME smaller-id neighbor is
    within τ, whether or not that neighbor is itself dropped) — a
    deterministic superset of sequential greedy dropping.

    Scale shape: seeds are a k-row broadcast folded into a single
    argmax over an array column (no shuffle to assign — the scan
    pipelines); the only corpus shuffle is the within-cluster
    self-join, which is O(Σ n_c²) pairwise work — ``k`` is the dial
    that bounds cluster sizes, exactly as in the paper (k grows with
    the corpus so n_c stays bounded). When ``k`` is None (default) it
    is DERIVED from the corpus: ``k = max(min_k, ceil(n /
    target_cluster_size))``, so expected cluster size stays ≈
    ``target_cluster_size`` and the self-join cost grows linearly
    (n·n_c), not quadratically, as the corpus grows — the count that
    sizes it is a column-pruned id scan, negligible next to the
    self-join it bounds. The assignment table is persisted so the
    corpus is scanned (and the argmax evaluated) ONCE for its three
    consumers (both self-join sides + the final rollup), not
    re-derived per branch."""
    import math

    from pyspark import StorageLevel

    from ..functions.text import portable_hash32
    v = _as_double(_spread(df), vec_col)
    if k is None:
        n = v.select(id_col).count()
        k = max(min_k, math.ceil(n / target_cluster_size))
    seeds = (v.select(F.col(id_col).alias("sid"), F.col(vec_col).alias("sv"))
             .orderBy(portable_hash32(F.col("sid")), "sid").limit(k))
    seed_row = seeds.agg(F.collect_list(F.struct("sid", "sv")).alias("_seeds"))
    best = F.array_max(F.transform(
        F.col("_seeds"),
        lambda s: F.struct(
            F.round(cosine(F.col(vec_col), s["sv"]), 6).alias("score"),
            (-s["sid"]).alias("nsid"))))
    assigned = (v.crossJoin(F.broadcast(seed_row))
                .select(F.col(id_col), F.col(vec_col),
                        (-best["nsid"]).alias("cluster"))
                .persist(StorageLevel.MEMORY_AND_DISK))
    a = assigned.select("cluster", F.col(id_col).alias("id_a"),
                        F.col(vec_col).alias("_va"))
    b = assigned.select("cluster", F.col(id_col).alias("id_b"),
                        F.col(vec_col).alias("_vb"))
    dropped = (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.round(cosine(F.col("_va"), F.col("_vb")), 6) >= threshold)
        .select("cluster", F.col("id_b").alias(id_col))
        .distinct()
    )
    return (
        assigned.join(dropped.withColumn("_drop", F.lit(1)),
                      ["cluster", id_col], "left")
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_vecs"),
             F.count(F.col("_drop")).alias("n_dropped"),
             (F.count(F.lit(1)) - F.count(F.col("_drop"))).alias("n_kept"))
    )


def knn_edges(df: DataFrame, k: int = 3, block_col: str = "label",
              vec_col: str = "embedding",
              id_col: str = "vec_id") -> DataFrame:
    """k-nearest-neighbor similarity graph over an embedding corpus:
    undirected edge list (id_a < id_b, distinct) linking each vector
    to its ``k`` most-cosine-similar neighbors within its block.

    This is the scale-safe edge contract for graph analytics over a
    similarity corpus: out-degree is capped at ``k`` BY CONSTRUCTION,
    so the edge count is ≤ k·n — linear in the corpus — and every
    downstream graph pass (O(m^1.5) triangle census, O(m)-per-round
    PageRank) stays linear too. Contrast a thresholded similarity
    graph, whose edge count is quadratic wherever the corpus is dense
    (the part-name graph measured in SCALING.md is near-block-clique
    at sf0.1 — 3.1M edges even at the distance-2 cut).

    Plan shape: within-block pair scores (the only shuffle is on the
    block key), then a per-node window top-k — WindowGroupLimit pushes
    the rank filter map-side before the shuffle sort — then
    least/greatest symmetrization + distinct. Blocks here are the
    pre-assigned cluster column; at 100 TB swap in IVF-centroid or
    sign-LSH bucket assignments (same plan shape, bounded blocks).

    Determinism: scores rounded to 6dp before ranking, ties broken on
    neighbor id asc — a SQL oracle derives the identical edge set.
    """
    from pyspark.sql.window import Window as W
    v = _as_double(_spread(df), vec_col)
    a = v.select(F.col(block_col).alias("_blk"), F.col(id_col).alias("_sa"),
                 F.col(vec_col).alias("_va"))
    b = v.select(F.col(block_col).alias("_blk"), F.col(id_col).alias("_sb"),
                 F.col(vec_col).alias("_vb"))
    pairs = (a.join(b, "_blk")
             .filter(F.col("_sa") != F.col("_sb"))
             .select("_sa", "_sb",
                     F.round(cosine(F.col("_va"), F.col("_vb")), 6)
                     .alias("_sc")))
    w = W.partitionBy("_sa").orderBy(F.desc("_sc"), F.asc("_sb"))
    knn = (pairs.withColumn("_rn", F.row_number().over(w))
           .filter(F.col("_rn") <= k))
    return (knn.select(F.least("_sa", "_sb").alias("id_a"),
                       F.greatest("_sa", "_sb").alias("id_b"))
            .distinct())


def quantize_int8(vec: Column) -> Column:
    """Per-vector scalar quantization to [0, 255]: q_i = round((x_i -
    vmin) / (vmax - vmin) * 255). 4x memory reduction for embedding
    storage; per-vector scale factors avoid a corpus-stats pass (the
    global/per-dim variant would use `centroids`-style aggregation).
    Constant vectors (vmax == vmin) quantize to 0."""
    vmin = F.array_min(vec)
    vmax = F.array_max(vec)
    span = vmax - vmin
    return F.transform(
        vec, lambda x: F.when(span == 0, F.lit(0))
        .otherwise(F.round((x - vmin) / span * 255, 0)).cast("int"))


def dequantize_int8(q: Column, vmin: Column, vmax: Column) -> Column:
    span = vmax - vmin
    return F.transform(q, lambda b: vmin + b.cast("double") / 255.0 * span)


def quantization_error(vec: Column) -> Column:
    """Mean absolute reconstruction error of the int8 round-trip."""
    vmin = F.array_min(vec)
    vmax = F.array_max(vec)
    dq = dequantize_int8(quantize_int8(vec), vmin, vmax)
    abs_err = F.zip_with(vec, dq, lambda a, b: F.abs(a - b))
    return F.aggregate(abs_err, F.lit(0.0), lambda acc, x: acc + x) / F.size(vec)


def neardup_pairs_blocked(df: DataFrame, threshold: float = 0.0, top: int | None = 20,
                          cluster_col: str = "label", vec_col: str = "embedding",
                          id_col: str = "vec_id") -> DataFrame:
    """All-pairs cosine within each block of ``cluster_col`` (IVF-style
    blocking: near-dups co-locate in a cluster). Shuffles on the block
    key; never forms the global cross product."""
    v = _as_double(_spread(df), vec_col).select(
        F.col(cluster_col).alias("_blk"), F.col(id_col), F.col(vec_col))
    a = v.select(F.col("_blk"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = v.select(F.col("_blk"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    pairs = (
        a.join(b, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                F.round(cosine(F.col("_va"), F.col("_vb")), 6).alias("score"))
        .filter(F.col("score") >= threshold)
    )
    if top is not None:
        pairs = pairs.orderBy(F.col("score").desc(), "id_a", "id_b").limit(top)
    return pairs


def batch_hard_negatives(df: DataFrame, queries: DataFrame, k: int = 5,
                         vec_col: str = "embedding", id_col: str = "vec_id",
                         label_col: str = "label",
                         query_id_col: str = "query_id") -> DataFrame:
    """Hard-negative mining for contrastive/retrieval training: per
    query, the ``k`` most-cosine-similar corpus vectors whose label
    DIFFERS from the query's — the near-miss examples that make the
    strongest negatives (Karpukhin et al., DPR).

    Same scale shape as :func:`batch_cosine_topk`: queries (with
    their labels) broadcast, ONE corpus scan, label-mismatch filter
    BEFORE the window, per-query rank-filtered window whose k-limit
    Spark pushes map-side — shuffled state is O(|queries| * k).

    Returns (query_id, rnk, id, label, score)."""
    from pyspark.sql.window import Window as W
    corpus = _as_double(_spread(df), vec_col)
    q = _as_double(
        queries.select(F.col(query_id_col).alias("_qid"),
                       F.col(label_col).alias("_qlabel"),
                       F.col(vec_col).alias("_qv")), "_qv")
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col(label_col) != F.col("_qlabel"))
        .select(F.col("_qid").alias(query_id_col), F.col(id_col),
                F.col(label_col),
                F.round(cosine(F.col(vec_col), F.col("_qv")), 6).alias("score"))
    )
    win = W.partitionBy(query_id_col).orderBy(F.col("score").desc(),
                                              F.col(id_col))
    return (scored.withColumn("rnk", F.row_number().over(win))
            .filter(F.col("rnk") <= k)
            .select(query_id_col, "rnk", id_col, label_col, "score"))


def nearest_centroid_confusion(df: DataFrame, vec_col: str = "embedding",
                               id_col: str = "vec_id",
                               label_col: str = "label") -> DataFrame:
    """Nearest-centroid (Rocchio) classification self-evaluation:
    build per-label centroids, classify every vector by cosine to
    the nearest centroid, and return the confusion matrix
    ``(label, predicted, n_vecs)`` — the standing label-quality /
    cluster-coherence audit for an embedded corpus.

    Exactness: vectors are snapped to integer micro-units, so the
    per-label per-dimension SUM vector is exact BIGINT (partition-
    order independent). Cosine to the centroid equals cosine to that
    sum vector (the 1/n scale cancels), so no division ever happens
    in the aggregation — dot products and norms are exact BIGINTs,
    and only the final score does IEEE double sqrt/divide (identical
    in every engine on identical integers), rounded to 6 dp before
    the argmax so near-ties resolve identically everywhere.

    Scale design: one posexplode pass to the (labels × dims) sum
    table (tiny), which broadcasts back as an L-row centroid array
    table; classification is a broadcast nested-loop over L
    centroids with a JVM-side zip_with/aggregate fold per pair — the
    corpus is scanned once, never shuffled, and the only wide stage
    is the final confusion groupBy over L² keys.
    """
    vi = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * 1000000.0 + F.lit(0.5))
        .cast("long"))
    vecs = (df.select(F.col(id_col), F.col(label_col), vi.alias("_vi"))
            .withColumn("_nv", F.aggregate(
                F.transform("_vi", lambda a: a * a),
                F.lit(0).cast("long"), lambda acc, x: acc + x)))
    sums = (vecs.select(label_col,
                        F.posexplode("_vi").alias("_d", "_x"))
            .groupBy(label_col, "_d").agg(F.sum("_x").alias("_s")))
    cent = (sums.groupBy(label_col)
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("_d", "_s"))),
                lambda t: t["_s"]).alias("_c"))
            .select(F.col(label_col).alias("predicted"), "_c")
            .withColumn("_nc", F.aggregate(
                F.transform("_c", lambda a: a * a),
                F.lit(0).cast("long"), lambda acc, x: acc + x)))
    dot = F.aggregate(F.zip_with("_vi", "_c", lambda a, b: a * b),
                      F.lit(0).cast("long"), lambda acc, x: acc + x)
    score = F.round(dot / (F.sqrt(F.col("_nv").cast("double"))
                           * F.sqrt(F.col("_nc").cast("double"))), 6)
    scored = (vecs.crossJoin(F.broadcast(cent))
              .withColumn("_score", score))
    w = W.partitionBy(id_col).orderBy(F.desc("_score"), "predicted")
    pred = (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1))
    return (pred.groupBy(label_col, "predicted")
            .agg(F.count(F.lit(1)).alias("n_vecs")))


def mmr_topk(df: DataFrame, query, k: int = 5, pool: int = 20,
             lam: float = 0.7, vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """Maximal-marginal-relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998) — the diversified-retrieval stage RAG pipelines run on
    top of ANN: greedily pick the candidate maximizing
    ``lam * sim(q, d) - (1 - lam) * max_{s in S} sim(d, s)`` so the
    result set trades pure relevance against redundancy (a corpus full
    of near-duplicates otherwise returns k copies of one document).

    Plan shape: stage 1 is the usual one-scan exact top-``pool``
    (TakeOrderedAndProject — corpus-sized work happens HERE and only
    here); stage 2 joins vectors back for the pool's pairwise cosines
    (pool x pool broadcast self-join) and runs the inherently
    sequential greedy on the driver over a BOUNDED collect (pool +
    pool^2/2 rows, independent of corpus size — the kmeans-seed
    pattern). At 100 TB pool stays what it is: retrieval depth, not
    data scale.

    Determinism: candidate and pairwise cosines are 6dp-rounded
    doubles (the ann_* convention — engine-identical); the greedy
    argmax compares the raw IEEE doubles ``lam*qs - (1-lam)*red`` and
    breaks ties on the smaller id, so the selection order (and the
    emitted scores) replay exactly in a relational engine.

    Returns (rnk 1..k, id, mmr_score) in selection order.

    Reference scope: beyond-reference; task brief's similarity-search
    / curation family."""
    spark = df.sparkSession
    # pool rows, two consumers (pairwise join + the bounded collect):
    # checkpoint so the corpus-sized top-k scan runs exactly once
    cand = (cosine_topk(df, query, k=pool, vec_col=vec_col,
                        id_col=id_col)
            .localCheckpoint(eager=True))
    cv = (_as_double(_spread(df), vec_col)
          .join(F.broadcast(cand), id_col)
          .select(id_col, "score", vec_col))
    a = cv.select(F.col(id_col).alias("ia"), F.col(vec_col).alias("va"))
    b = cv.select(F.col(id_col).alias("ib"), F.col(vec_col).alias("vb"))
    pairs = (a.crossJoin(F.broadcast(b))
             .filter(F.col("ia") < F.col("ib"))
             .select("ia", "ib",
                     F.round(cosine(F.col("va"), F.col("vb")), 6)
                     .alias("sim")))
    qs = {r[id_col]: r["score"] for r in cand.collect()}
    sim: dict[tuple, float] = {}
    for r in pairs.collect():
        sim[(r["ia"], r["ib"])] = r["sim"]
        sim[(r["ib"], r["ia"])] = r["sim"]
    selected: list = []
    remaining = sorted(qs)
    out_rows = []
    for rank in range(1, min(k, len(qs)) + 1):
        best = None
        for cid in remaining:
            red = max((sim[(cid, s)] for s in selected), default=0.0)
            m = lam * qs[cid] - (1.0 - lam) * red
            if best is None or m > best[0]:
                best = (m, cid)
        out_rows.append((rank, best[1], float(best[0])))
        selected.append(best[1])
        remaining.remove(best[1])
    from pyspark.sql import types as T
    # id-type-agnostic: the greedy never inspects ids, so the result
    # schema must follow the corpus (string doc ids work too)
    schema = T.StructType([
        T.StructField("rnk", T.IntegerType()),
        T.StructField(id_col, df.schema[id_col].dataType),
        T.StructField("mmr_score", T.DoubleType())])
    from ..core.localframe import local_frame
    return local_frame(spark, out_rows, schema)

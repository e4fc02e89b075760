"""Deduplication operators for document corpora at scale.

Four families (task brief "training-data pipeline ops"):

- **exact**: hash-groupBy on a content fingerprint.
- **n-gram Jaccard**: exact set-similarity via an inverted shingle
  index — the classic "similarity join as a join" formulation: no
  cross product; candidate pairs come from co-occurrence on a shingle.
- **MinHash + LSH**: signature of k portable min-hashes, banded into
  buckets; pairs sharing any band bucket are candidates, then exact
  Jaccard verification. Probabilistic RECALL, deterministic RESULT:
  the hashes are engine-portable (functions/text.portable_hash32), so
  a DuckDB oracle reproduces the identical candidate set.
- **SimHash**: 64-bit signed-projection sketch (two 32-bit halves);
  near-dups = pairs within Hamming distance ``k``, candidates via
  band equality on 16-bit bands (pigeonhole: distance ≤ 3 ⇒ at least
  one of 4 bands equal; 65k buckets per band keeps the candidate
  join near-linear at corpus scale).

Scale notes (100 TB): every operator is explode → shuffle-on-key →
aggregate; no driver-side loops, no cross joins. The inverted-index
joins shuffle on the shingle/bucket — frequent-shingle skew is the
known hazard; ``df_cap`` drops shingles whose document frequency
exceeds a cap (stop-shingles add candidates, not information). AQE
skew-join handles residual imbalance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.partitioning import spread as _spread
from ..functions.text import fingerprint, shingles

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per distinct normalized content: representative id
    (min), duplicate count. (reference analog: dup detection at
    utilities/utilities.py:317-330 is name-level; this is the
    content-level generalization.)"""
    return (
        _spread(df).select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("rep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


# ---------------------------------------------------------------------------
# shingle inverted index + exact jaccard pairs
# ---------------------------------------------------------------------------

def _shingle_index(df: DataFrame, text_col: str, id_col: str, n: int,
                   df_cap: int | None = None) -> DataFrame:
    """Hashed (id, h1, h2) inverted index: each distinct shingle is
    represented by the two 32-bit halves of its md5 (the same portable
    derivation the MinHash family uses). Joining/shuffling 16 bytes of
    longs instead of ~30-byte shingle strings cuts shuffle volume and
    comparison cost; the (h1, h2) pair gives 64-bit collision safety,
    and the SQL oracle derives identical hashes so results still match
    bit-for-bit. ``df_cap`` drops stop-shingles with document
    frequency > cap."""
    sh = _spread(df).select(F.col(id_col).alias("_id"),
                            F.explode(shingles(F.col(text_col), n)).alias("s"))
    digest = F.md5(F.col("s"))
    idx = sh.select(
        "_id",
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring(digest, 9, 8), 16, 10).cast("long").alias("h2"),
    )
    if df_cap is not None:
        hot = (idx.groupBy("h1", "h2").agg(F.count(F.lit(1)).alias("df"))
               .filter(F.col("df") > df_cap).select("h1", "h2"))
        idx = idx.join(F.broadcast(hot), ["h1", "h2"], "left_anti")
    return idx


def ngram_jaccard_pairs(df: DataFrame, text_col: str, id_col: str,
                        n: int = 3, threshold: float = 0.5,
                        df_cap: int | None = None,
                        persist_index: bool = True) -> DataFrame:
    """Exact Jaccard similarity join: pairs (a < b) with
    |shingles(a) ∩ shingles(b)| / |union| ≥ threshold.

    Plan shape: explode → self-join on shingle (shuffle on shingle) →
    count per pair (shuffle on pair) → join against per-doc sizes
    (broadcastable: one row per doc). Never materializes a cross
    product.

    ``persist_index`` caches the exploded index (MEMORY_AND_DISK),
    which feeds three consumers (both join sides + sizes); disable for
    one-shot pipelines where memory is tighter than recompute."""
    idx = _shingle_index(df, text_col, id_col, n, df_cap)
    if persist_index:
        from pyspark import StorageLevel
        idx = idx.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = idx.groupBy("_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = idx.alias("a"), idx.alias("b")
    common = (
        a.join(b, (F.col("a.h1") == F.col("b.h1")) & (F.col("a.h2") == F.col("b.h2"))
               & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("n_sh", "n_a")
    sb = sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("n_sh", "n_b")
    return (
        common.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_containment_pairs(df: DataFrame, text_col: str, id_col: str,
                            n: int = 3, threshold: float = 0.8,
                            df_cap: int | None = None,
                            persist_index: bool = True) -> DataFrame:
    """Asymmetric containment join: pairs where the SMALLER document's
    shingle set is mostly inside the other's —
    ``containment = |A ∩ B| / min(|A|, |B|) ≥ threshold``.

    Catches what symmetric Jaccard misses: a short document quoted
    wholesale inside a long one scores near-zero Jaccard (the union is
    dominated by the long doc) but containment ≈ 1. The standard
    second pass after Jaccard dedup in corpus curation. Same
    inverted-index plan shape as ``ngram_jaccard_pairs`` — one
    persisted index, no cross product."""
    idx = _shingle_index(df, text_col, id_col, n, df_cap)
    if persist_index:
        from pyspark import StorageLevel
        idx = idx.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = idx.groupBy("_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = idx.alias("a"), idx.alias("b")
    common = (
        a.join(b, (F.col("a.h1") == F.col("b.h1")) & (F.col("a.h2") == F.col("b.h2"))
               & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("n_sh", "n_a")
    sb = sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("n_sh", "n_b")
    return (
        common.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "containment",
            F.round(F.col("n_common") / F.least(F.col("n_a"), F.col("n_b")), 6),
        )
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(df: DataFrame, text_col: str, id_col: str,
                       n: int = 3, num_hashes: int = 16,
                       index: DataFrame | None = None) -> DataFrame:
    """Per-doc MinHash signature: for each seed, the min portable hash
    over the doc's shingles. One explode + one groupBy(id) with
    ``num_hashes`` min-aggregates (map-side combinable).

    Hash family: the two-hash trick — ONE md5 per shingle yields
    h1 (hex 1-8) and h2 (hex 9-16); hash_i = (h1 + i*h2) mod 2^32.
    16x fewer digest computations than independent seeded hashes, and
    still engine-portable (the DuckDB oracle states the same formula).

    Pass a prebuilt (ideally persisted) ``index`` from
    ``_shingle_index`` to avoid re-shingling a corpus that another
    stage already indexed.
    """
    idx = index if index is not None else _shingle_index(df, text_col, id_col, n)
    aggs = [
        F.min((F.col("h1") + F.lit(i) * F.col("h2")) % F.lit(4294967296).cast("long"))
        .alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return idx.groupBy(F.col("_id").alias("id")).agg(*aggs)


def _band_buckets(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(id, band, bkey) banded LSH bucket keys from a signature table:
    md5 of each band's signature slice. One explode instead of a
    bands-way union — a single pass over sig."""
    rows = num_hashes // bands
    band_structs = []
    for bnd in range(bands):
        cols = [F.col(f"mh_{bnd * rows + r}") for r in range(rows)]
        key = F.md5(F.concat_ws(",", *[c.cast("string") for c in cols]))
        band_structs.append(F.struct(F.lit(bnd).alias("band"),
                                     key.alias("bkey")))
    return (sig.select("id", F.explode(F.array(*band_structs)).alias("bb"))
            .select("id", F.col("bb.band").alias("band"),
                    F.col("bb.bkey").alias("bkey")))



def minhash_lsh_pairs(df: DataFrame, text_col: str, id_col: str,
                      n: int = 3, num_hashes: int = 16, bands: int = 4,
                      threshold: float = 0.5,
                      df_cap: int | None = None,
                      persist_index: bool = True) -> DataFrame:
    """Candidate pairs from banded MinHash buckets, verified with exact
    Jaccard ≥ threshold. Deterministic end-to-end (portable hashes).

    One corpus scan: the persisted shingle index feeds BOTH the
    signature aggregation and the exact-Jaccard verification (the
    md5 digests are the dominant cost — computing them twice doubles
    the whole job at corpus scale), and the per-doc signature is
    persisted before the banded self-join so each side reads the
    cached one-row-per-doc table."""
    rows = num_hashes // bands
    # exact verification index; signatures intentionally use the
    # UNCAPPED shingle set (df_cap only bounds the verification join)
    idx = _shingle_index(df, text_col, id_col, n, df_cap)
    if persist_index:
        from pyspark import StorageLevel
        idx = idx.persist(StorageLevel.MEMORY_AND_DISK)
    sig = minhash_signatures(df, text_col, id_col, n, num_hashes,
                             index=idx if df_cap is None else None)
    if persist_index:
        from pyspark import StorageLevel
        sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
    buckets = _band_buckets(sig, num_hashes, bands)
    a, b = buckets.alias("a"), buckets.alias("b")
    candidates = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bkey") == F.col("b.bkey"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sizes = idx.groupBy("_id").agg(F.count(F.lit(1)).alias("n_sh"))
    ia = idx.withColumnRenamed("_id", "id_a")
    ib = idx.withColumnRenamed("_id", "id_b")
    common = (
        candidates.join(ia, "id_a").join(ib, ["id_b", "h1", "h2"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("n_sh", "n_a")
    sb = sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("n_sh", "n_b")
    return (
        common.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_LANE = 21           # bits per packed counter lane (3 lanes per long)
_LANE_MASK = (1 << _LANE) - 1


def simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash per doc, carried as two non-negative 32-bit
    halves (``sim_lo`` from the shingle hash h2, ``sim_hi`` from h1):
    bit i is set iff MORE than half the doc's shingles have bit i set
    in their portable hash (equivalently: the classic ±1 sum is
    positive).

    Aggregation is SIMD-style lane packing rather than 64 separate
    sums: per shingle, three bit-indicators are packed into one long
    at 21-bit offsets, so one ``sum`` accumulates three independent
    counters (no lane can carry into the next while per-doc distinct
    shingle counts stay below 2^21 ≈ 2M — shingles are distinct words,
    so that means >2M-word documents). 2×11 packed sums + 1 count
    instead of 64 conditional sums ≈ 3× narrower aggregate state and
    buffer row; all map-side combinable."""
    idx = _shingle_index(df, text_col, id_col, n=3)
    aggs = [F.count(F.lit(1)).alias("n_sh")]
    for half, src in (("lo", "h2"), ("hi", "h1")):
        for g in range(0, 32, 3):
            packed = None
            for lane, i in enumerate(range(g, min(g + 3, 32))):
                bit = F.shiftright(F.col(src), i).bitwiseAND(F.lit(1))
                term = F.shiftleft(bit.cast("long"), lane * _LANE)
                packed = term if packed is None else packed + term
            aggs.append(F.sum(packed).alias(f"{half}_{g}"))
    per_doc = idx.groupBy(F.col("_id").alias("id")).agg(*aggs)
    lo, hi = None, None
    for g in range(0, 32, 3):
        for lane, i in enumerate(range(g, min(g + 3, 32))):
            cnt_lo = F.shiftright(F.col(f"lo_{g}"), lane * _LANE).bitwiseAND(F.lit(_LANE_MASK))
            cnt_hi = F.shiftright(F.col(f"hi_{g}"), lane * _LANE).bitwiseAND(F.lit(_LANE_MASK))
            # majority test: 2·popcount > n ⇔ the ±1 sum is positive
            lt = F.when(cnt_lo * 2 > F.col("n_sh"), F.lit(2 ** i).cast("long")).otherwise(F.lit(0).cast("long"))
            ht = F.when(cnt_hi * 2 > F.col("n_sh"), F.lit(2 ** i).cast("long")).otherwise(F.lit(0).cast("long"))
            lo = lt if lo is None else lo + lt
            hi = ht if hi is None else hi + ht
    return per_doc.select("id", lo.alias("sim_lo"), hi.alias("sim_hi"))


def simhash_pairs(df: DataFrame, text_col: str, id_col: str,
                  max_hamming: int = 3,
                  persist_signature: bool = True) -> DataFrame:
    """Pairs within Hamming distance ``max_hamming`` of their 64-bit
    SimHash. Candidates via equality on one of four 16-bit bands —
    65,536 buckets per band, so the candidate self-join stays near-
    linear at corpus scale (the former 32-bit/8-bit variant had only
    256 buckets per band: quadratic at 100 TB). Pigeonhole still
    guarantees no false negatives for distance ≤ 3; verification via
    bit_count(xor) over both halves.

    ``persist_signature`` caches the (id, sim_lo, sim_hi) table —
    one small row per document — before the self-join; without it both
    join sides recompute the signature, i.e. the whole corpus is
    re-shingled and re-hashed twice."""
    sig = simhash(df, text_col, id_col)
    if persist_signature:
        from pyspark import StorageLevel
        sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
    band_structs = [
        F.struct(
            F.lit(bnd).alias("band"),
            F.shiftright(F.col(half), sh).bitwiseAND(F.lit(65535)).alias("bkey"),
        )
        for bnd, (half, sh) in enumerate(
            [("sim_lo", 0), ("sim_lo", 16), ("sim_hi", 0), ("sim_hi", 16)])
    ]
    buckets = (
        sig.select("id", "sim_lo", "sim_hi", F.explode(F.array(*band_structs)).alias("bb"))
        .select("id", "sim_lo", "sim_hi",
                F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    hamming = (
        F.bit_count(F.col("a.sim_lo").bitwiseXOR(F.col("b.sim_lo")))
        + F.bit_count(F.col("a.sim_hi").bitwiseXOR(F.col("b.sim_hi")))
    )
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bkey") == F.col("b.bkey"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                hamming.alias("hamming"))
        # hamming is a function of the id pair, so filtering BEFORE
        # the distinct is equivalent — and the distinct's exchange
        # then carries only the (rare) surviving pairs instead of
        # every band-collision candidate (guide §2.3: shuffle fewer
        # bytes; round 12)
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def _prefix_candidates(idx: DataFrame, threshold: float) -> DataFrame:
    """Candidate (id_a, id_b) pairs from AllPairs prefix filtering
    with the two lossless PPJoin prunes (length + positional) — see
    :func:`prefix_filter_jaccard_pairs` for the proofs. Split out so
    the pruning behavior is regression-testable on crafted corpora."""
    from pyspark.sql.window import Window as W

    dfreq = idx.groupBy("h1", "h2").agg(F.count(F.lit(1)).alias("_df"))
    w = W.partitionBy("_id").orderBy("_df", "h1", "h2")
    ranked = (idx.join(dfreq, ["h1", "h2"])
              .select("_id", "h1", "h2", "_df",
                      F.row_number().over(w).alias("_pos"),
                      F.count(F.lit(1)).over(W.partitionBy("_id"))
                      .alias("_sz")))
    prefix = ranked.filter(
        F.col("_pos") <= F.col("_sz")
        - F.ceil(F.lit(threshold) * F.col("_sz")) + F.lit(1))
    a, b = prefix.alias("a"), prefix.alias("b")
    matches = (a.join(b, (F.col("a.h1") == F.col("b.h1"))
                      & (F.col("a.h2") == F.col("b.h2"))
                      & (F.col("a._id") < F.col("b._id"))
                      & (F.least(F.col("a._sz"), F.col("b._sz"))
                         >= F.lit(threshold)
                         * F.greatest(F.col("a._sz"), F.col("b._sz"))))
               .select(F.col("a._id").alias("id_a"),
                       F.col("b._id").alias("id_b"),
                       (F.least(F.col("a._sz") - F.col("a._pos"),
                                F.col("b._sz") - F.col("b._pos"))
                        + F.lit(1)).alias("_ub"),
                       (F.col("a._sz") + F.col("b._sz")).alias("_szsum")))
    return (matches.groupBy("id_a", "id_b")
            .agg(F.max("_ub").alias("_ub"), F.first("_szsum").alias("_szsum"))
            .filter(F.col("_ub")
                    >= F.ceil(F.lit(threshold / (1.0 + threshold))
                              * F.col("_szsum") - F.lit(1e-9)))
            .select("id_a", "id_b"))


def prefix_filter_jaccard_pairs(df: DataFrame, text_col: str, id_col: str,
                                n: int = 3, threshold: float = 0.5,
                                persist_index: bool = True,
                                index: DataFrame | None = None) -> DataFrame:
    """Exact Jaccard join via AllPairs/PPJoin prefix filtering: same
    result as ``ngram_jaccard_pairs`` (lossless), but candidates come
    from joining only each document's PREFIX — its
    ``|x| - ceil(t·|x|) + 1`` globally-rarest shingles — instead of
    its full shingle set.

    Why it scales where the plain inverted index degrades: candidate
    volume on a shingle is quadratic in that shingle's document
    frequency, and the plain index pays that for EVERY shingle. The
    prefix keeps only the rarest slice of each document, so hot
    (high-df) shingles — the quadratic ones — are exactly the ones
    dropped from the index, with a proof (Bayardo et al., WWW'07)
    that any pair at Jaccard ≥ t still shares its globally smallest
    common shingle inside both prefixes. No recall dial needed, unlike
    ``df_cap``.

    Ordering is the total order (document frequency asc, h1, h2) —
    both engines derive it identically, so the candidate set (not
    just the verified output) is reproducible. Shuffles: shingle →
    df join, id → prefix window, shingle → candidate join, id →
    verification array joins. All equi-joins; never a cross product.

    Two further LOSSLESS prunes ride the candidate join (PPJoin,
    Xiao et al., WWW'08):

    - **length filter**: J(x,y) ≥ t forces min(|x|,|y|) ≥
      t·max(|x|,|y|); size-incompatible pairs never leave the join.
    - **positional filter**: a prefix match at sorted positions
      (pa, pb) bounds the overlap by min(|x|−pa, |y|−pb) + 1 (every
      common shingle sorts after the first match in BOTH documents);
      J ≥ t needs overlap ≥ t·(|x|+|y|)/(1+t), so candidates whose
      loosest match can't reach the bound drop before verification.
      The required-overlap ceil is epsilon-guarded so float rounding
      can only UNDER-prune.

    Verification is the standard explode-join intersection count over
    the surviving candidates. (An array_intersect-over-collected-
    arrays variant was measured 10× SLOWER: Spark's array_intersect
    has no hash fast path for struct elements, so per-pair
    intersection degraded to quadratic interpreted comparisons.)"""
    idx = index if index is not None \
        else _shingle_index(df, text_col, id_col, n, None)
    if persist_index and index is None:
        from pyspark import StorageLevel
        idx = idx.persist(StorageLevel.MEMORY_AND_DISK)
    cand = _prefix_candidates(idx, threshold)
    sizes = idx.groupBy("_id").agg(F.count(F.lit(1)).alias("n_sh"))
    ia = idx.select(F.col("_id").alias("id_a"), "h1", "h2")
    ib = idx.select(F.col("_id").alias("id_b"), "h1", "h2")
    inter = (cand.join(ia, "id_a").join(ib, ["id_b", "h1", "h2"])
             .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_common")))
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (inter.join(sa, "id_a").join(sb, "id_b")
            .withColumn("jaccard",
                        F.round(F.col("n_common")
                                / (F.col("n_a") + F.col("n_b")
                                   - F.col("n_common")), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def incremental_minhash_pairs(old: DataFrame, new: DataFrame,
                              text_col: str, id_col: str,
                              n: int = 3, num_hashes: int = 16,
                              bands: int = 4,
                              threshold: float = 0.5) -> DataFrame:
    """Incremental near-dup detection: every pair INVOLVING A NEW
    DOCUMENT (new×old and new×new), bit-identical to running the full
    :func:`minhash_lsh_pairs` over old∪new and keeping pairs that
    touch the batch — verified as an operator property in tests.

    This is the nightly-ingest shape at 100 TB: signatures and
    shingle indexes of the EXISTING corpus are position-independent
    per-document state (in production, stored tables updated by
    append); the new batch computes its own, probes the banded
    buckets, and exact-Jaccard verification joins only the OLD
    documents that actually share a bucket with the batch (a
    candidate semi-join prune) — total cost O(batch + touched), never
    a corpus re-scan.

    Returns (id_a, id_b, jaccard) with id_a < id_b."""
    idx_old = _shingle_index(old, text_col, id_col, n, None)
    idx_new = _shingle_index(new, text_col, id_col, n, None)
    from pyspark import StorageLevel
    idx_old = idx_old.persist(StorageLevel.MEMORY_AND_DISK)
    idx_new = idx_new.persist(StorageLevel.MEMORY_AND_DISK)
    sig_old = minhash_signatures(old, text_col, id_col, n, num_hashes,
                                 index=idx_old)
    sig_new = minhash_signatures(new, text_col, id_col, n, num_hashes,
                                 index=idx_new)
    b_old = _band_buckets(sig_old, num_hashes, bands)
    b_new = _band_buckets(sig_new, num_hashes, bands).persist(
        StorageLevel.MEMORY_AND_DISK)

    a, b = b_new.alias("a"), b_old.alias("b")
    cand_no = (a.join(b, (F.col("a.band") == F.col("b.band"))
                      & (F.col("a.bkey") == F.col("b.bkey")))
               .select(F.least("a.id", "b.id").alias("id_a"),
                       F.greatest("a.id", "b.id").alias("id_b")))
    x, y = b_new.alias("x"), b_new.alias("y")
    cand_nn = (x.join(y, (F.col("x.band") == F.col("y.band"))
                      & (F.col("x.bkey") == F.col("y.bkey"))
                      & (F.col("x.id") < F.col("y.id")))
               .select(F.col("x.id").alias("id_a"),
                       F.col("y.id").alias("id_b")))
    candidates = cand_no.unionByName(cand_nn).distinct() \
        .localCheckpoint(eager=True)

    # verification touches only candidate docs: prune the OLD index
    # down to ids that share a bucket with the batch.  The pruned
    # index is O(batch + touched) — checkpoint it eagerly so the
    # cached inputs can be released immediately (a nightly-ingest
    # building block must not leak cached blocks across calls)
    touched = (candidates.select(F.col("id_a").alias("_id"))
               .unionByName(candidates.select(F.col("id_b").alias("_id")))
               .distinct())
    idx = (idx_new.unionByName(idx_old.join(touched, "_id", "left_semi"))
           .localCheckpoint(eager=True))
    idx_old.unpersist()
    idx_new.unpersist()
    b_new.unpersist()
    sizes = idx.groupBy("_id").agg(F.count(F.lit(1)).alias("n_sh"))
    ia = idx.withColumnRenamed("_id", "id_a")
    ib = idx.withColumnRenamed("_id", "id_b")
    common = (candidates.join(ia, "id_a")
              .join(ib, ["id_b", "h1", "h2"])
              .groupBy("id_a", "id_b")
              .agg(F.count(F.lit(1)).alias("n_common")))
    sa = sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("n_sh", "n_a")
    sb = sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("n_sh", "n_b")
    return (common.join(sa, "id_a").join(sb, "id_b")
            .withColumn("jaccard",
                        F.round(F.col("n_common")
                                / (F.col("n_a") + F.col("n_b")
                                   - F.col("n_common")), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))

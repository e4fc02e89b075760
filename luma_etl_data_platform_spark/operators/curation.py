"""Corpus-curation operators for LLM training-data pipelines:
rule-based quality filtering (Gopher-style), deterministic stratified
sampling, domain-mixture weighting, and concat-and-chunk sequence
packing.

Beyond-reference surface: the reference (an ERP ETL tool) has no
corpus-curation layer; these are the selection / mixing / packing
operators a 100-TB pretraining pipeline needs (task brief). All
logic is pure ``pyspark.sql`` Column expressions or single-shuffle
window/groupBy plans — no Python UDFs — built on the portable md5
primitives from ``functions.text`` so every operator is verifiable
against a DuckDB oracle bit-for-bit.

Scale notes
-----------
* ``gopher_rule_flags`` is a narrow map stage — no shuffle at all;
  at 100 TB it pipelines with the scan.
* ``stratified_sample_flag`` is also narrow: membership is a pure
  function of (stratum, id), so the sample is reproducible, needs no
  count-first pass, and never materializes the stratum sizes.
* ``pack_sequences`` shuffles once on a hash bucket; the running
  token total is a per-bucket window. Bucket count is the
  parallelism dial — 32 here, thousands on a cluster — and packing
  quality is unaffected by bucket count (each bucket is an
  independent stream).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions import text as X

# Gopher-style rule thresholds (Rae et al. 2021, "Scaling Language
# Models" appendix A1.1 — adapted to the small synthetic docs).
# Stated as module constants so the SQL oracles quote the same values.
MIN_TOKENS = 20
MAX_TOKENS = 100_000
MIN_AVG_TOKEN_LEN = 3.0
MAX_AVG_TOKEN_LEN = 10.0
MIN_STOPWORDS = 2
MAX_REPETITION = 0.20


def gopher_rule_flags(text_col: Column) -> dict[str, Column]:
    """Boolean flag per quality rule: token-count bounds, mean token
    length bounds, minimum stopword hits, and n-gram repetition cap.
    Pure Column arithmetic — evaluates in the scan stage."""
    t = X.tokens(text_col)
    wc = F.size(t)
    awl = X.avg_token_len(text_col)
    sw = F.size(F.filter(t, lambda x: x.isin(*X.STOPWORDS)))
    rep = X.repetition_ratio(text_col, 3)
    return {
        "pass_wc": (wc >= MIN_TOKENS) & (wc <= MAX_TOKENS),
        "pass_awl": (awl >= MIN_AVG_TOKEN_LEN) & (awl <= MAX_AVG_TOKEN_LEN),
        "pass_stop": sw >= MIN_STOPWORDS,
        "pass_rep": rep <= MAX_REPETITION,
    }


def stratified_sample_flag(stratum_col: Column, id_col: Column,
                           rates_pct: dict[str, int],
                           default_pct: int = 2) -> Column:
    """Deterministic per-stratum Bernoulli membership: a row is in the
    sample iff ``portable_hash32(stratum ':' id) % 100 < rate(stratum)``.

    No RNG, no count-first pass, no driver round-trip: membership is a
    pure function of the row, so re-running at any partitioning (or on
    a different engine) selects the identical rows. ``rates_pct`` maps
    stratum value → integer percent."""
    h = X.portable_hash32(id_col, seed=stratum_col.cast("string"))
    rate: Column = F.lit(default_pct)
    for value, pct in sorted(rates_pct.items()):
        rate = F.when(stratum_col == value, F.lit(pct)).otherwise(rate)
    return F.pmod(h, F.lit(100)) < rate


def domain_mix_weights(df: DataFrame, domain_col: str,
                       tokens_col: Column) -> DataFrame:
    """Per-domain upsampling weights that flatten the corpus to a
    uniform token mixture: ``weight = target_share / actual_share``
    with a uniform ``1/n_domains`` target.

    One groupBy shuffle to per-domain totals, then a size-n_domains
    window (broadcast-scale) for the global total — the 100-TB scan
    never moves, only the tiny per-domain aggregate does."""
    per = df.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tokens_col).cast("long").alias("domain_tokens"),
    )
    everything = W.partitionBy()
    return (
        per
        .withColumn("_total", F.sum("domain_tokens").over(everything))
        .withColumn("_n_dom", F.count(F.lit(1)).over(everything))
        .select(
            domain_col, "n_docs", "domain_tokens",
            F.round(F.col("domain_tokens") / F.col("_total"), 6)
             .alias("token_share"),
            F.round((F.lit(1.0) / F.col("_n_dom"))
                    / (F.col("domain_tokens") / F.col("_total")), 6)
             .alias("mix_weight"),
        )
    )


def pack_sequences(df: DataFrame, id_col: str, tokens_col: Column,
                   ctx_len: int = 512, n_buckets: int = 32) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are concatenated
    in a deterministic hash order and split into ``ctx_len``-token
    training chunks; each document is assigned the chunk its first
    token lands in.

    The corpus is split into ``n_buckets`` independent streams by a
    portable hash of the id (the parallelism dial — each bucket packs
    independently, so results don't depend on bucket count staying
    fixed only on the hash), ordered by (hash, id) within the bucket,
    and a running token total places each doc:
    ``chunk = floor((cumsum - n_tokens) / ctx_len)``.

    Returns one row per (bucket, chunk): docs packed and tokens
    filled. One shuffle (the bucket), one window, one groupBy on the
    same key — no second shuffle thanks to the shared partitioning.
    """
    h = X.portable_hash32(F.col(id_col))
    rows = df.select(
        F.col(id_col),
        F.pmod(h, F.lit(n_buckets)).alias("bucket"),
        h.alias("_h"),
        tokens_col.cast("long").alias("_tok"),
    )
    win = (W.partitionBy("bucket").orderBy("_h", id_col)
           .rowsBetween(W.unboundedPreceding, W.currentRow))
    placed = rows.withColumn(
        "chunk",
        F.floor((F.sum("_tok").over(win) - F.col("_tok")) / ctx_len),
    )
    return (placed.groupBy("bucket", "chunk")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("_tok").cast("long").alias("chunk_tokens")))


def temperature_mix_weights(df: DataFrame, domain_col: str,
                            tokens_col: Column) -> DataFrame:
    """Temperature-flattened sampling weights (multilingual/multi-
    domain mixing a la multinomial temperature sampling): the sampling
    share of domain i becomes ``q_i = p_i^α / Σ p_j^α`` with α = 0.5,
    a compromise between the natural mix (α=1) and uniform (α=0).

    α is fixed at 0.5 so the power is ``sqrt`` — correctly rounded in
    every IEEE engine, unlike general ``pow`` whose last-ulp behavior
    is libm-specific and would break cross-engine reproducibility.
    The normalizer Σ sqrt(p_j) is summed in DECIMAL(28,12) (exact, so
    the few-hundred-domain reduce is order-independent); everything
    else is a fixed sequence of double ops on deterministic inputs.

    Same scale shape as ``domain_mix_weights``: the corpus shuffles
    once into per-domain totals; only the tiny domain table ever
    enters the global window."""
    per = df.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tokens_col).cast("long").alias("domain_tokens"),
    )
    everything = W.partitionBy()
    p = F.col("domain_tokens") / F.col("_total")
    s = F.sqrt(p).cast("decimal(28,12)")
    return (
        per
        .withColumn("_total", F.sum("domain_tokens").over(everything))
        .withColumn("_s", s)
        .withColumn("_norm", F.sum("_s").over(everything))
        .select(
            domain_col, "n_docs", "domain_tokens",
            F.round(p, 6).alias("token_share"),
            F.round(F.col("_s").cast("double")
                    / F.col("_norm").cast("double"), 6).alias("temp_share"),
            F.round((F.col("_s").cast("double")
                     / F.col("_norm").cast("double")) / p, 6)
             .alias("mix_weight"),
        )
    )


def hashed_linear_scores(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id",
                         buckets: int = 4096) -> DataFrame:
    """fastText-style linear quality classifier via the hashing trick
    (Weinberger et al. 2009): every token hashes into one of
    ``buckets`` feature slots, each slot carries a fixed weight, and a
    document's score is the mean slot weight of its token bag.

    The weights here are md5-derived milli-unit integers in
    [-1000, 1000] — a stand-in for trained parameters with the same
    execution shape (real weights would arrive as a broadcast lookup
    or be folded into a literal array exactly like this hash). What
    matters for the engine is the plan: tokenize -> slot -> weight is
    a pure narrow Column pipeline (zero joins, zero Python UDFs), the
    per-doc mean is one map-side-combined groupBy on the doc id, and
    the score is carried as an exact integer sum until the final
    division, so it is partition-order invariant and oracle-exact.

    Returns (id, n_tokens, score) with score = sum(w)/1000/n carried
    to 6 dp as exact micro-units: ``round(sw*1000/n) / 1e6``. The
    numerator ``sw*1000`` is an exact integer in double range, the
    one division's half-way cases land on representable ``k + 0.5``
    values, and both round-half-away and the final power-of-ten
    division are engine-identical — unlike ``round(x, 6)`` of an
    arbitrary quotient, whose last-ulp behavior diverged between
    Spark (exact-BigDecimal rounding) and the DuckDB oracle at sf0.1
    (found by the round-9 sf0.1 oracle tier).
    """
    from ..functions.text import portable_hash32, tokens
    tok = df.select(F.col(id_col),
                    F.explode(tokens(F.col(text_col))).alias("_tk"))
    slot = portable_hash32(F.col("_tk"), seed=7) % buckets
    w = (portable_hash32(slot, seed=11) % 2001) - 1000
    return (tok.select(id_col, w.alias("_w"))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.sum("_w").alias("_sw"))
            .select(id_col, "n_tokens",
                    (F.round(F.col("_sw").cast("double") * 1000.0
                             / F.col("n_tokens"))
                     / F.lit(1000000.0)).alias("score")))


def repetition_profile(df: DataFrame, text_col: str, id_col: str,
                       ns: tuple[int, ...] = (2, 3)) -> DataFrame:
    """Gopher repetition diagnostics (Rae et al. 2021 appendix A1.1),
    token-weighted: for each document and each n in ``ns``,

    * ``top{n}gram_frac`` — fraction of the document's tokens covered
      by occurrences of its single most frequent n-gram
      (count(top gram) · n / n_tokens), and
    * ``dup{n}gram_frac`` — fraction covered by ALL n-grams that
      occur more than once (Σ_{count≥2} count · n / n_tokens).

    The reference Gopher rules measure characters; the synthetic
    corpus is uniform-length word soup, so token fractions carry the
    same signal without an extra length join. Numerators are exact
    BIGINTs; the final division rounds to 6 dp for cross-engine hash
    stability.

    Plan shape: one positional n-gram explode per document (narrow),
    one groupBy (id, n, gram) with map-side partial aggregation, one
    per-(id, n) aggregate, then a conditional-aggregation pivot back
    to one row per document — two small shuffles total, both keyed on
    the document id, no self-joins. At 100 TB this is a linear scan:
    the explode multiplies rows by ~n_tokens but each gram row is
    tiny and collapses in the first partial aggregate.
    """
    t = X.tokens(F.col(text_col))

    # NB: the lambda must take exactly ONE arg — F.transform feeds a
    # second (the element index) to two-arg lambdas, which would
    # silently override a `_n=n` default-capture.
    def _gram_fn(nn):
        return lambda i: F.concat_ws(" ", F.slice(t, i, nn))

    grams = None
    for n in ns:
        g = df.select(
            F.col(id_col),
            F.size(t).alias("_nt"),
            F.lit(n).alias("_n"),
            F.explode(
                F.when(
                    F.size(t) >= n,
                    F.transform(
                        F.sequence(F.lit(1), F.size(t) - (n - 1)),
                        _gram_fn(n),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("_gram"),
        )
        grams = g if grams is None else grams.unionByName(g)
    counts = (grams.groupBy(id_col, "_nt", "_n", "_gram")
              .agg(F.count(F.lit(1)).alias("_c")))
    per_n = (counts.groupBy(id_col, "_nt", "_n")
             .agg(F.max("_c").alias("_top"),
                  F.sum(F.when(F.col("_c") >= 2, F.col("_c"))
                        .otherwise(F.lit(0))).alias("_dup"))
             .withColumn("_top_frac",
                         F.round(F.col("_top") * F.col("_n")
                                 / F.col("_nt").cast("double"), 6))
             .withColumn("_dup_frac",
                         F.round(F.col("_dup") * F.col("_n")
                                 / F.col("_nt").cast("double"), 6)))
    aggs = [F.max("_nt").alias("n_tokens")]
    for n in ns:
        aggs.append(F.max(F.when(F.col("_n") == n, F.col("_top_frac")))
                    .alias(f"top{n}gram_frac"))
        aggs.append(F.max(F.when(F.col("_n") == n, F.col("_dup_frac")))
                    .alias(f"dup{n}gram_frac"))
    return per_n.groupBy(id_col).agg(*aggs)


def budget_pack(df: DataFrame, id_col: str, score_col: str,
                tokens_col: str, budget: int,
                score_decimals: int = 6) -> DataFrame:
    """Token-budget-constrained selection: walk documents in
    (score DESC, id ASC) order and keep them while the running token
    total stays within ``budget`` — the curation step that turns
    "score everything" into "ship exactly N tokens of the best data".

    Adds ``cum_tokens`` (running total INCLUDING the row) and keeps
    only rows with ``cum_tokens <= budget``.

    Scale design — a global prefix sum without a global window:
    the score is snapped to exact integer micro-units and used as a
    bucket key; bucket token totals (one row per DISTINCT score) are
    cumulated in a tiny bucket-level window, broadcast back, and each
    row's running total is its bucket offset plus a WITHIN-bucket
    window partitioned by the bucket — so no stage ever moves the
    corpus to one partition. Distinct-score cardinality, not corpus
    size, bounds the serial step. Arithmetic is BIGINT throughout;
    the selection is bit-stable under any partitioning.

    ``score_decimals`` sets the bucket quantum (default 6 dp — exact
    for scores that are themselves <= 6 dp). For CONTINUOUS scores
    the distinct-bucket set approaches corpus size at full precision
    and the bucket window becomes the bottleneck; pass a coarser
    value (e.g. 3) to bound it. Within a quantum the walk order is
    (bucket DESC, id ASC) — ties that quantization introduces break
    deterministically by id, and the budget is never over-spent at
    ANY quantization (``cum_tokens <= budget`` is the filter itself).
    """
    micro = F.floor(F.col(score_col) * F.lit(10.0 ** score_decimals)
                    + F.lit(0.5)).cast("long")
    rows = df.withColumn("_b", micro)
    buckets = (rows.groupBy("_b")
               .agg(F.sum(F.col(tokens_col).cast("long")).alias("_btot")))
    w_b = W.orderBy(F.desc("_b")).rowsBetween(W.unboundedPreceding, -1)
    offsets = buckets.withColumn(
        "_off", F.coalesce(F.sum("_btot").over(w_b), F.lit(0)))
    w_in = (W.partitionBy("_b").orderBy(id_col)
            .rowsBetween(W.unboundedPreceding, 0))
    out = (rows.join(F.broadcast(offsets.select("_b", "_off")), "_b")
           .withColumn("cum_tokens",
                       F.col("_off")
                       + F.sum(F.col(tokens_col).cast("long")).over(w_in))
           .filter(F.col("cum_tokens") <= budget)
           .drop("_b", "_off"))
    return out

"""Ranked retrieval and corpus-statistics operators.

Okapi BM25 search, PMI collocation mining, and per-source vocabulary
profiling — the retrieval/statistics layer of an LLM training-data
pipeline (beyond-reference surface: the reference ERP ETL tool has no
text stack; task brief "text analysis" family).

All pure Column expressions (JVM-side, codegen'd, no UDFs), built on
the same portable primitives as :mod:`..functions.text` so a DuckDB
oracle reproduces every result bit-for-bit.

Scale shape (100 TB):

- ``bm25_top_docs`` filters the exploded token stream to the query's
  terms BEFORE any aggregation, so all shuffled state downstream is
  bounded by the hit set (O(|query| · docs-containing-a-term)), never
  by corpus vocabulary. Per-term scores are summed in a FIXED literal
  order (one conditional-aggregate column per query term), keeping
  the double addition partition-order-independent.
- ``pmi_bigrams`` is two explode→groupBy passes (bigrams, unigrams)
  plus a broadcast of the scalar token total; the bigram→unigram
  joins shuffle on the word key. ``min_count`` prunes the long tail
  before the joins, so joined state is the frequent-bigram set.
- ``vocab_profile`` is a two-level aggregation (term counts, then
  per-source rollup): one corpus shuffle on (source, term), then a
  tiny per-source reduce.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..core.partitioning import spread as _spread
from ..functions.text import tokens


def bm25_top_docs(df: DataFrame, query_terms: tuple[str, ...],
                  text_col: str = "text", id_col: str = "doc_id",
                  k1: float = 1.2, b: float = 0.75, k: int = 15) -> DataFrame:
    """Top-``k`` documents by Okapi BM25 for a literal bag-of-words
    query (Lucene idf variant: ``ln(1 + (N - df + 0.5)/(df + 0.5))``).

    Returns (id, n_terms_hit, score, rnk), ``rnk`` dense over
    (score desc, id) for a unique, engine-portable ordering.
    """
    toks = _spread(df).select(F.col(id_col).alias("_id"),
                              tokens(F.col(text_col)).alias("_t"))
    lens = toks.select("_id", F.size("_t").alias("_dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("_n_docs"),
        (F.sum("_dl").cast("double") / F.count(F.lit(1))).alias("_avgdl"))

    hits = (toks.select("_id", F.size("_t").alias("_dl"),
                        F.explode("_t").alias("_term"))
            .filter(F.col("_term").isin(list(query_terms))))
    tf = hits.groupBy("_id", "_dl", "_term").agg(F.count(F.lit(1)).alias("_tf"))
    dfreq = tf.groupBy("_term").agg(F.count(F.lit(1)).alias("_df"))

    scored = (tf.join(F.broadcast(dfreq), "_term")
              .crossJoin(F.broadcast(stats)))
    idf = F.log(F.lit(1.0) + (F.col("_n_docs").cast("double")
                              - F.col("_df") + F.lit(0.5))
                / (F.col("_df").cast("double") + F.lit(0.5)))
    norm = (F.col("_tf").cast("double") + F.lit(k1)
            * (F.lit(1.0) - F.lit(b)
               + F.lit(b) * F.col("_dl").cast("double") / F.col("_avgdl")))
    per_term = (idf * (F.col("_tf").cast("double") * F.lit(k1 + 1.0))
                / norm).alias("_s")
    scored = scored.select("_id", "_term", per_term)

    # Fixed-order summation: one conditional max per literal query
    # term, added left-to-right — partition-order-independent doubles.
    term_cols = [
        F.max(F.when(F.col("_term") == F.lit(t), F.col("_s"))).alias(f"_s{i}")
        for i, t in enumerate(query_terms)]
    agg = scored.groupBy("_id").agg(*term_cols)
    total: Column = F.lit(0.0)
    nhit: Column = F.lit(0)
    for i in range(len(query_terms)):
        total = total + F.coalesce(F.col(f"_s{i}"), F.lit(0.0))
        nhit = nhit + F.col(f"_s{i}").isNotNull().cast("int")
    ranked = agg.select(
        F.col("_id").alias(id_col),
        nhit.alias("n_terms_hit"),
        F.round(total, 6).alias("score"))
    # Global top-k via orderBy+limit (TakeOrderedAndProject: per-
    # partition heaps, never a single-partition sort of the full
    # candidate set), THEN rank the k survivors — the window now sees
    # a k-row input, so its one-partition exchange is O(k) regardless
    # of corpus size.
    topk = ranked.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
    win = W.orderBy(F.col("score").desc(), F.col(id_col))
    return (topk.withColumn("rnk", F.row_number().over(win))
            .filter(F.col("rnk") <= k))


def pmi_bigrams(df: DataFrame, text_col: str = "text",
                min_count: int = 5, k: int = 20) -> DataFrame:
    """Top-``k`` collocations by pointwise mutual information:
    ``pmi = ln(c_ab * T / (c_a * c_b))`` over unigram totals ``T``.

    Returns (w1, w2, pair_count, pmi, rnk); bigrams below
    ``min_count`` are pruned before any join.
    """
    toks = _spread(df).select(tokens(F.col(text_col)).alias("_t"))
    uni = (toks.select(F.explode("_t").alias("_w"))
           .groupBy("_w").agg(F.count(F.lit(1)).alias("_c")))
    tot = uni.agg(F.sum("_c").alias("_tot"))

    big_expr = F.expr(
        "transform(slice(_t, 1, greatest(size(_t) - 1, 0)),"
        " (x, i) -> struct(x AS w1, element_at(_t, i + 2) AS w2))")
    big = (toks.select(F.explode(big_expr).alias("_b"))
           .select(F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))
           .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_count"))
           .filter(F.col("pair_count") >= min_count))

    joined = (big.join(uni.select(F.col("_w").alias("w1"),
                                  F.col("_c").alias("_ca")), "w1")
              .join(uni.select(F.col("_w").alias("w2"),
                               F.col("_c").alias("_cb")), "w2")
              .crossJoin(F.broadcast(tot)))
    # symmetric 6-dp emission (round(x*1e6)/1e6, mirrored in the
    # oracle) — pmi orders the top-k, so a rounding divergence would
    # change membership, not just a value
    pmi = F.round(F.log(
        (F.col("pair_count").cast("double") * F.col("_tot"))
        / (F.col("_ca").cast("double") * F.col("_cb")))
        * F.lit(1_000_000.0)) / F.lit(1_000_000.0)
    scored = joined.select("w1", "w2", "pair_count", pmi.alias("pmi"))
    # Same TakeOrdered-then-rank shape as bm25_top_docs: the frequent-
    # bigram set scales with the corpus, so limit(k) first keeps the
    # window's one-partition exchange at O(k).
    topk = scored.orderBy(F.col("pmi").desc(), F.col("w1"), F.col("w2")) \
                 .limit(k)
    win = W.orderBy(F.col("pmi").desc(), F.col("w1"), F.col("w2"))
    return (topk.withColumn("rnk", F.row_number().over(win))
            .filter(F.col("rnk") <= k))


def bigram_lm_scores(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document perplexity under an add-one-smoothed bigram
    language model trained on the corpus itself — the CCNet/KenLM
    quality-filter pattern (docs with high perplexity under the
    corpus LM are boilerplate, spam, or off-distribution).

    Model: ``p(w2 | w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)`` with
    ``c(w1 ·)`` the context count (bigram occurrences starting with
    ``w1``) and ``V`` the unigram vocabulary size.

    Determinism: each bigram's log-probability is rounded to 6 dp and
    scaled to integer micro-nats; per-document totals are BIGINT sums
    — exact under any partitioning or summation order — and only the
    final division/exp return to doubles.  This is the same
    fixed-point carriage the streaming twins use for micro-batch
    invariance.

    Scale shape: two explode→groupBy passes build the model (shuffles
    keyed on the bigram / context word), scoring joins the per-doc
    bigram counts against the model on the bigram key, and V arrives
    as a broadcast scalar.  All state is corpus-vocabulary-sized;
    nothing is per-pair or driver-side.

    Returns (id, n_bigrams, avg_nll, ppl) — one row per document with
    at least one bigram.
    """
    toks = _spread(df).select(F.col(id_col).alias("_id"),
                              tokens(F.col(text_col)).alias("_t"))
    big_expr = F.expr(
        "transform(slice(_t, 1, greatest(size(_t) - 1, 0)),"
        " (x, i) -> struct(x AS w1, element_at(_t, i + 2) AS w2))")
    doc_big = (toks.select("_id", F.explode(big_expr).alias("_b"))
               .select("_id", F.col("_b.w1").alias("w1"),
                       F.col("_b.w2").alias("w2")))

    model = doc_big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_c2"))
    ctx = model.groupBy("w1").agg(F.sum("_c2").alias("_c1"))
    vocab = (toks.select(F.explode("_t").alias("_w")).distinct()
             .agg(F.count(F.lit(1)).alias("_v")))

    dtf = doc_big.groupBy("_id", "w1", "w2").agg(
        F.count(F.lit(1)).alias("_dtf"))
    scored = (dtf.join(model, ["w1", "w2"])
              .join(ctx, "w1")
              .crossJoin(F.broadcast(vocab)))
    logp = F.log((F.col("_c2").cast("double") + F.lit(1.0))
                 / (F.col("_c1").cast("double") + F.col("_v")))
    # round-to-nearest AFTER scaling (round-then-multiply can land a
    # hair below the integer and truncate differently per engine)
    micro = F.round(logp * F.lit(-1_000_000.0), 0).cast("long")
    per_doc = scored.groupBy("_id").agg(
        F.sum(F.col("_dtf")).alias("n_bigrams"),
        F.sum(F.col("_dtf") * micro).alias("_nll_micro"))
    # exact-integer micro trick (r9's hashed_linear_scores fix): the
    # 6-dp average is round(micro_sum / n) / 1e6 — one 0-dp round of
    # an integer-over-integer quotient, engine-identical, unlike
    # round(x, 6) of an arbitrary double whose last-ulp half-way
    # behavior diverges between Spark and the DuckDB oracle
    avg_nll = (F.round(F.col("_nll_micro").cast("double")
                       / F.col("n_bigrams").cast("double"))
               / F.lit(1_000_000.0))
    return per_doc.select(
        F.col("_id").alias(id_col),
        "n_bigrams",
        avg_nll.alias("avg_nll"),
        F.round(F.exp(avg_nll), 4).alias("ppl"))


def vocab_profile(df: DataFrame, text_col: str = "text",
                  group_col: str = "source") -> DataFrame:
    """Per-group vocabulary profile: vocabulary size, hapax count
    (terms occurring once in the group), total tokens, and
    type/token ratio — the standard corpus health metrics."""
    tc = (_spread(df)
          .select(F.col(group_col), F.explode(tokens(F.col(text_col))).alias("_w"))
          .groupBy(group_col, "_w").agg(F.count(F.lit(1)).alias("_c")))
    return tc.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum((F.col("_c") == 1).cast("int")).alias("hapax_count"),
        F.sum("_c").alias("total_tokens"),
        # exact-integer micro trick: int/int quotient to 6 dp
        (F.round(F.count(F.lit(1)).cast("double") * F.lit(1_000_000.0)
                 / F.sum("_c").cast("double"))
         / F.lit(1_000_000.0)).alias("type_token_ratio"))


def ccnet_perplexity_buckets(df: DataFrame, ref_col: str,
                             text_col: str = "text",
                             id_col: str = "doc_id") -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020): score every
    document by its per-token negative log-likelihood under a unigram
    LM trained on a REFERENCE slice (CCNet trains on Wikipedia; here
    the docs where ``ref_col`` is true), then split the corpus into
    ``head`` / ``middle`` / ``tail`` terciles — head reads most like
    the reference. The LM is add-one smoothed over the CORPUS
    vocabulary, so out-of-reference tokens get a proper probability
    instead of -inf.

    Determinism & scale shape (the r8 rfm/bm25 discipline):

    - Per-token log-probs are quantized to integer MICRO-nats; per-doc
      sums are exact BIGINT — partition-order-independent, and the
      vocab-sized log-prob table is explicitly broadcast (the corpus
      token stream is never shuffled for the scoring join).
    - The doc score is avg-nll quantized to MILLI-nats
      (``round(-sum_lp / (n·1000))``) — an integer whose DISTINCT
      cardinality is bounded by the nll RANGE (a few thousand values),
      not by corpus size.
    - Tercile thresholds are the ceil(n/3)-th / ceil(2n/3)-th smallest
      scores, found by a cumulative count over the DISTINCT score
      values (value-cardinality-bounded window — no global sort whose
      input grows with the corpus, no ntile). Bucketing is by VALUE
      against the thresholds, so ties land deterministically in the
      lower bucket under any parallelism.

    Perplexity is ``exp(avg_nll)``; the monotone avg-nll integer is
    kept as the comparison surface (exp differs by ulps across libm
    implementations and would break exact oracle parity).

    Returns per-doc ``(id, n_tokens, nll_milli, bucket)``.
    Reference: Wenzek et al., "CCNet: Extracting High Quality
    Monolingual Datasets from Web Crawl Data", LREC 2020 (§4.3
    perplexity bucketing). Beyond-reference surface (task brief
    LLM-pipeline family).
    """
    tok = (_spread(df)
           .select(F.col(id_col), F.col(ref_col).alias("_ref"),
                   F.explode(tokens(F.col(text_col))).alias("_tk")))
    # per-token reference counts — the ONE corpus aggregation; the
    # scalar totals (vocab size, reference token count) derive from
    # this vocab-sized table instead of a second corpus pass
    cnt = (tok.groupBy("_tk")
           .agg(F.count(F.when(F.col("_ref"), 1)).alias("_cr"))
           .localCheckpoint(eager=True))
    totals = cnt.agg(F.count(F.lit(1)).alias("_vv"),
                     F.sum("_cr").alias("_nr"))
    # log p(tok | ref LM), add-one smoothed over the corpus vocab,
    # for EVERY corpus token (ref count 0 for out-of-reference)
    lp = (cnt.crossJoin(F.broadcast(totals))
          .select("_tk", F.round(
              F.log((F.col("_cr") + 1.0)
                    / (F.col("_nr") + F.col("_vv")).cast("double"))
              * 1000000.0, 0).cast("long").alias("_lp")))
    docs = (tok.join(F.broadcast(lp), "_tk")
            .groupBy(F.col(id_col).alias("id"))
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.sum("_lp").alias("_slp"))
            .select("id", "n_tokens",
                    F.round(-F.col("_slp").cast("double")
                            / (F.col("n_tokens") * 1000.0), 0)
                    .cast("long").alias("nll_milli"))
            .localCheckpoint(eager=True))
    n_docs = docs.agg(F.count(F.lit(1)).alias("_n"))
    # k-th smallest via cumulative counts over DISTINCT milli scores
    cum = (docs.groupBy("nll_milli").agg(F.count(F.lit(1)).alias("_m"))
           .withColumn("_cum", F.sum("_m").over(
               W.orderBy("nll_milli")
               .rowsBetween(W.unboundedPreceding, 0))))
    k1 = F.expr("(_n + 2) DIV 3")        # ceil(n/3), exact integers
    k2 = F.expr("(_n * 2 + 2) DIV 3")    # ceil(2n/3)
    thr = (cum.crossJoin(F.broadcast(n_docs))
           .agg(F.min(F.when(F.col("_cum") >= k1, F.col("nll_milli")))
                .alias("_t1"),
                F.min(F.when(F.col("_cum") >= k2, F.col("nll_milli")))
                .alias("_t2")))
    return (docs.crossJoin(F.broadcast(thr))
            .select("id", "n_tokens", "nll_milli",
                    F.when(F.col("nll_milli") <= F.col("_t1"), "head")
                    .when(F.col("nll_milli") <= F.col("_t2"), "middle")
                    .otherwise("tail").alias("bucket")))


def dsir_importance_scores(df: DataFrame, target_col: str,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Data Selection with Importance Resampling (DSIR, Xie et al.
    2023) under a unigram bag-of-words feature model: every document
    is scored by its average log-likelihood ratio between a TARGET
    distribution (docs where ``target_col`` is true — the domain you
    want more of) and the overall corpus distribution, both add-one
    smoothed over the shared vocabulary. High scorers look like the
    target domain; resampling by these weights tilts the pretraining
    mixture toward it.

    Scale shape: two vocabulary-bounded aggregations (global + target
    unigram counts) produce a per-token log-ratio table that is
    VOCAB-sized, not corpus-sized, so it is explicitly broadcast and
    the per-doc scoring join is map-side — the corpus token stream is
    never shuffled. Scalar totals (token counts, vocabulary size)
    ride along as broadcast 1-row aggregates.

    Determinism: the per-token log-ratio is quantized to integer
    micro-nats (round * 1e6 — same carriage as
    :func:`bigram_lm_scores`), per-doc totals are exact BIGINT sums,
    and only the final average returns to doubles.

    Returns (id, n_tokens, sum_lr_micro, avg_lr).
    """
    tok = (_spread(df)
           .select(F.col(id_col), F.col(target_col).alias("_tgt"),
                   F.explode(tokens(F.col(text_col))).alias("_tk")))
    # ONE corpus aggregation; the scalar totals derive from the
    # vocab-sized count table, not a second corpus pass (round 9)
    counts = (tok.groupBy("_tk")
              .agg(F.count(F.lit(1)).alias("_ca"),
                   F.count(F.when(F.col("_tgt"), 1)).alias("_ct"))
              .localCheckpoint(eager=True))
    totals = counts.agg(F.count(F.lit(1)).alias("_vv"),
                        F.sum("_ca").alias("_na"),
                        F.sum("_ct").alias("_nt"))
    lam = (counts.crossJoin(F.broadcast(totals))
           .select("_tk", F.round(
               (F.log((F.col("_ct") + 1.0)
                      / (F.col("_nt") + F.col("_vv")).cast("double"))
                - F.log((F.col("_ca") + 1.0)
                        / (F.col("_na") + F.col("_vv")).cast("double")))
               * 1000000.0, 0).cast("long").alias("_lr")))
    return (tok.join(F.broadcast(lam), "_tk")
            .groupBy(F.col(id_col).alias("id"))
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.sum("_lr").alias("sum_lr_micro"))
            .select("id", "n_tokens", "sum_lr_micro",
                    # micro-trick (round-9): round the integer-exact
                    # micro average, THEN divide by the power of ten —
                    # round(x, 6) of an arbitrary int/int quotient has
                    # engine-divergent half-way behavior (the sf0.1
                    # oracle tier caught this class in
                    # hashed_linear_scores)
                    (F.round(F.col("sum_lr_micro").cast("double")
                             / F.col("n_tokens"))
                     / F.lit(1000000.0)).alias("avg_lr")))

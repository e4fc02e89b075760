"""Unigram-LM subword segmentation (Viterbi) — the second tokenizer
family beside BPE (Kudo 2018, "Subword Regularization"; the model
SentencePiece trains). BPE builds words bottom-up by merging; a
unigram LM scores every candidate token and segments each word with
the MINIMUM total cost path (Viterbi over word positions), which is
the decode half of SentencePiece training (the full trainer iterates
E[Viterbi counts] -> M[re-score]; one scoring pass is exposed here
and re-running over re-counted segmentations is the EM loop).

Scale design (same doctrine as ``operators/bpe.py``): the corpus
(100 TB) collapses to its distinct-word frequency table in one
groupBy; everything downstream — substring counting, token scoring,
the DP itself — runs over that vocabulary-bounded table. The Viterbi
DP is ONE narrow pass: each word's candidate edges are assembled into
a single row (grouped collect of <= max_word_len * max_sub structs)
and the dp vector folds inside the row via nested higher-order
functions — no per-position join round, no driver loop, no UDF.

Determinism: token costs are integer micro-nats
(``round(-ln(count/total) * 1e6)`` — the repo's LM carriage, engine-
identical doubles in, exact BIGINT out); DP totals are exact integer
sums; path ties break lexicographically on (cost, n_tokens), so every
emitted value replays in a relational engine round by round.

Reference scope: beyond-reference (no tokenizer layer in the ERP
reference); task brief's token-counting family, scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: words longer than this are excluded from the segmentation study
#: (the DP and its unrolled oracle cover positions 1..MAX_WORD_LEN;
#: the tail above 12 chars is <1% of occurrences in every sf)
MAX_WORD_LEN = 12
#: longest candidate token (SentencePiece defaults are similar;
#: bounds the per-word edge count at MAX_WORD_LEN * MAX_SUB)
MAX_SUB = 4


def _sub_grid(words: DataFrame) -> DataFrame:
    """(word, n_word, j 1-based start, l length, token) for every
    substring of length <= MAX_SUB — the shared generator for both
    token counting and DP edge building."""
    return (words
            .select("word", "n_word", "ln",
                    F.explode(F.sequence(F.lit(1), F.col("ln")))
                    .alias("j"))
            .select("word", "n_word", "j",
                    F.explode(F.sequence(
                        F.lit(1),
                        F.least(F.lit(MAX_SUB),
                                F.col("ln") - F.col("j") + 1)))
                    .alias("l"))
            .select("word", "n_word", "j", "l",
                    F.col("word").substr(F.col("j"), F.col("l"))
                    .alias("token")))


def token_cost_table(words: DataFrame, min_count: int = 2) -> DataFrame:
    """(token, cnt, cost): candidate tokens are all substrings of the
    (length-capped) distinct words, occurrence-counted weighted by
    word frequency; cost = round(-ln(cnt/total) * 1e6) micro-nats.
    Tokens under ``min_count`` are dropped EXCEPT single characters —
    the coverage guarantee that makes every word segmentable."""
    cnt = (_sub_grid(words).groupBy("token")
           .agg(F.sum("n_word").alias("cnt")))
    tot = cnt.agg(F.sum("cnt").alias("_tot"))
    return (cnt.filter((F.col("cnt") >= min_count)
                       | (F.length("token") == 1))
            .crossJoin(F.broadcast(tot))
            .select("token", "cnt",
                    F.round(-F.log(F.col("cnt").cast("double")
                                   / F.col("_tot").cast("double"))
                            * 1_000_000.0, 0)
                    .cast("long").alias("cost")))


def corpus_words(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The length-capped distinct-word frequency table every unigram
    stage reads — checkpointed once (costs + edges + rejoins all
    consume it)."""
    from .bpe import word_frequencies
    return (word_frequencies(df, text_col)
            .withColumn("ln", F.length("word"))
            .filter(F.col("ln") <= MAX_WORD_LEN)
            .localCheckpoint(eager=True))


def _viterbi_core(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """Viterbi over ``words`` against a (token, cost) table:
    (word, n_word, ln, cost, ntoks, toks). The DP folds IN-ROW (see
    module docstring); the path is reconstructed by a second in-row
    fold over the backpointers, so the E-step's token usage needs no
    extra shuffle beyond the final explode."""
    edges = (_sub_grid(words)
             .join(vocab.select("token", "cost"), "token")
             .select("word",
                     (F.col("j") - 1).alias("j"),
                     (F.col("j") - 1 + F.col("l")).alias("i"),
                     "cost"))
    arr = (edges.groupBy("word")
           .agg(F.collect_list(F.struct("j", "i", "cost")).alias("es"))
           .join(words, "word"))
    # dp[i] = min over edges (j -> i) of dp[j] + cost; ties -> fewer
    # tokens, then the smaller backpointer (array_min on
    # (cost, ntoks, bj) structs is lexicographic — the SQL replay
    # orders rn by the same triple). Round 1's vocabulary keeps every
    # single character, so each position has an incoming edge; under
    # an EM-pruned vocabulary a MID-word position can be unreachable
    # (no candidate) — it gets the UNREACHABLE sentinel, whose huge
    # cost can never win a later min against a real path (the word's
    # own previous-round path tokens are always in the vocab, so the
    # FINAL position is always reachable). The SQL replay represents
    # the same state by row absence.
    unreachable = F.struct(F.lit(1 << 60).cast("long").alias("cost"),
                           F.lit(1 << 20).alias("ntoks"),
                           F.lit(0).alias("bj"))
    dp = F.aggregate(
        F.sequence(F.lit(1), F.col("ln")),
        F.array(F.struct(F.lit(0).cast("long").alias("cost"),
                         F.lit(0).alias("ntoks"),
                         F.lit(-1).alias("bj"))),
        lambda acc, i: F.concat(acc, F.array(F.coalesce(F.array_min(
            F.transform(
                F.filter(F.col("es"), lambda e: e.getField("i") == i),
                lambda e: F.struct(
                    (F.element_at(acc, e.getField("j") + 1)
                     .getField("cost") + e.getField("cost"))
                    .alias("cost"),
                    (F.element_at(acc, e.getField("j") + 1)
                     .getField("ntoks") + F.lit(1)).alias("ntoks"),
                    e.getField("j").alias("bj")))), unreachable))))
    staged = arr.select("word", "n_word", "ln", dp.alias("dp"))
    best = F.element_at(F.col("dp"), F.col("ln") + 1)
    # backward walk: start at pos=ln, hop bj -> bj until 0, PREPENDING
    # the consumed substring — tokens come out left-to-right
    walk = F.aggregate(
        F.sequence(F.lit(1), F.lit(MAX_WORD_LEN)),
        F.struct(F.col("ln").alias("pos"),
                 F.array().cast("array<string>").alias("toks")),
        lambda acc, _: F.when(acc.getField("pos") <= 0, acc).otherwise(
            F.struct(
                F.element_at(F.col("dp"), acc.getField("pos") + 1)
                .getField("bj").alias("pos"),
                F.concat(
                    F.array(F.col("word").substr(
                        F.element_at(F.col("dp"),
                                     acc.getField("pos") + 1)
                        .getField("bj") + 1,
                        acc.getField("pos")
                        - F.element_at(F.col("dp"),
                                       acc.getField("pos") + 1)
                        .getField("bj"))),
                    acc.getField("toks")).alias("toks"))))
    return staged.select("word", "n_word", "ln",
                         best.getField("cost").alias("cost"),
                         best.getField("ntoks").alias("ntoks"),
                         walk.getField("toks").alias("toks"))


def segmentation_cost_table(seg: DataFrame) -> DataFrame:
    """M-step: re-score tokens from their USAGE in the current
    segmentations (occurrences weighted by word frequency) — same
    micro-nat formula as :func:`token_cost_table`. Every word's own
    round-N path tokens are in the table by construction, so round
    N+1 stays fully segmentable without a coverage clause."""
    usage = (seg.select("n_word", F.explode("toks").alias("token"))
             .groupBy("token").agg(F.sum("n_word").alias("cnt")))
    tot = usage.agg(F.sum("cnt").alias("_tot"))
    return (usage.crossJoin(F.broadcast(tot))
            .select("token", "cnt",
                    F.round(-F.log(F.col("cnt").cast("double")
                                   / F.col("_tot").cast("double"))
                            * 1_000_000.0, 0)
                    .cast("long").alias("cost")))


def prune_cost_table(vocab: DataFrame, words: DataFrame,
                     keep_top: int) -> DataFrame:
    """Vocabulary-pruning step of the unigram trainer (SentencePiece's
    shrink schedule): keep the ``keep_top`` multi-character tokens
    with the LARGEST likelihood contribution ``cnt * cost`` — the
    total micro-nats the corpus currently pays through that token,
    which is the dominant term of SentencePiece's remove-and-measure
    loss under a Viterbi-only E-step — plus EVERY single character of
    the corpus (the coverage floor that keeps all words segmentable).
    Characters absent from the current usage table get the fallback
    cost ``max(cost) + 1e6`` (one nat worse than the rarest used
    token: available, never preferred). Ties break on the token
    string, so the kept set replays exactly in a relational engine.

    Scale shape: the ranking is ONE vocabulary-bounded global sort
    (row_number over ~10^5-10^6 tiny rows — a trainer step, not a
    data-path shuffle); the char inventory is a projection of the
    distinct-word table."""
    from pyspark.sql.window import Window as W
    chars = (words
             .select(F.explode(F.sequence(F.lit(1), F.col("ln")))
                     .alias("j"), "word")
             .select(F.col("word").substr(F.col("j"), F.lit(1))
                     .alias("token"))
             .distinct())
    fb = vocab.agg((F.max("cost") + F.lit(1_000_000)).alias("_fb"))
    w = W.orderBy(F.desc(F.col("cnt") * F.col("cost")), "token")
    multi = (vocab.filter(F.length("token") > 1)
             .withColumn("_rk", F.row_number().over(w))
             .filter(F.col("_rk") <= keep_top)
             .select("token", "cnt", "cost"))
    singles = (chars.join(vocab.filter(F.length("token") == 1),
                          "token", "left")
               .crossJoin(F.broadcast(fb))
               .select("token",
                       F.coalesce("cnt", F.lit(0).cast("long"))
                       .alias("cnt"),
                       F.coalesce("cost", F.col("_fb")).alias("cost")))
    return multi.unionByName(singles)


def viterbi_segment(df: DataFrame, text_col: str = "text",
                    min_count: int = 2,
                    em_rounds: int = 0,
                    vocab_target: int | None = None) -> DataFrame:
    """Per distinct word: (word, n_word, ln, cost micro-nats, ntoks,
    toks) of its minimum-cost unigram segmentation. One corpus scan
    (the word groupBy), one vocabulary-scale substring count, one
    edges join, one grouped DP row-fold.

    ``em_rounds > 0`` runs that many EM iterations: E-step = the
    Viterbi paths above, M-step = re-score tokens from path usage
    (:func:`segmentation_cost_table`) — unused candidates fall out of
    the vocabulary (implicit pruning) and costs sharpen toward the
    tokens the corpus actually segments with. ``vocab_target``
    additionally applies the EXPLICIT prune schedule each round
    (:func:`prune_cost_table`): at most that many multi-character
    tokens survive, ranked by likelihood contribution, single
    characters always kept — the SentencePiece trainer's shrink
    toward a target vocabulary size."""
    words = corpus_words(df, text_col)
    vocab = token_cost_table(words, min_count)
    seg = _viterbi_core(words, vocab)
    for _ in range(em_rounds):
        vocab = segmentation_cost_table(
            seg.localCheckpoint(eager=True))
        if vocab_target is not None:
            vocab = prune_cost_table(vocab, words, vocab_target)
        seg = _viterbi_core(words, vocab)
    return seg

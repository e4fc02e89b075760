"""Byte-pair-encoding merge statistics — the corpus-side half of
tokenizer training (Sennrich et al. 2016, "Neural Machine Translation
of Rare Words with Subword Units").

Beyond-reference surface: the reference ERP ETL tool has no tokenizer
layer; a 100-TB pretraining pipeline trains (or at least audits) its
tokenizer from the corpus, and the expensive part — corpus-wide
symbol-pair frequencies — is exactly a relational aggregation.

Scale design. BPE training iterates ``merge the most frequent
adjacent symbol pair`` K times; each iteration is ONE relational pass
over the *distinct-word frequency table*, not the corpus: the corpus
(100 TB) collapses to its vocabulary (millions of rows) in the first
groupBy, and every subsequent iteration touches only that table. The
driver-side loop over K merges is therefore cheap — the per-iteration
plan here is a narrow explode + one small-key shuffle whose group
count is bounded by |alphabet|² (pairs), not by corpus size. This
module exposes the single-iteration pair count (the hot operator);
the K-step loop is a driver ``for`` over it, re-deriving the symbol
split from the merge list each round.

All arithmetic is integer (BIGINT counts); hashes are not needed, so
results are bit-identical in any engine — the DuckDB oracle states
the same explode + weighted count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

END_MARK = "</w>"


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus → distinct-word frequency table ``(word, n_word)``.

    This is the corpus-collapsing step: everything downstream of
    tokenizer training reads this table, whose cardinality is the
    vocabulary size (bounded), not the corpus size. Map-side partial
    aggregation means the shuffle carries at most one row per
    (partition, distinct word).
    """
    return (df.select(F.explode(tokens(F.col(text_col))).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("n_word")))


def bpe_pair_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Adjacent symbol-pair frequencies for the FIRST BPE merge
    iteration: each word is split into characters plus a terminal
    ``</w>`` marker (so suffixes and whole-word units stay distinct),
    and every adjacent pair is counted weighted by word frequency.

    Returns ``(left, right, pair_count)`` — ``ORDER BY pair_count
    DESC`` gives the canonical merge order; the caller applies the
    top merge and re-invokes for iteration 2 (driver loop, see module
    docstring).

    Plan shape: corpus-sized explode → small groupBy(word) shuffle →
    per-word character explode (vocabulary-sized input) → pair
    groupBy whose key space is |symbols|² — both shuffles after the
    first are vocabulary-bounded, which is what makes the K-iteration
    loop affordable at 100 TB.
    """
    words = word_frequencies(df, text_col)
    n = F.length("word")
    pairs = words.select(
        "n_word",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.struct(
                    F.expr("word").substr(i, F.lit(1)).alias("left"),
                    F.when(i < n, F.expr("word").substr(i + 1, F.lit(1)))
                     .otherwise(F.lit(END_MARK)).alias("right"),
                ),
            )
        ).alias("p"),
    ).select("n_word", F.col("p.left").alias("left"),
             F.col("p.right").alias("right"))
    return (pairs.groupBy("left", "right")
            .agg(F.sum("n_word").alias("pair_count")))


def _pair_counts_from_symbols(vocab: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts from a ``(symbols, n_word)``
    vocabulary, where ``symbols`` is the space-joined symbol string
    (space-padded on both ends)."""
    arr = F.split(F.trim(F.col("symbols")), " ")
    # guard: a fully-merged word has ONE symbol; sequence(1, 0) would
    # count DOWN and index past the array (repo invariant: always
    # guard sequence upper bounds)
    adj = F.when(
        F.size(arr) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - 1),
            lambda i: F.struct(
                F.element_at(arr, i).alias("left"),
                F.element_at(arr, i + 1).alias("right"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))
    pairs = (vocab.select("n_word", F.explode(adj).alias("p"))
             .select("n_word", "p.left", "p.right"))
    return (pairs.groupBy("left", "right")
            .agg(F.sum("n_word").alias("pair_count")))


def bpe_train(df: DataFrame, text_col: str, n_merges: int = 5) -> list[dict]:
    """See :func:`_bpe_loop` — returns the merge list only."""
    merges, _ = _bpe_loop(df, text_col, n_merges)
    return merges


def bpe_vocab(df: DataFrame, text_col: str, n_merges: int = 5) -> DataFrame:
    """The vocabulary AFTER applying the first ``n_merges`` learned
    merges: ``(symbols, n_word)`` with ``symbols`` the space-joined
    subword segmentation of each distinct word. Exploding this by
    weight gives the corpus's subword-token distribution — the
    "what does the tokenizer actually produce" audit."""
    _, vocab = _bpe_loop(df, text_col, n_merges)
    return vocab


def _bpe_loop(df: DataFrame, text_col: str,
              n_merges: int) -> tuple[list[dict], DataFrame]:
    """Train the first ``n_merges`` BPE merges on the corpus: a
    driver loop where each iteration is ONE relational pass over the
    vocabulary table — count adjacent symbol pairs, pick the top pair
    (count DESC, then left, right — a total order), and apply the
    merge by delimiter-padded literal replace on the symbol string.

    Returns ``([{merge_rank, left, right, pair_count}, ...], vocab)``
    where ``vocab`` is the post-merge ``(symbols, n_word)`` table.

    Scale design: the corpus collapses to its vocabulary once
    (``word_frequencies``); each iteration then shuffles only
    vocabulary-sized data and ships exactly ONE row to the driver
    (the argmax pair — a bounded collect, the same cost class as any
    aggregate readback). The vocabulary keeps its natural (groupBy
    shuffle) partitioning so every merge round's pair-count explode
    and literal-replace stack run at full cluster parallelism — at
    web-scale vocabularies (10M+ distinct words) this is the
    difference between K parallel rounds and K serialized ones; the
    per-round argmax collapses to one row regardless of partitioning,
    so the result is partitioning-invariant by construction.

    Merge-application semantics: ``replace(' l r ', ' lr ')`` merges
    non-overlapping occurrences left-to-right. For a self-merge pair
    inside a run of the same symbol (``x x x x`` under merge (x,x))
    the shared delimiter makes it merge every OTHER occurrence in one
    pass (``xx x x``) where canonical BPE pairs greedily (``xx xx``);
    runs regroup on subsequent merges of the same pair, and the
    semantics are engine-portable (DuckDB ``replace`` scans
    identically), which is what the oracle gate requires.
    """
    base = (word_frequencies(df, text_col)
            .select(
                F.concat(F.lit(" "),
                         F.regexp_replace("word", "(.)", "$1 "),
                         F.lit(END_MARK + " ")).alias("symbols"),
                "n_word")
            .localCheckpoint(eager=True))
    # One checkpoint only: the corpus collapses to the vocabulary
    # here; each iteration re-derives symbols as a stack of k literal
    # replaces over it (narrow, vocabulary-sized — k stays small), so
    # the loop costs one shuffle + one 1-row collect per merge and no
    # per-round materialization.
    sym = F.col("symbols")
    merges: list[dict] = []
    for rank in range(1, n_merges + 1):
        vocab = base.select(sym.alias("symbols"), "n_word")
        top = (_pair_counts_from_symbols(vocab)
               .orderBy(F.desc("pair_count"), "left", "right")
               .limit(1).collect())
        if not top:
            break
        l, r, c = top[0]["left"], top[0]["right"], top[0]["pair_count"]
        merges.append({"merge_rank": rank, "left": l, "right": r,
                       "pair_count": c})
        sym = F.replace(sym, F.lit(f" {l} {r} "), F.lit(f" {l}{r} "))
    return merges, base.select(sym.alias("symbols"), "n_word")

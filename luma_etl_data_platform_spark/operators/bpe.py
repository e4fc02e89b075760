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

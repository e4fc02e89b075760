"""Cross-document duplicated-span detection (exact substring dedup).

Implements the training-corpus pass popularized by Lee et al. 2021
("Deduplicating Training Data Makes Language Models Better"): find
every maximal run of >= k consecutive tokens that also appears in some
OTHER document, so the pipeline can cut (or down-weight) the span
instead of dropping whole documents.  The reference platform has no
such operator (`SURVEY.md §2.4` "(absent)" families); this is part of
the mandated LLM-pipeline layer.

Scale design — mark-and-merge, never pair-and-explode:

1. one scan tokenizes and emits every k-token window with its md5
   (windows per doc = len - k + 1, linear);
2. the inverted index ``groupBy(window_hash)`` counts *distinct*
   documents per window — one shuffle keyed on the hash, partial
   aggregation map-side;
3. windows whose hash occurs in >= 2 documents join back per doc
   (broadcast-ineligible but still a hash semi-join on the window
   hash);
4. per-doc gaps-and-islands (one window shuffle on doc_id) merges
   adjacent duplicated window starts into MAXIMAL spans.

Nothing in the plan enumerates document PAIRS, so a span shared by m
documents costs O(m) rows, not O(m²) — the property that keeps this
runnable at 100 TB where popular boilerplate recurs in millions of
documents.  (Pair listings for near-dup analysis live in
``operators/dedup.py``; this operator answers "what do I cut", which
is per-document.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.text import tokens


def window_hashes(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", k: int = 10) -> DataFrame:
    """(id, i, h): md5 of the k-token window starting at 1-based token
    position i.  Documents shorter than k tokens emit no windows."""
    # Tokenize behind its own projection so the regex runs once per
    # row — referencing tokens(text) inside the per-window lambda would
    # re-evaluate the extraction for every window (measured 5x cost).
    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_t"))
    t = F.col("_t")
    # sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty — guard
    # docs shorter than k tokens explicitly
    n_win = F.size(t) - (k - 1)
    starts = (F.when(n_win >= 1, F.sequence(F.lit(1), n_win))
              .otherwise(F.array().cast("array<int>")))
    win = F.transform(
        starts,
        lambda i: F.struct(
            i.alias("i"),
            F.md5(F.array_join(F.slice(t, i, k), " ")).alias("h")),
    )
    return (toked.select(F.col(id_col), F.explode(win).alias("w"))
            .select(id_col, F.col("w.i").alias("i"), F.col("w.h").alias("h")))


def duplicated_spans(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", k: int = 10) -> DataFrame:
    """Maximal cross-document duplicated spans per document:
    (id, span_start, span_end, span_tokens) where span_start/end are
    1-based token positions of the first/last window start and
    span_tokens = span_end - span_start + k (tokens covered)."""
    from pyspark import StorageLevel
    # the window-hash index feeds BOTH the shared-hash aggregation and
    # the mark join — persist it so the corpus is tokenized and
    # digested once, not twice (same idiom as the minhash index)
    wh = (window_hashes(df, text_col, id_col, k)
          .persist(StorageLevel.MEMORY_AND_DISK))
    shared = (wh.select(id_col, "h").distinct()
              .groupBy("h").agg(F.count(F.lit(1)).alias("_nd"))
              .filter(F.col("_nd") >= 2)
              .select("h"))
    dup = wh.join(shared, "h", "left_semi")
    isl = dup.withColumn(
        "_g", F.col("i") - F.row_number().over(
            W.partitionBy(id_col).orderBy("i")))
    return (isl.groupBy(id_col, "_g")
            .agg(F.min("i").alias("span_start"),
                 F.max("i").alias("span_end"))
            .select(id_col, "span_start", "span_end",
                    (F.col("span_end") - F.col("span_start") + k)
                    .alias("span_tokens")))

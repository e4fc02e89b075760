"""Train/test decontamination: remove training documents that share
n-gram content with an evaluation set.

The standard guard against benchmark leakage in LLM training corpora
(the GPT-3-style n-gram collision check): a training document is
contaminated if ANY of its word n-gram shingles appears anywhere in
the test corpus. Built on the same portable shingle index as the
dedup family (operators/dedup._shingle_index — md5-derived (h1, h2)
pairs), so the result is engine-reproducible and oracle-checkable.

Scale shape (100 TB train corpus, benchmark-sized test set):
- the TEST side is reduced to its distinct shingle-hash set — two
  longs per shingle — and broadcast by default: the contamination
  check is then a map-side semi-join over the train index with NO
  shuffle of the training corpus;
- with ``broadcast_test=False`` (a test corpus too big to broadcast)
  it degrades to a shuffle semi-join on the shingle hash, still
  linear, never all-pairs;
- output is id-level, joined back with ``left_anti`` — document
  payloads never travel through the shingle join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _shingle_index


def _test_shingles(test: DataFrame, text_col: str, id_col: str, n: int,
                   broadcast_test: bool) -> DataFrame:
    sh = _shingle_index(test, text_col, id_col, n).select("h1", "h2").distinct()
    return F.broadcast(sh) if broadcast_test else sh


def contamination_report(train: DataFrame, test: DataFrame,
                         text_col: str = "text", id_col: str = "doc_id",
                         n: int = 3,
                         broadcast_test: bool = True) -> DataFrame:
    """Per contaminated training doc: how many of its distinct
    n-gram shingles appear in the test corpus. Docs with zero overlap
    are absent (this is the removal list plus evidence)."""
    train_idx = _shingle_index(train, text_col, id_col, n)
    test_sh = _test_shingles(test, text_col, id_col, n, broadcast_test)
    return (
        train_idx.join(test_sh, ["h1", "h2"])
        .groupBy(F.col("_id").alias(id_col))
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
    )


def decontaminate(train: DataFrame, test: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 3, min_shared: int = 1,
                  broadcast_test: bool = True) -> DataFrame:
    """Training corpus minus contaminated documents. ``min_shared``
    raises the removal threshold (1 = any shared shingle removes,
    the conservative default)."""
    flagged = (contamination_report(train, test, text_col, id_col, n,
                                    broadcast_test)
               .filter(F.col("n_shared_shingles") >= min_shared)
               .select(id_col))
    return train.join(flagged, id_col, "left_anti")

"""Banded range join — equi-join on coarse time buckets + exact
filter, instead of a raw theta join.

A naive ``a JOIN b ON abs(a.t - b.t) <= w`` is a broadcast-nested-loop
(O(|A|·|B|)). Bucketing both sides to width-``w`` bins and equi-joining
on (key, bin) with each left row exploded to its bin and the two
adjacent bins turns it into a hash join whose candidate set is only
the rows within one bin of each other — O(|A|+|B|+candidates). This is
the standard interval-join technique (also what streaming interval
joins do internally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def banded_range_join(left: DataFrame, right: DataFrame, on: str,
                      left_time: str, right_time: str,
                      window_seconds: int) -> DataFrame:
    """Inner join of rows with the same ``on`` key whose times are
    within ``window_seconds`` of each other. Output: all left columns +
    all right columns (caller projects)."""
    w = window_seconds
    lbin = (F.col(left_time).cast("long") / w).cast("long")
    l = left.withColumn("_bin", F.explode(F.array(lbin - 1, lbin, lbin + 1)))
    r = right.withColumn("_bin", (F.col(right_time).cast("long") / w).cast("long"))
    joined = l.join(r, [on, "_bin"])
    exact = (F.abs(F.col(left_time).cast("long") - F.col(right_time).cast("long")) <= w)
    return joined.filter(exact).drop("_bin")

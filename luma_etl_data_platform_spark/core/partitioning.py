"""Partitioning helpers.

``spread``: guarantee CPU-bound per-row pipelines (tokenize, shingle,
hash, vector math) get at least default-parallelism partitions. Small
inputs often arrive as one file split → one task → single-threaded
compute; at real scale inputs already have >= cores splits and this
is a no-op (the repartition only fires when under-partitioned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df

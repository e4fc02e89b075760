"""Deterministic sampling and quality-filtering for training-data
pipelines.

RNG-based ``df.sample`` is partition-order dependent and not
reproducible across engines or re-runs; these operators derive
membership from the portable md5 hash of a key column instead —
exactly reproducible anywhere, stable under repartitioning, and
expressible in a SQL oracle. This is how large corpus pipelines pin
held-out sets: hash-bucket membership travels with the record, not
with the execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import portable_hash32

_BUCKETS = 10_000


def hash_bucket(col: F.Column, buckets: int = _BUCKETS, seed: int = 0) -> F.Column:
    """Stable bucket in [0, buckets) from the portable hash of a key."""
    return portable_hash32(col, seed) % buckets


def deterministic_sample(df: DataFrame, key_col: str, fraction: float,
                         seed: int = 0) -> DataFrame:
    """Keep rows whose hash bucket falls below ``fraction`` of the
    bucket space — a reproducible ~fraction sample keyed on
    ``key_col`` (same keys always co-selected)."""
    cutoff = int(fraction * _BUCKETS)
    return df.filter(hash_bucket(F.col(key_col), seed=seed) < cutoff)


def train_test_split(df: DataFrame, key_col: str, test_fraction: float = 0.1,
                     seed: int = 0) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive, reproducible split: (train, test)."""
    cutoff = int(test_fraction * _BUCKETS)
    bucket = hash_bucket(F.col(key_col), seed=seed)
    return df.filter(bucket >= cutoff), df.filter(bucket < cutoff)


def quantile_trim(df: DataFrame, group_col: str, value_col: str,
                  lo: float = 0.05, hi: float = 0.95) -> DataFrame:
    """Drop per-group outliers outside the [lo, hi] exact interpolated
    quantiles — the standard quality-trim before training statistics.
    Two-pass: tiny per-group bounds (broadcast) + one filtered scan."""
    bounds = (
        df.groupBy(group_col)
        .agg(F.expr(f"percentile({value_col}, {lo})").alias("_qlo"),
             F.expr(f"percentile({value_col}, {hi})").alias("_qhi"))
    )
    return (
        df.join(F.broadcast(bounds), group_col)
        .filter((F.col(value_col) >= F.col("_qlo")) & (F.col(value_col) <= F.col("_qhi")))
        .drop("_qlo", "_qhi")
    )


def weighted_sample(df: DataFrame, key_col: str, weight_col: str,
                    k: int, seed: int = 0,
                    scale: int = 1_000_000) -> DataFrame:
    """Deterministic probability-proportional-to-size order sampling
    (Ohlsson's sequential Poisson scheme): each row gets priority
    u/w — u a portable uniform hash of the key, w its weight — and
    the sample is the k smallest priorities. Heavier rows draw
    smaller priorities and are proportionally more likely to make
    the cut.

    Exactness: the priority is carried as the INTEGER
    ``(u * scale) div w`` (BIGINT; u < 2^32 so u·scale < 2^52 — no
    overflow, no floating-point division), so the selected set is
    bit-identical in any engine and under any partitioning; ties
    break on the key.

    Plan shape: narrow map to compute the priority, then a global
    ``ORDER BY … LIMIT k`` which Spark executes as
    TakeOrderedAndProject — each partition ships only its local
    top-k, no full sort, no corpus shuffle. The priority column also
    makes the sample MERGEABLE: the weighted sample of a union of
    shards is the k smallest priorities across the shards' samples.

    Rows with non-positive weight are excluded (they have no mass).
    """
    u = portable_hash32(F.col(key_col), seed=seed)
    w = F.col(weight_col).cast("long")
    df2 = (df.filter(w > 0)
           .withColumn("_u", u)
           .withColumn("_priority",
                       F.expr(f"(_u * CAST({scale} AS BIGINT)) div "
                              f"CAST({weight_col} AS BIGINT)")))
    return (df2.drop("_u")
            .orderBy("_priority", key_col)
            .limit(k))

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

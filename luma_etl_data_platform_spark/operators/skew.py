"""Skew-mitigation join operators for hot keys at scale.

AQE's skew-join splitting (on by default in core/session.py) handles
most runtime skew; ``salted_join`` is the explicit fallback for
pathological hot keys — e.g. a null-heavy foreign key or a celebrity
user id — where you want deterministic control:

- the LEFT (large, skewed) side gets a random salt in [0, salt);
- the RIGHT (smaller) side is replicated ``salt`` times;
- the equi-join runs on (key, salt), spreading each hot key over
  ``salt`` reducers.

``bucketize`` writes a bucketed+sorted catalog table so repeated
joins/aggs on the key are co-located with NO exchange at read time
(Spark buckets survive across jobs — the 100-TB answer to "we join on
this key every night").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(left: DataFrame, right: DataFrame, on: str,
                how: str = "inner", salt: int = 8) -> DataFrame:
    """Equi-join with salting. Semantics match ``left.join(right, on,
    how)`` for inner/left joins on an equi-key."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salted_l = left.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("_salt")
    salted_r = right.select(F.col("*"), salts)
    out = salted_l.join(salted_r, [on, "_salt"], how)
    return out.drop("_salt")


def salted_agg_sum(df: DataFrame, key: str, value: str, salt: int = 16,
                   out_col: str | None = None) -> DataFrame:
    """Two-phase aggregation for skewed group keys: partial sums on
    (key, salt) spread a hot key over ``salt`` reducers, the final
    reduce combines ``salt`` partials per key. Spark's hash aggregate
    already does map-side partials — this adds an extra REDUCE-side
    spreading stage for keys so hot that even one reducer's final
    combine is the bottleneck (e.g. billions of rows on one key).
    Exact for algebraic aggregates (sum/count)."""
    out_col = out_col or f"sum_{value}"
    salted = df.withColumn("_salt", (F.rand(seed=7) * salt).cast("int"))
    partial = (salted.groupBy(key, "_salt")
               .agg(F.sum(value).alias("_partial")))
    return partial.groupBy(key).agg(F.sum("_partial").alias(out_col))


def bucketize(df: DataFrame, table: str, key: str, buckets: int = 64,
              sort: bool = True) -> None:
    """Persist as a bucketed (and optionally sorted) managed table;
    later equi-joins/aggs on ``key`` between co-bucketed tables skip
    the exchange entirely."""
    writer = df.write.bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.mode("overwrite").format("parquet").saveAsTable(table)

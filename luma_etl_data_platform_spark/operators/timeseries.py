"""Time-series regularization: bucket resampling with forward fill.

``resample_ffill`` turns an irregular event stream into a regular
per-key time grid (the hypertable/time-bucket pattern):

1. per (key, bucket): the LAST observation wins, picked
   deterministically via max over a (ts, tiebreak, value) struct —
   one map-side-combinable aggregate, no window over raw events;
2. the dense grid is ``sequence(min_bucket, max_bucket, step)``
   exploded per key — a narrow op sized by the grid, not the events;
3. gaps forward-fill with ``last(value, ignorenulls)`` over the
   bucket-ordered window — one shuffle on the key.

Scale: raw-event volume is collapsed to bucket cardinality in step 1
before anything wide happens; the window in step 3 runs over buckets,
not events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def resample_ffill(df: DataFrame, key_col: str, ts_col: str, value_col: str,
                   bucket: str = "hour", step: str = "INTERVAL 1 HOUR",
                   tiebreak_col: str | None = None) -> DataFrame:
    """Regular per-key grid of ``bucket`` steps from each key's first
    to last observation; value = last observation in the bucket,
    forward-filled across empty buckets."""
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket")
    tb = F.col(tiebreak_col) if tiebreak_col else F.col(ts_col)
    picked = (
        df.groupBy(F.col(key_col), b)
        .agg(F.max(F.struct(F.col(ts_col), tb.alias("_tb"),
                            F.col(value_col).alias("_v"))).alias("_last"))
        .select(key_col, "bucket", F.col("_last._v").alias("_value"))
    )
    bounds = picked.groupBy(key_col).agg(
        F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1"))
    grid = bounds.select(
        key_col,
        F.explode(F.sequence(F.col("_b0"), F.col("_b1"), F.expr(step))).alias("bucket"))
    joined = grid.join(picked, [key_col, "bucket"], "left")
    w = (W.partitionBy(key_col).orderBy("bucket")
         .rowsBetween(W.unboundedPreceding, 0))
    return joined.select(
        key_col, "bucket",
        F.last("_value", ignorenulls=True).over(w).alias("value_ffill"),
        F.col("_value").isNotNull().alias("observed"),
    )

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


def merge_intervals(df: DataFrame, key_col: str, start_col: str,
                    end_col: str) -> DataFrame:
    """Gaps-and-islands interval merge: coalesce overlapping or
    touching [start, end) intervals per key into maximal islands.

    The complement of ``plans/windows.sessionize`` (which groups point
    events by inter-event gap): here the inputs are *intervals*, and
    two intervals belong to one island iff they overlap or abut —
    the classic SQL pattern for coverage/uptime/occupancy analysis.

    Algorithm (one shuffle on the key, one window pass):
    an interval starts a new island iff its start exceeds the running
    max of all previous ends; the island id is the running sum of
    those start flags. Timestamp arithmetic is exact (no doubles), so
    results are bit-stable at any partitioning; within equal starts
    the tie order is irrelevant because an equal start can never
    exceed a previous end that covers it.

    Returns one row per island:
    (key, island, island_start, island_end, n_intervals).
    """
    w_prev = (W.partitionBy(key_col).orderBy(start_col, end_col)
              .rowsBetween(W.unboundedPreceding, -1))
    w_run = (W.partitionBy(key_col).orderBy(start_col, end_col)
             .rowsBetween(W.unboundedPreceding, 0))
    prev_max_end = F.max(end_col).over(w_prev)
    new_island = (prev_max_end.isNull()
                  | (F.col(start_col) > prev_max_end)).cast("long")
    return (df
            .withColumn("_island", F.sum(new_island).over(w_run))
            .groupBy(key_col, F.col("_island").alias("island"))
            .agg(F.min(start_col).alias("island_start"),
                 F.max(end_col).alias("island_end"),
                 F.count(F.lit(1)).alias("n_intervals")))


def rolling_anomaly(df: DataFrame, key_col: str, ts_col: str,
                    value_col: str, tiebreak_col: str,
                    lookback: int = 6, min_obs: int = 3,
                    z: float = 2.0) -> DataFrame:
    """Trailing-window outlier detection: flag a point when it sits
    more than ``z`` standard deviations from the mean of the previous
    ``lookback`` observations of its key (self excluded, so the
    outlier never suppresses its own detection).

    Determinism at any partitioning: the frame sums are DECIMAL
    (exact regardless of evaluation order — DuckDB's segment-tree
    frame evaluation and Spark's running accumulation then agree
    bit-for-bit), and mean/variance are derived from those exact sums
    with a fixed operation order. One shuffle on the key.

    Returns every input row with (n_prior, roll_mean, is_anomaly);
    rows with fewer than ``min_obs`` prior points are never flagged.
    """
    fr = (W.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
          .rowsBetween(-lookback, -1))
    v = F.col(value_col)
    s1 = (F.sum(v.cast("decimal(18,2)")).over(fr)
          .cast("decimal(38,6)").cast("double"))
    s2 = (F.sum((v * v).cast("decimal(28,4)")).over(fr)
          .cast("decimal(38,6)").cast("double"))
    n = F.count(v).over(fr)
    mean = s1 / n
    var = F.greatest(s2 / n - mean * mean, F.lit(0.0))
    flag = (n >= F.lit(min_obs)) & (F.abs(v - mean) > F.lit(z) * F.sqrt(var))
    # symmetric 6-dp emission (round(x*1e6)/1e6, mirrored in the
    # oracle): the rolling mean is a small-denominator rational that
    # can land exactly on a 6-dp half-way, where plain round(x, 6) is
    # engine-divergent (the r9 sf0.1-tier bug class)
    return df.select(
        key_col, tiebreak_col, value_col,
        n.alias("n_prior"),
        (F.round(mean * F.lit(1_000_000.0)) / F.lit(1_000_000.0))
        .alias("roll_mean"),
        flag.alias("is_anomaly"))

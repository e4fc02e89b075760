"""Continuous aggregate maintenance: a time-bucketed rollup table kept
up to date by micro-batches (the "hypertable continuous aggregate"
pattern, on Spark).

Each micro-batch is partially aggregated to (bucket, dims) →
(count, sum), then merged into the rollup table by key: existing
buckets are re-aggregated with the delta, new buckets are inserted.
State lives in the table itself, not in streaming state — restarts
are cheap and the rollup is queryable mid-stream.

Scale: the merge touches only buckets present in the delta (dynamic
partition overwrite when the table is partitioned by bucket date);
the delta is tiny after partial aggregation regardless of input rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def _merge_delta(spark: SparkSession, rollup_path: str, delta: DataFrame,
                 keys: list[str]) -> None:
    try:
        current = spark.read.parquet(rollup_path)
        exists = True
    except Exception:
        exists = False
    if exists:
        merged = (
            current.unionByName(delta)
            .groupBy(*keys)
            .agg(F.sum("n_events").alias("n_events"),
                 F.sum("sum_value").alias("sum_value"))
        )
    else:
        merged = delta
    # staged write + rename swap: never clear the live rollup before
    # its replacement is durably written (see plans/transform.py).
    from ..plans.transform import replace_parquet_staged
    replace_parquet_staged(spark, rollup_path, merged)


def continuous_rollup(stream: DataFrame, rollup_path: str, checkpoint: str,
                      ts_col: str = "ts", dim_col: str = "event_type",
                      bucket: str = "hour",
                      available_now: bool = True) -> StreamingQuery:
    """Maintain an (hour-bucket × dim) rollup of counts and value sums
    from a stream of events."""
    keys = ["bucket_start", dim_col]

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        delta = (
            batch_df
            .groupBy(F.date_trunc(bucket, F.col(ts_col)).alias("bucket_start"),
                     F.col(dim_col))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("sum_value"))
        )
        _merge_delta(batch_df.sparkSession, rollup_path, delta, keys)

    writer = (stream.writeStream.foreachBatch(_apply)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

"""Structured Streaming layer.

The reference approximates streaming with scheduled incremental
batches (nightly full pipeline + ~2-hourly WFM loads,
schedule_jobs.ps1:13-32, wfm_hourly.ps1:9-21) and tracks progress in
an append-only extracted-ids file (datalakewrapper.py:189-194). Here
that maps onto Structured Streaming proper:

- ``windowed_event_counts``: watermarked tumbling-window aggregation
  (late data handled by the watermark instead of the reference's
  cutoff-hour rollback).
- ``session_window_agg``: gap-based session windows (the streaming
  twin of plans/windows.sessionize_events).
- ``incremental_ingest``: file-source micro-batches with
  ``foreachBatch`` exactly-once-ish loading — per-batch dedupe
  against a processed-id ledger, append to the staging table,
  failures routed to a dead-letter path (the reference flushes
  partial history and skips failed ids, datalakewrapper.py:286-297).

All entry points accept ``trigger_available_now`` so a scheduled job
drains everything pending and exits — the exact replacement for the
reference's scheduler-driven incremental runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..sources.incremental import ProcessedIdLedger


def windowed_event_counts(stream: DataFrame, ts_col: str = "ts",
                          key_col: str = "event_type",
                          window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts/sums; append-mode compatible."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                key_col, "n_events", "total_value")
    )


def session_window_agg(stream: DataFrame, ts_col: str = "ts",
                       key_col: str = "user_id",
                       gap: str = "30 minutes",
                       watermark: str = "2 hours") -> DataFrame:
    """Native session windows (gap-close semantics)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("session_value"))
        .select(F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                key_col, "n_events", "session_value")
    )


def stream_stream_interval_join(left: DataFrame, right: DataFrame,
                                key_col: str = "user_id",
                                ts_col: str = "ts",
                                interval: str = "1 hour",
                                watermark: str = "2 hours") -> DataFrame:
    """Stream-stream inner join: right rows within ``interval`` BEFORE
    each left row, same key. Both sides watermarked so the join state
    is bounded (Spark evicts right rows older than the watermark +
    interval). The batch twin is operators/rangejoin.banded_range_join."""
    l = left.select(F.col(key_col).alias("l_key"),
                    F.col(ts_col).alias("l_ts"),
                    F.col("event_id").alias("l_event_id")
                    ).withWatermark("l_ts", watermark)
    r = right.select(F.col(key_col).alias("r_key"),
                     F.col(ts_col).alias("r_ts"),
                     F.col("event_id").alias("r_event_id")
                     ).withWatermark("r_ts", watermark)
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {interval}"))
        & (F.col("r_ts") <= F.col("l_ts"))
    )
    return l.join(r, cond, "inner").select(
        F.col("l_key").alias("user_id"), "l_event_id", "r_event_id",
        "l_ts", "r_ts")


def streaming_dedupe(stream: DataFrame, id_cols: list[str],
                     ts_col: str = "ts",
                     watermark: str = "2 hours") -> DataFrame:
    """Watermarked streaming deduplication: state for each key is kept
    only within the watermark horizon (bounded memory), duplicates
    inside the horizon are dropped exactly."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates(id_cols)


def incremental_ingest(stream: DataFrame, *, ledger: ProcessedIdLedger,
                       id_col: str, target_path: str, checkpoint: str,
                       dead_letter_path: str | None = None,
                       batch_id_fn=None,
                       available_now: bool = True) -> StreamingQuery:
    """Micro-batch ingest with ledger-based idempotence.

    Per batch: anti-join the ledger (re-delivered rows are dropped),
    append survivors to the staging parquet, record their ids. A
    failing batch writes its rows to the dead-letter path instead of
    aborting the stream (reference behavior: log, flush partial
    history, continue — datalakewrapper.py:286-297).

    Failure routing is append-aware: once rows have landed in the
    target, a subsequent ledger failure must NOT dead-letter them (the
    checkpoint still commits the batch, so a redelivery would pass the
    anti-join and duplicate rows — and a DLQ replay would double-load
    them). Instead the ids alone are written to
    ``{dead_letter_path}/_ledger_repair`` (the ``_`` prefix keeps them
    invisible to a plain read of the DLQ), for an offline
    ledger-reconcile step."""

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        appended = False
        fresh = None
        run_id = epoch_id
        try:
            # inside the try: a failing batch_id_fn must also route to
            # the dead letter, not kill the stream
            run_id = batch_id_fn(epoch_id) if batch_id_fn else epoch_id
            fresh = ledger.not_processed(batch_df, id_col)
            fresh = fresh.withColumn("_batch_id", F.lit(run_id).cast("long"))
            fresh.persist()
            try:
                fresh.write.mode("append").parquet(target_path)
                appended = True
                ledger.record(fresh.select(id_col), run_id, id_col)
            finally:
                fresh.unpersist()
        except Exception:
            if dead_letter_path is None:
                raise
            if not appended:
                # nothing reached the target: the whole batch is
                # replayable from the DLQ
                (batch_df.withColumn("_batch_id", F.lit(epoch_id).cast("long"))
                 .write.mode("append").parquet(dead_letter_path))
            else:
                # rows ARE in the target; only the ledger record
                # failed. Emit id-only repair records — replaying the
                # data would duplicate it.
                (fresh.select(id_col)
                 .withColumn("_batch_id", F.lit(run_id).cast("long"))
                 .write.mode("append")
                 .parquet(dead_letter_path.rstrip("/") + "/_ledger_repair"))

    writer = (stream.writeStream.foreachBatch(_process)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

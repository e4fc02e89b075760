"""Batch-twin queries that drive the STREAMING layer through the
DuckDB correctness gate.

The driver's gate is batch-shaped (each query is (spark, sf_dir) →
DataFrame), so streaming operators were previously pytest-verified
only. Each query here stages the events table into a temp directory,
runs the REAL streaming operator over it with
``trigger(availableNow=True)`` and ``maxFilesPerTrigger=1`` (so the
run is split into several genuine micro-batches and cross-batch state
/ merge logic is exercised), then returns the final table — whose
contents a plain batch SQL statement over ``events`` predicts
exactly. This is the same strategy as the reference's own incremental
jobs being validated against full reloads (schedule_jobs.ps1 nightly
full run vs wfm_hourly.ps1 incremental runs).

Determinism: micro-batch boundaries must not affect the result, so
- rollup merges re-aggregate DECIMAL sums (exact, associative);
- stateful running totals carry integer cent values in doubles
  (integer-valued float64 addition is exact below 2^53);
- ledger idempotence is checked by REDELIVERING the whole input and
  asserting nothing duplicates.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..sources.incremental import ProcessedIdLedger
from ..sources.tables import load_table
from ..streaming.microbatch import incremental_ingest
from ..streaming.rollup import continuous_rollup
from ..streaming.stateful import running_user_totals

ORACLE: dict[str, str] = {}

_N_FILES = 4  # staged input files → micro-batches per run


def _stage(df: DataFrame, path: str) -> None:
    df.repartition(_N_FILES).write.parquet(path)


def _read_stream(spark: SparkSession, path: str) -> DataFrame:
    schema = spark.read.parquet(path).schema
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(path))


# ---------------------------------------------------------------------------
# stream_rollup_hourly: continuous aggregate maintenance
# (streaming/rollup.continuous_rollup) drained over 4 micro-batches;
# the final rollup table must equal the one-shot batch aggregation.
# ---------------------------------------------------------------------------
def stream_rollup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    tmp = tempfile.mkdtemp(prefix="luma_stream_rollup_")
    ev = load_table(spark, sf_dir, "events").select(
        "ts", "event_type",
        # decimal input → every per-batch partial sum and every merge
        # re-aggregation is exact, so the result is micro-batch- and
        # partition-order-invariant.
        F.col("value").cast("decimal(18,2)").alias("value"))
    _stage(ev, f"{tmp}/src")
    q = continuous_rollup(_read_stream(spark, f"{tmp}/src"),
                          f"{tmp}/rollup", f"{tmp}/ck")
    q.awaitTermination(600)
    roll = spark.read.parquet(f"{tmp}/rollup")
    return roll.select(
        "bucket_start", "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.round(F.col("sum_value").cast("decimal(38,6)"), 2)
         .cast("double").alias("total_value"))


ORACLE["stream_rollup_hourly"] = """
SELECT date_trunc('hour', ts) AS bucket_start, event_type,
       count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# stream_user_totals: applyInPandasWithState running totals
# (streaming/stateful.running_user_totals) across 4 micro-batches; the
# LAST emission per key is that key's all-time total.
# ---------------------------------------------------------------------------
def stream_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    tmp = tempfile.mkdtemp(prefix="luma_stream_state_")
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        # integer cents in a double: the state's float64 accumulation
        # is exact (values < 2^53), so cross-batch totals can't drift.
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("double").alias("value"))
    _stage(ev, f"{tmp}/src")
    totals = running_user_totals(_read_stream(spark, f"{tmp}/src"))

    out = f"{tmp}/out"

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        (batch_df.withColumn("_batch_id", F.lit(epoch_id).cast("long"))
         .write.mode("append").parquet(out))

    q = (totals.writeStream.foreachBatch(_sink).outputMode("update")
         .option("checkpointLocation", f"{tmp}/ck")
         .trigger(availableNow=True).start())
    q.awaitTermination(600)

    emitted = spark.read.parquet(out)
    last = (emitted
            .withColumn("_rn", F.row_number().over(
                W.partitionBy("user_id").orderBy(F.col("_batch_id").desc())))
            .filter(F.col("_rn") == 1))
    return last.select(
        "user_id", "n_events",
        F.round((F.col("total_value") / 100).cast("decimal(38,6)"), 2)
         .cast("double").alias("total_value"))


ORACLE["stream_user_totals"] = """
SELECT user_id, count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# stream_ingest_dedup: ledger-idempotent micro-batch ingest
# (streaming/microbatch.incremental_ingest). The whole input is
# REDELIVERED in a second stream run (same ledger, fresh files): the
# anti-join must drop every redelivered row, so the target holds each
# event exactly once — the exactly-once contract under the oracle.
# ---------------------------------------------------------------------------
def stream_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    tmp = tempfile.mkdtemp(prefix="luma_stream_ingest_")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type",
        F.col("value").cast("decimal(18,2)").alias("value"))
    _stage(ev, f"{tmp}/src")
    ledger = ProcessedIdLedger(spark, f"{tmp}/ledger")

    def _run() -> None:
        q = incremental_ingest(
            _read_stream(spark, f"{tmp}/src"),
            ledger=ledger, id_col="event_id",
            target_path=f"{tmp}/target", checkpoint=f"{tmp}/ck")
        q.awaitTermination(600)

    _run()                                   # first delivery: all rows land
    _stage(ev, f"{tmp}/src2")                # redelivery: same rows, new files
    for f in os.listdir(f"{tmp}/src2"):
        if f.endswith(".parquet"):
            shutil.copy(f"{tmp}/src2/{f}", f"{tmp}/src/redeliver_{f}")
    _run()                                   # ledger must drop every row

    tgt = spark.read.parquet(f"{tmp}/target")
    return (tgt.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value").cast("decimal(38,6)"), 2)
                  .cast("double").alias("total_value")))


ORACLE["stream_ingest_dedup"] = """
SELECT event_type, count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
FROM events GROUP BY 1
"""


QUERIES = {
    "stream_rollup_hourly": stream_rollup_hourly,
    "stream_user_totals": stream_user_totals,
    "stream_ingest_dedup": stream_ingest_dedup,
}

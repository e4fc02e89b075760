"""Orchestration + ops layer.

Subject-area fan-out with per-class error isolation (reference:
workflow.ps1:469-509 loops classes, catches per-class failures and
continues), a job-runs ops table (reference: utilities/helpers/
report_job.py:56-92 inserts BusinessClass/Timestamp/WasSuccessful/
Duration rows), a long-task alert hook (reference: db/activequeries.
py:61-91 alerts on >25-min queries via SNS), and structured-log
duration summarization (reference: utilities/helpers/log_scanner.py:
40-79 scans logs for LOAD DURATION / failure lines).
"""

from __future__ import annotations

import time
import traceback
from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LONG_TASK_THRESHOLD_S = 25 * 60  # reference: db/activequeries.py:67


class JobTracker:
    """Append-only job-runs table (FIXTURES.md F9 schema, kept
    semantically typed: success as boolean, duration in seconds)."""

    _SCHEMA = T.StructType([
        T.StructField("business_class", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("was_successful", T.BooleanType(), False),
        T.StructField("duration_s", T.DoubleType(), False),
        T.StructField("error", T.StringType(), True),
    ])

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def record(self, business_class: str, success: bool, duration_s: float,
               error: str | None = None) -> None:
        import datetime as dt
        from .core.localframe import local_frame
        row = [(business_class, dt.datetime.now(dt.timezone.utc).replace(tzinfo=None),
                bool(success), float(duration_s), error)]
        local_frame(self.spark, row, self._SCHEMA).write.mode("append").parquet(self.path)

    def read(self) -> DataFrame:
        return self.spark.read.schema(self._SCHEMA).parquet(self.path)


@dataclass
class RunResult:
    succeeded: list[str]
    failed: dict[str, str]

    @property
    def ok(self) -> bool:
        return not self.failed


def run_subject_area(classes: Sequence[str],
                     stage_fn: Callable[[str], None],
                     tracker: JobTracker | None = None,
                     alert_fn: Callable[[str], None] | None = None,
                     long_task_threshold_s: float = LONG_TASK_THRESHOLD_S) -> RunResult:
    """Run ``stage_fn`` for every class with per-class error isolation:
    a failure is recorded and the loop continues (reference:
    workflow.ps1:482-505). Tasks exceeding the long-task threshold
    fire ``alert_fn`` (the SNS hook stand-in)."""
    ok: list[str] = []
    failed: dict[str, str] = {}
    for bc in classes:
        t0 = time.perf_counter()
        try:
            stage_fn(bc)
            dur = time.perf_counter() - t0
            ok.append(bc)
            if tracker:
                tracker.record(bc, True, dur)
        except Exception as exc:  # noqa: BLE001 — isolation is the contract
            dur = time.perf_counter() - t0
            failed[bc] = f"{type(exc).__name__}: {exc}\n{traceback.format_exc(limit=3)}"
            if tracker:
                tracker.record(bc, False, dur, error=str(exc))
            if alert_fn:
                alert_fn(f"{bc} failed after {dur:.1f}s: {exc}")
        if alert_fn and dur > long_task_threshold_s:
            alert_fn(f"{bc} exceeded long-task threshold: {dur:.1f}s")
    return RunResult(ok, failed)


def plan_metrics(df: DataFrame, wanted: tuple[str, ...] = ("numOutputRows",),
                 ) -> list[dict]:
    """Per-operator runtime metrics from the EXECUTED physical plan
    (run an action on ``df`` first). Walks through AQE wrappers and
    query stages. The Spark-native upgrade of the reference's
    wall-clock-only instrumentation (SURVEY §6): per-node output rows
    / spill sizes instead of one duration per run.

    Returns ``[{"node": name, "depth": d, "metrics": {...}}, ...]`` in
    plan order."""
    plan = df._jdf.queryExecution().executedPlan()

    def children(node):
        name = node.nodeName()
        if name == "AdaptiveSparkPlan":
            return [node.executedPlan()]
        if "QueryStage" in name:
            return [node.plan()]
        if name == "ReusedExchange":
            return []
        return [node.children().apply(i) for i in range(node.children().length())]

    out: list[dict] = []

    def walk(node, depth=0):
        vals = {}
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            key = kv._1()
            if any(w in key for w in wanted):
                vals[key] = kv._2().value()
        out.append({"node": node.nodeName(), "depth": depth, "metrics": vals})
        for c in children(node):
            walk(c, depth + 1)

    walk(plan)
    return out


def summarize_logs(logs: DataFrame, line_col: str = "value") -> DataFrame:
    """Duration/failure extraction from structured text logs
    (reference: log_scanner.py greps 'LOAD DURATION' and 'load failed'
    lines). Input: a DataFrame of log lines (e.g. spark.read.text)."""
    line = F.col(line_col)
    dur = F.regexp_extract(line, r"LOAD DURATION[:=]?\s*([0-9.]+)", 1)
    return (
        logs.select(
            F.when(line.contains("LOAD DURATION"), dur.cast("double")).alias("duration_s"),
            F.when(F.lower(line).contains("load failed"), F.lit(1)).otherwise(F.lit(0)).alias("failed"),
        )
        .agg(
            F.count(F.col("duration_s")).alias("n_duration_lines"),
            F.round(F.sum("duration_s"), 3).alias("total_duration_s"),
            F.round(F.max("duration_s"), 3).alias("max_duration_s"),
            F.sum("failed").alias("n_failures"),
        )
    )


@dataclass
class BackfillResult:
    partitions_run: list[str]
    partitions_skipped: list[str]
    failures: dict[str, str]

    @property
    def ok(self) -> bool:
        return not self.failures


def backfill(partitions: Sequence[str],
             run_partition: Callable[[str], None],
             is_done: Callable[[str], bool] | None = None,
             tracker: "JobTracker | None" = None,
             max_failures: int | None = None) -> BackfillResult:
    """Idempotent historical re-run: execute ``run_partition`` for
    every partition key (typically an ``ingest_date``), skipping
    partitions ``is_done`` already confirms, isolating failures per
    partition (the reference's per-class error isolation —
    workflow.ps1:482-505 — applied along the TIME axis), and
    stopping early after ``max_failures`` so a systematic breakage
    doesn't burn the whole range.

    The partition callable must be idempotent (overwrite-partition /
    staged-swap semantics — transform.replace_parquet_staged or a
    lakehouse MERGE keyed on the partition), which is what makes
    re-running a subset after a failure safe. At 100 TB a backfill is
    driver-orchestrated but each partition's work is a full Spark
    job; parallelism across partitions belongs to the scheduler, not
    this loop (two concurrent writers to one table need the
    lakehouse's optimistic concurrency)."""
    import time as _time
    run: list[str] = []
    skipped: list[str] = []
    failures: dict[str, str] = {}
    for p in partitions:
        if is_done is not None and is_done(p):
            skipped.append(p)
            continue
        t0 = _time.perf_counter()
        try:
            run_partition(p)
            run.append(p)
            if tracker is not None:
                tracker.record(f"backfill:{p}", True,
                               _time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001 — per-partition isolation
            failures[p] = f"{type(exc).__name__}: {exc}"
            if tracker is not None:
                tracker.record(f"backfill:{p}", False,
                               _time.perf_counter() - t0)
            if max_failures is not None and len(failures) >= max_failures:
                break
    return BackfillResult(run, skipped, failures)

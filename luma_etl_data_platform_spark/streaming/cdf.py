"""Streaming change-data-feed source for the commit-log lakehouse —
the streaming half of ``sources/lakehouse.read_changes`` (Delta's
``readChangeFeed`` in micro-batch form): follow a table's commit log
from a starting version and apply each commit's row-level change set
(insert / update_preimage / update_postimage / delete) to a
downstream consumer exactly once.

Mechanics: the lakehouse is a custom log format, so the feed is
driven as a micro-batch loop over COMMIT VERSIONS rather than a
DataStreamReader — each unprocessed version ``v`` becomes one batch
``read_changes(v-1, v)`` (the per-commit file diff: only the files
that commit touched are read, never the table), handed to
``apply_fn(changes_df, v)``. Exactly-once rides the processed-version
ledger pattern of ``sources/incremental.py``: a version is recorded
AFTER its apply returns, and already-recorded versions are skipped on
redelivery — at-least-once delivery into an idempotent/versioned
apply, the same contract Structured Streaming's ``foreachBatch``
gives (batch_id ≡ commit version here, and unlike epoch ids it is
STABLE across restarts because it comes from the table's own log).

Scale shape: per batch the work is one per-commit file diff (O(files
touched by that commit)), the ledger is a parquet append of one row,
and the catch-up scan is one commit-log listing — no state grows with
table size. A 100-TB table with small incremental commits streams in
O(change) per version.

Reference anchor: the reference's incremental jobs re-derive "what
changed" by diffing extracted-id ledgers (datalakewrapper.py:189-194);
this is the same ledger discipline applied to a transactional table's
own commit history.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T


class ChangeFeedLedger:
    """Append-only parquet ledger of processed commit versions (the
    ``ProcessedIdLedger`` shape, keyed by version)."""

    _SCHEMA = T.StructType([
        T.StructField("version", T.LongType(), False),
    ])

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def processed(self) -> set[int]:
        try:
            return {int(r["version"]) for r in
                    (self.spark.read.schema(self._SCHEMA)
                     .parquet(self.path).collect())}
        except Exception:
            return set()

    def record(self, version: int) -> None:
        (self.spark.createDataFrame([(int(version),)], self._SCHEMA)
         .coalesce(1).write.mode("append").parquet(self.path))


def stream_changes(spark: SparkSession, table_path: str, apply_fn,
                   ledger_path: str, from_version: int = 1,
                   keys: list[str] | None = None,
                   max_batches: int | None = None) -> dict:
    """Drain every unprocessed commit of ``table_path`` at or above
    ``from_version`` through ``apply_fn(changes_df, version)`` — the
    ``trigger(availableNow=True)`` shape of the change feed: one call
    processes everything available and returns.

    ``changes_df`` is the :func:`sources.lakehouse.read_changes`
    frame of versions ``(v-1, v]`` (table columns +
    ``_change_type``). Versions already in the ledger are skipped, so
    re-running after a crash (or redelivering the whole history)
    applies nothing twice; a crash BETWEEN apply and record redelivers
    that one version — apply must be idempotent per version, which
    any keyed MERGE/overwrite-by-version sink is.

    Returns ``{"versions_applied": [...], "versions_skipped": n}``.
    """
    from ..sources import lakehouse as LH
    ledger = ChangeFeedLedger(spark, ledger_path)
    done = ledger.processed()
    commits = [d["version"] for d in LH._commits(spark, table_path)
               if d["version"] >= max(from_version, 1)
               and not LH._invisible(d)]
    applied: list[int] = []
    skipped = 0
    for v in sorted(commits):
        if v in done:
            skipped += 1
            continue
        changes = LH.read_changes(spark, table_path, v - 1, v,
                                  keys=keys)
        apply_fn(changes, v)
        ledger.record(v)
        applied.append(v)
        if max_batches is not None and len(applied) >= max_batches:
            break
    return {"versions_applied": applied, "versions_skipped": skipped}

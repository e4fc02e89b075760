"""Incremental extraction engine: processed-id ledger + batch ids.

Reference semantics:

- Extraction history is an append-only file of extracted object ids;
  an incremental run extracts ``set(all ids) − set(extracted ids)``
  (reference: datalakewrapper.py:189-194, utilities/utilities.py:
  208-224).
- The "active inc id" names the batch: the epoch of 5AM (configurable
  anchor) in a fixed timezone for the ETL day, rolling back one day
  before a cutoff hour; manual override supported (reference:
  utilities/utilities.py:792-808).

Spark restatement: the ledger is a parquet-backed table and the
anti-join is ``left_anti`` — a shuffle-free broadcast anti-join while
the ledger side stays modest, a shuffled one at scale; either way no
driver-side set materialization.
"""

from __future__ import annotations

import datetime as dt
import zoneinfo

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class ProcessedIdLedger:
    """Append-only ledger of processed ids, parquet-backed."""

    _SCHEMA = T.StructType([
        T.StructField("id", T.StringType(), False),
        T.StructField("batch_id", T.LongType(), True),
    ])

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def read(self) -> DataFrame:
        try:
            return self.spark.read.schema(self._SCHEMA).parquet(self.path)
        except Exception:
            from ..core.localframe import local_frame
            return local_frame(self.spark, [], self._SCHEMA)

    def not_processed(self, candidates: DataFrame, id_col: str = "id") -> DataFrame:
        """Anti-join: candidates not yet in the ledger (reference:
        utilities/utilities.py:208-224 ``not_extracted_ids``)."""
        ledger = self.read().select(F.col("id").alias(id_col)).distinct()
        return candidates.join(ledger, id_col, "left_anti")

    def record(self, ids: DataFrame, batch_id: int, id_col: str = "id") -> None:
        (ids.select(F.col(id_col).cast("string").alias("id"))
            .distinct()
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("append").parquet(self.path))


def active_inc_id(now: dt.datetime | None = None,
                  tz: str = "America/Denver",
                  anchor_hour: int = 5,
                  cutoff_hour: int = 5,
                  override: int | None = None) -> int:
    """Batch id = epoch seconds of ``anchor_hour`` local time of the
    ETL day; before ``cutoff_hour`` local the ETL day is yesterday
    (reference: utilities/utilities.py:792-808 — 5AM Mountain anchor
    with cutoff-hour rollback and manual override)."""
    if override is not None:
        return override
    zone = zoneinfo.ZoneInfo(tz)
    if now is None:
        now = dt.datetime.now(tz=zone)
    local = now.astimezone(zone)
    etl_day = local.date()
    if local.hour < cutoff_hour:
        etl_day = etl_day - dt.timedelta(days=1)
    anchor = dt.datetime.combine(etl_day, dt.time(anchor_hour), tzinfo=zone)
    return int(anchor.timestamp())

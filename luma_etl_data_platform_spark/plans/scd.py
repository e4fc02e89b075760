"""Slowly-changing-dimension (Type 2) maintenance.

The reference's warehouse stored procedures owned history tracking
(staging → warehouse MERGE per subject area); this is the in-repo
Spark restatement: ``scd2_apply`` folds a source snapshot into a
history table of (business key, attributes, valid_from, valid_to,
is_current):

- new keys            → insert as current;
- changed attributes  → close the current row (valid_to = batch ts),
                        insert the new version as current;
- unchanged keys      → untouched;
- keys absent from the source → untouched (snapshot is a delta, not a
  full mirror; pass ``close_missing=True`` for full-mirror semantics).

Format-free (parquet, staged write + rename swap via
transform.replace_parquet_staged — on Delta this becomes two MERGEs).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OPEN_TS = "9999-12-31 00:00:00"


def scd2_apply(spark: SparkSession, target_path: str, source: DataFrame,
               key: str, attrs: list[str], batch_ts: dt.datetime,
               close_missing: bool = False) -> None:
    src = source.select(key, *attrs).dropDuplicates([key])
    ts = F.lit(batch_ts).cast("timestamp")
    open_ts = F.lit(OPEN_TS).cast("timestamp")

    try:
        tgt = spark.read.parquet(target_path)
        exists = True
    except Exception:
        exists = False

    if not exists:
        fresh = src.select(
            key, *attrs,
            ts.alias("valid_from"), open_ts.alias("valid_to"),
            F.lit(True).alias("is_current"))
        fresh.write.mode("overwrite").parquet(target_path)
        return

    cur = tgt.filter(F.col("is_current"))
    hist = tgt.filter(~F.col("is_current"))

    changed_cond = None
    for a in attrs:
        ne = ~(F.col(f"cur.{a}").eqNullSafe(F.col(f"src.{a}")))
        changed_cond = ne if changed_cond is None else (changed_cond | ne)

    # presence flags via marker columns (attribute nullability safe)
    joined = (cur.alias("cur").withColumn("_in_cur", F.lit(True))
              .join(src.alias("src").withColumn("_in_src", F.lit(True)),
                    key, "full_outer"))
    is_new = F.col("_in_cur").isNull()
    is_changed = F.col("_in_cur").isNotNull() & F.col("_in_src").isNotNull() & changed_cond
    is_gone = F.col("_in_src").isNull()

    closed = joined.filter(is_changed | (F.lit(close_missing) & is_gone)).select(
        key, *[F.col(f"cur.{a}").alias(a) for a in attrs],
        F.col("cur.valid_from").alias("valid_from"),
        ts.alias("valid_to"),
        F.lit(False).alias("is_current"))
    kept = joined.filter(~is_new & ~is_changed
                         & ~(F.lit(close_missing) & is_gone)).select(
        key, *[F.col(f"cur.{a}").alias(a) for a in attrs],
        F.col("cur.valid_from").alias("valid_from"),
        F.col("cur.valid_to").alias("valid_to"),
        F.lit(True).alias("is_current"))
    inserted = joined.filter(is_new | is_changed).select(
        key, *[F.col(f"src.{a}").alias(a) for a in attrs],
        ts.alias("valid_from"), open_ts.alias("valid_to"),
        F.lit(True).alias("is_current"))

    out = hist.select(key, *attrs, "valid_from", "valid_to", "is_current") \
              .unionByName(closed).unionByName(kept).unionByName(inserted)
    # staged write + rename swap: the live table is never cleared
    # before its replacement is durably written (see transform.py).
    from .transform import replace_parquet_staged
    replace_parquet_staged(spark, target_path, out)

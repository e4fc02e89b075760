"""Parquet table catalog for the synthetic TPC-H-ish corpus.

Analog of the reference's "business class" → staging-table resolution
(reference: config/bc_table_map.json, utilities/utilities.py:745-790):
a logical table name resolves to a storage location; readers get a
DataFrame, never a path. Parquet scans give Catalyst predicate
pushdown + column pruning for free, which is the 100-TB story: a
query touching 2 of 11 lineitem columns reads 2 column chunks, and a
date filter prunes row groups via parquet min/max stats.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Dimension tables that stay small at any scale factor (fixed
# cardinality in TPC-H): always worth a broadcast hint. Everything
# else scales with SF and is left to AQE's join-strategy selection.
FIXED_SIZE_DIMS = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts has shipped as either parquet TIMESTAMP(NANOS)
        # (vanilla Spark rejects it — read via the legacy nanosAsLong
        # conf as a long and truncate to micros, matching the DuckDB
        # oracle) or TIMESTAMP(MICROS, isAdjustedToUTC=false) (arrives
        # as TIMESTAMP_NTZ). Normalize BOTH to a TimestampType whose
        # epoch equals the wall-clock value interpreted as UTC, so
        # every downstream epoch cast / bucket / window is identical
        # across data vintages and independent of the session tz.
        from pyspark.sql import functions as F, types as T
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        dt = df.schema["ts"].dataType
        if isinstance(dt, T.LongType):
            # nanos → micros by integer division (`div`): float
            # division would lose precision above 2^53 ns.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(dt, T.TimestampNTZType):
            # NOT to_utc_timestamp: Spark implicitly casts NTZ→LTZ via
            # the SESSION timezone first, which would shift the epoch
            # on any non-UTC session. timestampdiff against an NTZ
            # epoch literal is pure wall-clock arithmetic.
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr(
                    "timestampdiff(MICROSECOND,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so plans/ SQL can refer to
    them by name — the Spark-side mirror of the DuckDB oracle's
    pre-registered views."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

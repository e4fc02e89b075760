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
        # events.ts is parquet TIMESTAMP(NANOS), which vanilla Spark
        # rejects (PARQUET_TYPE_ILLEGAL). Set the legacy conf on
        # whatever session we were handed (runtime-settable) so the
        # column arrives as a long, then truncate nanos → micros
        # exactly like the DuckDB oracle does. Integer division
        # (`div`) — float division would lose precision above 2^53 ns.
        from pyspark.sql import functions as F, types as T
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so plans/ SQL can refer to
    them by name — the Spark-side mirror of the DuckDB oracle's
    pre-registered views."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

"""End-to-end ELT pipeline: extract → stage → transform.

Mirrors the reference's three-stage flow (workflow.ps1:402-433 chains
"Infor → S3 → Staging → Data Warehouse") with DataFrames flowing
between stages instead of S3 payload files:

- **ingest**: JSON-lines (or any DataFrame) → canonical column names →
  schema-version tagging (drift registry) → cleansing.
- **stage**: partitioned parquet write, partitioned by schema version
  (the reference's per-version CSV files, utilities/utilities.py:609-637)
  and optionally by ingest batch id.
- **compile**: union-of-schemas merged view (the "cleansed" file,
  utilities/utilities.py:394-426).

Scale: stage writes are append-only partitioned parquet — at 100 TB
the partition columns (_schema_version, batch_id) keep rewrites
incremental, and downstream reads partition-prune on batch_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .functions.cleansing import canonicalize_columns
from .operators.merge import ordered_projection
from .schema_registry.registry import SchemaRegistry


def ingest_records(df: DataFrame, registry: SchemaRegistry,
                   columns_to_load: list[str] | None = None) -> DataFrame:
    """Canonicalize names, optionally project to the include-list
    (reference: utilities/utilities.py:98-107), and tag schema
    versions."""
    out = canonicalize_columns(df)
    if columns_to_load:
        keep = [c for c in out.columns if c in set(columns_to_load)]
        out = out.select(*keep)
    return registry.tag_versions(out)


def stage(df: DataFrame, path: str, batch_id: int | None = None,
          mode: str = "append") -> None:
    """Write the tagged frame as parquet partitioned by schema version
    (and batch id for incremental loads — the reference's
    ``{bc}/{inc_id}/`` folder layout, datalakewrapper.py:247-250)."""
    parts = ["_schema_version"]
    if batch_id is not None:
        from pyspark.sql import functions as F
        df = df.withColumn("_batch_id", F.lit(batch_id))
        parts.append("_batch_id")
    df.write.partitionBy(*parts).mode(mode).parquet(path)


def compile_merged(spark: SparkSession, staged_path: str,
                   columns: list[str] | None = None) -> DataFrame:
    """Read the staged per-version partitions back as one merged frame
    with alphabetically ordered columns — outer-union semantics come
    from parquet schema merging across partitions."""
    df = spark.read.option("mergeSchema", "true").parquet(staged_path)
    data_cols = [c for c in df.columns if not c.startswith("_")]
    if columns is not None:
        data_cols = [c for c in data_cols if c in set(columns)]
    return ordered_projection(df.select(*data_cols, "_schema_version"),
                              sorted(data_cols) + ["_schema_version"])

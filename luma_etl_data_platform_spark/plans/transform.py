"""Warehouse transform layer: templated SQL + MERGE upserts.

The reference generates per-table stored-proc scripts from a template
+ table map (reference: utilities/helpers/table_generator.py:39-90),
executes directories of ``.sql`` files split on ``GO`` (utilities/
helpers/sql_runner.py:38-77), and emits T-SQL MERGE column lists
(db/columns/dbcolumngen.py:3-32). Here the templates render Spark SQL
executed in-process, and MERGE is provided two ways:

- ``merge_sql``: the statement text for MERGE-capable table formats
  (Delta/Iceberg — jars not in this build, so emission only);
- ``merge_upsert_parquet``: format-free emulation — upsert-by-key on
  a parquet target via anti-join + union + atomic overwrite.

Scale note: overwrite-by-key rewrites the whole target; for real
deployments partition the target and use dynamic partition overwrite
(``partition_cols``) so only touched partitions rewrite.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# template rendering + script running (S17/S18)
# ---------------------------------------------------------------------------

def render_template(template: str, params: dict[str, str]) -> str:
    """``{{name}}`` substitution (whitespace-tolerant); unknown
    placeholders raise."""
    def sub(m: re.Match) -> str:
        key = m.group(1).strip()
        if key not in params:
            raise KeyError(f"template placeholder {{{{{key}}}}} has no value")
        return str(params[key])
    return re.sub(r"\{\{([^{}]+)\}\}", sub, template)


def split_statements(script: str, delimiter: str = ";") -> list[str]:
    """Split a SQL script into statements (the reference splits on GO,
    utilities/helpers/sql_runner.py; Spark scripts use ';')."""
    parts = [p.strip() for p in script.split(delimiter)]
    return [p for p in parts if p]


def run_script(spark: SparkSession, script: str,
               params: dict[str, str] | None = None) -> list[DataFrame]:
    """Render + execute every statement; returns each statement's
    result DataFrame (most are empty for DDL/DML)."""
    if params:
        script = render_template(script, params)
    return [spark.sql(stmt) for stmt in split_statements(script)]


# ---------------------------------------------------------------------------
# MERGE (J3)
# ---------------------------------------------------------------------------

def merge_column_lists(columns: list[str], keys: list[str]) -> tuple[str, str, str]:
    """The reference's MERGE scaffolding (db/columns/dbcolumngen.py:
    3-32): ON condition, UPDATE SET list, INSERT lists."""
    on = " AND ".join(f"tgt.{k} = src.{k}" for k in keys)
    upd = ", ".join(f"tgt.{c} = src.{c}" for c in columns if c not in keys)
    ins_cols = ", ".join(columns)
    ins_vals = ", ".join(f"src.{c}" for c in columns)
    return on, upd, f"({ins_cols}) VALUES ({ins_vals})"


def merge_sql(target: str, source: str, columns: list[str], keys: list[str]) -> str:
    """MERGE INTO text for Delta/Iceberg deployments."""
    on, upd, ins = merge_column_lists(columns, keys)
    return (
        f"MERGE INTO {target} AS tgt\n"
        f"USING {source} AS src\n"
        f"ON {on}\n"
        f"WHEN MATCHED THEN UPDATE SET {upd}\n"
        f"WHEN NOT MATCHED THEN INSERT {ins}"
    )


def upsert(spark: SparkSession, target: str, source: DataFrame,
           keys: list[str]) -> None:
    """Format-dispatching upsert: native MERGE INTO when a
    MERGE-capable catalog table format is present (Delta — jars not in
    this build, gated by import-try), else the parquet
    overwrite-by-key emulation."""
    try:
        from delta.tables import DeltaTable  # noqa: F401
        have_delta = True
    except Exception:
        have_delta = False
    if have_delta and not target.startswith("/"):
        source.createOrReplaceTempView("_upsert_src")
        spark.sql(merge_sql(target, "_upsert_src", source.columns, keys))
        return
    merge_upsert_parquet(spark, target, source, keys)


def merge_upsert_parquet(spark: SparkSession, target_path: str,
                         source: DataFrame, keys: list[str]) -> None:
    """Upsert-by-key on a parquet target without a MERGE-capable
    format: keep target rows whose key is absent from the source
    (anti-join), union the source (updates + inserts), rewrite
    atomically (write to staging dir semantics via overwrite).

    Source must be deduplicated on ``keys`` (last-writer-wins is the
    caller's policy decision)."""
    try:
        target = spark.read.parquet(target_path)
        exists = True
    except Exception:
        exists = False
    if not exists:
        source.write.mode("overwrite").parquet(target_path)
        return
    keep = target.join(source.select(*keys).distinct(), keys, "left_anti")
    merged = keep.unionByName(source.select(*target.columns))
    # materialize before overwriting the path we read from
    merged.persist()
    try:
        merged.count()
        merged.write.mode("overwrite").parquet(target_path)
    finally:
        merged.unpersist()

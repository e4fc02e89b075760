"""File and JDBC sinks.

- Schema-versioned CSV sink/scan: the reference lands one CSV per
  (business class, schema version) with values scrubbed of quotes and
  newlines (reference: utilities/utilities.py:609-637 sink,
  598-607 sanitizer, 351-360 typed scan). Parquet partitioned by
  ``_schema_version`` is the native rebuild; CSV kept for parity and
  interchange.
- JDBC sink: the reference chunk-inserts via executemany with
  ``fast_executemany`` and a config chunk size, with a truncate-first
  replace mode (reference: lambda_function.py:201-243, db/database.py:
  30-41). Spark's JDBC writer batches natively; replace mode maps to
  ``mode("overwrite") + truncate``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.cleansing import clean_csv_value

DEFAULT_JDBC_BATCH = 10_000


def write_versioned_csv(df: DataFrame, path: str, mode: str = "append",
                        sanitize: bool = True) -> None:
    """Write partitioned by ``_schema_version`` as headerless CSV, with
    the reference's value sanitization (quotes/newlines stripped)."""
    out = df
    if sanitize:
        out = df.select(*[
            clean_csv_value(F.col(c)).alias(c)
            if isinstance(df.schema[c].dataType, T.StringType) else F.col(c)
            for c in df.columns
        ])
    (out.write.partitionBy("_schema_version")
        .mode(mode).option("header", "false").csv(path))


def read_versioned_csv(spark: SparkSession, path: str,
                       schema: T.StructType) -> DataFrame:
    """Typed scan of the versioned CSV layout (explicit schema, never
    inferSchema — reference passes explicit columns+dtypes,
    utilities/utilities.py:351-360)."""
    return spark.read.schema(schema).option("header", "false").csv(path)


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append",
               batchsize: int = DEFAULT_JDBC_BATCH, truncate: bool = False,
               properties: dict | None = None) -> None:
    """JDBC bulk load. ``mode='overwrite', truncate=True`` is the
    reference's replace mode (truncate + reload,
    lambda_function.py:205-209). Partitioned writes replace the
    reference's manual file splitting (utilities/splitfile.py)."""
    writer = (df.write.format("jdbc")
              .option("url", url)
              .option("dbtable", table)
              .option("batchsize", str(batchsize))
              .option("truncate", str(truncate).lower())
              .mode(mode))
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def write_orc(df: DataFrame, path: str, mode: str = "append",
              partition_by: list[str] | None = None,
              compression: str = "zstd") -> None:
    """Columnar ORC sink (Spark-native writer — no extra jars): the
    interchange format for Hive/Trino-side consumers who don't read
    parquet. zstd by default (best ratio at comparable scan speed on
    modern Spark); partition columns map to hive-style directories.

    Reference scope: beyond the reference's CSV/JDBC sinks — a
    warehouse this size needs at least one columnar interchange
    format per downstream engine family."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str,
             schema: T.StructType | None = None) -> DataFrame:
    """ORC scan; pass ``schema`` for a typed read (never infer on an
    interchange boundary — same doctrine as ``read_versioned_csv``).
    Predicate pushdown and column pruning work as for parquet (ORC
    carries min/max/bloom indexes in stripe footers)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)

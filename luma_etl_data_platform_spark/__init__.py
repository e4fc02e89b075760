"""luma_etl_data_platform_spark — a PySpark-native ELT/analytics engine.

Re-expression of the capabilities of the reference ETL platform
(/root/reference, an "Infor → S3 → SQL Server staging → warehouse"
batch loader; see SURVEY.md) as an idiomatic Spark engine:

- ingestion with schema-drift handling (schema_registry/),
- a cleansing/conforming operator library (functions/, operators/),
- warehouse transforms as Spark SQL (plans/),
- incremental micro-batch + streaming (sources/incremental.py, streaming/),
- large-scale training-data ops: dedup, similarity search, text
  analysis, multimodal plumbing (operators/).

Everything is DataFrame/Catalyst-first: operators are declarative
compositions of pyspark.sql primitives so predicate pushdown, column
pruning, whole-stage codegen, and AQE apply end to end.
"""

__version__ = "0.1.0"

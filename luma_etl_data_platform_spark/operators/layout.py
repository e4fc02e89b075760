"""Physical data layout for scan pruning at scale.

``write_partitioned``: hive-style partition columns → partition
pruning (a filter on the partition column never opens non-matching
directories).

``write_range_layout``: range-repartition + in-partition sort on a
column → every parquet file covers a narrow value range, so row-group
min/max statistics prune file contents even without hive partitions
(the poor man's Z-order for a single dimension — the right layout for
time-series fact tables queried by time range).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      mode: str = "overwrite") -> None:
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def write_range_layout(df: DataFrame, path: str, order_col: str,
                       n_files: int = 8, mode: str = "overwrite") -> None:
    (df.repartitionByRange(n_files, F.col(order_col))
       .sortWithinPartitions(order_col)
       .write.mode(mode).parquet(path))


def read_pruned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)

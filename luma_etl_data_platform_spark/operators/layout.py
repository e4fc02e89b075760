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


def morton_key(c1, c2, bits: int = 16):
    """Z-order (Morton) interleaving of two bucketed integer columns:
    bit i of each input lands at position 2i / 2i+1 of the key, so
    sorting by the key clusters rows that are close in BOTH
    dimensions — range-layout by morton_key gives file-level min/max
    pruning for predicates on either column (the multi-dimension
    upgrade of write_range_layout's single column)."""
    key = F.lit(0).cast("long")
    for i in range(bits):
        b1 = F.shiftright(c1.cast("long"), i).bitwiseAND(F.lit(1))
        b2 = F.shiftright(c2.cast("long"), i).bitwiseAND(F.lit(1))
        key = key + (b1.cast("long") * F.lit(2 ** (2 * i)).cast("long")) \
                  + (b2.cast("long") * F.lit(2 ** (2 * i + 1)).cast("long"))
    return key


def write_zorder_layout(df: DataFrame, path: str, col1: str, col2: str,
                        n_files: int = 8, bits: int = 16,
                        mode: str = "overwrite") -> None:
    keyed = df.withColumn("_z", morton_key(F.col(col1), F.col(col2), bits))
    (keyed.repartitionByRange(n_files, F.col("_z"))
          .sortWithinPartitions("_z")
          .drop("_z")
          .write.mode(mode).parquet(path))

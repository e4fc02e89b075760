"""One-pass table profiling: per-column null counts, exact distinct
counts, and min/max — the data-quality summary the reference only got
implicitly from load failures (SURVEY §5: correctness was enforced
operationally; here profiling is a first-class operator).

Implementation: a single wide aggregate (every metric for every column
in one scan — map-side combinable), then an in-memory melt to rows.
The melt is driver-side over one aggregated row (column-count sized),
not over data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    row = df.agg(*aggs).collect()[0].asDict()
    n = row["__n"]
    out = [(c, n, int(row[f"{c}__nulls"]), int(row[f"{c}__distinct"]),
            row[f"{c}__min"], row[f"{c}__max"]) for c in cols]
    schema = T.StructType([
        T.StructField("column", T.StringType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("n_nulls", T.LongType(), False),
        T.StructField("n_distinct", T.LongType(), False),
        T.StructField("min_str", T.StringType(), True),
        T.StructField("max_str", T.StringType(), True),
    ])
    return df.sparkSession.createDataFrame(out, schema)

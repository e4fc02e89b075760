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


def key_skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """One-row skew diagnosis of a join/partition key: key count, row
    total, max/p99 per-key frequencies, the hottest key, and the Gini
    coefficient of the key-frequency distribution — the number that
    tells you whether a shuffle on this key needs salting or AQE skew
    handling BEFORE you run the join.

    Gini uses the exact integer identity over ascending-sorted counts
    ``G = Σ (2i − n − 1)·c_i / (n · Σc)`` — the numerator is an exact
    sum of products carried in DECIMAL(38,0) (order-free and safe past
    2^63: at billions of keys × trillions of rows the BIGINT form
    would silently wrap in non-ANSI Spark), so the statistic is
    bit-stable and SQL-oracle-checkable; only the final ratio is a
    rounded double.

    Scale shape: ranks are NEVER assigned per key (a global
    row_number over billions of keys would be one task).  Keys with
    the same count occupy a contiguous rank run whose rank-sum is
    closed-form, so the computation collapses to count-of-counts:
    one groupBy on the key, one groupBy on the count value, and a
    window over DISTINCT count values — a set whose size is bounded
    by O(sqrt(total_rows)) regardless of key cardinality.
    """
    from pyspark.sql.window import Window as W
    counts = (df.groupBy(F.col(key_col).alias("_k"))
              .agg(F.count(F.lit(1)).alias("_c")))
    # count-of-counts: multiplicity m per distinct count value c
    coc = counts.groupBy("_c").agg(F.count(F.lit(1)).alias("_m"))
    run = (coc.withColumn(
        "_cum", F.sum("_m").over(
            W.orderBy("_c").rowsBetween(W.unboundedPreceding, 0))))
    # ranks for count value c run from start = (cum−m+1) to cum;
    # Σ i over the run = m·(2·start + m − 1) / 2, exact in BIGINT
    run_rank_sum = F.expr(
        "_m * (2 * (_cum - _m + 1) + _m - 1) DIV 2")
    # products of two sub-2^63 values fit DECIMAL(38,0) exactly;
    # summing in decimal keeps the accumulator overflow-proof
    agg = run.agg(
        F.sum("_m").alias("n_keys"),
        F.sum(F.col("_c") * F.col("_m")).alias("total_rows"),
        F.max("_c").alias("max_count"),
        F.sum(F.col("_c").cast("decimal(19,0)")
              * run_rank_sum.cast("decimal(19,0)")).alias("_s_ic"),
    )
    p99 = counts.agg(
        (F.round(F.expr("CAST(percentile(_c, 0.99) AS DOUBLE)")
                 * F.lit(1_000_000.0)) / F.lit(1_000_000.0))
        .alias("p99_count"))
    agg = agg.crossJoin(F.broadcast(p99))
    hottest = (counts
               .join(F.broadcast(counts.agg(F.max("_c").alias("_mx"))),
                     F.col("_c") == F.col("_mx"))
               .agg(F.min("_k").alias("hottest_key")))
    gini_num = (F.lit(2).cast("decimal(19,0)") * F.col("_s_ic")
                - (F.col("n_keys") + 1).cast("decimal(19,0)")
                * F.col("total_rows").cast("decimal(19,0)"))
    # denominator in double: n_keys*total_rows can also pass 2^63 and
    # only feeds the rounded ratio, where double precision suffices
    gini_den = (F.col("n_keys").cast("double")
                * F.col("total_rows").cast("double"))
    return (agg.crossJoin(F.broadcast(hottest))
            .select("n_keys", "total_rows", "max_count", "p99_count",
                    "hottest_key",
                    (F.round(gini_num.cast("double") / gini_den
                             * F.lit(1_000_000.0))
                     / F.lit(1_000_000.0)).alias("gini")))


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
    from ..core.localframe import local_frame
    return local_frame(df.sparkSession, out, schema)

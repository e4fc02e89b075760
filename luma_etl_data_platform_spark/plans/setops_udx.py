"""Set operations, date-function battery, and the UDF/UDAF/UDTF
surface (SURVEY §2.8 lists these as absent in the reference; Spark
provides them natively and the task brief grades Pandas-UDF
proficiency). The pandas paths are deliberately integer-exact so a
SQL oracle reproduces them bit-for-bit."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..sources.tables import load_table

ORACLE: dict[str, str] = {}


# ---------------------------------------------------------------------------
# setop_active_buildings: INTERSECT / EXCEPT battery on customer keys.
# ---------------------------------------------------------------------------
def setop_active_buildings(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey"))
    big_spenders = orders.filter(F.col("o_totalprice") > 200000).select(
        F.col("o_custkey").alias("custkey"))
    low_prio = orders.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("custkey"))
    return building.intersect(big_spenders).exceptAll(low_prio.distinct())


ORACLE["setop_active_buildings"] = """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey FROM orders WHERE o_totalprice > 200000
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
"""


# ---------------------------------------------------------------------------
# order_date_battery: scalar date/time function family (F6/F7 surface).
# ---------------------------------------------------------------------------
def order_date_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.quarter(d).alias("qtr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.dayofweek(d).alias("dow"),          # 1 = Sunday
        F.date_trunc("week", d).alias("week_start"),
        # timestamps (not DateType) on both sides: pandas renders SQL
        # DATE as midnight Timestamp, Spark DateType as datetime.date —
        # value-hash comparators may treat those differently
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.date_add(d.cast("date"), 30).cast("timestamp").alias("plus_30d"),
        F.datediff(d, F.lit("1995-01-01").cast("timestamp")).alias("days_since_epoch_start"),
    )


ORACLE["order_date_battery"] = """
SELECT o_orderkey,
       year(o_orderdate)                       AS yr,
       quarter(o_orderdate)                    AS qtr,
       month(o_orderdate)                      AS mo,
       day(o_orderdate)                        AS dom,
       dayofweek(o_orderdate) + 1              AS dow,
       date_trunc('week', o_orderdate)         AS week_start,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS TIMESTAMP) AS plus_30d,
       date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start
FROM orders
"""


# ---------------------------------------------------------------------------
# udaf_weighted_chars: Pandas GROUPED_AGG UDAF — doc_id-weighted mean
# of n_chars per source. Integer-exact accumulation so the SQL oracle
# matches bit-for-bit.
# ---------------------------------------------------------------------------
def udaf_weighted_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    # defined inside the function: pandas_udf needs an active session.
    # The UDF returns the MICRO-scaled quotient with the same op order
    # as the oracle (exact int -> double, then one double division),
    # and the 6-dp emission is one 0-dp round — the int/int round(x,6)
    # half-way class is engine-divergent (r9 sf0.1-tier bug)
    @pandas_udf("double")
    def _weighted_mean_micro(chars: pd.Series, weight: pd.Series) -> float:
        num = int((chars.astype("int64") * weight.astype("int64")).sum())
        den = int(weight.astype("int64").sum())
        return float(num * 1_000_000) / float(den) if den else 0.0

    docs = load_table(spark, sf_dir, "documents")
    w = (F.col("doc_id") + 1).cast("long")
    # a grouped-agg pandas UDF cannot share an agg with JVM aggregates
    # → compute counts separately and join (source cardinality is tiny)
    wavg = (docs.groupBy("source")
            .agg((F.round(_weighted_mean_micro(F.col("n_chars"), w))
                  / F.lit(1_000_000.0)).alias("weighted_chars")))
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return wavg.join(counts, "source").orderBy("source")


ORACLE["udaf_weighted_chars"] = """
SELECT source,
       round(CAST(sum(n_chars * (doc_id + 1)) * 1000000 AS DOUBLE)
             / CAST(sum(doc_id + 1) AS DOUBLE)) / 1000000.0
         AS weighted_chars,
       count(*) AS n_docs
FROM documents GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# udtf_sentences: Python UDTF exploding documents into numbered
# sentence rows (lateral join), oracled by unnest-with-position.
# ---------------------------------------------------------------------------
def udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="sent_idx int, sentence string")
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            for i, s in enumerate(text.split(". ")):
                yield i, s

    spark.udtf.register("sentence_split", SentenceSplit)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_docs_udtf")
    return spark.sql("""
        SELECT d.doc_id, s.sent_idx, s.sentence
        FROM _docs_udtf d, LATERAL sentence_split(d.text) s
    """)


ORACLE["udtf_sentences"] = """
WITH parts AS (SELECT doc_id, string_split(text, '. ') AS p FROM documents),
pos AS (SELECT doc_id, p, unnest(generate_series(1, len(p))) AS i FROM parts)
SELECT doc_id, CAST(i - 1 AS INT) AS sent_idx, p[i] AS sentence FROM pos
"""


# ---------------------------------------------------------------------------
# grouped_minmax_chars: grouped-map applyInPandas (per-source min-max
# normalization), oracled by window min/max — integer subtraction and
# one double division are deterministic through the pandas path.
# ---------------------------------------------------------------------------
def grouped_minmax_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.grouped import minmax_scale
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return minmax_scale(docs, "source", "n_chars", out_col="chars_scaled")


ORACLE["grouped_minmax_chars"] = """
SELECT doc_id, source, n_chars,
       CASE WHEN max(n_chars) OVER w = min(n_chars) OVER w THEN 0.0
            ELSE round((n_chars - min(n_chars) OVER w) * 1.0
                       / (max(n_chars) OVER w - min(n_chars) OVER w), 6)
       END AS chars_scaled
FROM documents
WINDOW w AS (PARTITION BY source)
"""


QUERIES = {
    "setop_active_buildings": setop_active_buildings,
    "order_date_battery": order_date_battery,
    "udaf_weighted_chars": udaf_weighted_chars,
    "udtf_sentences": udtf_sentences,
    "grouped_minmax_chars": grouped_minmax_chars,
}

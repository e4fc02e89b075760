"""Second TPC-H-shape batch: volume shipping (Q7), customer order-count
distribution including zero-order customers (Q13), large-volume
customers via HAVING + join-back (Q18), and above-average idle
customers via scalar subquery + anti-join (Q22)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ._exact import SQL_REV, dmoney, exact_sum, revenue_expr

ORACLE: dict[str, str] = {}


# ---------------------------------------------------------------------------
# q7: volume shipping between nation pairs per year.
# ---------------------------------------------------------------------------
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(nation.select(F.col("n_nationkey").alias("c_nk"),
                                   F.col("n_name").alias("cust_nation")))
    n2 = F.broadcast(nation.select(F.col("n_nationkey").alias("s_nk"),
                                   F.col("n_name").alias("supp_nation")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(n1, cust.c_nationkey == F.col("c_nk"))
        .join(n2, supp.s_nationkey == F.col("s_nk"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(exact_sum(revenue_expr()).alias("volume"),
             F.count(F.lit(1)).alias("n_lines"))
    )


ORACLE["q7_volume_shipping"] = f"""
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
       year(l_shipdate) AS ship_year,
       CAST(round(sum({SQL_REV}), 2) AS DOUBLE) AS volume,
       count(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# q13: distribution of orders-per-customer, zero included (left join).
# ---------------------------------------------------------------------------
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


ORACLE["q13_order_count_distribution"] = """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# q18: large-volume customers — HAVING on a grouped sum, join back.
# ---------------------------------------------------------------------------
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (li.groupBy("l_orderkey")
           .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
           .filter(F.col("total_qty") > 150))
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                F.round(F.col("o_totalprice"), 2).alias("o_totalprice"), "total_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


ORACLE["q18_large_volume_customers"] = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       round(o_totalprice, 2) AS o_totalprice, total_qty
FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
      FROM lineitem GROUP BY 1 HAVING round(sum(l_quantity), 2) > 150) big
JOIN orders   ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# q22: customers with above-average balance and no orders
# (scalar subquery + anti-join).
# ---------------------------------------------------------------------------
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    # exact decimal sum / count → the cutoff is partition-order
    # independent (a float avg could flip membership of a customer
    # whose balance ties the average)
    row = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(dmoney(F.col("c_acctbal"))).cast("double").alias("s"),
        F.count(F.lit(1)).alias("n")).collect()[0]
    avg_bal = row["s"] / row["n"]
    return (
        cust.filter(F.col("c_acctbal") > F.lit(avg_bal))
        .join(orders.select(F.col("o_custkey").alias("c_custkey")).distinct(),
              "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_custs"),
             exact_sum(dmoney(F.col("c_acctbal"))).alias("total_bal"))
        .orderBy("c_mktsegment")
    )


ORACLE["q22_idle_rich_customers"] = """
SELECT c_mktsegment, count(*) AS n_custs,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_bal
FROM customer
WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# q15: top supplier(s) — grouped revenue vs its own maximum (view +
# scalar-max shape; ties all returned, exactly as TPC-H specifies).
# ---------------------------------------------------------------------------
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
    supp = load_table(spark, sf_dir, "supplier")
    rev = (li.groupBy("l_suppkey")
           .agg(exact_sum(revenue_expr()).alias("total_revenue")))
    max_rev = rev.agg(F.max("total_revenue").alias("m"))
    return (
        rev.join(F.broadcast(max_rev), rev.total_revenue == max_rev.m)
        .join(supp, rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


ORACLE["q15_top_supplier"] = f"""
WITH rev AS (
  SELECT l_suppkey, CAST(round(sum({SQL_REV}), 2) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# q8: national market share — NATION_1's share of revenue from
# AMERICA-region customers, per order year. Decimal-exact numerator
# and denominator, divided once in double.
# ---------------------------------------------------------------------------
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n_cust = nation.select(F.col("n_nationkey").alias("cnk"),
                           F.col("n_regionkey").alias("crk"))
    n_supp = nation.select(F.col("n_nationkey").alias("snk"),
                           F.col("n_name").alias("supp_nation"))
    rev = revenue_expr()
    nation_rev = F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(
        F.lit(0).cast("decimal(18,2)"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("cnk"))
        .join(F.broadcast(region), F.col("crk") == region.r_regionkey)
        .join(F.broadcast(n_supp), supp.s_nationkey == F.col("snk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(nation_rev).cast("double")
                     / F.sum(rev).cast("double"), 6).alias("mkt_share"),
             exact_sum(rev).alias("total_volume"))
        .orderBy("o_year")
    )


ORACLE["q8_market_share"] = f"""
SELECT year(o_orderdate) AS o_year,
       round(CAST(sum(CASE WHEN n2.n_name = 'NATION_1' THEN {SQL_REV}
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum({SQL_REV}) AS DOUBLE), 6) AS mkt_share,
       CAST(round(sum({SQL_REV}), 2) AS DOUBLE) AS total_volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region    ON n1.n_regionkey = r_regionkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'AMERICA'
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# q19: disjunctive multi-attribute predicates (brand × size × quantity
# bands OR-ed together) — the optimizer must push a complex OR into
# the join without exploding it.
# ---------------------------------------------------------------------------
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    b1 = ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15))
          & (F.col("l_quantity").between(1, 20)))
    b2 = ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(10, 30))
          & (F.col("l_quantity").between(10, 35)))
    b3 = ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(20, 50))
          & (F.col("l_quantity").between(20, 50)))
    return (
        j.filter(b1 | b2 | b3)
        .agg(exact_sum(revenue_expr()).alias("revenue"),
             F.count(F.lit(1)).alias("n_lines"))
    )


ORACLE["q19_disjunctive_revenue"] = f"""
SELECT CAST(round(sum({SQL_REV}), 2) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
"""


QUERIES = {
    "q7_volume_shipping": q7_volume_shipping,
    "q15_top_supplier": q15_top_supplier,
    "q8_market_share": q8_market_share,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q22_idle_rich_customers": q22_idle_rich_customers,
}

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


# ---------------------------------------------------------------------------
# q4: order priority checking — orders with at least one late line,
# counted per priority (EXISTS → left-semi join). The testdata schema
# has no l_commitdate/l_receiptdate, so "late" is adapted to shipped
# more than 90 days after the order date; the plan shape (date-window
# scan + correlated EXISTS + grouped count) is Q4's.
# ---------------------------------------------------------------------------
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem")
    late = li.select("l_orderkey", "l_shipdate")
    cond = (orders.o_orderkey == late.l_orderkey) & \
           (late.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS"))
    return (
        orders.join(late, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORACLE["q4_order_priority"] = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate <  TIMESTAMP '1995-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# q12: shipping-delay priority classification — per lateness bucket,
# how many HIGH/URGENT vs other-priority orders shipped there
# (conditional counts). Adapted from Q12's shipmode dimension to a
# lateness dimension (no l_shipmode/l_commitdate in the testdata);
# the conditional-aggregation-over-join shape is Q12's.
# ---------------------------------------------------------------------------
def q12_late_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp")))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    days_late = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (F.when(days_late > 90, "very_late")
              .when(days_late > 30, "late").otherwise("on_time"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(bucket.alias("delay_bucket"))
        .agg(F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
             F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"))
        .orderBy("delay_bucket")
    )


ORACLE["q12_late_priority_counts"] = """
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90 THEN 'very_late'
            WHEN date_diff('day', o_orderdate, l_shipdate) > 30 THEN 'late'
            ELSE 'on_time' END AS delay_bucket,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1996-01-01'
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# q14: promotion effect — promo revenue share of one ship month
# (conditional sum ratio; p_type = 'PROMO' stands in for the
# spec's LIKE 'PROMO%'). Numerator and denominator decimal-exact,
# one double division at the end.
# ---------------------------------------------------------------------------
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp")))
    part = load_table(spark, sf_dir, "part")
    rev = revenue_expr()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,2)"))
    return (
        li.join(F.broadcast(part.select("p_partkey", "p_type")),
                li.l_partkey == F.col("p_partkey"))
        .agg(F.round(F.lit(100.0) * F.sum(promo).cast("double")
                     / F.sum(rev).cast("double"), 6).alias("promo_revenue_pct"),
             exact_sum(rev).alias("total_revenue"))
    )


ORACLE["q14_promo_effect"] = f"""
SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {SQL_REV}
                                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum({SQL_REV}) AS DOUBLE), 6) AS promo_revenue_pct,
       CAST(round(sum({SQL_REV}), 2) AS DOUBLE) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01'
  AND l_shipdate <  TIMESTAMP '1995-10-01'
"""


# ---------------------------------------------------------------------------
# q17: small-quantity-order revenue — lines of one brand/size bucket
# whose quantity is below 20% of that part's average quantity
# (correlated avg subquery → per-part aggregate joined back;
# p_size = 5 stands in for the spec's p_container). The 0.2*avg cutoff
# is computed as exact decimal sum / count, divided once.
# ---------------------------------------------------------------------------
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") == 5))
    per_part = (li.groupBy(F.col("l_partkey").alias("avg_pk"))
                .agg((F.lit(0.2) * (F.sum(dmoney(F.col("l_quantity"))).cast("double")
                                    / F.count(F.lit(1)))).alias("qty_cutoff")))
    return (
        li.join(F.broadcast(part.select("p_partkey")),
                li.l_partkey == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("avg_pk"))
        .filter(F.col("l_quantity") < F.col("qty_cutoff"))
        .agg(F.round(F.sum(dmoney(F.col("l_extendedprice"))).cast("double")
                     / F.lit(7.0), 2).alias("avg_yearly"),
             F.count(F.lit(1)).alias("n_lines"))
    )


ORACLE["q17_small_quantity_revenue"] = """
WITH cutoff AS (
  SELECT l_partkey AS avg_pk,
         0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*))
           AS qty_cutoff
  FROM lineitem GROUP BY 1)
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7, 2)
         AS avg_yearly,
       count(*) AS n_lines
FROM lineitem
JOIN part   ON l_partkey = p_partkey
JOIN cutoff ON l_partkey = avg_pk
WHERE p_brand = 'Brand#3' AND p_size = 5
  AND l_quantity < qty_cutoff
"""


# ---------------------------------------------------------------------------
# q21: suppliers who kept orders waiting — in multi-supplier 'F'
# orders, the supplier who alone shipped last (strictly after every
# other supplier). Adapted to l_shipdate (no commit/receipt dates in
# the testdata); Q21's exists/not-exists pair becomes one window over
# per-(order, supplier) maxima: blocking ⇔ rank-1 max with no tie and
# ≥2 suppliers in the order.
# ---------------------------------------------------------------------------
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F")
    supp = load_table(spark, sf_dir, "supplier")
    per_os = (
        li.join(orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("s_max"))
    )
    w = W.partitionBy("l_orderkey")
    flagged = per_os.select(
        "l_orderkey", "l_suppkey", "s_max",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.max("s_max").over(w).alias("o_max"),
    ).withColumn(
        "n_at_max",
        F.sum(F.when(F.col("s_max") == F.col("o_max"), 1).otherwise(0)).over(w))
    blocking = flagged.filter(
        (F.col("n_supp") >= 2) & (F.col("n_at_max") == 1)
        & (F.col("s_max") == F.col("o_max")))
    return (
        blocking.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


ORACLE["q21_waiting_supplier"] = """
WITH per_os AS (
  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS s_max
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2),
flagged AS (
  SELECT l_orderkey, l_suppkey, s_max,
         count(*) OVER w AS n_supp,
         max(s_max) OVER w AS o_max
  FROM per_os
  WINDOW w AS (PARTITION BY l_orderkey)),
at_max AS (
  SELECT *, CAST(sum(CASE WHEN s_max = o_max THEN 1 ELSE 0 END)
                 OVER (PARTITION BY l_orderkey) AS BIGINT) AS n_at_max
  FROM flagged)
SELECT s_name, count(*) AS numwait
FROM at_max JOIN supplier ON l_suppkey = s_suppkey
WHERE n_supp >= 2 AND n_at_max = 1 AND s_max = o_max
GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 100
"""


# ---------------------------------------------------------------------------
# Third batch: the five remaining canonical shapes, adapted to the
# synthetic schema (no partsupp table — the part↔supplier association
# and "supply cost"/"stock" figures come from lineitem facts instead;
# no comment columns — q16's complaints filter becomes a negative-
# balance filter). Shapes preserved: q2 correlated-min join-back,
# q9 multi-join profit rollup, q11 global-threshold HAVING,
# q16 filtered distinct-count, q20 nested semi-join chain.
# ---------------------------------------------------------------------------
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 adaptation: minimum-cost supplier per size-15 part in
    EUROPE. ``partsupp.ps_supplycost`` is absent; the offer price is
    the minimum observed ``l_extendedprice`` per (part, supplier) —
    raw stored doubles, so the min-equality join-back is exact.
    Shape: aggregate → correlated min → join back at the min →
    dimension joins → multi-key ORDER BY + LIMIT."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    eu = F.broadcast(
        nation.join(region.filter(F.col("r_name") == "EUROPE"),
                    nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey", "n_name"))
    offers = (li.groupBy("l_partkey", "l_suppkey")
              .agg(F.min("l_extendedprice").alias("offer_price")))
    eu_supp = (supp.join(eu, supp.s_nationkey == eu.n_nationkey)
               .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    eu_offers = offers.join(eu_supp,
                            offers.l_suppkey == eu_supp.s_suppkey)
    min_part = (eu_offers.groupBy("l_partkey")
                .agg(F.min("offer_price").alias("min_price")))
    target = F.broadcast(part.filter(F.col("p_size") == 15)
                         .select("p_partkey", "p_name"))
    return (eu_offers
            .join(min_part, ["l_partkey"])
            .filter(F.col("offer_price") == F.col("min_price"))
            .join(target, F.col("l_partkey") == F.col("p_partkey"))
            .select("s_acctbal", "s_name", "n_name", "p_partkey",
                    "p_name", F.col("min_price").alias("offer_price"))
            .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name",
                     "p_partkey")
            .limit(100))


ORACLE["q2_min_cost_supplier"] = """
WITH eu AS (SELECT n_nationkey, n_name FROM nation
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'),
offers AS (SELECT l_partkey, l_suppkey,
                  min(l_extendedprice) AS offer_price
           FROM lineitem GROUP BY 1, 2),
eu_offers AS (SELECT o.l_partkey, o.offer_price,
                     s.s_name, s.s_acctbal, eu.n_name
              FROM offers o
              JOIN supplier s ON o.l_suppkey = s.s_suppkey
              JOIN eu ON s.s_nationkey = eu.n_nationkey),
mp AS (SELECT l_partkey, min(offer_price) AS min_price
       FROM eu_offers GROUP BY 1)
SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_name,
       e.offer_price
FROM eu_offers e
JOIN mp ON e.l_partkey = mp.l_partkey AND e.offer_price = mp.min_price
JOIN part p ON e.l_partkey = p.p_partkey
WHERE p.p_size = 15
ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
LIMIT 100
"""


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 adaptation: profit per (supplier nation, order year) over
    parts named like '%red%'. ``ps_supplycost`` is absent; unit cost
    is ``p_retailprice`` — profit = revenue − retailprice·quantity,
    decimal-exact end to end."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    red = F.broadcast(part.filter(F.col("p_name").like("%red%"))
                      .select("p_partkey", "p_retailprice"))
    profit = (revenue_expr()
              - dmoney(F.col("p_retailprice")) * dmoney(F.col("l_quantity")))
    return (
        li.join(red, li.l_partkey == red.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(exact_sum(profit).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


ORACLE["q9_product_type_profit"] = f"""
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       CAST(round(sum({SQL_REV}
                      - CAST(p_retailprice AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))), 2)
            AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
ORDER BY 1, 2 DESC
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 adaptation: parts whose EUROPE-supplied revenue exceeds
    0.1% of all EUROPE-supplied revenue. ``partsupp`` stock value is
    absent; 'value' is lineitem revenue from EUROPE suppliers.
    Shape: grouped sum HAVING > (scalar-subquery global threshold) —
    the threshold is a 1-row broadcast, no second scan of the
    grouped data."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    eu = F.broadcast(
        nation.join(region.filter(F.col("r_name") == "EUROPE"),
                    nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey"))
    eu_supp = F.broadcast(supp.join(eu, supp.s_nationkey == eu.n_nationkey)
                          .select("s_suppkey"))
    eu_li = li.join(eu_supp, li.l_suppkey == eu_supp.s_suppkey)
    per_part = (eu_li.groupBy("l_partkey")
                .agg(F.sum(revenue_expr()).alias("_val")))
    total = per_part.agg(
        (F.sum("_val") * F.lit(0.001).cast("decimal(9,4)"))
        .alias("_threshold"))
    return (per_part.crossJoin(F.broadcast(total))
            .filter(F.col("_val") > F.col("_threshold"))
            .select(F.col("l_partkey").alias("p_partkey"),
                    F.round(F.col("_val").cast("decimal(38,6)"), 2)
                    .cast("double").alias("part_value"))
            .orderBy(F.col("part_value").desc(), "p_partkey"))


ORACLE["q11_important_stock"] = f"""
WITH eu_s AS (SELECT s_suppkey FROM supplier
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'EUROPE'),
pp AS (SELECT l_partkey, sum({SQL_REV}) AS val
       FROM lineitem JOIN eu_s ON l_suppkey = s_suppkey
       GROUP BY 1),
t AS (SELECT sum(val) * CAST(0.001 AS DECIMAL(9,4)) AS threshold FROM pp)
SELECT l_partkey AS p_partkey,
       CAST(round(val, 2) AS DOUBLE) AS part_value
FROM pp, t
WHERE val > threshold
ORDER BY part_value DESC, p_partkey
"""


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 adaptation: distinct supplier counts per (brand, type,
    size) for selected sizes, excluding one brand, the PROMO type,
    and suppliers with negative balances (stand-in for the original's
    complaints comment filter; no comment columns in this schema).
    The part↔supplier association comes from lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    sizes = [1, 9, 14, 19, 23, 36, 45, 49]
    target = F.broadcast(
        part.filter(F.col("p_size").isin(sizes)
                    & (F.col("p_brand") != "Brand#13")
                    & (F.col("p_type") != "PROMO"))
        .select("p_partkey", "p_brand", "p_type", "p_size"))
    ok_supp = F.broadcast(supp.filter(F.col("s_acctbal") >= 0)
                          .select("s_suppkey"))
    return (li.join(target, li.l_partkey == target.p_partkey)
            .join(ok_supp, li.l_suppkey == ok_supp.s_suppkey, "left_semi")
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type",
                     "p_size"))


ORACLE["q16_supplier_part_counts"] = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND p_brand <> 'Brand#13'
  AND p_type <> 'PROMO'
  AND l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0)
GROUP BY 1, 2, 3
ORDER BY 4 DESC, 1, 2, 3
"""


def q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 adaptation: EUROPE suppliers who shipped MORE THAN HALF of
    some 'small%' part's total 1996 volume. The original's
    availqty-vs-half-of-shipped threshold (partsupp) becomes
    per-supplier-share-of-part volume; the comparison is kept integer
    (2·supplier_qty > total_qty — quantities are integral, so no
    0.5· float compare). Shape: nested aggregate subqueries feeding a
    semi-join chain up to the supplier dimension."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    small = F.broadcast(part.filter(F.col("p_name").like("small%"))
                        .select("p_partkey"))
    li96 = (li.filter(F.year("l_shipdate") == 1996)
            .join(small, li.l_partkey == small.p_partkey)
            .select("l_partkey", "l_suppkey",
                    F.col("l_quantity").cast("long").alias("qty")))
    per_supp = (li96.groupBy("l_partkey", "l_suppkey")
                .agg(F.sum("qty").alias("s_qty")))
    per_part = (li96.groupBy("l_partkey")
                .agg(F.sum("qty").alias("t_qty")))
    dominant = (per_supp.join(per_part, ["l_partkey"])
                .filter(F.lit(2) * F.col("s_qty") > F.col("t_qty"))
                .select("l_suppkey").distinct())
    eu = F.broadcast(
        nation.join(region.filter(F.col("r_name") == "EUROPE"),
                    nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey"))
    return (supp.join(dominant, supp.s_suppkey == dominant.l_suppkey,
                      "left_semi")
            .join(eu, supp.s_nationkey == eu.n_nationkey, "left_semi")
            .select("s_name", "s_acctbal")
            .orderBy("s_name"))


ORACLE["q20_dominant_supplier"] = """
WITH li96 AS (SELECT l_partkey, l_suppkey, CAST(l_quantity AS BIGINT) AS qty
              FROM lineitem
              WHERE year(l_shipdate) = 1996
                AND l_partkey IN (SELECT p_partkey FROM part
                                  WHERE p_name LIKE 'small%')),
ps AS (SELECT l_partkey, l_suppkey, sum(qty) AS s_qty
       FROM li96 GROUP BY 1, 2),
pt AS (SELECT l_partkey, sum(qty) AS t_qty FROM li96 GROUP BY 1),
dom AS (SELECT DISTINCT ps.l_suppkey
        FROM ps JOIN pt ON ps.l_partkey = pt.l_partkey
        WHERE 2 * ps.s_qty > pt.t_qty)
SELECT s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM dom)
  AND s_nationkey IN (SELECT n_nationkey FROM nation
                      JOIN region ON n_regionkey = r_regionkey
                      WHERE r_name = 'EUROPE')
ORDER BY s_name
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q4_order_priority": q4_order_priority,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_type_profit": q9_product_type_profit,
    "q11_important_stock": q11_important_stock,
    "q12_late_priority_counts": q12_late_priority_counts,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q14_promo_effect": q14_promo_effect,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q20_dominant_supplier": q20_dominant_supplier,
    "q21_waiting_supplier": q21_waiting_supplier,
    "q22_idle_rich_customers": q22_idle_rich_customers,
}

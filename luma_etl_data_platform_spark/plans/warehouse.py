"""Warehouse transform layer: the joins/aggregations/windows that the
reference delegated to out-of-repo SQL Server stored procedures
(reference: utilities/helpers/run_stored_proc.py:55-63 invokes
``EXEC {subject_area}_proc``; the proc bodies live outside the repo —
SURVEY.md §2.3-2.5). Here they are first-class Spark plans.

Every query is written DataFrame-first so Catalyst owns the physical
strategy, with two scale-minded conventions:

1. **Broadcast the fixed-cardinality dims** (region, nation — constant
   size at any SF) and let AQE pick broadcast-vs-shuffle for the
   SF-scaled tables. At 100 TB the lineitem side must never be
   broadcast, and the join keys (l_orderkey, o_custkey) are the
   natural shuffle keys Catalyst will pick.
2. **Deterministic float output**: every floating aggregate is rounded
   (sums → 2dp, avgs → 4dp) and every top-k has a total order with a
   unique tiebreaker, so results hash-match a DuckDB oracle despite
   non-associative float addition across partitions.

Each function takes ``(spark, sf_dir)`` and returns a DataFrame; the
matching DuckDB oracle SQL lives in ``ORACLE`` keyed by the same name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..sources.tables import load_table
from ._exact import (
    SQL_CHARGE, SQL_REV, charge_expr, dmoney, drate, exact_sum, revenue_expr,
)

ORACLE: dict[str, str] = {}


# ---------------------------------------------------------------------------
# q1: pricing summary (TPC-H Q1 shape) — wide scan + 2-key hash agg.
# Scale: map-side partial aggregation collapses 100 TB to 4 groups before
# the shuffle; parquet reads only the 7 referenced columns and the
# shipdate predicate prunes row groups.
# ---------------------------------------------------------------------------
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # quantities are integer-valued: double sums of integers
            # are exact under any ordering — no decimal tax needed
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            exact_sum(dmoney(F.col("l_extendedprice"))).alias("sum_base_price"),
            exact_sum(revenue_expr()).alias("sum_disc_price"),
            exact_sum(charge_expr()).alias("sum_charge"),
            F.round(F.sum("l_quantity") / F.count(F.lit(1)), 4).alias("avg_qty"),
            F.round(F.sum(dmoney(F.col("l_extendedprice"))).cast("double")
                    / F.count(F.lit(1)), 4).alias("avg_price"),
            F.round(F.sum(drate(F.col("l_discount"))).cast("double")
                    / F.count(F.lit(1)), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE["q1_pricing_summary"] = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                             AS sum_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
       CAST(round(sum({SQL_REV}), 2) AS DOUBLE)                              AS sum_disc_price,
       CAST(round(sum({SQL_CHARGE}), 2) AS DOUBLE)                           AS sum_charge,
       round(sum(l_quantity) / count(*), 4)                                  AS avg_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_price,
       round(CAST(sum(CAST(l_discount AS DECIMAL(9,4))) AS DOUBLE) / count(*), 4)       AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q3: shipping priority (TPC-H Q3 shape) — 3-way join + agg + top-k.
# Scale: the customer filter cuts the build side before the join; the
# orders↔lineitem join shuffles on orderkey (both huge — sort-merge);
# top-10 via TakeOrdered, no global sort materialization.
# ---------------------------------------------------------------------------
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(exact_sum(revenue_expr()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


ORACLE["q3_shipping_priority"] = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(round(sum({SQL_REV}), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q5: local supplier volume (TPC-H Q5 shape) — 6-way join.
# Scale: region+nation are fixed-size → explicit broadcast; the
# c_nationkey = s_nationkey co-location predicate runs as a join filter.
# ---------------------------------------------------------------------------
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(exact_sum(revenue_expr()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


ORACLE["q5_local_supplier_volume"] = f"""
SELECT n_name, CAST(round(sum({SQL_REV}), 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------------------
# q6: forecast revenue (TPC-H Q6 shape) — pure scan-filter-agg.
# Scale: fully pushed to the parquet scan (PushedFilters on shipdate/
# discount/quantity); single scalar out, no shuffle at all beyond the
# final 1-row reduce.
# ---------------------------------------------------------------------------
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(exact_sum(dmoney(F.col("l_extendedprice"))
                       * drate(F.col("l_discount"))).alias("revenue"))
    )


ORACLE["q6_forecast_revenue"] = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(9,4))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# q10: returned items (TPC-H Q10 shape) — join + agg + top-20 customers.
# ---------------------------------------------------------------------------
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(exact_sum(revenue_expr()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


ORACLE["q10_returned_items"] = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(round(sum({SQL_REV}), 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# top3_orders_per_customer: ranking window (top-k per group).
# Scale: single shuffle on o_custkey; rank computed within partitions,
# no global sort. Skewed customers are bounded by order-count per
# customer, not data volume.
# ---------------------------------------------------------------------------
def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


ORACLE["top3_orders_per_customer"] = """
SELECT o_custkey, o_orderkey, o_totalprice, rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) WHERE rk <= 3
"""


# ---------------------------------------------------------------------------
# revenue_rollup: hierarchical aggregate (ROLLUP region → nation).
# The reference's warehouse procs aggregate per subject area; rollup
# gives the subtotal/grand-total shape in one pass (partial aggs merge
# per grouping set — one shuffle).
# ---------------------------------------------------------------------------
def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(exact_sum(dmoney(F.col("o_totalprice"))).alias("total_price"),
             F.count(F.lit(1)).alias("n_orders"))
    )


ORACLE["revenue_rollup"] = """
SELECT r_name, n_name,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price,
       count(*)                    AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


# ---------------------------------------------------------------------------
# order_priority_count: semi-join existence test (TPC-H Q4 shape,
# adapted: orders having at least one returned lineitem).
# Scale: left_semi join never widens rows and short-circuits per key.
# ---------------------------------------------------------------------------
def order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORACLE["order_priority_count"] = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# part_type_share: conditional aggregation (TPC-H Q14 shape) —
# promo revenue share by month.
# ---------------------------------------------------------------------------
def part_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = revenue_expr()
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(
        F.lit(0).cast("decimal(18,2)"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            F.round(F.sum(promo).cast("double")
                    / F.sum(rev).cast("double") * 100, 4).alias("promo_share"),
            exact_sum(rev).alias("total_revenue"),
        )
        .orderBy("ship_month")
    )


ORACLE["part_type_share"] = f"""
SELECT date_trunc('month', l_shipdate) AS ship_month,
       round(CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN {SQL_REV}
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum({SQL_REV}) AS DOUBLE) * 100, 4) AS promo_share,
       CAST(round(sum({SQL_REV}), 2) AS DOUBLE)         AS total_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# events_hourly: event-time tumbling aggregation over the events table
# (the batch mirror of the streaming windowed agg in streaming/).
# ---------------------------------------------------------------------------
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("hour", "event_type")
    )


ORACLE["events_hourly"] = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*)            AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_items": q10_returned_items,
    "top3_orders_per_customer": top3_orders_per_customer,
    "revenue_rollup": revenue_rollup,
    "order_priority_count": order_priority_count,
    "part_type_share": part_type_share,
    "events_hourly": events_hourly,
}

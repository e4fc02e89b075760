"""Queries exercised through the SQL front door (``spark.sql`` over
registered views — the S18 script-runner path) rather than the
DataFrame API: correlated scalar subqueries and the ranking-window
battery. Catalyst produces the same plans either way; these prove the
SQL surface end-to-end."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import register_views

ORACLE: dict[str, str] = {}


def _sql(spark: SparkSession, sf_dir: str, stmt: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders", "customer", "lineitem", "events"))
    return spark.sql(stmt)


# ---------------------------------------------------------------------------
# sql_order_share: correlated scalar subquery — each order as a share
# of its customer's (decimal-exact) lifetime spend.
# ---------------------------------------------------------------------------
_ORDER_SHARE = """
SELECT o_orderkey, o_custkey,
       round(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
             / (SELECT CAST(sum(CAST(i.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                FROM orders i WHERE i.o_custkey = o.o_custkey), 6) AS spend_share
FROM orders o
"""


def sql_order_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _ORDER_SHARE)


ORACLE["sql_order_share"] = _ORDER_SHARE


# ---------------------------------------------------------------------------
# sql_window_battery: first_value/last_value/nth_value/ntile/
# percent_rank/cume_dist over each customer's order history.
# ---------------------------------------------------------------------------
_WINDOW_BATTERY = """
SELECT o_custkey, o_orderkey,
       first_value(o_orderkey) OVER w                        AS first_ok,
       last_value(o_orderkey)  OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND UNBOUNDED FOLLOWING) AS last_ok,
       nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND UNBOUNDED FOLLOWING) AS second_ok,
       ntile(4) OVER w                                        AS quartile,
       round(percent_rank() OVER w, 6)                        AS pct_rank,
       round(cume_dist() OVER w, 6)                           AS cume
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def sql_window_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _WINDOW_BATTERY)


ORACLE["sql_window_battery"] = _WINDOW_BATTERY


# ---------------------------------------------------------------------------
# sql_exists_chains: correlated EXISTS + NOT EXISTS (Q21 shape) —
# suppliers that shipped on shared orders but never shipped late-year.
# ---------------------------------------------------------------------------
_EXISTS_CHAINS = """
SELECT s.l_suppkey AS suppkey, count(DISTINCT s.l_orderkey) AS shared_orders
FROM lineitem s
WHERE EXISTS (SELECT 1 FROM lineitem o
              WHERE o.l_orderkey = s.l_orderkey
                AND o.l_suppkey <> s.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_suppkey = s.l_suppkey
                    AND l2.l_shipdate >= TIMESTAMP '2001-06-01')
GROUP BY 1 ORDER BY 1
"""


def sql_exists_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _EXISTS_CHAINS)


ORACLE["sql_exists_chains"] = _EXISTS_CHAINS


# ---------------------------------------------------------------------------
# sql_grouping_sets: explicit GROUPING SETS lattice + grouping_id +
# bool_and/bool_or aggregates.
# ---------------------------------------------------------------------------
_GROUPING_SETS = """
SELECT c_mktsegment, o_orderpriority,
       grouping(c_mktsegment)    AS g_seg,
       grouping(o_orderpriority) AS g_pri,
       count(*) AS n_orders,
       bool_and(o_totalprice > 1000)   AS all_over_1k,
       bool_or(o_totalprice > 400000)  AS any_over_400k
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())
"""


def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _GROUPING_SETS)


ORACLE["sql_grouping_sets"] = _GROUPING_SETS


# ---------------------------------------------------------------------------
# sql_filter_aggregates: FILTER (WHERE ...) clause + try-division.
# ---------------------------------------------------------------------------
_FILTER_AGGS = """
SELECT c_mktsegment,
       count(*)                                            AS n_orders,
       count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
       count(*) FILTER (WHERE o_totalprice > 200000)        AS n_big,
       round(CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE)
             / count(*), 6)                                AS urgent_rate,
       CASE WHEN count(*) FILTER (WHERE o_totalprice > 200000) = 0 THEN NULL
            ELSE CAST(count(*) AS DOUBLE)
                 / count(*) FILTER (WHERE o_totalprice > 200000) END AS orders_per_big
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1 ORDER BY 1
"""


def sql_filter_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _FILTER_AGGS)


# Spark's FILTER clause and DuckDB's are the same syntax; the final
# division is rounded/CASE-guarded identically. One rounding applied
# in Spark output for float-column stability:
ORACLE["sql_filter_aggregates"] = _FILTER_AGGS


# ---------------------------------------------------------------------------
# sql_bag_setops: EXCEPT ALL / INTERSECT ALL (multiset semantics).
# ---------------------------------------------------------------------------
_BAG_OPS = """
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT ALL
SELECT user_id FROM events WHERE event_type = 'view'
EXCEPT ALL
SELECT user_id FROM events WHERE event_type = 'error'
"""


def sql_bag_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _BAG_OPS)


ORACLE["sql_bag_setops"] = _BAG_OPS


# ---------------------------------------------------------------------------
# sql_null_semantics: the three-valued-logic battery — NOT IN against
# a set containing NULL matches NOTHING (the classic production trap),
# NOT EXISTS anti-joins correctly, and IS NOT DISTINCT FROM adds the
# null-safe match. Both key sets are salted with NULLs via NULLIF.
# ---------------------------------------------------------------------------
_NULL_SEMANTICS = """
WITH probe AS (SELECT o_orderkey, NULLIF(o_custkey % 50, 7) AS k FROM orders),
ref AS (SELECT DISTINCT NULLIF(c_custkey % 50, 11) AS k FROM customer)
SELECT
 (SELECT count(*) FROM probe) AS n_probe,
 (SELECT count(k) FROM probe) AS n_probe_nonnull,
 (SELECT count(*) FROM probe WHERE k IN (SELECT k FROM ref)) AS n_in,
 (SELECT count(*) FROM probe WHERE k NOT IN (SELECT k FROM ref)) AS n_not_in,
 (SELECT count(*) FROM probe p
  WHERE EXISTS (SELECT 1 FROM ref r WHERE r.k = p.k)) AS n_exists,
 (SELECT count(*) FROM probe p
  WHERE NOT EXISTS (SELECT 1 FROM ref r WHERE r.k = p.k)) AS n_not_exists,
 (SELECT count(*) FROM probe p
  WHERE EXISTS (SELECT 1 FROM ref r
                WHERE r.k IS NOT DISTINCT FROM p.k)) AS n_nullsafe_exists
"""


def sql_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _NULL_SEMANTICS)


ORACLE["sql_null_semantics"] = _NULL_SEMANTICS


QUERIES = {
    "sql_null_semantics": sql_null_semantics,
    "sql_order_share": sql_order_share,
    "sql_window_battery": sql_window_battery,
    "sql_exists_chains": sql_exists_chains,
    "sql_grouping_sets": sql_grouping_sets,
    "sql_filter_aggregates": sql_filter_aggregates,
    "sql_bag_setops": sql_bag_setops,
}

"""Analytic-window / temporal query family: as-of join,
sessionization, cumulative windows, lag/lead gaps, pivot, exact
percentiles, distinct counts. These fill the reference's "(absent —
delegated to warehouse SQL)" rows for §2.5 window functions and the
streaming-adjacent batch shapes (SURVEY.md §2.5, §2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..operators.asof import asof_join
from ..sources.tables import load_table
from ._exact import dmoney, exact_sum

ORACLE: dict[str, str] = {}


# ---------------------------------------------------------------------------
# asof_events_orders: each event matched to the user's latest order at
# or before the event time. Spark side: union+window asof operator
# (one shuffle); oracle states the same semantics via join + window.
# ---------------------------------------------------------------------------
def asof_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate")
    return asof_join(
        events, orders.withColumnRenamed("o_custkey", "user_id"),
        on="user_id", left_time="ts", right_time="o_orderdate",
        right_cols=["o_orderkey"], tiebreak="o_orderkey",
    ).select("event_id", "user_id", "ts", "o_orderkey", "o_orderdate")


ORACLE["asof_events_orders"] = """
SELECT event_id, user_id, ts, o_orderkey, o_orderdate FROM (
  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e
  LEFT JOIN orders o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# sessionize_events: gap-based sessions (30 min) per user — the batch
# mirror of streaming session_window. lag → gap flag → running sum =
# session index; one shuffle on user_id.
# ---------------------------------------------------------------------------
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    by_user = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(by_user)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)))
    sessioned = flagged.withColumn(
        "session_idx", F.sum("new_session").over(
            by_user.rowsBetween(W.unboundedPreceding, 0)))
    return (
        sessioned.groupBy("user_id", "session_idx")
        .agg(F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             F.count(F.lit(1)).alias("n_events"),
             exact_sum(dmoney(F.col("value"))).alias("session_value"))
    )


ORACLE["sessionize_events"] = """
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('second', lag(ts) OVER w, ts) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessioned AS (
  SELECT user_id, ts, value,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM flagged
)
SELECT user_id, session_idx,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS session_value
FROM sessioned GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# cumulative_revenue: running total per customer over order history —
# frame-spec window (ROWS UNBOUNDED PRECEDING).
# ---------------------------------------------------------------------------
def cumulative_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(W.unboundedPreceding, 0))
    return orders.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        # decimal-exact running sum: identical under any partitioning
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w)
                .cast("decimal(38,6)"), 2).cast("double").alias("cum_spend"),
        F.row_number().over(
            W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        ).alias("order_seq"),
    )


ORACLE["cumulative_revenue"] = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey
                        ROWS UNBOUNDED PRECEDING), 2) AS DOUBLE) AS cum_spend,
       row_number() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey) AS order_seq
FROM orders
"""


# ---------------------------------------------------------------------------
# order_gaps: lag/lead — days since a customer's previous order.
# ---------------------------------------------------------------------------
def order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return orders.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        F.datediff(F.col("o_orderdate"), prev).alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


ORACLE["order_gaps"] = """
SELECT o_custkey, o_orderkey, o_orderdate,
       date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS days_since_prev,
       lead(o_orderkey) OVER w AS next_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


# ---------------------------------------------------------------------------
# event_type_pivot: daily event counts pivoted to one column per type
# (explicit value list on both sides).
# ---------------------------------------------------------------------------
_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(_EVENT_TYPES))
        .orderBy("day")
    )


ORACLE["event_type_pivot"] = """
SELECT date_trunc('day', ts) AS day,
       count(*) FILTER (event_type = 'click')    AS click,
       count(*) FILTER (event_type = 'error')    AS error,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'signup')   AS signup,
       count(*) FILTER (event_type = 'view')     AS view
FROM events GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# event_value_percentiles: exact interpolated percentiles per type.
# ---------------------------------------------------------------------------
def event_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
            F.round(F.min("value"), 6).alias("vmin"),
            F.round(F.max("value"), 6).alias("vmax"),
        )
        .orderBy("event_type")
    )


ORACLE["event_value_percentiles"] = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6)  AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(min(value), 6) AS vmin,
       round(max(value), 6) AS vmax
FROM events GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# distinct_users: exact distinct + total per event type.
# ---------------------------------------------------------------------------
def distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"),
             F.count(F.lit(1)).alias("n_events"))
        .orderBy("event_type")
    )


ORACLE["distinct_users"] = """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# event_type_unpivot: melt the pivoted daily counts back to long form
# (pivot ∘ unpivot surface; Spark `unpivot` ↔ SQL UNPIVOT).
# ---------------------------------------------------------------------------
def event_type_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = event_type_pivot(spark, sf_dir)
    return (
        wide.unpivot("day", list(_EVENT_TYPES), "event_type", "n_events")
        .filter(F.col("n_events") > 0)
        .orderBy("day", "event_type")
    )


ORACLE["event_type_unpivot"] = """
SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n_events
FROM events GROUP BY 1, 2 HAVING count(*) > 0 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# range_join_user_bursts: pairs of events from the same user within
# 10 minutes of each other (banded range join — equi-join on coarse
# bins + exact filter, not a nested-loop theta join).
# ---------------------------------------------------------------------------
def range_join_user_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rangejoin import banded_range_join
    ev = load_table(spark, sf_dir, "events")
    a = ev.select("user_id", F.col("event_id").alias("eid_a"), F.col("ts").alias("ts_a"))
    b = ev.select("user_id", F.col("event_id").alias("eid_b"), F.col("ts").alias("ts_b"))
    return (
        banded_range_join(a, b, "user_id", "ts_a", "ts_b", window_seconds=600)
        .filter(F.col("eid_a") < F.col("eid_b"))
        .select("user_id", "eid_a", "eid_b",
                (F.col("ts_b").cast("long") - F.col("ts_a").cast("long")).alias("gap_s"))
    )


ORACLE["range_join_user_bursts"] = """
SELECT a.user_id, a.event_id AS eid_a, b.event_id AS eid_b,
       date_diff('second', a.ts, b.ts) AS gap_s
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_id < b.event_id
 AND abs(date_diff('second', a.ts, b.ts)) <= 600
"""


# ---------------------------------------------------------------------------
# moving_avg_daily_revenue: 7-row sliding frame over daily order
# totals (ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) — bounded-frame
# spec beyond the UNBOUNDED runs. Daily totals are decimal-exact; the
# 7-term window sum runs over identical doubles in identical order on
# both engines.
# ---------------------------------------------------------------------------
def moving_avg_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
             .cast("double").alias("day_total"),
             F.count(F.lit(1)).alias("n_orders"))
    )
    w = W.orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "day", F.round(F.col("day_total"), 2).alias("day_total"), "n_orders",
        F.round(F.avg("day_total").over(w), 4).alias("ma7"),
        F.count(F.lit(1)).over(w).alias("window_n"),
    )


ORACLE["moving_avg_daily_revenue"] = """
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS day_total,
         count(*) AS n_orders
  FROM orders GROUP BY 1)
SELECT day, round(day_total, 2) AS day_total, n_orders,
       round(avg(day_total) OVER w, 4) AS ma7,
       count(*) OVER w AS window_n
FROM daily
WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# latest_snapshot_per_user: last-write-wins dedup of an event feed —
# the CDC/incremental-reload pattern (keep the newest record per key;
# the reference's truncate-and-reload becomes a rank-1 filter).
# ---------------------------------------------------------------------------
def latest_snapshot_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_id").alias("latest_event_id"),
                F.col("ts").alias("latest_ts"), "event_type",
                F.round(F.col("value"), 6).alias("latest_value"))
    )


ORACLE["latest_snapshot_per_user"] = """
SELECT user_id, event_id AS latest_event_id, ts AS latest_ts,
       event_type, round(value, 6) AS latest_value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# resample_ffill_user_values: hourly per-user grid with forward fill
# (operators/timeseries.py) — the time-bucket/gap-fill pattern.
# ---------------------------------------------------------------------------
def resample_ffill_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import resample_ffill
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 20)
    out = resample_ffill(ev, "user_id", "ts", "value",
                         bucket="hour", tiebreak_col="event_id")
    return out.select("user_id", "bucket",
                      F.round(F.col("value_ffill"), 6).alias("value_ffill"),
                      "observed")


ORACLE["resample_ffill_user_values"] = """
WITH hourly AS (
  SELECT user_id, bucket, value FROM (
    SELECT user_id, date_trunc('hour', ts) AS bucket, value,
           row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE user_id <= 20) WHERE rn = 1),
bounds AS (SELECT user_id, min(bucket) AS b0, max(bucket) AS b1 FROM hourly GROUP BY 1),
grid AS (SELECT user_id, unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
         FROM bounds),
joined AS (SELECT g.user_id, g.bucket, h.value
           FROM grid g LEFT JOIN hourly h
             ON g.user_id = h.user_id AND g.bucket = h.bucket)
SELECT user_id, bucket,
       round(last_value(value IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY bucket
                   ROWS UNBOUNDED PRECEDING), 6) AS value_ffill,
       value IS NOT NULL AS observed
FROM joined
"""


# ---------------------------------------------------------------------------
# funnel_click_to_purchase: conversion funnel — clicks followed by a
# purchase from the same user within 30 minutes (forward-window
# existence via the banded range join, no nested loop).
# ---------------------------------------------------------------------------
def funnel_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rangejoin import banded_range_join
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("ts_c"))
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("ts_p"))
    joined = banded_range_join(clicks, buys, "user_id", "ts_c", "ts_p",
                               window_seconds=1800)
    converted = (
        joined.filter((F.col("ts_p").cast("long") > F.col("ts_c").cast("long"))
                      & (F.col("ts_p").cast("long") - F.col("ts_c").cast("long") <= 1800))
        .select("user_id", "click_id").distinct()
    )
    per_user_clicks = clicks.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_clicks"))
    per_user_conv = converted.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_converted"))
    return (
        per_user_clicks.join(per_user_conv, "user_id", "left")
        .select("user_id", "n_clicks",
                F.coalesce(F.col("n_converted"), F.lit(0)).alias("n_converted"))
        .orderBy("user_id")
    )


ORACLE["funnel_click_to_purchase"] = """
WITH clicks AS (SELECT user_id, event_id AS click_id, ts FROM events
                WHERE event_type = 'click'),
conv AS (SELECT DISTINCT c.user_id, c.click_id
         FROM clicks c JOIN events p
           ON p.user_id = c.user_id AND p.event_type = 'purchase'
          AND date_diff('second', c.ts, p.ts) > 0
          AND date_diff('second', c.ts, p.ts) <= 1800)
SELECT c.user_id, count(*) AS n_clicks,
       coalesce(any_value(x.n), 0) AS n_converted
FROM clicks c
LEFT JOIN (SELECT user_id, count(*) AS n FROM conv GROUP BY 1) x
  ON c.user_id = x.user_id
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# ratio_to_report_nations: percent-of-total via an unpartitioned
# window over the AGGREGATED rows (25 nations — the window input is
# group-cardinality sized, not data-sized), plus dense_rank.
# ---------------------------------------------------------------------------
def ratio_to_report_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_nation = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_d"))
    )
    total = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    w_all = W.orderBy("n_name").rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        per_nation.select(
            "n_name",
            F.round(F.col("rev_d").cast("decimal(38,6)"), 2).cast("double").alias("revenue"),
            F.round(F.col("rev_d").cast("double")
                    / F.sum(F.col("rev_d")).over(w_all).cast("double"), 6).alias("share"),
            F.dense_rank().over(W.orderBy(F.col("rev_d").desc())).alias("rev_rank"),
        )
        .orderBy("n_name")
    )


ORACLE["ratio_to_report_nations"] = """
WITH per_nation AS (
  SELECT n_name, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_d
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY 1)
SELECT n_name,
       CAST(round(rev_d, 2) AS DOUBLE) AS revenue,
       round(CAST(rev_d AS DOUBLE) / CAST(sum(rev_d) OVER () AS DOUBLE), 6) AS share,
       dense_rank() OVER (ORDER BY rev_d DESC) AS rev_rank
FROM per_nation ORDER BY 1
"""


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences: for each (prev_type, next_type) the transition count
    and row-normalized probability. lead() over the unique (ts,
    event_id) order; one shuffle on user_id, then a tiny (types²)
    aggregate — the path-analysis primitive behind next-action
    prediction and funnel diagnostics."""
    ev = load_table(spark, sf_dir, "events")
    by_user = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (ev.select(F.col("event_type").alias("prev_type"),
                       F.lead("event_type").over(by_user).alias("next_type"))
             .filter(F.col("next_type").isNotNull()))
    counts = (pairs.groupBy("prev_type", "next_type")
              .agg(F.count(F.lit(1)).alias("n_transitions")))
    totals = W.partitionBy("prev_type")
    return (counts
            .withColumn("prob",
                        F.round(F.col("n_transitions")
                                / F.sum("n_transitions").over(totals), 6))
            .orderBy("prev_type", "next_type"))


ORACLE["event_transition_matrix"] = """
WITH pairs AS (
  SELECT event_type AS prev_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events),
counts AS (SELECT prev_type, next_type, count(*) AS n_transitions
           FROM pairs WHERE next_type IS NOT NULL GROUP BY 1, 2)
SELECT prev_type, next_type, n_transitions,
       round(CAST(n_transitions AS DOUBLE)
             / sum(n_transitions) OVER (PARTITION BY prev_type), 6) AS prob
FROM counts ORDER BY 1, 2
"""


QUERIES = {
    "event_transition_matrix": event_transition_matrix,
    "asof_events_orders": asof_events_orders,
    "event_type_unpivot": event_type_unpivot,
    "range_join_user_bursts": range_join_user_bursts,
    "moving_avg_daily_revenue": moving_avg_daily_revenue,
    "resample_ffill_user_values": resample_ffill_user_values,
    "latest_snapshot_per_user": latest_snapshot_per_user,
    "funnel_click_to_purchase": funnel_click_to_purchase,
    "ratio_to_report_nations": ratio_to_report_nations,
    "sessionize_events": sessionize_events,
    "cumulative_revenue": cumulative_revenue,
    "order_gaps": order_gaps,
    "event_type_pivot": event_type_pivot,
    "event_value_percentiles": event_value_percentiles,
    "distinct_users": distinct_users,
}

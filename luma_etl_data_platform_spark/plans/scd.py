"""Slowly-changing-dimension (Type 2) maintenance.

The reference's warehouse stored procedures owned history tracking
(staging → warehouse MERGE per subject area); this is the in-repo
Spark restatement: ``scd2_apply`` folds a source snapshot into a
history table of (business key, attributes, valid_from, valid_to,
is_current):

- new keys            → insert as current;
- changed attributes  → close the current row (valid_to = batch ts),
                        insert the new version as current;
- unchanged keys      → untouched;
- keys absent from the source → untouched (snapshot is a delta, not a
  full mirror; pass ``close_missing=True`` for full-mirror semantics).

Format-free (parquet, staged write + rename swap via
transform.replace_parquet_staged — on Delta this becomes two MERGEs).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OPEN_TS = "9999-12-31 00:00:00"


def scd2_merge(cur: DataFrame, hist: DataFrame | None, src: DataFrame,
               key: str, attrs: list[str], batch_ts: dt.datetime | str,
               close_missing: bool = False) -> DataFrame:
    """Pure-DataFrame SCD2 fold: given the current slice ``cur`` (rows
    with valid_from/valid_to/is_current), the closed history ``hist``
    (or None), and a source snapshot ``src`` (key + attrs), return the
    new full history table. One full-outer join on the business key —
    the single shuffle — then three filtered projections unioned with
    the untouched history; no writes, so the merge semantics are
    testable (and oracle-checkable) independently of the sink."""
    src = src.select(key, *attrs).dropDuplicates([key])
    ts = F.lit(batch_ts).cast("timestamp")
    open_ts = F.lit(OPEN_TS).cast("timestamp")

    changed_cond = None
    for a in attrs:
        ne = ~(F.col(f"cur.{a}").eqNullSafe(F.col(f"src.{a}")))
        changed_cond = ne if changed_cond is None else (changed_cond | ne)

    # presence flags via marker columns (attribute nullability safe)
    joined = (cur.alias("cur").withColumn("_in_cur", F.lit(True))
              .join(src.alias("src").withColumn("_in_src", F.lit(True)),
                    key, "full_outer"))
    is_new = F.col("_in_cur").isNull()
    is_changed = F.col("_in_cur").isNotNull() & F.col("_in_src").isNotNull() & changed_cond
    is_gone = F.col("_in_src").isNull()

    closed = joined.filter(is_changed | (F.lit(close_missing) & is_gone)).select(
        key, *[F.col(f"cur.{a}").alias(a) for a in attrs],
        F.col("cur.valid_from").alias("valid_from"),
        ts.alias("valid_to"),
        F.lit(False).alias("is_current"))
    kept = joined.filter(~is_new & ~is_changed
                         & ~(F.lit(close_missing) & is_gone)).select(
        key, *[F.col(f"cur.{a}").alias(a) for a in attrs],
        F.col("cur.valid_from").alias("valid_from"),
        F.col("cur.valid_to").alias("valid_to"),
        F.lit(True).alias("is_current"))
    inserted = joined.filter(is_new | is_changed).select(
        key, *[F.col(f"src.{a}").alias(a) for a in attrs],
        ts.alias("valid_from"), open_ts.alias("valid_to"),
        F.lit(True).alias("is_current"))

    out = closed.unionByName(kept).unionByName(inserted)
    if hist is not None:
        out = hist.select(key, *attrs, "valid_from", "valid_to",
                          "is_current").unionByName(out)
    return out


def scd2_apply(spark: SparkSession, target_path: str, source: DataFrame,
               key: str, attrs: list[str], batch_ts: dt.datetime,
               close_missing: bool = False) -> None:
    try:
        tgt = spark.read.parquet(target_path)
        exists = True
    except Exception:
        exists = False

    if not exists:
        fresh = source.select(key, *attrs).dropDuplicates([key]).select(
            key, *attrs,
            F.lit(batch_ts).cast("timestamp").alias("valid_from"),
            F.lit(OPEN_TS).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"))
        fresh.write.mode("overwrite").parquet(target_path)
        return

    out = scd2_merge(tgt.filter(F.col("is_current")),
                     tgt.filter(~F.col("is_current")),
                     source, key, attrs, batch_ts, close_missing)
    # staged write + rename swap: the live table is never cleared
    # before its replacement is durably written (see transform.py).
    from .transform import replace_parquet_staged
    replace_parquet_staged(spark, target_path, out)


# ---------------------------------------------------------------------------
# scd2_customer_history: the merge core under the oracle gate. A
# deterministic scenario built from the customer table — dim = keys
# with c_custkey % 3 <> 0 (current as of 2024-01-01), source = ALL
# customers with c_acctbal bumped for keys % 7 == 0 — exercises all
# three row fates in one pass: new keys inserted, changed keys closed
# + re-inserted, unchanged keys kept. Timestamps are emitted as
# strings (the open-ended 9999-12-31 sentinel overflows pandas'
# datetime64[ns] in both engines' result transfer).
# ---------------------------------------------------------------------------
_DIM_FROM = "2024-01-01 00:00:00"
_BATCH_TS = "2024-06-01 00:00:00"


def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table
    cust = load_table(spark, sf_dir, "customer")
    cur = (cust.filter(F.col("c_custkey") % 3 != 0)
           .select("c_custkey", "c_name", "c_acctbal",
                   F.lit(_DIM_FROM).cast("timestamp").alias("valid_from"),
                   F.lit(OPEN_TS).cast("timestamp").alias("valid_to"),
                   F.lit(True).alias("is_current")))
    src = cust.select(
        "c_custkey", "c_name",
        F.when(F.col("c_custkey") % 7 == 0,
               F.round(F.col("c_acctbal") + F.lit(100.0), 2))
        .otherwise(F.col("c_acctbal")).alias("c_acctbal"))
    out = scd2_merge(cur, None, src, "c_custkey", ["c_name", "c_acctbal"],
                     _BATCH_TS)
    return out.select(
        "c_custkey", "c_name", "c_acctbal",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        "is_current")


ORACLE: dict[str, str] = {}
ORACLE["scd2_customer_history"] = """
WITH dim AS (SELECT c_custkey, c_name, c_acctbal,
                    TIMESTAMP '2024-01-01 00:00:00' AS valid_from
             FROM customer WHERE c_custkey % 3 <> 0),
src AS (SELECT c_custkey, c_name,
               CASE WHEN c_custkey % 7 = 0 THEN round(c_acctbal + 100.0, 2)
                    ELSE c_acctbal END AS c_acctbal
        FROM customer),
j AS (SELECT d.c_custkey AS dk, s.c_custkey AS sk,
             d.c_name AS dn, d.c_acctbal AS db, d.valid_from,
             s.c_name AS sn, s.c_acctbal AS sb
      FROM dim d FULL OUTER JOIN src s ON d.c_custkey = s.c_custkey),
closed AS (SELECT dk AS c_custkey, dn AS c_name, db AS c_acctbal,
                  valid_from, TIMESTAMP '2024-06-01 00:00:00' AS valid_to,
                  FALSE AS is_current
           FROM j WHERE dk IS NOT NULL AND sk IS NOT NULL
             AND (dn IS DISTINCT FROM sn OR db IS DISTINCT FROM sb)),
kept AS (SELECT dk AS c_custkey, dn AS c_name, db AS c_acctbal,
                valid_from, TIMESTAMP '9999-12-31 00:00:00' AS valid_to,
                TRUE AS is_current
         FROM j WHERE dk IS NOT NULL AND sk IS NOT NULL
           AND NOT (dn IS DISTINCT FROM sn OR db IS DISTINCT FROM sb)),
ins AS (SELECT sk AS c_custkey, sn AS c_name, sb AS c_acctbal,
               TIMESTAMP '2024-06-01 00:00:00' AS valid_from,
               TIMESTAMP '9999-12-31 00:00:00' AS valid_to,
               TRUE AS is_current
        FROM j WHERE dk IS NULL
          OR (sk IS NOT NULL AND (dn IS DISTINCT FROM sn
                                  OR db IS DISTINCT FROM sb)))
SELECT c_custkey, c_name, c_acctbal,
       strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(valid_to, '%Y-%m-%d %H:%M:%S') AS valid_to,
       is_current
FROM (SELECT * FROM closed UNION ALL SELECT * FROM kept
      UNION ALL SELECT * FROM ins)
"""

# ---------------------------------------------------------------------------
# cdc_orders_state: Debezium-style op-log apply. The log is derived
# deterministically from orders — seq 1 inserts every order, seq 2
# updates keys % 7 == 0 (price + 10), seq 3 deletes keys % 13 == 0 —
# so both engines construct the identical stream and the final state
# must match row-for-row.
# ---------------------------------------------------------------------------
def cdc_orders_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cdc import apply_cdc
    from ..sources.tables import load_table
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    ins = o.select("*", F.lit("I").alias("op"), F.lit(1).alias("seq"))
    upd = (o.filter(F.col("o_orderkey") % 7 == 0)
           .select("o_orderkey", "o_custkey",
                   F.round(F.col("o_totalprice") + 10.0, 2)
                   .alias("o_totalprice"),
                   F.lit("X").alias("o_orderstatus"),
                   F.lit("U").alias("op"), F.lit(2).alias("seq")))
    dels = (o.filter(F.col("o_orderkey") % 13 == 0)
            .select("o_orderkey", "o_custkey", "o_totalprice",
                    "o_orderstatus",
                    F.lit("D").alias("op"), F.lit(3).alias("seq")))
    log = ins.unionByName(upd).unionByName(dels)
    return apply_cdc(log, ["o_orderkey"], "seq")


ORACLE["cdc_orders_state"] = """
WITH log AS (
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus,
         'I' AS op, 1 AS seq FROM orders
  UNION ALL
  SELECT o_orderkey, o_custkey, round(o_totalprice + 10.0, 2), 'X',
         'U', 2 FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus,
         'D', 3 FROM orders WHERE o_orderkey % 13 = 0),
ranked AS (
  SELECT *, row_number() OVER (
             PARTITION BY o_orderkey
             ORDER BY seq DESC,
                      CASE op WHEN 'D' THEN 2 WHEN 'U' THEN 1
                              ELSE 0 END DESC) AS rn
  FROM log)
SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus, seq
FROM ranked WHERE rn = 1 AND op <> 'D'
"""


# ---------------------------------------------------------------------------
# scd2_point_in_time_join: the consumption side of SCD2 — join facts
# to the dimension version that was ACTIVE at fact time (temporal /
# AS OF join). History derived with scd2_merge mid-way through the
# event window (balances bump for c_custkey % 7 == 0 at 2024-01-15),
# so events genuinely split across versions. Plan: the history is
# dimension-sized → broadcast; the range predicate (ts ∈
# [valid_from, valid_to)) runs as a broadcast join with no shuffle of
# the fact side — the right 100-TB shape for fact-to-versioned-dim
# lookups. Money totals in exact DECIMAL.
# ---------------------------------------------------------------------------
_PIT_FROM = "2024-01-01 00:00:00"
_PIT_TS = "2024-01-15 00:00:00"


def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table
    cust = load_table(spark, sf_dir, "customer")
    cur = cust.select(
        "c_custkey", "c_name", "c_acctbal",
        F.lit(_PIT_FROM).cast("timestamp").alias("valid_from"),
        F.lit(OPEN_TS).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"))
    src = cust.select(
        "c_custkey", "c_name",
        F.when(F.col("c_custkey") % 7 == 0,
               F.round(F.col("c_acctbal") + F.lit(100.0), 2))
        .otherwise(F.col("c_acctbal")).alias("c_acctbal"))
    hist = scd2_merge(cur, None, src, "c_custkey", ["c_name", "c_acctbal"],
                      _PIT_TS)
    ev = load_table(spark, sf_dir, "events")
    j = ev.join(
        F.broadcast(hist),
        (ev["user_id"] == hist["c_custkey"])
        & (ev["ts"] >= hist["valid_from"]) & (ev["ts"] < hist["valid_to"]))
    return (j.groupBy(F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss")
                      .alias("version_from"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.countDistinct("user_id").alias("n_users"),
                 F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                         .cast("decimal(38,6)"), 2).cast("double")
                 .alias("balance_total"))
            .orderBy("version_from"))


ORACLE["scd2_point_in_time_join"] = """
WITH src AS (SELECT c_custkey, c_name,
                    CASE WHEN c_custkey % 7 = 0
                         THEN round(c_acctbal + 100.0, 2)
                         ELSE c_acctbal END AS c_acctbal
             FROM customer),
-- history: unchanged keys keep one open row from 2024-01-01; changed
-- keys (%7=0) get a closed row + a new open row from 2024-01-15
hist AS (
  SELECT c_custkey, c_acctbal,
         TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
         CASE WHEN c_custkey % 7 = 0
              THEN TIMESTAMP '2024-01-15 00:00:00'
              ELSE TIMESTAMP '9999-12-31 00:00:00' END AS valid_to
  FROM customer
  UNION ALL
  SELECT c_custkey, c_acctbal,
         TIMESTAMP '2024-01-15 00:00:00' AS valid_from,
         TIMESTAMP '9999-12-31 00:00:00' AS valid_to
  FROM src WHERE c_custkey % 7 = 0)
SELECT strftime(h.valid_from, '%Y-%m-%d %H:%M:%S') AS version_from,
       count(*) AS n_events,
       count(DISTINCT e.user_id) AS n_users,
       CAST(round(CAST(sum(CAST(h.c_acctbal AS DECIMAL(18,2)))
                       AS DECIMAL(38,6)), 2) AS DOUBLE) AS balance_total
FROM events e JOIN hist h
  ON e.user_id = h.c_custkey
 AND e.ts >= h.valid_from AND e.ts < h.valid_to
GROUP BY 1 ORDER BY 1
"""

QUERIES = {"scd2_customer_history": scd2_customer_history,
           "cdc_orders_state": cdc_orders_state,
           "scd2_point_in_time_join": scd2_point_in_time_join}

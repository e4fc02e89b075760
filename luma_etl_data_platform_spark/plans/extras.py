"""Additional oracle-verified query families: CUBE grouping sets,
JSON extraction (the reference encodes/decodes JSON payload docs —
utilities/utilities.py:440-505), statistical aggregates, scalar
string-function battery, correlation, and the multimodal plumbing
queries (mapInPandas decode over binary columns with a pure-SQL
oracle thanks to digest-derived fake dims)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..operators import multimodal as MM
from ..sources.tables import load_table

ORACLE: dict[str, str] = {}


# ---------------------------------------------------------------------------
# revenue_cube: full grouping-set lattice over (region, orderpriority).
# ---------------------------------------------------------------------------
def revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .cube("r_name", "o_orderpriority")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_price"),
             F.count(F.lit(1)).alias("n_orders"))
    )


ORACLE["revenue_cube"] = """
SELECT r_name, o_orderpriority,
       round(sum(o_totalprice), 2) AS total_price,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY CUBE (r_name, o_orderpriority)
"""


# ---------------------------------------------------------------------------
# events_json_extract: decode the JSON props payload (F8 analog).
# ---------------------------------------------------------------------------
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(F.sum(k).alias("sum_k"),
             F.count(F.when(k.isNull(), 1)).alias("n_null_k"),
             F.max(k).alias("max_k"))
        .orderBy("event_type")
    )


ORACLE["events_json_extract"] = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 1 END) AS n_null_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# supplier_acct_stats: stddev/variance family.
# ---------------------------------------------------------------------------
def supplier_acct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance family from exact decimal moments: Sx and Sxx are
    decimal sums (partition-order independent), converted to double,
    then the textbook formulas run in deterministic double arithmetic
    — identical on any engine, unlike builtin stddev whose streaming
    merge order varies with partitioning."""
    cust = load_table(spark, sf_dir, "customer")
    x = F.col("c_acctbal").cast("decimal(18,2)")
    base = (
        cust.groupBy("c_nationkey")
        .agg(F.sum(x).cast("double").alias("sx"),
             F.sum(x * x).cast("double").alias("sxx"),
             F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
    )
    n = F.col("n")
    var_samp = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - 1)
    var_pop = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / n
    # symmetric 6-dp emission: round(x*1e6)/1e6 with the SAME explicit
    # ops in the oracle — round(x, 6) of these rational quotients
    # (varpop's true value has denominator n^2*10^4 and DOES hit 6-dp
    # half-ways) is engine-divergent at the half-way (Spark rounds the
    # double's exact decimal expansion, DuckDB the scaled product; the
    # r9 sf0.1-tier bug class). With both sides scaling first, both
    # engines round the identical double identically.
    def _r6(x):
        return F.round(x * F.lit(1_000_000.0)) / F.lit(1_000_000.0)

    return base.select(
        "c_nationkey",
        _r6(F.sqrt(var_samp)).alias("acct_stddev"),
        _r6(var_pop).alias("acct_varpop"),
        _r6(F.col("sx") / n).alias("acct_avg"),
        "n",
    ).orderBy("c_nationkey")


ORACLE["supplier_acct_stats"] = """
WITH m AS (
  SELECT c_nationkey,
         CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))
                  * CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
         count(*) AS n
  FROM customer GROUP BY 1 HAVING count(*) >= 2)
SELECT c_nationkey,
       round(sqrt((sxx - sx * sx / n) / (n - 1)) * 1000000.0)
         / 1000000.0 AS acct_stddev,
       round((sxx - sx * sx / n) / n * 1000000.0) / 1000000.0
         AS acct_varpop,
       round(sx / n * 1000000.0) / 1000000.0 AS acct_avg,
       n
FROM m ORDER BY 1
"""


# ---------------------------------------------------------------------------
# top_user_by_value: argmax-per-group (deterministic via window).
# ---------------------------------------------------------------------------
def top_user_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sums = (ev.groupBy("event_type", "user_id")
            .agg(F.round(F.sum("value"), 2).alias("total_value")))
    w = W.partitionBy("event_type").orderBy(F.col("total_value").desc(), F.col("user_id"))
    return (sums.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("event_type", "user_id", "total_value"))


ORACLE["top_user_by_value"] = """
SELECT event_type, user_id, total_value FROM (
  SELECT event_type, user_id, round(sum(value), 2) AS total_value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY round(sum(value), 2) DESC, user_id) AS rk
  FROM events GROUP BY 1, 2
) WHERE rk = 1
"""


# ---------------------------------------------------------------------------
# part_string_functions: scalar string battery (F1/F2-family surface).
# ---------------------------------------------------------------------------
def part_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    name = F.col("p_name")
    return part.select(
        "p_partkey",
        F.upper(name).alias("upper_name"),
        F.length(name).alias("name_len"),
        F.substring(name, 1, 5).alias("name_prefix"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.concat_ws("|", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        F.regexp_replace(name, "[aeiou]", "_").alias("devoweled"),
        F.reverse(name).alias("reversed_name"),
    )


ORACLE["part_string_functions"] = """
SELECT p_partkey,
       upper(p_name)                       AS upper_name,
       length(p_name)                      AS name_len,
       substring(p_name, 1, 5)             AS name_prefix,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       concat_ws('|', p_brand, p_type)     AS brand_type,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       reverse(p_name)                     AS reversed_name
FROM part
"""


# ---------------------------------------------------------------------------
# quantity_price_corr: correlation per return flag.
# ---------------------------------------------------------------------------
def quantity_price_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + sample covariance from exact decimal
    moments (see supplier_acct_stats for why not the builtins)."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    base = (
        li.groupBy("l_returnflag")
        .agg(F.sum(x).cast("double").alias("sx"),
             F.sum(y).cast("double").alias("sy"),
             F.sum(x * x).cast("double").alias("sxx"),
             F.sum(y * y).cast("double").alias("syy"),
             F.sum(x * y).cast("double").alias("sxy"),
             F.count(F.lit(1)).alias("n"))
    )
    n = F.col("n")
    cov = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (n - 1)
    corr = ((n * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
               * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))))
    # symmetric scaled rounding (see supplier_acct_stats)
    return base.select(
        "l_returnflag",
        (F.round(corr * F.lit(1_000_000.0)) / F.lit(1_000_000.0))
        .alias("qty_price_corr"),
        (F.round(cov * F.lit(10_000.0)) / F.lit(10_000.0))
        .alias("qty_price_covar"),
    ).orderBy("l_returnflag")


ORACLE["quantity_price_corr"] = """
WITH m AS (
  SELECT l_returnflag,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
         count(*) AS n
  FROM lineitem GROUP BY 1)
SELECT l_returnflag,
       round((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
             * 1000000.0) / 1000000.0 AS qty_price_corr,
       round((sxy - sx * sy / n) / (n - 1) * 10000.0) / 10000.0
         AS qty_price_covar
FROM m ORDER BY 1
"""


# ---------------------------------------------------------------------------
# map_functions_battery: JSON → MapType and the map function family.
# ---------------------------------------------------------------------------
def map_functions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return ev.select(
        "event_id",
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("keys_sorted"),
        m["k"].alias("k_value"),
        F.map_contains_key(m, "k").alias("has_k"),
        F.size(m).alias("n_entries"),
    )


ORACLE["map_functions_battery"] = """
SELECT event_id,
       array_to_string(list_sort(json_keys(props)), ',') AS keys_sorted,
       CAST(json_extract_string(props, '$.k') AS BIGINT)  AS k_value,
       list_contains(json_keys(props), 'k')               AS has_k,
       len(json_keys(props))                              AS n_entries
FROM events
"""


# ---------------------------------------------------------------------------
# regex_extract_battery: capture groups, translate, trim/case family.
# ---------------------------------------------------------------------------
def regex_extract_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract(F.col("p_brand"), r"Brand#(\d+)", 1).alias("brand_num"),
        F.translate(F.col("p_type"), "AEIOU", "aeiou").alias("type_lowered_vowels"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.initcap(F.lower(F.col("p_type"))).alias("type_title"),
        F.repeat(F.lit("*"), F.col("p_size") % 5).alias("stars"),
    )


ORACLE["regex_extract_battery"] = """
SELECT p_partkey,
       regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS brand_num,
       translate(p_type, 'AEIOU', 'aeiou')        AS type_lowered_vowels,
       trim('  ' || p_name || '  ')               AS trimmed,
       -- initcap: capitalize each word of the lowercased type
       list_aggregate(list_transform(string_split(lower(p_type), ' '),
                      x -> upper(x[1]) || x[2:]), 'string_agg', ' ') AS type_title,
       repeat('*', p_size % 5)                    AS stars
FROM part
"""


# ---------------------------------------------------------------------------
# topk_via_aggregation: top-3 order prices per customer via sorted
# collect_list slice — the agg-based top-k (single shuffle, map-side
# partials, no per-row window rank; the right shape when k is tiny
# and groups are hot).
# ---------------------------------------------------------------------------
def topk_via_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    prices = F.col("o_totalprice").cast("decimal(18,2)")
    top3 = F.slice(F.sort_array(F.collect_list(prices), asc=False), 1, 3)
    return (
        orders.groupBy("o_custkey")
        .agg(F.concat_ws(",", F.transform(top3, lambda x: x.cast("string")))
             .alias("top3_prices"),
             F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_custkey")
    )


ORACLE["topk_via_aggregation"] = """
SELECT o_custkey,
       array_to_string(
         list_transform(
           list_sort(list(CAST(o_totalprice AS DECIMAL(18,2))), 'DESC')[1:3],
           x -> CAST(x AS VARCHAR)),
         ',') AS top3_prices,
       count(*) AS n_orders
FROM orders GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# histogram_totalprice: fixed-width histogram via arithmetic bucketing
# (deterministic floor math, identical both engines).
# ---------------------------------------------------------------------------
def histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lo, hi, n = 0.0, 600000.0, 12
    width = (hi - lo) / n
    bucket = F.least(F.floor((F.col("o_totalprice") - lo) / width),
                     F.lit(n - 1)).cast("int")
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.min("o_totalprice"), 2).alias("bucket_min"),
             F.round(F.max("o_totalprice"), 2).alias("bucket_max"))
        .orderBy("bucket")
    )


ORACLE["histogram_totalprice"] = """
SELECT CAST(least(floor(o_totalprice / 50000.0), 11) AS INT) AS bucket,
       count(*) AS n_orders,
       round(min(o_totalprice), 2) AS bucket_min,
       round(max(o_totalprice), 2) AS bucket_max
FROM orders GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# profile_orders_table: one-pass data-quality profile (nulls, exact
# distinct, min/max per column).
# ---------------------------------------------------------------------------
def profile_orders_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import profile_columns
    orders = load_table(spark, sf_dir, "orders")
    return profile_columns(orders, ["o_orderkey", "o_custkey", "o_orderstatus",
                                    "o_orderpriority"])


ORACLE["profile_orders_table"] = """
SELECT 'o_orderkey' AS column, count(*) AS n_rows,
       CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       count(DISTINCT o_orderkey) AS n_distinct,
       min(CAST(o_orderkey AS VARCHAR)) AS min_str,
       max(CAST(o_orderkey AS VARCHAR)) AS max_str
FROM orders
UNION ALL
SELECT 'o_custkey', count(*),
       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT o_custkey),
       min(CAST(o_custkey AS VARCHAR)), max(CAST(o_custkey AS VARCHAR))
FROM orders
UNION ALL
SELECT 'o_orderstatus', count(*),
       CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT o_orderstatus),
       min(o_orderstatus), max(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_orderpriority', count(*),
       CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT o_orderpriority),
       min(o_orderpriority), max(o_orderpriority)
FROM orders
"""


# ---------------------------------------------------------------------------
# multimodal: binary-column plumbing with a pure-SQL oracle (the fake
# decoder derives dims from the md5 digest, which SQL reproduces).
# ---------------------------------------------------------------------------
def multimodal_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_demo_binary(docs)
    return MM.decode_image_meta(media)


ORACLE["multimodal_image_meta"] = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       CAST((CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 1920) + 1 AS INT) AS width,
       CAST((CAST('0x' || substr(md5(text), 9, 8) AS BIGINT) % 1080) + 1 AS INT) AS height,
       'image/fake' AS media_type
FROM documents
"""


def multimodal_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_demo_binary(docs)
    frames = MM.sample_frames(media, n_frames=4)
    return (
        frames.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_frames"),
             F.sum("n_bytes").alias("total_bytes"),
             F.max("n_bytes").alias("max_frame_bytes"))
    )


ORACLE["multimodal_frame_stats"] = """
-- frame sampling splits the blob into ceil(len/step) chunks with
-- step = ceil(len/4): n_frames = least(len, 4), chunk sizes step
-- except a short tail; max chunk = step.
SELECT doc_id,
       least(octet_length(encode(text)), 4) AS n_frames,
       octet_length(encode(text)) AS total_bytes,
       CAST(ceil(octet_length(encode(text)) / 4.0) AS BIGINT) AS max_frame_bytes
FROM documents
"""


# multimodal audio: byte-level feature extraction (mean amplitude,
# RMS, sign changes) — the mapInPandas path with an exact byte-by-byte
# SQL oracle (bytes recovered from hex(encode(text))).
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_demo_binary(docs)
    return MM.extract_audio_features(media)


ORACLE["multimodal_audio_features"] = """
WITH b AS (SELECT doc_id, hex(encode(text)) AS h,
                  octet_length(encode(text)) AS n
           FROM documents),
idx AS (SELECT unnest(generate_series(0, (SELECT max(n) - 1 FROM b))) AS i),
bytes AS (SELECT doc_id, i,
                 CAST('0x' || substr(h, 2 * i + 1, 2) AS INTEGER) - 128 AS v
          FROM b JOIN idx ON i < n),
agg AS (SELECT doc_id, count(*) AS n_samples,
               round(CAST(sum(v) AS DOUBLE) / count(*), 4) AS mean_amp,
               round(sqrt(CAST(sum(v * v) AS DOUBLE) / count(*)), 4) AS rms
        FROM bytes GROUP BY 1),
lagged AS (SELECT doc_id, v,
                  lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
           FROM bytes),
sc AS (SELECT doc_id,
              CAST(count(*) FILTER (WHERE pv IS NOT NULL
                                      AND (v < 0) <> (pv < 0)) AS BIGINT)
                AS n_sign_changes
       FROM lagged GROUP BY 1)
SELECT doc_id, n_samples, mean_amp, rms, n_sign_changes
FROM agg JOIN sc USING (doc_id)
"""


# multimodal resize: REAL nearest-neighbor resize of raw 32x32
# grayscale bitmaps to 8x8 (blob zero-padded/truncated) — the oracle
# recomputes the exact sampled-pixel checksum byte-by-byte: sampled
# positions are 128*r + 4*c for r,c in 0..7.
def multimodal_resize_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_demo_binary(docs)
    resized = MM.resize_raw_gray(media, src_w=32, src_h=32, dst_w=8, dst_h=8)
    return resized.select("doc_id", "out_w", "out_h", "pixel_sum")


# salted join under the oracle: the hot-key mitigation must be
# RESULT-invariant — salting only changes row distribution (random
# salt on the big side, replicated small side), so the grouped output
# equals the plain SQL join bit-for-bit.
def salted_join_user_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join
    from ._exact import exact_sum
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("value").cast("decimal(18,2)").alias("value"))
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment")
    j = salted_join(ev, cust, "user_id", salt=8)
    return (j.groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 exact_sum(F.col("value")).alias("total_value"))
            .orderBy("c_mktsegment"))


ORACLE["salted_join_user_segments"] = """
SELECT c_mktsegment, count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1 ORDER BY 1
"""


# equal-width histogram: 10 global bins between min/max (exact
# endpoints), bin index clamped at 9 — identical float arithmetic on
# both engines. Min/max arrive via a broadcast 1-row aggregate.
def event_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    binned = (
        ev.crossJoin(F.broadcast(bounds))
        .select(F.least(
            F.floor((F.col("value") - F.col("vmin"))
                    / (F.col("vmax") - F.col("vmin")) * 10).cast("long"),
            F.lit(9).cast("long")).alias("bin"))
    )
    return (binned.groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .orderBy("bin"))


ORACLE["event_value_histogram"] = """
WITH b AS (SELECT min(value) AS vmin, max(value) AS vmax FROM events)
SELECT least(CAST(floor((value - vmin) / (vmax - vmin) * 10) AS BIGINT),
             9) AS bin,
       count(*) AS n_events
FROM events CROSS JOIN b
GROUP BY 1 ORDER BY 1
"""


ORACLE["multimodal_resize_checksum"] = """
WITH b AS (SELECT doc_id, hex(encode(text)) AS h,
                  octet_length(encode(text)) AS n
           FROM documents),
grid AS (SELECT r.r, c.c
         FROM (SELECT unnest(generate_series(0, 7)) AS r) r
         CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS c) c),
px AS (SELECT doc_id, 128 * r + 4 * c AS p, h, n FROM b CROSS JOIN grid),
v AS (SELECT doc_id,
             CASE WHEN p < n THEN CAST('0x' || substr(h, 2 * p + 1, 2) AS INTEGER)
                  ELSE 0 END AS byte
      FROM px)
SELECT doc_id, 8 AS out_w, 8 AS out_h,
       CAST(sum(byte) AS BIGINT) AS pixel_sum
FROM v GROUP BY 1
"""


# ---------------------------------------------------------------------------
# approximate aggregates — engine-specific sketches (HLL / KLL). The
# raw estimates are engine-specific, so the hashed output carries the
# EXACT values plus deterministic tolerance verdicts (|approx − exact|
# within the sketch's published error bound): the oracle asserts the
# same columns with literal TRUE, making the accuracy claim itself the
# gate instead of falling back to a rows-only check. The point at
# 100 TB: approx_count_distinct is one pass + constant state vs
# countDistinct's expand+double-shuffle.
# ---------------------------------------------------------------------------
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("_approx"),
             F.countDistinct("user_id").alias("exact_users"))
        # rsd=1% HLL: accept 4σ (+1 for tiny groups) — deterministic
        # for fixed data, so the verdict is hashable
        .select("event_type", "exact_users",
                (F.abs(F.col("_approx") - F.col("exact_users"))
                 <= F.col("exact_users") * 0.04 + F.lit(1))
                .alias("approx_within_tol"))
        .orderBy("event_type")
    )


def approx_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # KLL-style bound: percentile_approx(accuracy=10000) guarantees
    # rank error ≤ n/10000, so each estimate must lie between the
    # EXACT quantiles at q ± 0.005 (50× the guarantee — slack for
    # interpolation differences, still a real accuracy gate).
    ev = load_table(spark, sf_dir, "events")
    qs = [0.5, 0.95, 0.99]
    lo = ", ".join(str(q - 0.005) for q in qs)
    hi = ", ".join(str(q + 0.005) for q in qs)
    agg = ev.groupBy("event_type").agg(
        F.percentile_approx("value", qs, 10000).alias("_q"),
        F.expr(f"percentile(value, array({lo}))").alias("_ql"),
        F.expr(f"percentile(value, array({hi}))").alias("_qh"),
        F.count(F.lit(1)).alias("n"))
    checks = [((F.col("_q")[i] >= F.col("_ql")[i])
               & (F.col("_q")[i] <= F.col("_qh")[i]))
              .alias(f"p{int(q * 100)}_within_tol")
              for i, q in enumerate(qs)]
    return agg.select("event_type", "n", *checks).orderBy("event_type")


# ---------------------------------------------------------------------------
# array_agg_battery: array construction/inspection — sorted collect,
# contains, slice, distinct counts per group.
# ---------------------------------------------------------------------------
def array_agg_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(F.array_sort(F.collect_list("o_orderkey")).alias("order_keys"))
    )
    return per_cust.select(
        "o_custkey",
        F.size(F.col("order_keys")).alias("n_orders"),
        F.element_at(F.col("order_keys"), 1).alias("first_key"),
        F.element_at(F.col("order_keys"), -1).alias("last_key"),
        # string-join the array output: engines agree on the values but
        # may stringify native array types differently in a hasher
        F.concat_ws(",", F.slice(F.col("order_keys"), 1, 3)).alias("first3"),
        F.array_contains(F.col("order_keys"),
                         F.element_at(F.col("order_keys"), 1)).alias("contains_first"),
    )


ORACLE["array_agg_battery"] = """
WITH per_cust AS (
  SELECT o_custkey, list_sort(list(o_orderkey)) AS order_keys
  FROM orders GROUP BY 1)
SELECT o_custkey,
       len(order_keys)                 AS n_orders,
       order_keys[1]                   AS first_key,
       order_keys[-1]                  AS last_key,
       array_to_string(order_keys[1:3], ',') AS first3,
       list_contains(order_keys, order_keys[1]) AS contains_first
FROM per_cust
"""


# ---------------------------------------------------------------------------
# null_handling_battery: coalesce/nullif/greatest/least semantics.
# ---------------------------------------------------------------------------
def null_handling_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.select(
        "event_id",
        F.coalesce(k, F.lit(-1)).alias("k_or_default"),
        F.nullif(k, F.lit(0)).alias("k_nullif_zero"),
        F.greatest(k, F.col("user_id")).alias("max_of"),
        F.least(k, F.col("user_id")).alias("min_of"),
        F.isnull(k).alias("k_is_null"),
        F.when(k.isNotNull() & (k > 50), F.lit("high"))
         .when(k.isNotNull(), F.lit("low"))
         .otherwise(F.lit("unknown")).alias("bucket"),
    )


ORACLE["null_handling_battery"] = """
WITH e AS (SELECT event_id, user_id,
                  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
           FROM events)
SELECT event_id,
       coalesce(k, -1)    AS k_or_default,
       nullif(k, 0)       AS k_nullif_zero,
       greatest(k, user_id) AS max_of,
       least(k, user_id)    AS min_of,
       k IS NULL          AS k_is_null,
       CASE WHEN k IS NOT NULL AND k > 50 THEN 'high'
            WHEN k IS NOT NULL THEN 'low'
            ELSE 'unknown' END AS bucket
FROM e
"""


# ---------------------------------------------------------------------------
# config_lookup_enrichment: map-side lookup against an in-code config
# map (the reference resolves business classes through three small
# JSON maps — J4; here a literal map broadcast into the plan).
# ---------------------------------------------------------------------------
_URGENCY = {"1-URGENT": 5, "2-HIGH": 4, "3-MEDIUM": 3, "4-NOT SPECIFIED": 2, "5-LOW": 1}


def config_lookup_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    mapping = F.create_map(*[F.lit(x) for kv in _URGENCY.items() for x in kv])
    return (
        orders.withColumn("urgency", mapping[F.col("o_orderpriority")])
        .groupBy("urgency")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("urgency")
    )


ORACLE["config_lookup_enrichment"] = """
SELECT CASE o_orderpriority
         WHEN '1-URGENT' THEN 5 WHEN '2-HIGH' THEN 4 WHEN '3-MEDIUM' THEN 3
         WHEN '4-NOT SPECIFIED' THEN 2 WHEN '5-LOW' THEN 1 END AS urgency,
       count(*) AS n_orders
FROM orders GROUP BY 1 ORDER BY 1
"""


# multimodal PPM: a REAL image decode under the gate — the blobs are
# genuine P6 PPM files (header + RGB payload) built deterministically
# from each document, and decode_ppm_stats actually parses the
# header and reshapes the pixel array. The oracle replays the
# construction relationally: pixel p cycles the text bytes
# (ascii(substr(text, p % L + 1))), channel = p % 3.
def multimodal_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_demo_ppm(docs)
    return MM.decode_ppm_stats(media).orderBy("doc_id")


ORACLE["multimodal_ppm_decode"] = """
WITH d0 AS (SELECT doc_id,
                   regexp_replace(text, '[^\x01-\x7f]', '', 'g') AS t7
            FROM documents),
d AS (SELECT doc_id, t7, length(t7) AS L,
             4 + doc_id % 5 AS w,
             3 + length(t7) % 4 AS h
      FROM d0),
px AS (SELECT doc_id, w, h, p % 3 AS ch,
              CASE WHEN L = 0 THEN 32
                   ELSE ascii(substr(t7, CAST(p % L AS INT) + 1, 1))
              END AS b
       FROM d, unnest(generate_series(0, 3 * w * h - 1)) t(p)),
agg AS (SELECT doc_id, w, h, ch, CAST(sum(b) AS BIGINT) AS s
        FROM px GROUP BY 1, 2, 3, 4),
a2 AS (SELECT doc_id, w, h,
              round(CAST(max(CASE WHEN ch = 0 THEN s END) AS DOUBLE)
                    / (w * h), 4) AS mean_r,
              round(CAST(max(CASE WHEN ch = 1 THEN s END) AS DOUBLE)
                    / (w * h), 4) AS mean_g,
              round(CAST(max(CASE WHEN ch = 2 THEN s END) AS DOUBLE)
                    / (w * h), 4) AS mean_b
       FROM agg GROUP BY 1, 2, 3)
SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(w * h AS BIGINT) AS n_pixels, mean_r, mean_g, mean_b
FROM a2 ORDER BY doc_id
"""


ORACLE["approx_distinct_users"] = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS approx_within_tol
FROM events GROUP BY event_type ORDER BY event_type
"""

ORACLE["approx_value_quantiles"] = """
SELECT event_type,
       COUNT(*) AS n,
       TRUE AS p50_within_tol,
       TRUE AS p95_within_tol,
       TRUE AS p99_within_tol
FROM events GROUP BY event_type ORDER BY event_type
"""

QUERIES = {
    "revenue_cube": revenue_cube,
    "config_lookup_enrichment": config_lookup_enrichment,
    "approx_distinct_users": approx_distinct_users,
    "approx_value_quantiles": approx_value_quantiles,
    "array_agg_battery": array_agg_battery,
    "null_handling_battery": null_handling_battery,
    "regex_extract_battery": regex_extract_battery,
    "map_functions_battery": map_functions_battery,
    "profile_orders_table": profile_orders_table,
    "histogram_totalprice": histogram_totalprice,
    "topk_via_aggregation": topk_via_aggregation,
    "events_json_extract": events_json_extract,
    "supplier_acct_stats": supplier_acct_stats,
    "top_user_by_value": top_user_by_value,
    "part_string_functions": part_string_functions,
    "quantity_price_corr": quantity_price_corr,
    "multimodal_image_meta": multimodal_image_meta,
    "multimodal_ppm_decode": multimodal_ppm_decode,
    "multimodal_frame_stats": multimodal_frame_stats,
    "multimodal_audio_features": multimodal_audio_features,
    "multimodal_resize_checksum": multimodal_resize_checksum,
    "salted_join_user_segments": salted_join_user_segments,
    "event_value_histogram": event_value_histogram,
}


# multimodal WAV: a REAL audio-container decode under the gate — the
# blobs are genuine RIFF/WAVE 16-bit PCM files built deterministically
# from each document's text, and decode_wav_meta actually walks the
# chunk list, validates the fmt fields, and decodes the frames with
# numpy. The oracle replays sample i = (codepoint_i % 256 - 128)*256
# relationally; every emitted statistic is integer (or a floor(sqrt)
# exact in double at these magnitudes).
def multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_demo_wav(docs)
    return MM.decode_wav_meta(media).orderBy("doc_id")


ORACLE["multimodal_wav_decode"] = """
WITH d AS (SELECT doc_id, text, least(400, length(text)) AS n
           FROM documents WHERE length(text) >= 1),
s AS (SELECT doc_id, n,
             CAST((unicode(substr(text, CAST(i AS INT), 1)) % 256 - 128)
                  * 256 AS BIGINT) AS v
      FROM d, unnest(generate_series(1, n)) t(i)),
a AS (SELECT doc_id, any_value(n) AS n, max(abs(v)) AS peak,
             CAST(sum(v * v) AS BIGINT) AS ss
      FROM s GROUP BY doc_id)
SELECT doc_id, CAST(8000 AS INT) AS sample_rate,
       CAST(1 AS INT) AS n_channels, CAST(16 AS INT) AS bits,
       CAST(n AS BIGINT) AS n_samples,
       CAST(floor(n * 1000.0 / 8000) AS BIGINT) AS duration_ms,
       CAST(peak AS BIGINT) AS peak,
       CAST(floor(sqrt(CAST(floor(CAST(ss AS DOUBLE) / n) AS BIGINT)))
            AS BIGINT) AS rms
FROM a ORDER BY doc_id
"""

QUERIES["multimodal_wav_decode"] = multimodal_wav_decode

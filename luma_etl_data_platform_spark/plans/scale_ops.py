"""Scale-native analytics: portable cardinality sketches, triangle
counting over a similarity graph, interval-coverage merge, and
corpus-LM perplexity scoring.

Every query here exists because of a 100-TB concern:

- ``kmv_distinct_users``  — mergeable fixed-size distinct sketches
  (the hash-verifiable counterpart of the rows-only HLL queries in
  ``plans/extras.py``);
- ``graph_triangle_stats`` — O(m^1.5) degree-ordered wedge counting,
  the skew-proof formulation of the one graph metric every dedup
  graph audit needs;
- ``interval_coverage_user`` — gaps-and-islands coalescing with exact
  timestamp arithmetic (uptime/occupancy analysis);
- ``lm_perplexity_docs``  — add-one bigram-LM perplexity with integer
  micro-nat carriage (partition-order-independent float totals).

Reference scope: all beyond-reference surface (`SURVEY.md §2` crowns
these families "(absent)"); oracle parity follows the repo's portable-
md5 / fixed-point conventions so DuckDB reproduces results exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.basket import basket_pair_stats
from ..operators.graph import pagerank, triangle_stats
from ..operators.ranking import bigram_lm_scores
from ..operators.sketches import (
    bloom_lanes, bloom_might_contain, bottomk_sample, kmv_estimate,
    kmv_sketch, kmv_union)
from ..operators.timeseries import merge_intervals
from ..sources.tables import load_table

ORACLE: dict[str, str] = {}

# the kNN similarity graph over embeddings: the shared edge contract
# of the graph-analytics queries (triangles, PageRank) — one row per
# undirected pair, id_a < id_b, each vector linked to its 3 most-
# similar within-block neighbors. Degree is capped by construction,
# so edges ≤ 3n — LINEAR in the corpus (968 edges at sf0.01, 3.9k at
# sf0.1) — unlike the part-name similarity graph this replaced, which
# is near-block-clique above sf0.1 (3.1M edges at the distance-2 cut;
# measured in SCALING.md) and made the census quadratic-hostile.
_KNN_EDGE_CTE = """
emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
sim AS (SELECT a.vec_id AS sa, b.vec_id AS sb,
               round(list_dot_product(a.v, b.v)
                     / (sqrt(list_dot_product(a.v, a.v))
                        * sqrt(list_dot_product(b.v, b.v))), 6) AS sc
        FROM emb a JOIN emb b
          ON a.label = b.label AND a.vec_id <> b.vec_id),
rk AS (SELECT sa, sb,
              row_number() OVER (PARTITION BY sa
                                 ORDER BY sc DESC, sb) AS rn
       FROM sim),
e AS (SELECT DISTINCT least(sa, sb) AS id_a, greatest(sa, sb) AS id_b
      FROM rk WHERE rn <= 3)
"""


def _knn_graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import knn_edges
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_edges(emb, k=3, block_col="label")

_KMV_K = 64


def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type KMV distinct-user estimates plus a '__union__'
    row whose estimate comes from MERGING the per-type sketches —
    demonstrating the property that makes sketches worth their error
    bar: cross-group union cardinality without re-reading the data."""
    ev = load_table(spark, sf_dir, "events")
    # eager localCheckpoint (not persist): the tiny sketch feeds both
    # the per-type estimates and the union merge; checkpoint blocks
    # are ContextCleaner-freed, cached plans are not
    sk = (kmv_sketch(ev, "event_type", "user_id", k=_KMV_K)
          .localCheckpoint(eager=True))
    uni = kmv_union(sk, group_expr=F.lit("__union__"), k=_KMV_K)
    return (kmv_estimate(sk, "event_type", k=_KMV_K)
            .unionByName(kmv_estimate(uni, "event_type", k=_KMV_K))
            .orderBy("event_type"))


ORACLE["kmv_distinct_users"] = f"""
WITH h AS (SELECT DISTINCT event_type,
                  CAST('0x' || substr(md5('0:' || CAST(user_id AS VARCHAR)), 1, 8)
                       AS BIGINT) AS hh
           FROM events),
ranked AS (SELECT event_type, hh,
                  row_number() OVER (PARTITION BY event_type ORDER BY hh) AS rn
           FROM h),
sk AS (SELECT event_type, hh FROM ranked WHERE rn <= {_KMV_K}),
uranked AS (SELECT hh, row_number() OVER (ORDER BY hh) AS rn
            FROM (SELECT DISTINCT hh FROM sk)),
allsk AS (SELECT * FROM sk
          UNION ALL
          SELECT '__union__', hh FROM uranked WHERE rn <= {_KMV_K}),
agg AS (SELECT event_type, max(hh) AS kth, count(*) AS n_sketch
        FROM allsk GROUP BY 1)
SELECT event_type, n_sketch,
       round(CASE WHEN n_sketch < {_KMV_K} THEN CAST(n_sketch AS DOUBLE)
                  ELSE {_KMV_K - 1}.0 * 4294967296.0 / kth END
             * 10000.0) / 10000.0 AS est_distinct
FROM agg ORDER BY event_type
"""


def graph_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the embedding kNN similarity graph (each
    vector → its 3 nearest within-block neighbors; degree-capped, so
    the graph stays sparse at every SF): node/edge/triangle counts +
    global clustering coefficient, via degree-ordered wedge
    enumeration."""
    return triangle_stats(_knn_graph_edges(spark, sf_dir))


ORACLE["graph_triangle_stats"] = f"""
WITH {_KNN_EDGE_CTE},
deg AS (SELECT node, count(*) AS deg
        FROM (SELECT id_a AS node FROM e UNION ALL SELECT id_b FROM e)
        GROUP BY 1),
o AS (SELECT CASE WHEN da.deg < db.deg
                    OR (da.deg = db.deg AND e.id_a < e.id_b)
                  THEN e.id_a ELSE e.id_b END AS u,
             CASE WHEN da.deg < db.deg
                    OR (da.deg = db.deg AND e.id_a < e.id_b)
                  THEN e.id_b ELSE e.id_a END AS v,
             CASE WHEN da.deg < db.deg
                    OR (da.deg = db.deg AND e.id_a < e.id_b)
                  THEN db.deg ELSE da.deg END AS dv
      FROM e JOIN deg da ON e.id_a = da.node
             JOIN deg db ON e.id_b = db.node),
w AS (SELECT a.u, a.v AS v1, b.v AS v2
      FROM o a JOIN o b ON a.u = b.u
      WHERE a.dv < b.dv OR (a.dv = b.dv AND a.v < b.v)),
t AS (SELECT count(*) AS n_triangles FROM w
      WHERE EXISTS (SELECT 1 FROM o WHERE o.u = w.v1 AND o.v = w.v2)),
s AS (SELECT count(*) AS n_nodes,
             CAST(sum(deg) / 2 AS BIGINT) AS n_edges,
             CAST(sum(deg * (deg - 1) / 2) AS BIGINT) AS n_wedges
      FROM deg)
SELECT n_nodes, n_edges, n_triangles,
       CASE WHEN n_wedges > 0
            THEN round(3.0 * n_triangles / n_wedges * 1000000.0)
                 / 1000000.0
            ELSE 0.0 END AS clustering_coeff
FROM s, t
"""


def interval_coverage_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity coverage: each event opens a 5-minute
    interval; overlapping/abutting intervals merge into islands.
    Output per user: island count, covered micros, busiest island."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select("user_id", F.col("ts").alias("s"),
                   (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("e"))
    islands = merge_intervals(iv, "user_id", "s", "e")
    # timestampdiff is pure wall-clock arithmetic — works on the
    # normalized TimestampType load_table emits without consulting
    # the session timezone
    covered = F.expr(
        "timestampdiff(MICROSECOND, island_start, island_end)")
    return (islands.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_islands"),
                 F.sum(covered).alias("covered_us"),
                 F.max("n_intervals").alias("max_island_events")))


ORACLE["interval_coverage_user"] = """
WITH iv AS (SELECT user_id, ts AS s, ts + INTERVAL 5 MINUTE AS e FROM events),
m AS (SELECT user_id, s, e,
             max(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS pme
      FROM iv),
fl AS (SELECT *, CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END AS nf
       FROM m),
isl AS (SELECT *, sum(nf) OVER (PARTITION BY user_id ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS island
        FROM fl),
g AS (SELECT user_id, island, min(s) AS i0, max(e) AS i1, count(*) AS n
      FROM isl GROUP BY 1, 2)
SELECT user_id, count(*) AS n_islands,
       CAST(sum(epoch_us(i1) - epoch_us(i0)) AS BIGINT) AS covered_us,
       max(n) AS max_island_events
FROM g GROUP BY 1
"""


def lm_perplexity_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return bigram_lm_scores(docs)


ORACLE["lm_perplexity_docs"] = """
WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS t
             FROM documents),
db AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
       FROM (SELECT doc_id, t,
                    unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i
             FROM tok)),
model AS (SELECT w1, w2, count(*) AS c2 FROM db GROUP BY 1, 2),
ctx AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM model GROUP BY 1),
v AS (SELECT count(DISTINCT w) AS vv
      FROM (SELECT unnest(t) AS w FROM tok)),
dtf AS (SELECT doc_id, w1, w2, count(*) AS dtf FROM db GROUP BY 1, 2, 3),
sc AS (SELECT doc_id, dtf,
              CAST(round(ln((c2 + 1.0) / (c1 + vv)) * -1000000, 0) AS BIGINT)
                AS micro
       FROM dtf JOIN model USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN v),
pd AS (SELECT doc_id, CAST(sum(dtf) AS BIGINT) AS n_bigrams,
              CAST(sum(dtf * micro) AS BIGINT) AS nll_micro
       FROM sc GROUP BY 1)
SELECT doc_id, n_bigrams,
       round(CAST(nll_micro AS DOUBLE) / CAST(n_bigrams AS DOUBLE))
         / 1000000.0 AS avg_nll,
       round(exp(round(CAST(nll_micro AS DOUBLE)
                       / CAST(n_bigrams AS DOUBLE)) / 1000000.0), 4) AS ppl
FROM pd
"""


def graph_pagerank_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PageRank vertices of the embedding kNN similarity graph
    — iterative message passing with integer pico-unit rank carriage
    (bit-stable at any partitioning, reproduced exactly by the
    unrolled-iteration SQL oracle)."""
    ranks = pagerank(_knn_graph_edges(spark, sf_dir), iterations=10)
    return (ranks.orderBy(F.col("rank_scaled").desc(), "node").limit(20))


def _pagerank_oracle(iterations: int = 10) -> str:
    scale = "1000000000000.0"
    ctes = [f"""
b AS (SELECT id_a AS u, id_b AS v FROM e
      UNION ALL SELECT id_b, id_a FROM e),
deg AS (SELECT u AS node, count(*) AS deg FROM b GROUP BY 1),
n AS (SELECT count(*) AS nn FROM deg),
r0 AS (SELECT node, CAST(floor({scale} / nn) AS BIGINT) AS rank
       FROM deg, n)"""]
    for i in range(1, iterations + 1):
        ctes.append(f"""
r{i} AS (SELECT b.v AS node,
              CAST(floor(3.0 * {scale} / (20.0 * nn)) AS BIGINT)
              + CAST(sum(CAST(floor((17.0 * r.rank) / (20.0 * d.deg))
                              AS BIGINT)) AS BIGINT) AS rank
       FROM b JOIN r{i - 1} r ON b.u = r.node
              JOIN deg d ON b.u = d.node
              CROSS JOIN n
       GROUP BY b.v, nn)""")
    return (f"WITH {_KNN_EDGE_CTE}, " + ",".join(ctes)
            + f"\nSELECT node, rank AS rank_scaled FROM r{iterations}"
            + "\nORDER BY rank_scaled DESC, node LIMIT 20")


ORACLE["graph_pagerank_top20"] = _pagerank_oracle(10)


def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket mining over order baskets (basket = order, item =
    part): top-20 part pairs by lift among pairs co-occurring in ≥ 3
    orders."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    stats = basket_pair_stats(li, "l_orderkey", "l_partkey", min_pair_count=3)
    return stats.orderBy(F.col("lift").desc(), "item_a", "item_b").limit(20)


ORACLE["basket_part_pairs"] = """
WITH items AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
n AS (SELECT count(DISTINCT b) AS nn FROM items),
supp AS (SELECT i, count(*) AS s FROM items GROUP BY 1),
pairs AS (SELECT a.i AS item_a, b.i AS item_b, count(*) AS pair_baskets
          FROM items a JOIN items b ON a.b = b.b AND a.i < b.i
          GROUP BY 1, 2
          HAVING count(*) >= 3)
SELECT item_a, item_b, pair_baskets,
       round(CAST(pair_baskets AS DOUBLE) / nn * 1000000.0)
         / 1000000.0 AS support,
       round(CAST(pair_baskets AS DOUBLE) / sa.s * 1000000.0)
         / 1000000.0 AS confidence_a_b,
       round(CAST(pair_baskets AS DOUBLE) * nn / (sa.s * sb.s)
             * 1000000.0) / 1000000.0 AS lift
FROM pairs
JOIN supp sa ON item_a = sa.i
JOIN supp sb ON item_b = sb.i
CROSS JOIN n
ORDER BY lift DESC, item_a, item_b LIMIT 20
"""


def sampled_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type value quantiles estimated from a deterministic
    bottom-1024-by-hash sample — the reproducible, hash-verifiable
    counterpart of the engine-specific KLL sketch behind
    ``approx_value_quantiles`` (which can only be rows-checked)."""
    ev = load_table(spark, sf_dir, "events")
    s = bottomk_sample(ev, "event_id", k=1024)
    return (s.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_sampled"),
                 # symmetric 6-dp emission (interpolated percentiles
                 # are rationals — the engine-divergent half-way class)
                 (F.round(F.expr("percentile(value, 0.5)")
                          * F.lit(1_000_000.0))
                  / F.lit(1_000_000.0)).alias("p50_est"),
                 (F.round(F.expr("percentile(value, 0.9)")
                          * F.lit(1_000_000.0))
                  / F.lit(1_000_000.0)).alias("p90_est"))
            .orderBy("event_type"))


ORACLE["sampled_value_quantiles"] = """
WITH s AS (SELECT event_type, value
           FROM events
           ORDER BY CAST('0x' || substr(md5('0:' || CAST(event_id AS VARCHAR)),
                                        1, 8) AS BIGINT),
                    event_id
           LIMIT 1024)
SELECT event_type, count(*) AS n_sampled,
       round(quantile_cont(value, 0.5) * 1000000.0) / 1000000.0
         AS p50_est,
       round(quantile_cont(value, 0.9) * 1000000.0) / 1000000.0
         AS p90_est
FROM s GROUP BY 1 ORDER BY 1
"""


def key_skew_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis of events.user_id: frequency extremes,
    hottest key, and the exact-integer Gini coefficient — the
    pre-join report that decides salting vs plain shuffle."""
    from ..operators.profile import key_skew_report
    ev = load_table(spark, sf_dir, "events")
    return key_skew_report(ev, "user_id")


ORACLE["key_skew_users"] = """
WITH c AS (SELECT user_id AS k, count(*) AS c FROM events GROUP BY 1),
r AS (SELECT k, c, row_number() OVER (ORDER BY c, k) AS i FROM c),
a AS (SELECT count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS total_rows,
             max(c) AS max_count,
             round(CAST(quantile_cont(c, 0.99) AS DOUBLE) * 1000000.0)
               / 1000000.0 AS p99_count,
             CAST(sum(i * c) AS BIGINT) AS s_ic
      FROM r),
h AS (SELECT min(k) AS hottest_key FROM c
      WHERE c = (SELECT max(c) FROM c))
SELECT n_keys, total_rows, max_count, p99_count, hottest_key,
       round(CAST(2 * s_ic - (n_keys + 1) * total_rows AS DOUBLE)
             / (n_keys * total_rows) * 1000000.0) / 1000000.0 AS gini
FROM a, h
"""


def bloom_prune_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter pre-join pruning audit: build a portable filter
    over rich customers (c_acctbal > 9900), probe every order, and
    report candidate vs exact match counts + the realized false-
    positive rate.  Because the filter's bits are md5-derived, the
    candidate set — including its false positives — reproduces
    exactly in the oracle."""
    cust = (load_table(spark, sf_dir, "customer")
            .filter(F.col("c_acctbal") > 9900).select("c_custkey"))
    # deliberately small filter (1024 bits) so the realized FP rate is
    # non-zero at test scale and the fp accounting is exercised
    lanes = bloom_lanes(cust, "c_custkey", m_bits=1024)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey")
    cand = bloom_might_contain(orders, "o_custkey", lanes, m_bits=1024)
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    n_exact = (orders.join(cust, orders.o_custkey == cust.c_custkey,
                           "left_semi")
               .agg(F.count(F.lit(1)).alias("n_exact")))
    n_all = orders.agg(F.count(F.lit(1)).alias("n_orders"))
    return (n_all.crossJoin(F.broadcast(n_cand))
            .crossJoin(F.broadcast(n_exact))
            .select("n_orders", "n_candidates", "n_exact",
                    # guard the degenerate every-key-matches case:
                    # 0-denominator would yield NULL (non-ANSI) or
                    # error (ANSI) — return 0.0 on both engines
                    (F.round(F.when(
                        F.col("n_orders") > F.col("n_exact"),
                        (F.col("n_candidates") - F.col("n_exact"))
                        .cast("double")
                        / (F.col("n_orders") - F.col("n_exact")))
                        .otherwise(F.lit(0.0)) * F.lit(1_000_000.0))
                     / F.lit(1_000_000.0)).alias("fp_rate")))


ORACLE["bloom_prune_orders"] = """
WITH small AS (SELECT c_custkey FROM customer WHERE c_acctbal > 9900),
seeds AS (SELECT unnest([0, 1, 2]) AS s),
bpos AS (SELECT (CAST('0x' || substr(md5(s || ':' || CAST(c_custkey AS VARCHAR)),
                                     1, 8) AS BIGINT)) % 1024 AS pos
         FROM small CROSS JOIN seeds),
lanes AS (SELECT CAST(floor(pos / 64) AS BIGINT) AS lane,
                 -- HUGEINT lanes: DuckDB's BIGINT << 63 raises an
                 -- overflow (strict, unlike Spark's wrapping
                 -- shiftleft); the 128-bit shift carries bit 63
                 -- losslessly and the lane values never leave this
                 -- CTE, so signedness parity with the Spark side is
                 -- irrelevant (found by the sf0.1 oracle tier)
                 bit_or(CAST(1 AS HUGEINT) << CAST(pos % 64 AS INT)) AS bits
          FROM bpos GROUP BY 1),
probes AS (SELECT o_orderkey,
                  (CAST('0x' || substr(md5(s || ':' || CAST(o_custkey AS VARCHAR)),
                                       1, 8) AS BIGINT)) % 1024 AS pos
           FROM orders CROSS JOIN seeds),
hits AS (SELECT o_orderkey,
                min(coalesce((bits >> CAST(pos % 64 AS INT)) & 1, 0)) AS ok
         FROM probes LEFT JOIN lanes
           ON CAST(floor(pos / 64) AS BIGINT) = lanes.lane
         GROUP BY 1),
c AS (SELECT count(*) AS n_candidates FROM hits WHERE ok = 1),
e AS (SELECT count(*) AS n_exact FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM small)),
t AS (SELECT count(*) AS n_orders FROM orders)
SELECT n_orders, n_candidates, n_exact,
       round(CASE WHEN n_orders > n_exact
                  THEN CAST(n_candidates - n_exact AS DOUBLE)
                       / (n_orders - n_exact)
                  ELSE 0.0 END * 1000000.0) / 1000000.0 AS fp_rate
FROM t, c, e
"""


def clamped_balance_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user credit-ledger balance: each event adds (value − 50),
    clamped to [0, 500] at every step.  The clamp makes the
    recurrence non-associative — NOT expressible with window frames —
    so this runs through grouped-map applyInPandas, and the oracle is
    a recursive CTE stepping the identical IEEE arithmetic."""
    from ..operators.grouped import clamped_running_sum
    ev = (load_table(spark, sf_dir, "events")
          .select("user_id", "ts", "event_id",
                  (F.col("value") - 50.0).alias("delta")))
    out = clamped_running_sum(ev, "user_id", ["ts", "event_id"],
                              "delta", lo=0.0, hi=500.0)
    return out.select("user_id", "event_id",
                      (F.round(F.col("balance") * F.lit(1_000_000.0))
                       / F.lit(1_000_000.0)).alias("balance"))


ORACLE["clamped_balance_users"] = """
WITH RECURSIVE s AS (
  SELECT user_id, event_id, value - 50.0 AS d,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
r(user_id, event_id, rn, bal) AS (
  SELECT user_id, event_id, rn, least(greatest(0.0 + d, 0.0), 500.0)
  FROM s WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.event_id, s.rn,
         least(greatest(r.bal + s.d, 0.0), 500.0)
  FROM r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1)
SELECT user_id, event_id,
       round(bal * 1000000.0) / 1000000.0 AS balance FROM r
"""


def time_weighted_avg_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user TIME-weighted average event value — each observation
    holds until the next one (zero-order hold), so the average weights
    values by how LONG they were current, not by how often they were
    sampled (the hypertable `time_weight('LOCF')` semantic, which a
    plain avg() gets wrong on irregular streams).

    Exactness: weights are integer microseconds from lead(ts); the
    weighted sum is value·micros summed in DECIMAL(38,6), so the
    result is bit-stable at any partitioning. One shuffle on the key,
    one window pass, one aggregate."""
    from pyspark.sql.window import Window as W
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    held_us = F.expr("timestampdiff(MICROSECOND, ts, _next_ts)")
    stepped = (ev
               .withColumn("_next_ts", F.lead("ts").over(w))
               .filter(F.col("_next_ts").isNotNull())
               .withColumn("_w_us", held_us))
    wsum = F.sum((F.col("value").cast("decimal(18,2)")
                  * F.col("_w_us")).cast("decimal(38,6)"))
    tot = F.sum("_w_us")
    return (stepped.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_intervals"),
                 tot.alias("held_us"),
                 (F.round(wsum.cast("double") / tot
                          * F.lit(1_000_000.0))
                  / F.lit(1_000_000.0)).alias("twa_value")))


ORACLE["time_weighted_avg_user"] = """
WITH stepped AS (
  SELECT user_id, value,
         epoch_us(lead(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id))
         - epoch_us(ts) AS w_us
  FROM events),
f AS (SELECT * FROM stepped WHERE w_us IS NOT NULL)
SELECT user_id, count(*) AS n_intervals,
       CAST(sum(w_us) AS BIGINT) AS held_us,
       round(CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * w_us
                           AS DECIMAL(38,6))) AS DOUBLE)
             / CAST(sum(w_us) AS BIGINT) * 1000000.0) / 1000000.0
         AS twa_value
FROM f GROUP BY 1
"""


def ewma_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average of the 8 most
    recent event values (alpha = 1/2, weights normalized over the
    available tail) — the online-smoothing statistic a feature store
    would maintain per entity.

    Engine shape: one window (rank the per-user tail; WindowGroupLimit
    pushes the <=8 filter map-side) + one groupBy that assembles the
    ordered tail ARRAY, then the weighted sum runs as a sequential
    higher-order fold over that array (zip_with + aggregate) — fixed
    evaluation order, so the double arithmetic is bit-reproducible and
    the DuckDB oracle (list_transform with index + list_reduce) folds
    to the identical value. Weights are powers of two, so each term is
    an EXACT halving: no rounding drift between engines.

    At 100 TB the plan is shuffle-bounded by (users x 8) rows — the
    tail filter happens before the aggregation, so state never grows
    with history depth."""
    from pyspark.sql.window import Window as W
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(),
                                         F.col("event_id").desc())
    r = ev.select("user_id", "event_id", "ts", "value",
                  F.row_number().over(w).alias("_rn"),
                  F.count(F.lit(1)).over(W.partitionBy("user_id"))
                  .alias("n_events"))
    tail = r.filter(F.col("_rn") <= 8)
    g = (tail.groupBy("user_id", "n_events")
         .agg(F.array_sort(F.collect_list(F.struct("_rn", "value")))
              .alias("_pairs")))
    vals = F.transform(F.col("_pairs"), lambda p: p["value"])
    weighted = F.zip_with(
        vals, F.sequence(F.lit(1), F.size(vals)),
        lambda v, j: v * F.pow(F.lit(0.5), j.cast("double")))
    wsum = F.aggregate(weighted, F.lit(0.0), lambda a, x: a + x)
    den = F.lit(1.0) - F.pow(F.lit(0.5), F.size(vals).cast("double"))
    return (g.select("user_id", "n_events",
                     (F.round(wsum / den * F.lit(1_000_000.0))
                      / F.lit(1_000_000.0)).alias("ewma_value"))
            .orderBy("user_id"))


ORACLE["ewma_user_values"] = """
WITH tails AS (
  SELECT user_id, count(*) AS n_events,
         (list(value ORDER BY ts DESC, event_id DESC))[1:8] AS lst
  FROM events GROUP BY 1)
SELECT user_id, n_events,
       round(list_reduce(list_transform(lst, (x, i) -> x * pow(0.5, i)),
                         (a, b) -> a + b)
             / (1.0 - pow(0.5, len(lst))) * 1000000.0) / 1000000.0
         AS ewma_value
FROM tails ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# hll_distinct_calibration: per-type portable-HLL distinct-user
# estimates NEXT TO the exact counts, plus a '__union__' row whose
# registers come from MERGING the per-type sketches (register-wise
# max) — the lossless-union property that makes HLL the standing
# distinct monitor at 100 TB. Unlike the engine-native
# approx_count_distinct queries (rows-only), the md5 register file is
# engine-independent, so estimates hash-match the DuckDB oracle.
# ---------------------------------------------------------------------------
def hll_distinct_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import hll_estimate, hll_merge, hll_sketch
    ev = load_table(spark, sf_dir, "events")
    # eager localCheckpoint: the <=1280-row register file feeds both
    # the per-type estimates and the union merge
    sk = (hll_sketch(ev, "event_type", "user_id")
          .localCheckpoint(eager=True))
    uni = hll_merge(sk, group_col="event_type",
                    group_expr=F.lit("__union__"))
    ests = (hll_estimate(sk, "event_type")
            .unionByName(hll_estimate(uni, "event_type")))
    exact = (ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("exact_distinct"))
             .unionByName(
                 ev.agg(F.countDistinct("user_id").alias("exact_distinct"))
                 .select(F.lit("__union__").alias("event_type"),
                         "exact_distinct")))
    ex = F.col("exact_distinct").cast("double")
    return (ests.join(F.broadcast(exact), "event_type")
            .select("event_type", "n_zero_regs", "est_distinct",
                    "exact_distinct",
                    (F.round((F.col("est_distinct") - ex) / ex
                             * F.lit(100.0) * F.lit(10_000.0))
                     / F.lit(10_000.0)).alias("err_pct"))
            .orderBy("event_type"))


from ..operators.sketches import hll_estimate_sql, hll_regs_sql

ORACLE["hll_distinct_calibration"] = (
    "WITH " + hll_regs_sql() + """,
allregs AS (SELECT * FROM regs
            UNION ALL SELECT '__union__', bucket, reg FROM regs),
mreg AS (SELECT event_type, bucket, max(reg) AS reg
         FROM allregs GROUP BY 1, 2),
""" + hll_estimate_sql(regs_cte="mreg") + """,
ex AS (SELECT event_type, count(DISTINCT user_id) AS exact_distinct
       FROM events GROUP BY 1
       UNION ALL
       SELECT '__union__', count(DISTINCT user_id) FROM events)
SELECT est.event_type, n_zero_regs, est_distinct, exact_distinct,
       round((est_distinct - CAST(exact_distinct AS DOUBLE))
             / CAST(exact_distinct AS DOUBLE) * 100.0 * 10000.0)
         / 10000.0 AS err_pct
FROM est JOIN ex ON est.event_type = ex.event_type
ORDER BY est.event_type""")


# ---------------------------------------------------------------------------
# hll_sliding_distinct: 7-day TRAILING distinct-user estimates per
# day — the sketch-windowing pattern: per-day register files are tiny
# (≤ 256 rows/day), so the sliding union is a register-wise max over
# a 7-row window of SKETCHES, never a re-scan of raw events. At
# 100 TB this is how a "distinct users, trailing week, every day"
# dashboard runs in O(days × 256) state.
# ---------------------------------------------------------------------------
def hll_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import hll_estimate, hll_sketch
    ev = load_table(spark, sf_dir, "events")
    daily = hll_sketch(
        ev.select(F.date_format(F.date_trunc("day", F.col("ts")),
                                "yyyy-MM-dd").alias("day"), "user_id"),
        "day", "user_id")
    # trailing-7-day register: max over the window of per-day regs for
    # the same bucket. Day keys are dense here; a RANGE window over
    # day ordinals would cover calendar gaps identically in both
    # engines (date_diff-based range frame).
    days = daily.select("day").distinct()
    grid = (days.alias("d").join(
        daily.alias("s"),
        (F.col("s.day") <= F.col("d.day"))
        & (F.col("s.day") >= F.date_format(
            F.date_add(F.to_date(F.col("d.day")), -6), "yyyy-MM-dd")))
        .select(F.col("d.day").alias("day"), F.col("s._bucket").alias("_bucket"),
                F.col("s._reg").alias("_reg"))
        .groupBy("day", "_bucket").agg(F.max("_reg").alias("_reg")))
    return (hll_estimate(grid, "day")
            .select("day", "n_zero_regs", "est_distinct")
            .orderBy("day"))


from ..operators.sketches import hll_estimate_sql as _hll_est_sql
from ..operators.sketches import hll_regs_sql as _hll_regs_sql

ORACLE["hll_sliding_distinct"] = (
    "WITH " + _hll_regs_sql(
        table="(SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,"
              " user_id FROM events)",
        group_col="day") + """,
days AS (SELECT DISTINCT day FROM regs),
grid AS (SELECT d.day, s.bucket, max(s.reg) AS reg
         FROM days d JOIN regs s
           ON s.day <= d.day
          AND s.day >= strftime(CAST(d.day AS DATE) - 6, '%Y-%m-%d')
         GROUP BY 1, 2),
""" + _hll_est_sql(group_col="day", regs_cte="grid")
    + "\nSELECT day, n_zero_regs, est_distinct FROM est ORDER BY day")


# ---------------------------------------------------------------------------
# graph_lpa_communities: community detection on the embedding kNN
# graph — synchronous label propagation, 3 deterministic rounds
# (operators/graph.label_propagation); the oracle unrolls the same
# rounds (argmax label with count-desc/label-asc ties).
# ---------------------------------------------------------------------------
_LPA_ROUNDS = 3


def graph_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import label_propagation
    comms = label_propagation(_knn_graph_edges(spark, sf_dir),
                              rounds=_LPA_ROUNDS)
    return (comms.groupBy("community")
            .agg(F.count(F.lit(1)).alias("n_nodes"))
            .orderBy(F.desc("n_nodes"), "community")
            .limit(20))


def _lpa_oracle(rounds: int) -> str:
    sql = f"""WITH {_KNN_EDGE_CTE},
nbr AS MATERIALIZED (
  SELECT id_a AS n, id_b AS m FROM e
  UNION SELECT id_b, id_a FROM e),
l0 AS MATERIALIZED (SELECT DISTINCT n, n AS lbl FROM nbr)"""
    prev = "l0"
    for t in range(1, rounds + 1):
        sql += f""",
c{t} AS (SELECT b.n, l.lbl, count(*) AS c
         FROM nbr b JOIN {prev} l ON b.m = l.n
         GROUP BY 1, 2),
l{t} AS MATERIALIZED (
  SELECT n, lbl FROM c{t}
  QUALIFY row_number() OVER (PARTITION BY n
                             ORDER BY c DESC, lbl) = 1)"""
        prev = f"l{t}"
    sql += f"""
SELECT lbl AS community, count(*) AS n_nodes
FROM {prev} GROUP BY 1
ORDER BY n_nodes DESC, community LIMIT 20"""
    return sql


ORACLE["graph_lpa_communities"] = _lpa_oracle(_LPA_ROUNDS)


def community_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-quality calibration: do LPA communities on the kNN
    graph recover the ground-truth labels? Per community (size ≥ 2):
    size, majority label, and purity = majority fraction — the same
    calibration doctrine as ann_ivf_recall/minhash_calibration
    (approximation next to its exact yardstick)."""
    from ..operators.graph import label_propagation
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    comms = label_propagation(_knn_graph_edges(spark, sf_dir),
                              rounds=_LPA_ROUNDS)
    j = comms.join(emb, comms["node"] == emb["vec_id"])
    by_label = (j.groupBy("community", "label")
                .agg(F.count(F.lit(1)).alias("n")))
    from pyspark.sql.window import Window as W
    win = W.partitionBy("community").orderBy(F.desc("n"), F.asc("label"))
    top = (by_label.withColumn("_rn", F.row_number().over(win))
           .filter(F.col("_rn") == 1)
           .select("community", F.col("label").alias("majority_label"),
                   F.col("n").alias("n_majority")))
    sizes = by_label.groupBy("community").agg(F.sum("n").alias("n_members"))
    return (sizes.join(top, "community")
            .filter(F.col("n_members") >= 2)
            .select("community", "n_members", "majority_label",
                    F.round(F.col("n_majority").cast("double")
                            / F.col("n_members").cast("double"), 6)
                    .alias("purity"))
            .orderBy(F.desc("n_members"), "community")
            .limit(20))


ORACLE["community_label_purity"] = (
    _lpa_oracle(_LPA_ROUNDS).rsplit("SELECT lbl AS community", 1)[0]
    .rstrip().rstrip(")") + ")," + f"""
bl AS (SELECT l.lbl AS community, e.label, count(*) AS n
      FROM l{_LPA_ROUNDS} l JOIN embeddings e ON l.n = e.vec_id
      GROUP BY 1, 2),
top AS (SELECT community, label AS majority_label, n AS n_majority
        FROM bl
        QUALIFY row_number() OVER (PARTITION BY community
                                   ORDER BY n DESC, label) = 1),
sz AS (SELECT community, CAST(sum(n) AS BIGINT) AS n_members
       FROM bl GROUP BY 1)
SELECT sz.community, sz.n_members, top.majority_label,
       round(CAST(top.n_majority AS DOUBLE)
             / CAST(sz.n_members AS DOUBLE), 6) AS purity
FROM sz JOIN top ON sz.community = top.community
WHERE sz.n_members >= 2
ORDER BY n_members DESC, sz.community LIMIT 20""")


QUERIES = {
    "ewma_user_values": ewma_user_values,
    "time_weighted_avg_user": time_weighted_avg_user,
    "clamped_balance_users": clamped_balance_users,
    "bloom_prune_orders": bloom_prune_orders,
    "key_skew_users": key_skew_users,
    "sampled_value_quantiles": sampled_value_quantiles,
    "kmv_distinct_users": kmv_distinct_users,
    "hll_distinct_calibration": hll_distinct_calibration,
    "hll_sliding_distinct": hll_sliding_distinct,
    "graph_triangle_stats": graph_triangle_stats,
    "graph_pagerank_top20": graph_pagerank_top20,
    "graph_lpa_communities": graph_lpa_communities,
    "community_label_purity": community_label_purity,
    "interval_coverage_user": interval_coverage_user,
    "lm_perplexity_docs": lm_perplexity_docs,
    "basket_part_pairs": basket_part_pairs,
}

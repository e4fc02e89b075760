"""Round-3 pretraining-corpus operators: exact duplicated-span dedup
(Lee et al. 2021 substring dedup), a hashing-trick linear quality
classifier, retrieval-quality calibration (IVF recall vs exact,
MinHash estimate vs exact Jaccard), KMV set-operation estimates,
per-dimension embedding statistics, template/boilerplate detection,
and a deterministic shard-export manifest.

Beyond-reference surface (the reference ERP ETL tool has none of
these — `SURVEY.md §2.4` "(absent)" families); each query pairs a
Spark plan with a DuckDB oracle that reproduces the result exactly,
including the sketch estimates (both engines evaluate the same
portable md5 arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash32, token_count, tokens
from ..operators import dedup as D
from ..operators import similarity as S
from ..operators import sketches as K
from ..operators.curation import hashed_linear_scores
from ..operators.spans import duplicated_spans
from ..sources.tables import load_table
from .training_data import _EMB_CTE, _SH_CTE

ORACLE: dict[str, str] = {}
QUERIES: dict = {}


def _q(name):
    def reg(fn):
        QUERIES[name] = fn
        return fn
    return reg


# ---------------------------------------------------------------------------
# dedup_span_docs: maximal cross-document duplicated 10-token spans —
# the "what do I cut" per-document answer (mark-and-merge; no pair
# explosion, so shared boilerplate costs O(m) not O(m^2) rows).
# ---------------------------------------------------------------------------
@_q("dedup_span_docs")
def dedup_span_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (duplicated_spans(docs, "text", "doc_id", k=10)
            .orderBy("doc_id", "span_start"))


ORACLE["dedup_span_docs"] = """
WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS t FROM documents),
pos AS (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t)-9, 0))) AS i FROM tok),
win AS (SELECT doc_id, i, md5(array_to_string(t[i:i+9], ' ')) AS h FROM pos),
hot AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM win)
        GROUP BY h HAVING count(*) >= 2),
dup AS (SELECT doc_id, i FROM win SEMI JOIN hot USING (h)),
isl AS (SELECT doc_id, i,
               i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS g
        FROM dup)
SELECT doc_id, min(i) AS span_start, max(i) AS span_end,
       max(i) - min(i) + 10 AS span_tokens
FROM isl GROUP BY doc_id, g
ORDER BY doc_id, span_start
"""


# ---------------------------------------------------------------------------
# quality_classifier_scores: hashing-trick linear scorer (fastText
# shape) — tokenize -> feature slot -> weight is a pure narrow Column
# pipeline; the integer milli-weight sum is partition-order exact.
# ---------------------------------------------------------------------------
@_q("quality_classifier_scores")
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scores = hashed_linear_scores(docs, "text", "doc_id", buckets=4096)
    return (docs.select("doc_id", "source")
            .join(scores, "doc_id")
            .select("doc_id", "source", "n_tokens", "score",
                    (F.col("score") >= 0).alias("passed"))
            .orderBy("doc_id"))


ORACLE["quality_classifier_scores"] = """
WITH tok AS (SELECT doc_id, source,
                    unnest(regexp_extract_all(lower(text), '\\w+')) AS tk
             FROM documents),
w AS (SELECT doc_id, source,
             (CAST('0x' || substr(md5('11:' ||
                (CAST('0x' || substr(md5('7:' || tk), 1, 8) AS BIGINT) % 4096)
              ), 1, 8) AS BIGINT) % 2001) - 1000 AS wm
      FROM tok),
agg AS (SELECT doc_id, source, count(*) AS n_tokens,
               CAST(sum(wm) AS BIGINT) AS sw
        FROM w GROUP BY 1, 2)
SELECT doc_id, source, n_tokens,
       round(CAST(sw AS DOUBLE) * 1000 / n_tokens) / 1000000.0 AS score,
       round(CAST(sw AS DOUBLE) * 1000 / n_tokens) / 1000000.0 >= 0
         AS passed
FROM agg ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# ann_ivf_recall: retrieval-quality calibration — recall@10 of the
# IVF probe path against the exact brute-force top-10, per nprobe.
# The "measure, don't guess" query for the ANN recall/cost dial.
# ---------------------------------------------------------------------------
@_q("ann_ivf_recall")
def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    min_id = emb.agg(F.min("vec_id").alias("_mid"))
    q = emb.join(F.broadcast(min_id), F.col("vec_id") == F.col("_mid"))
    exact = (S.cosine_topk(emb, q, k=10)
             .select("vec_id").withColumn("_hit", F.lit(1)))
    per_probe = [
        S.ivf_topk(emb, q, k=10, nprobe=np)
        .select(F.lit(np).alias("nprobe"), "vec_id")
        for np in (1, 2, 4)
    ]
    allp = per_probe[0].unionByName(per_probe[1]).unionByName(per_probe[2])
    return (allp.join(F.broadcast(exact), "vec_id", "left")
            .groupBy("nprobe")
            .agg(F.count("_hit").alias("n_hits"))
            .select("nprobe", "n_hits",
                    F.round(F.col("n_hits") / 10.0, 4).alias("recall"))
            .orderBy("nprobe"))


ORACLE["ann_ivf_recall"] = f"""
WITH {_EMB_CTE},
cent AS (SELECT label, list(m ORDER BY i) AS c
         FROM (SELECT label, i, avg(v[i]) AS m
               FROM e, generate_series(1, 64) t(i) GROUP BY 1, 2)
         GROUP BY label),
pr AS (SELECT label,
              row_number() OVER (
                ORDER BY round(list_dot_product(c, qv)
                               / (sqrt(list_dot_product(c, c))
                                  * sqrt(list_dot_product(qv, qv))), 6) DESC,
                         label) AS r
       FROM cent, q),
np AS (SELECT unnest([1, 2, 4]) AS nprobe),
scored AS (SELECT vec_id, label,
                  round(list_dot_product(v, qv)
                        / (sqrt(list_dot_product(v, v))
                           * sqrt(list_dot_product(qv, qv))), 6) AS score
           FROM e, q),
ivf AS (SELECT nprobe, vec_id,
               row_number() OVER (PARTITION BY nprobe
                                  ORDER BY score DESC, vec_id) AS rk
        FROM scored JOIN pr USING (label) JOIN np ON pr.r <= np.nprobe),
ex AS (SELECT vec_id FROM scored ORDER BY score DESC, vec_id LIMIT 10)
SELECT nprobe,
       count(CASE WHEN vec_id IN (SELECT vec_id FROM ex) THEN 1 END) AS n_hits,
       round(count(CASE WHEN vec_id IN (SELECT vec_id FROM ex) THEN 1 END)
             / 10.0, 4) AS recall
FROM ivf WHERE rk <= 10 GROUP BY nprobe ORDER BY nprobe
"""


# ---------------------------------------------------------------------------
# kmv_type_jaccard: pairwise audience-overlap estimates from stored
# KMV sketches (Beyer et al. SIGMOD'07 intersection estimator) with
# the exact Jaccard alongside for calibration. The sketch-level ops
# never touch raw data — every join is a broadcast of <= k rows/group.
# ---------------------------------------------------------------------------
@_q("kmv_type_jaccard")
def kmv_type_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sk = K.kmv_sketch(ev, "event_type", "user_id", k=64)
    est = K.kmv_pair_jaccard(sk, "event_type", k=64)
    du = ev.select("event_type", "user_id").distinct()
    sizes = du.groupBy("event_type").agg(F.count(F.lit(1)).alias("_n"))
    inter = (du.alias("x").join(du.alias("y"), "user_id")
             .filter(F.col("x.event_type") < F.col("y.event_type"))
             .groupBy(F.col("x.event_type").alias("g_a"),
                      F.col("y.event_type").alias("g_b"))
             .agg(F.count(F.lit(1)).alias("_ni")))
    exact = (inter
             .join(sizes.select(F.col("event_type").alias("g_a"),
                                F.col("_n").alias("_na")), "g_a")
             .join(sizes.select(F.col("event_type").alias("g_b"),
                                F.col("_n").alias("_nb")), "g_b")
             .select("g_a", "g_b",
                     (F.round(F.col("_ni") / (F.col("_na")
                                              + F.col("_nb")
                                              - F.col("_ni"))
                              * F.lit(1_000_000.0))
                      / F.lit(1_000_000.0)).alias("exact_jaccard")))
    return (est.join(exact, ["g_a", "g_b"], "left")
            .select(F.col("g_a").alias("type_a"), F.col("g_b").alias("type_b"),
                    "n_union_sketch", "n_both", "est_union", "est_jaccard",
                    F.coalesce("exact_jaccard", F.lit(0.0))
                    .alias("exact_jaccard"))
            .orderBy("type_a", "type_b"))


ORACLE["kmv_type_jaccard"] = """
WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
h AS (SELECT event_type AS g,
             CAST('0x' || substr(md5('0:' || user_id), 1, 8) AS BIGINT) AS _h
      FROM du),
sk AS (SELECT g, _h FROM (
         SELECT g, _h, row_number() OVER (PARTITION BY g ORDER BY _h) AS rn
         FROM (SELECT DISTINCT g, _h FROM h))
       WHERE rn <= 64),
gs AS (SELECT DISTINCT g FROM sk),
pairs AS (SELECT a.g AS g_a, b.g AS g_b FROM gs a JOIN gs b ON a.g < b.g),
ph AS (SELECT DISTINCT g_a, g_b, _h
       FROM pairs JOIN sk ON sk.g = g_a OR sk.g = g_b),
usk AS (SELECT g_a, g_b, _h FROM (
          SELECT g_a, g_b, _h,
                 row_number() OVER (PARTITION BY g_a, g_b ORDER BY _h) AS rn
          FROM ph)
        WHERE rn <= 64),
inb AS (SELECT x.g AS g_a, y.g AS g_b, x._h
         FROM sk x JOIN sk y ON x._h = y._h AND x.g < y.g),
agg AS (SELECT g_a, g_b, max(u._h) AS kth, count(*) AS n_union_sketch,
               count(b._h) AS n_both
        FROM usk u LEFT JOIN inb b USING (g_a, g_b, _h)
        GROUP BY 1, 2),
est AS (SELECT g_a, g_b, n_union_sketch, n_both,
               round(CASE WHEN n_union_sketch < 64
                          THEN CAST(n_union_sketch AS DOUBLE)
                          ELSE 63.0 * 4294967296.0 / CAST(kth AS DOUBLE) END
                     * 10000.0) / 10000.0 AS est_union,
               round(CAST(n_both AS DOUBLE) / CAST(n_union_sketch AS DOUBLE)
                     * 1000000.0) / 1000000.0 AS est_jaccard
        FROM agg),
sz AS (SELECT event_type AS g, count(*) AS n FROM du GROUP BY 1),
ex AS (SELECT x.event_type AS g_a, y.event_type AS g_b, count(*) AS ni
       FROM du x JOIN du y ON x.user_id = y.user_id
                          AND x.event_type < y.event_type
       GROUP BY 1, 2)
SELECT est.g_a AS type_a, est.g_b AS type_b, n_union_sketch, n_both,
       est_union, est_jaccard,
       coalesce(round(CAST(ni AS DOUBLE) / (a.n + b.n - ni)
                      * 1000000.0) / 1000000.0, 0.0)
         AS exact_jaccard
FROM est
LEFT JOIN ex ON est.g_a = ex.g_a AND est.g_b = ex.g_b
LEFT JOIN sz a ON est.g_a = a.g
LEFT JOIN sz b ON est.g_b = b.g
ORDER BY type_a, type_b
"""


# ---------------------------------------------------------------------------
# embedding_dim_stats: per-dimension feature statistics over the
# vector corpus — the pre-normalization profile pass. Each component
# is snapped to integer micro-units (floor(v*1e6 + 0.5), identical in
# both engines) so the sums are exact and partition-order invariant;
# moments come out of the integer sums at the end.
# ---------------------------------------------------------------------------
@_q("embedding_dim_stats")
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = (emb.select(F.posexplode(F.col("embedding").cast("array<double>"))
                     .alias("dim0", "v"))
          .select((F.col("dim0") + 1).alias("dim"),
                  F.floor(F.col("v") * 1000000.0 + F.lit(0.5))
                  .cast("decimal(20,0)").alias("vm")))
    agg = (ex.groupBy("dim")
           .agg(F.count(F.lit(1)).alias("n_vecs"),
                F.sum("vm").alias("sx"),
                F.sum((F.col("vm") * F.col("vm")).cast("decimal(38,0)"))
                .alias("sxx"),
                F.min("vm").alias("mn"), F.max("vm").alias("mx")))
    sxd, sxxd = F.col("sx").cast("double"), F.col("sxx").cast("double")
    n = F.col("n_vecs")
    # all four stats leave the integer domain through ONE 0-dp round
    # (or a plain exact division) — never round(x, 6) of an arbitrary
    # double, whose half-way behavior is engine-divergent (the r9
    # sf0.1-tier bug class). mean: round(sum_micro/n)/1e6; std: the
    # sqrt is computed in micro units and 0-dp rounded (identical
    # IEEE sqrt of identical doubles in both engines); min/max are
    # exact micro integers divided by 1e6 (no round needed at all).
    return (agg.select(
        "dim", "n_vecs",
        (F.round(sxd / n) / F.lit(1000000.0)).alias("mean_v"),
        (F.round(F.sqrt((sxxd - sxd * sxd / n) / (n - 1)))
         / F.lit(1000000.0)).alias("std_v"),
        (F.col("mn").cast("double") / F.lit(1000000.0)).alias("min_v"),
        (F.col("mx").cast("double") / F.lit(1000000.0)).alias("max_v"))
        .orderBy("dim"))


ORACLE["embedding_dim_stats"] = """
WITH ex AS (SELECT i AS dim,
                   CAST(floor(v[i] * 1000000.0 + 0.5) AS BIGINT) AS vm
            FROM (SELECT embedding::DOUBLE[] AS v FROM embeddings),
                 generate_series(1, 64) t(i)),
agg AS (SELECT dim, count(*) AS n_vecs,
               CAST(sum(vm) AS DOUBLE) AS sxd,
               CAST(sum(vm * vm) AS DOUBLE) AS sxxd,
               min(vm) AS mn, max(vm) AS mx
        FROM ex GROUP BY 1)
SELECT dim, n_vecs,
       round(sxd / n_vecs) / 1000000.0 AS mean_v,
       round(sqrt((sxxd - sxd * sxd / n_vecs) / (n_vecs - 1)))
         / 1000000.0 AS std_v,
       CAST(mn AS DOUBLE) / 1000000.0 AS min_v,
       CAST(mx AS DOUBLE) / 1000000.0 AS max_v
FROM agg ORDER BY dim
"""


# ---------------------------------------------------------------------------
# shard_manifest: deterministic hash-sharding of the corpus into 16
# export shards, with the per-shard accounting a training-data export
# publishes (doc/token/byte totals, id range). Pure narrow map + one
# 16-group aggregate; at 100 TB this is the manifest stage before
# write.partitionBy("shard").
# ---------------------------------------------------------------------------
@_q("shard_manifest")
def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    shard = portable_hash32(F.col("doc_id"), seed=13) % 16
    return (docs.select(shard.alias("shard"),
                        token_count(F.col("text")).alias("_nt"),
                        F.col("n_chars"), F.col("doc_id"))
            .groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("_nt").alias("n_tokens"),
                 F.sum("n_chars").alias("n_bytes"),
                 F.min("doc_id").alias("min_doc_id"),
                 F.max("doc_id").alias("max_doc_id"))
            .orderBy("shard"))


ORACLE["shard_manifest"] = """
SELECT CAST('0x' || substr(md5('13:' || doc_id), 1, 8) AS BIGINT) % 16 AS shard,
       count(*) AS n_docs,
       CAST(sum(len(regexp_extract_all(lower(text), '\\w+'))) AS BIGINT)
         AS n_tokens,
       CAST(sum(n_chars) AS BIGINT) AS n_bytes,
       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
FROM documents GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# template_prefix_clusters: boilerplate/template detection — documents
# sharing their first-8-token prefix form a cluster (scraped template
# pages, license headers, form letters). One narrow hash + one
# groupBy; cluster count is bounded by distinct prefixes.
# ---------------------------------------------------------------------------
@_q("template_prefix_clusters")
def template_prefix_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pf = F.md5(F.concat_ws(" ", F.slice(tokens(F.col("text")), 1, 8)))
    return (docs.select(pf.alias("prefix_hash"), "doc_id", "source")
            .groupBy("prefix_hash")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct("source").alias("n_sources"),
                 F.min("doc_id").alias("rep_doc"))
            .filter(F.col("n_docs") >= 2)
            .orderBy(F.col("n_docs").desc(), "prefix_hash"))


ORACLE["template_prefix_clusters"] = """
WITH p AS (SELECT doc_id, source,
                  md5(array_to_string(
                        regexp_extract_all(lower(text), '\\w+')[1:8], ' '))
                    AS prefix_hash
           FROM documents)
SELECT prefix_hash, count(*) AS n_docs,
       count(DISTINCT source) AS n_sources, min(doc_id) AS rep_doc
FROM p GROUP BY 1 HAVING count(*) >= 2
ORDER BY n_docs DESC, prefix_hash
"""


# ---------------------------------------------------------------------------
# minhash_calibration: sketch-accuracy audit — for every exact-Jaccard
# pair >= 0.5, the MinHash-16 signature estimate (matching components
# / 16) against the exact Jaccard. The "measure, don't guess" query
# for the minhash recall dial: mean |err| bounds the threshold slack
# LSH banding needs.
# ---------------------------------------------------------------------------
@_q("minhash_calibration")
def minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel
    docs = load_table(spark, sf_dir, "documents")
    # ONE persisted shingle index feeds both the exact-Jaccard join
    # and the signature aggregation — the md5 digests dominate, so
    # sharing them halves the corpus-scan work.
    idx = (D._shingle_index(docs, "text", "doc_id", 3, None)
           .persist(StorageLevel.MEMORY_AND_DISK))
    pairs = D.prefix_filter_jaccard_pairs(docs, "text", "doc_id",
                                          n=3, threshold=0.5, index=idx)
    sig = D.minhash_signatures(docs, "text", "doc_id", n=3, num_hashes=16,
                               index=idx)
    sa = sig.select(F.col("id").alias("id_a"),
                    *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(16)])
    sb = sig.select(F.col("id").alias("id_b"),
                    *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(16)])
    matches = sum(
        (F.col(f"a_{i}") == F.col(f"b_{i}")).cast("int") for i in range(16))
    return (pairs.join(sa, "id_a").join(sb, "id_b")
            .select("id_a", "id_b",
                    F.col("jaccard").alias("exact_j"),
                    matches.alias("n_sig_match"))
            .withColumn("est_j", F.round(F.col("n_sig_match") / 16.0, 6))
            .withColumn("abs_err",
                        F.round(F.abs(F.col("est_j") - F.col("exact_j")), 6))
            .orderBy("id_a", "id_b"))


ORACLE["minhash_calibration"] = f"""
WITH {_SH_CTE},
common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
           FROM hs a JOIN hs b
             ON a.h1 = b.h1 AND a.h2 = b.h2 AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
pairs AS (SELECT id_a, id_b, round(c / (x.n + y.n - c), 6) AS exact_j
          FROM common JOIN sz x ON id_a = x.doc_id
                      JOIN sz y ON id_b = y.doc_id
          WHERE round(c / (x.n + y.n - c), 6) >= 0.5),
seeds AS (SELECT unnest(generate_series(0, 15)) AS seed),
mh AS (SELECT doc_id, seed, min((h1 + seed * h2) % 4294967296) AS mv
       FROM hs CROSS JOIN seeds GROUP BY 1, 2),
m AS (SELECT p.id_a, p.id_b, p.exact_j,
             count(CASE WHEN x.mv = y.mv THEN 1 END) AS n_sig_match
      FROM pairs p
      JOIN mh x ON x.doc_id = p.id_a
      JOIN mh y ON y.doc_id = p.id_b AND y.seed = x.seed
      GROUP BY 1, 2, 3)
SELECT id_a, id_b, exact_j, n_sig_match,
       round(n_sig_match / 16.0, 6) AS est_j,
       round(abs(round(n_sig_match / 16.0, 6) - exact_j), 6) AS abs_err
FROM m ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# curation_funnel_report: the end-to-end corpus-curation pipeline as
# ONE composed plan — language gate, Gopher rule filter, template
# (opening-prefix) dedup, duplicated-span cut, classifier threshold —
# reporting surviving docs/tokens after every stage. This is the
# composability flagship: each stage is the registered operator
# applied to the previous stage's survivors, and the whole funnel is
# still a declarative plan Catalyst can prune (the per-stage counts
# share one scan lineage; the survivor set is checkpointed once
# before the span stage, which walks it twice).
# ---------------------------------------------------------------------------
@_q("curation_funnel_report")
def curation_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import gopher_rule_flags
    docs = load_table(spark, sf_dir, "documents")
    flags = gopher_rule_flags(F.col("text"))
    all_pass = (flags["pass_wc"] & flags["pass_awl"]
                & flags["pass_stop"] & flags["pass_rep"])
    pf = F.md5(F.concat_ws(" ", F.slice(tokens(F.col("text")), 1, 8)))
    base = docs.select(
        "doc_id", "lang", "text",
        token_count(F.col("text")).alias("wc"),
        all_pass.alias("gopher_ok"), pf.alias("pf"))
    s1 = base.filter(F.col("lang") == "en")
    s2 = s1.filter(F.col("gopher_ok"))
    from pyspark.sql.window import Window as W
    s3 = (s2.withColumn("_rep", F.min("doc_id").over(W.partitionBy("pf")))
          .filter(F.col("doc_id") == F.col("_rep"))
          .localCheckpoint(eager=False))
    dup_tok = (duplicated_spans(s3, "text", "doc_id", k=10)
               .groupBy("doc_id")
               .agg(F.sum("span_tokens").alias("_dt")))
    s4 = (s3.join(dup_tok, "doc_id", "left")
          .filter(F.coalesce(F.col("_dt"), F.lit(0)) <= 0.3 * F.col("wc")))
    sc = hashed_linear_scores(s4, "text", "doc_id").select("doc_id", "score")
    s5 = s4.join(sc, "doc_id").filter(F.col("score") >= -0.05)

    def _stage(df, name):
        return df.agg(F.lit(name).alias("stage"),
                      F.count(F.lit(1)).alias("n_docs"),
                      F.coalesce(F.sum("wc"), F.lit(0)).alias("n_tokens"))

    out = (_stage(base, "00_ingest")
           .unionByName(_stage(s1, "01_lang"))
           .unionByName(_stage(s2, "02_gopher"))
           .unionByName(_stage(s3, "03_template_dedup"))
           .unionByName(_stage(s4, "04_span_clean"))
           .unionByName(_stage(s5, "05_classifier")))
    return out.orderBy("stage")


from ..operators import curation as _C  # noqa: E402  (oracle constants)

ORACLE["curation_funnel_report"] = f"""
WITH tok AS (SELECT doc_id, lang, regexp_extract_all(lower(text), '\\w+') AS t
             FROM documents),
m AS (SELECT *, len(t) AS wc,
         CASE WHEN len(t) > 0
              THEN list_aggregate(list_transform(t, x -> len(x)), 'sum') / len(t)
              ELSE 0.0 END AS awl,
         len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is','it'))) AS sw,
         CASE WHEN len(t) - 2 > 0
              THEN round(1.0 - len(list_distinct(list_transform(
                     generate_series(1, len(t) - 2),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])))
                   / (len(t) - 2), 6)
              ELSE 0.0 END AS rep,
         md5(array_to_string(t[1:8], ' ')) AS pf
      FROM tok),
s1 AS (SELECT * FROM m WHERE lang = 'en'),
s2 AS (SELECT * FROM s1
       WHERE wc BETWEEN {_C.MIN_TOKENS} AND {_C.MAX_TOKENS}
         AND awl BETWEEN {_C.MIN_AVG_TOKEN_LEN} AND {_C.MAX_AVG_TOKEN_LEN}
         AND sw >= {_C.MIN_STOPWORDS} AND rep <= {_C.MAX_REPETITION}),
s3 AS (SELECT * FROM s2
       WHERE doc_id = (SELECT min(doc_id) FROM s2 x WHERE x.pf = s2.pf)),
pos AS (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t)-9, 0))) AS i
        FROM s3),
win AS (SELECT doc_id, i, md5(array_to_string(t[i:i+9], ' ')) AS h FROM pos),
hot AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM win)
        GROUP BY h HAVING count(*) >= 2),
dup AS (SELECT doc_id, i FROM win SEMI JOIN hot USING (h)),
isl AS (SELECT doc_id, i,
               i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS g
        FROM dup),
sp AS (SELECT doc_id, sum(mx - mn + 10) AS dup_tok
       FROM (SELECT doc_id, g, min(i) AS mn, max(i) AS mx FROM isl GROUP BY 1, 2)
       GROUP BY 1),
s4 AS (SELECT s3.* FROM s3 LEFT JOIN sp USING (doc_id)
       WHERE coalesce(dup_tok, 0) <= 0.3 * wc),
w AS (SELECT doc_id,
             (CAST('0x' || substr(md5('11:' ||
                (CAST('0x' || substr(md5('7:' || tk), 1, 8) AS BIGINT) % 4096)
              ), 1, 8) AS BIGINT) % 2001) - 1000 AS wm
      FROM (SELECT doc_id, unnest(t) AS tk FROM s4)),
sc AS (SELECT doc_id,
              round(CAST(CAST(sum(wm) AS BIGINT) AS DOUBLE)
                    * 1000 / count(*)) / 1000000.0 AS score
       FROM w GROUP BY 1),
s5 AS (SELECT s4.* FROM s4 JOIN sc USING (doc_id) WHERE score >= -0.05)
SELECT * FROM (
  SELECT '00_ingest' AS stage, count(*) AS n_docs,
         CAST(coalesce(sum(wc), 0) AS BIGINT) AS n_tokens FROM m
  UNION ALL SELECT '01_lang', count(*), CAST(coalesce(sum(wc), 0) AS BIGINT) FROM s1
  UNION ALL SELECT '02_gopher', count(*), CAST(coalesce(sum(wc), 0) AS BIGINT) FROM s2
  UNION ALL SELECT '03_template_dedup', count(*), CAST(coalesce(sum(wc), 0) AS BIGINT) FROM s3
  UNION ALL SELECT '04_span_clean', count(*), CAST(coalesce(sum(wc), 0) AS BIGINT) FROM s4
  UNION ALL SELECT '05_classifier', count(*), CAST(coalesce(sum(wc), 0) AS BIGINT) FROM s5
) ORDER BY stage
"""


# ---------------------------------------------------------------------------
# dsir_importance_topk: DSIR (Xie et al. 2023) data selection — the 50
# documents whose unigram distribution best matches the src0 target
# domain, scored by average smoothed log-likelihood ratio carried as
# exact integer micro-nats. The log-ratio table is vocab-sized and
# broadcast; the corpus token stream is never shuffled.
# ---------------------------------------------------------------------------
# ccnet_perplexity_buckets: CCNet quality bucketing (Wenzek et al.
# 2020) — per-doc avg negative log-likelihood under a reference-slice
# unigram LM (integer micro-nats), corpus split into head/middle/tail
# terciles by VALUE thresholds (ceil(n/3)-th smallest via cumulative
# counts over distinct milli-nat scores — no ntile, no global sort
# whose input grows with the corpus).
# ---------------------------------------------------------------------------
@_q("ccnet_perplexity_buckets")
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranking import ccnet_perplexity_buckets as _op
    docs = load_table(spark, sf_dir, "documents")
    per = _op(docs.withColumn("_is_ref", F.col("source") == "src0"),
              "_is_ref")
    n = F.count(F.lit(1))
    return (per.groupBy("bucket")
            .agg(n.alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens"),
                 (F.round(F.sum("nll_milli").cast("double") / n)
                  / 1000.0).alias("avg_nll"),
                 (F.min("nll_milli") / 1000.0).alias("min_nll"),
                 (F.max("nll_milli") / 1000.0).alias("max_nll"))
            .orderBy("bucket"))


ORACLE["ccnet_perplexity_buckets"] = """
WITH tok AS (SELECT doc_id, source = 'src0' AS ref,
                    unnest(regexp_extract_all(lower(text), '\\w+')) AS tk
             FROM documents),
tot AS (SELECT count(DISTINCT tk) AS vv,
               count(*) FILTER (WHERE ref) AS nr FROM tok),
lp AS (SELECT tk,
              CAST(round(ln((count(*) FILTER (WHERE ref) + 1.0)
                            / CAST(nr + vv AS DOUBLE))
                         * 1000000.0, 0) AS BIGINT) AS lp
       FROM tok, tot GROUP BY tk, nr, vv),
d AS (SELECT doc_id, count(*) AS n_tokens,
             CAST(round(-CAST(sum(lp) AS DOUBLE)
                        / (count(*) * 1000.0)) AS BIGINT) AS nll_milli
      FROM tok JOIN lp USING (tk) GROUP BY 1),
n AS (SELECT count(*) AS n FROM d),
cum AS (SELECT nll_milli,
               sum(c) OVER (ORDER BY nll_milli
                            ROWS UNBOUNDED PRECEDING) AS cum
        FROM (SELECT nll_milli, count(*) AS c FROM d GROUP BY 1)),
thr AS (SELECT min(CASE WHEN cum >= (n + 2) // 3
                        THEN nll_milli END) AS t1,
               min(CASE WHEN cum >= (n * 2 + 2) // 3
                        THEN nll_milli END) AS t2
        FROM cum, n),
b AS (SELECT doc_id, n_tokens, nll_milli,
             CASE WHEN nll_milli <= t1 THEN 'head'
                  WHEN nll_milli <= t2 THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM d, thr)
SELECT bucket, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       round(CAST(sum(nll_milli) AS DOUBLE) / count(*)) / 1000.0
         AS avg_nll,
       min(nll_milli) / 1000.0 AS min_nll,
       max(nll_milli) / 1000.0 AS max_nll
FROM b GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
@_q("dsir_importance_topk")
def dsir_importance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranking import dsir_importance_scores
    docs = load_table(spark, sf_dir, "documents")
    scored = dsir_importance_scores(
        docs.withColumn("_is_tgt", F.col("source") == "src0"),
        "_is_tgt", "text", "doc_id")
    return (scored.withColumnRenamed("id", "doc_id")
            .join(docs.select("doc_id", "source"), "doc_id")
            .select("doc_id", "source", "n_tokens", "sum_lr_micro", "avg_lr")
            .orderBy(F.col("avg_lr").desc(), "doc_id")
            .limit(50))


ORACLE["dsir_importance_topk"] = """
WITH tok AS (SELECT doc_id, source = 'src0' AS tgt,
                    unnest(regexp_extract_all(lower(text), '\\w+')) AS tk
             FROM documents),
tot AS (SELECT count(DISTINCT tk) AS vv, count(*) AS na,
               count(*) FILTER (WHERE tgt) AS nt
        FROM tok),
cnt AS (SELECT tk, count(*) AS ca, count(*) FILTER (WHERE tgt) AS ct
        FROM tok GROUP BY 1),
lam AS (SELECT tk,
               CAST(round((ln((ct + 1.0) / CAST(nt + vv AS DOUBLE))
                           - ln((ca + 1.0) / CAST(na + vv AS DOUBLE)))
                          * 1000000.0, 0) AS BIGINT) AS lr
        FROM cnt, tot),
d AS (SELECT doc_id, count(*) AS n_tokens,
             CAST(sum(lr) AS BIGINT) AS sum_lr_micro
      FROM tok JOIN lam USING (tk) GROUP BY 1)
SELECT d.doc_id, docs.source, n_tokens, sum_lr_micro,
       round(CAST(sum_lr_micro AS DOUBLE) / n_tokens) / 1000000.0
         AS avg_lr
FROM d JOIN documents docs ON d.doc_id = docs.doc_id
ORDER BY avg_lr DESC, d.doc_id
LIMIT 50
"""


# ---------------------------------------------------------------------------
# rag_chunking: overlapping fixed-width retrieval chunks (64 tokens,
# stride 48) with deterministic ids — the document-splitting pass in
# front of an embedding/RAG indexer. Pure narrow plan: strided
# sequence + slice per row, no shuffle until the output sort.
# ---------------------------------------------------------------------------
@_q("rag_chunking")
def rag_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select("doc_id", tokens(F.col("text")).alias("_t"))
    t, width, stride = F.col("_t"), 64, 48
    starts = (F.when(F.size(t) >= 1,
                     F.sequence(F.lit(1), F.size(t), F.lit(stride)))
              .otherwise(F.array().cast("array<int>")))
    chunk = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start_tok"),
            F.size(F.slice(t, s, width)).alias("n_chunk_tokens"),
            F.md5(F.array_join(F.slice(t, s, width), " ")).alias("chunk_hash")))
    return (toked.select("doc_id", F.posexplode(chunk).alias("idx", "c"))
            .select("doc_id", (F.col("idx") + 1).alias("chunk_idx"),
                    F.col("c.start_tok").alias("start_tok"),
                    F.col("c.n_chunk_tokens").alias("n_chunk_tokens"),
                    F.col("c.chunk_hash").alias("chunk_hash"))
            .orderBy("doc_id", "chunk_idx"))


ORACLE["rag_chunking"] = """
WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS t
             FROM documents),
st AS (SELECT doc_id, t,
              unnest(generate_series(1, len(t), 48)) AS start_tok
       FROM tok WHERE len(t) >= 1)
SELECT doc_id,
       row_number() OVER (PARTITION BY doc_id ORDER BY start_tok)
         AS chunk_idx,
       start_tok,
       len(t[start_tok:start_tok+63]) AS n_chunk_tokens,
       md5(array_to_string(t[start_tok:start_tok+63], ' ')) AS chunk_hash
FROM st
ORDER BY doc_id, chunk_idx
"""


# ---------------------------------------------------------------------------
# unigram_kl_by_source: distribution-drift monitor — per-source
# truncated-support KL divergence (tokens observed in the source,
# add-one smoothed against the corpus unigram distribution). Per-token
# terms are quantized to integer nano-nats and summed exactly, so the
# statistic is partition-order invariant; coverage (share of corpus
# vocabulary the source uses) rides along.
# ---------------------------------------------------------------------------
@_q("unigram_kl_by_source")
def unigram_kl_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(tokens(F.col("text"))).alias("_tk"))
    totals = tok.agg(F.countDistinct("_tk").alias("_vv"),
                     F.count(F.lit(1)).alias("_na"))
    src_tot = tok.groupBy("source").agg(F.count(F.lit(1)).alias("_ns"))
    corpus_cnt = tok.groupBy("_tk").agg(F.count(F.lit(1)).alias("_ca"))
    src_cnt = tok.groupBy("source", "_tk").agg(F.count(F.lit(1)).alias("_cs"))
    joined = (src_cnt.join(F.broadcast(corpus_cnt), "_tk")
              .join(F.broadcast(src_tot), "source")
              .crossJoin(F.broadcast(totals)))
    p_s = (F.col("_cs") + 1.0) / (F.col("_ns") + F.col("_vv")).cast("double")
    p_a = (F.col("_ca") + 1.0) / (F.col("_na") + F.col("_vv")).cast("double")
    term = F.round(p_s * F.log(p_s / p_a) * 1e9, 0).cast("long")
    return (joined.select("source", term.alias("_term"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("vocab_used"),
                 F.sum("_term").alias("kl_nano"))
            .join(F.broadcast(src_tot.withColumnRenamed("_ns", "n_tokens")),
                  "source")
            .select("source", "n_tokens", "vocab_used", "kl_nano",
                    # exact-integer micro trick: nano -> micro is
                    # one 0-dp round of an integer/1000 quotient
                    (F.round(F.col("kl_nano").cast("double") / 1e3)
                     / F.lit(1_000_000.0)).alias("kl"))
            .orderBy("source"))


ORACLE["unigram_kl_by_source"] = """
WITH tok AS (SELECT source, unnest(regexp_extract_all(lower(text), '\\w+'))
               AS tk
             FROM documents),
tot AS (SELECT count(DISTINCT tk) AS vv, count(*) AS na FROM tok),
st AS (SELECT source, count(*) AS ns FROM tok GROUP BY 1),
ca AS (SELECT tk, count(*) AS ca FROM tok GROUP BY 1),
cs AS (SELECT source, tk, count(*) AS cs FROM tok GROUP BY 1, 2),
terms AS (SELECT source,
                 CAST(round(((cs + 1.0) / (ns + vv))
                            * ln(((cs + 1.0) / (ns + vv))
                                 / ((ca + 1.0) / (na + vv)))
                            * 1e9, 0) AS BIGINT) AS term
          FROM cs JOIN ca USING (tk) JOIN st USING (source), tot),
agg AS (SELECT source, count(*) AS vocab_used,
               CAST(sum(term) AS BIGINT) AS kl_nano
        FROM terms GROUP BY 1)
SELECT source, ns AS n_tokens, vocab_used, kl_nano,
       round(CAST(kl_nano AS DOUBLE) / 1e3) / 1000000.0 AS kl
FROM agg JOIN st USING (source)
ORDER BY source
"""


# ---------------------------------------------------------------------------
# ann_hard_negatives: contrastive-training hard negatives — per query
# (the 4 smallest vec_ids), the 5 most-similar vectors with a
# DIFFERENT label, mined in one broadcast corpus scan.
# ---------------------------------------------------------------------------
@_q("ann_hard_negatives")
def ann_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = (emb.select(F.col("vec_id").alias("query_id"),
                          "label", "embedding")
               .orderBy("query_id").limit(4))
    return S.batch_hard_negatives(emb, queries, k=5)


ORACLE["ann_hard_negatives"] = """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv
      FROM e ORDER BY vec_id LIMIT 4),
scored AS (SELECT query_id, e.vec_id, e.label,
                  round(list_dot_product(e.v, q.qv)
                        / (sqrt(list_dot_product(e.v, e.v))
                           * sqrt(list_dot_product(q.qv, q.qv))), 6) AS score
           FROM e CROSS JOIN q
           WHERE e.label <> q.qlabel),
ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                        ORDER BY score DESC, vec_id) AS rnk
           FROM scored)
SELECT query_id, rnk, vec_id, label, score FROM ranked WHERE rnk <= 5
"""


# ---------------------------------------------------------------------------
# embedding_dim_corr_top20: strongest pairwise dimension correlations
# across the vector corpus — the redundancy screen before
# dimensionality reduction / whitening. Co-moments accumulate as
# exact integer micro-unit products (DECIMAL(38,0) sums — partition-
# order invariant); Pearson assembles from the integer sums in double
# only at the end. Pair space is dims²/2 = 2016 structs per row,
# flat-mapped and aggregated with map-side combine — corpus rows
# stream through once.
# ---------------------------------------------------------------------------
@_q("embedding_dim_corr_top20")
def embedding_dim_corr_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    vm = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda v: F.floor(v * 1000000.0 + F.lit(0.5)).cast("long"))
    # flat (vec, dim, value) stream self-joined on the vector id —
    # small expressions keep whole-stage codegen fast (a literal
    # 2016-struct flat-map was measured at ~7s of pure compile time)
    flat = (emb.select("vec_id", F.posexplode(vm).alias("d0", "v"))
            .select("vec_id", (F.col("d0") + 1).alias("d"), "v")
            .localCheckpoint(eager=True))
    a = flat.select("vec_id", F.col("d").alias("i"), F.col("v").alias("x"))
    b = flat.select("vec_id", F.col("d").alias("j"), F.col("v").alias("y"))
    ex = (a.join(b, "vec_id")
          .filter(F.col("i") < F.col("j"))
          .select("i", "j",
                  F.col("x").cast("decimal(20,0)").alias("x"),
                  F.col("y").cast("decimal(20,0)").alias("y"),
                  (F.col("x") * F.col("y")).cast("decimal(38,0)").alias("xy")))
    agg = (ex.groupBy("i", "j")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                F.sum(F.col("x") * F.col("x")).alias("sxx"),
                F.sum(F.col("y") * F.col("y")).alias("syy"),
                F.sum("xy").alias("sxy")))
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    corr = ((n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
    return (agg.select(F.col("i").alias("dim_a"), F.col("j").alias("dim_b"),
                       F.round(corr, 6).alias("corr"))
            .orderBy(F.abs(F.col("corr")).desc(), "dim_a", "dim_b")
            .limit(20))


ORACLE["embedding_dim_corr_top20"] = """
WITH e AS (SELECT list_transform(embedding::DOUBLE[],
                                 v -> CAST(floor(v * 1000000.0 + 0.5)
                                           AS BIGINT)) AS vm
           FROM embeddings),
px AS (SELECT i, j, vm[i] AS x, vm[j] AS y
       FROM e, generate_series(1, 63) s(i), generate_series(2, 64) t(j)
       WHERE j > i),
agg AS (SELECT i, j, count(*) AS n,
               CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
               CAST(sum(x * x) AS DOUBLE) AS sxx,
               CAST(sum(y * y) AS DOUBLE) AS syy,
               CAST(sum(x * y) AS DOUBLE) AS sxy
        FROM px GROUP BY 1, 2)
SELECT i AS dim_a, j AS dim_b,
       round((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr
FROM agg
ORDER BY abs(round((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)) DESC,
         dim_a, dim_b
LIMIT 20
"""

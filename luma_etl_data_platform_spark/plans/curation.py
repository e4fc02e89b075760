"""Corpus-curation queries: Gopher-style quality filtering, stratified
sampling, domain-mixture weighting, and sequence packing — the
selection/mixing layer of an LLM training-data pipeline, each paired
with a DuckDB oracle that reproduces the identical result (portable
md5 hashing, explicit thresholds, identical arithmetic order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as X
from ..operators import curation as C
from ..sources.tables import load_table

ORACLE: dict[str, str] = {}

_TOK_CTE = (
    "tok AS (SELECT doc_id, lang, source,"
    " regexp_extract_all(lower(text), '\\w+') AS t FROM documents)"
)


# gopher_quality_filter: per-source pass rates of the four rule-based
# quality gates (token-count bounds, mean-token-length bounds, minimum
# stopword hits, repetition cap). Narrow map stage + one groupBy —
# the 100-TB corpus is scanned once and only per-source counters move.
def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    flags = C.gopher_rule_flags(F.col("text"))
    flagged = docs.select("source", *[v.alias(k) for k, v in flags.items()])
    all_pass = F.col("pass_wc") & F.col("pass_awl") & F.col("pass_stop") & F.col("pass_rep")
    return (
        flagged.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.count(F.when(F.col("pass_wc"), 1)).alias("n_pass_wc"),
             F.count(F.when(F.col("pass_awl"), 1)).alias("n_pass_awl"),
             F.count(F.when(F.col("pass_stop"), 1)).alias("n_pass_stop"),
             F.count(F.when(F.col("pass_rep"), 1)).alias("n_pass_rep"),
             F.count(F.when(all_pass, 1)).alias("n_pass_all"))
        .orderBy("source")
    )


ORACLE["gopher_quality_filter"] = f"""
WITH {_TOK_CTE},
m AS (SELECT source, len(t) AS wc,
             CASE WHEN len(t) > 0
                  THEN list_aggregate(list_transform(t, x -> len(x)), 'sum') / len(t)
                  ELSE 0.0 END AS awl,
             len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is','it'))) AS sw,
             CASE WHEN len(t) - 2 > 0
                  THEN round(1.0 - len(list_distinct(list_transform(
                         generate_series(1, len(t) - 2),
                         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])))
                       / (len(t) - 2), 6)
                  ELSE 0.0 END AS rep
      FROM tok),
f AS (SELECT source,
             wc BETWEEN {C.MIN_TOKENS} AND {C.MAX_TOKENS} AS p_wc,
             awl BETWEEN {C.MIN_AVG_TOKEN_LEN} AND {C.MAX_AVG_TOKEN_LEN} AS p_awl,
             sw >= {C.MIN_STOPWORDS} AS p_stop,
             rep <= {C.MAX_REPETITION} AS p_rep
      FROM m)
SELECT source, count(*) AS n_docs,
       count(*) FILTER (WHERE p_wc) AS n_pass_wc,
       count(*) FILTER (WHERE p_awl) AS n_pass_awl,
       count(*) FILTER (WHERE p_stop) AS n_pass_stop,
       count(*) FILTER (WHERE p_rep) AS n_pass_rep,
       count(*) FILTER (WHERE p_wc AND p_awl AND p_stop AND p_rep) AS n_pass_all
FROM f GROUP BY 1 ORDER BY 1
"""


# Per-language sample rates (integer percent). de is upsampled, zh
# falls through to the default — stated here so the oracle quotes the
# identical CASE chain.
_STRATA_PCT = {"en": 20, "es": 10, "fr": 5, "de": 50}
_DEFAULT_PCT = 2


def stratified_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified Bernoulli sample over documents,
    stratified by ``lang`` with per-stratum rates. Membership is a
    pure hash function of (lang, doc_id) — no RNG, no count-first
    pass, reproducible at any partitioning."""
    docs = load_table(spark, sf_dir, "documents")
    keep = C.stratified_sample_flag(
        F.col("lang"), F.col("doc_id"), _STRATA_PCT, _DEFAULT_PCT)
    return (
        docs.select("lang", keep.alias("keep"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.count(F.when(F.col("keep"), 1)).alias("n_sampled"))
        .orderBy("lang")
    )


ORACLE["stratified_sample_stats"] = f"""
WITH m AS (
  SELECT lang,
         CAST('0x' || substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 8)
              AS BIGINT) % 100 AS bucket,
         CASE lang WHEN 'de' THEN 50 WHEN 'en' THEN 20 WHEN 'es' THEN 10
                   WHEN 'fr' THEN 5 ELSE {_DEFAULT_PCT} END AS rate
  FROM documents)
SELECT lang, count(*) AS n_docs,
       count(*) FILTER (WHERE bucket < rate) AS n_sampled
FROM m GROUP BY 1 ORDER BY 1
"""


def domain_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source upsampling weights flattening the corpus to a
    uniform token mixture (weight = target_share / actual_share)."""
    docs = load_table(spark, sf_dir, "documents")
    return (C.domain_mix_weights(docs, "source", X.token_count(F.col("text")))
            .orderBy("source"))


ORACLE["domain_mix_weights"] = f"""
WITH {_TOK_CTE},
per AS (SELECT source, count(*) AS n_docs,
               CAST(sum(len(t)) AS BIGINT) AS domain_tokens
        FROM tok GROUP BY 1),
tot AS (SELECT CAST(sum(domain_tokens) AS BIGINT) AS total,
               count(*) AS n_dom FROM per)
SELECT source, n_docs, domain_tokens,
       round(domain_tokens / total, 6) AS token_share,
       round((1.0 / n_dom) / (domain_tokens / total), 6) AS mix_weight
FROM per CROSS JOIN tot ORDER BY 1
"""


_CTX_LEN = 512
_PACK_BUCKETS = 32


def sequence_packing_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing of documents into 512-token training
    chunks across 32 independent hash-bucket streams; one row per
    (bucket, chunk) with the docs packed and tokens filled."""
    docs = load_table(spark, sf_dir, "documents")
    return (C.pack_sequences(docs, "doc_id", X.token_count(F.col("text")),
                             ctx_len=_CTX_LEN, n_buckets=_PACK_BUCKETS)
            .orderBy("bucket", "chunk"))


ORACLE["sequence_packing_bins"] = f"""
WITH {_TOK_CTE},
h AS (SELECT doc_id, len(t) AS ntok,
             CAST('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 8)
                  AS BIGINT) AS hv
      FROM tok),
c AS (SELECT hv % {_PACK_BUCKETS} AS bucket, doc_id, ntok,
             sum(ntok) OVER (PARTITION BY hv % {_PACK_BUCKETS}
                             ORDER BY hv, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM h)
SELECT bucket, CAST(floor((cum - ntok) / {_CTX_LEN}) AS BIGINT) AS chunk,
       count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS chunk_tokens
FROM c GROUP BY 1, 2 ORDER BY 1, 2
"""


QUERIES = {
    "gopher_quality_filter": gopher_quality_filter,
    "stratified_sample_stats": stratified_sample_stats,
    "domain_mix_weights": domain_mix_weights,
    "sequence_packing_bins": sequence_packing_bins,
}


# temperature_mix_shares: α=0.5 temperature-flattened domain sampling
# shares. sqrt (not pow) keeps the per-domain transform correctly
# rounded in both engines; the normalizer is an exact DECIMAL sum.
def temperature_mix_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return C.temperature_mix_weights(docs, "source",
                                     X.token_count(F.col("text")))


ORACLE["temperature_mix_shares"] = """
WITH tok AS (SELECT source, regexp_extract_all(lower(text), '\\w+') AS t
             FROM documents),
per AS (SELECT source, count(*) AS n_docs,
               CAST(sum(len(t)) AS BIGINT) AS domain_tokens
        FROM tok GROUP BY 1),
w AS (SELECT *, sum(domain_tokens) OVER () AS _total FROM per),
sq AS (SELECT *, CAST(sqrt(domain_tokens / _total) AS DECIMAL(28,12)) AS _s
       FROM w),
nm AS (SELECT *, sum(_s) OVER () AS _norm FROM sq)
SELECT source, n_docs, domain_tokens,
       round(domain_tokens / _total, 6) AS token_share,
       round(CAST(_s AS DOUBLE) / CAST(_norm AS DOUBLE), 6) AS temp_share,
       round((CAST(_s AS DOUBLE) / CAST(_norm AS DOUBLE))
             / (domain_tokens / _total), 6) AS mix_weight
FROM nm
"""

QUERIES["temperature_mix_shares"] = temperature_mix_shares

"""Round-3 corpus-quality batch: Gopher repetition diagnostics,
BPE tokenizer-training pair statistics, count-min-sketch frequency
monitoring, and probability-proportional-to-size sampling.

Beyond-reference surface (the reference ERP ETL tool has none of
these — `SURVEY.md §2` "(absent)" families). Every query pairs the
Spark plan with a DuckDB oracle that reproduces the result exactly:
counts are BIGINT, hashes are the portable md5 primitive, fractions
divide exact integers and round to 6 dp, and the CMS priorities are
pure integer arithmetic — so even the *sketch estimates* and the
*sample membership* hash-match an independent engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import sketches as K
from ..operators.bpe import bpe_pair_counts
from ..operators.curation import repetition_profile
from ..operators.sampling import weighted_sample
from ..sources.tables import load_table

ORACLE: dict[str, str] = {}
QUERIES: dict = {}


def _q(name):
    def reg(fn):
        QUERIES[name] = fn
        return fn
    return reg


# ---------------------------------------------------------------------------
# repetition_profile_docs: Gopher repetition rules (Rae et al. 2021
# A1.1) — top-n-gram and duplicated-n-gram token fractions per doc.
# ---------------------------------------------------------------------------
@_q("repetition_profile_docs")
def repetition_profile_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (repetition_profile(docs, "text", "doc_id", ns=(2, 3))
            .orderBy("doc_id"))


ORACLE["repetition_profile_docs"] = """
WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS t
             FROM documents),
g AS (
  SELECT doc_id, len(t) AS nt, 2 AS n, array_to_string(t[i:i+1], ' ') AS gram
  FROM (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t)-1, 0))) AS i
        FROM tok)
  UNION ALL
  SELECT doc_id, len(t) AS nt, 3 AS n, array_to_string(t[i:i+2], ' ') AS gram
  FROM (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t)-2, 0))) AS i
        FROM tok)
),
c AS (SELECT doc_id, nt, n, gram, count(*) AS c FROM g GROUP BY 1, 2, 3, 4),
p AS (SELECT doc_id, nt, n,
             round(max(c) * n / CAST(nt AS DOUBLE), 6) AS top_frac,
             round(coalesce(sum(c) FILTER (WHERE c >= 2), 0) * n
                   / CAST(nt AS DOUBLE), 6) AS dup_frac
      FROM c GROUP BY 1, 2, 3)
SELECT doc_id, max(nt) AS n_tokens,
       max(CASE WHEN n = 2 THEN top_frac END) AS top2gram_frac,
       max(CASE WHEN n = 2 THEN dup_frac END) AS dup2gram_frac,
       max(CASE WHEN n = 3 THEN top_frac END) AS top3gram_frac,
       max(CASE WHEN n = 3 THEN dup_frac END) AS dup3gram_frac
FROM p GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# bpe_merge_pairs: first-iteration BPE merge candidates — corpus-wide
# adjacent symbol-pair frequencies off the vocabulary table.
# ---------------------------------------------------------------------------
@_q("bpe_merge_pairs")
def bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (bpe_pair_counts(docs, "text")
            .orderBy(F.desc("pair_count"), "left", "right")
            .limit(30))


ORACLE["bpe_merge_pairs"] = """
WITH w AS (SELECT tk AS word, count(*) AS n_word
           FROM (SELECT unnest(regexp_extract_all(lower(text), '\\w+')) AS tk
                 FROM documents)
           GROUP BY tk),
p AS (SELECT n_word,
             substr(word, i, 1) AS l,
             CASE WHEN i < len(word) THEN substr(word, i + 1, 1)
                  ELSE '</w>' END AS r
      FROM (SELECT word, n_word,
                   unnest(generate_series(1, len(word))) AS i FROM w))
SELECT l AS "left", r AS "right", CAST(sum(n_word) AS BIGINT) AS pair_count
FROM p GROUP BY 1, 2
ORDER BY pair_count DESC, "left", "right" LIMIT 30
"""


# ---------------------------------------------------------------------------
# cms_heavy_hitters: count-min-sketch estimates vs exact counts for
# the 20 most active users — the sketch-accuracy audit for the
# standing frequency monitor (estimates are one-sided: over_est >= 0).
# ---------------------------------------------------------------------------
@_q("cms_heavy_hitters")
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    lanes = K.cms_lanes(events, "user_id", depth=4, width=1024)
    exact = (events.groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n_events")))
    top = (exact.orderBy(F.desc("n_events"), "user_id").limit(20)
           .localCheckpoint(eager=True))
    est = (K.cms_estimate(lanes, top, "user_id", depth=4, width=1024)
           .withColumn("user_id", F.col("user_id").cast("long")))
    return (top.join(est, "user_id")
            .select("user_id", "n_events", "cms_est",
                    (F.col("cms_est") - F.col("n_events")).alias("over_est"))
            .orderBy(F.desc("n_events"), "user_id"))


ORACLE["cms_heavy_hitters"] = """
WITH r AS (SELECT unnest(generate_series(0, 3)) AS r),
lanes AS (
  SELECT r.r,
         CAST('0x' || substr(md5(r.r || ':' || CAST(user_id AS VARCHAR)),
                             1, 8) AS BIGINT) % 1024 AS b,
         count(*) AS cnt
  FROM events, r GROUP BY 1, 2),
exact AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1),
top AS (SELECT user_id, n_events FROM exact
        ORDER BY n_events DESC, user_id LIMIT 20),
probe AS (
  SELECT t.user_id, r.r,
         CAST('0x' || substr(md5(r.r || ':' || CAST(t.user_id AS VARCHAR)),
                             1, 8) AS BIGINT) % 1024 AS b
  FROM top t, r),
est AS (SELECT p.user_id, min(coalesce(l.cnt, 0)) AS cms_est
        FROM probe p LEFT JOIN lanes l ON p.r = l.r AND p.b = l.b
        GROUP BY 1)
SELECT t.user_id, CAST(t.n_events AS BIGINT) AS n_events,
       CAST(e.cms_est AS BIGINT) AS cms_est,
       CAST(e.cms_est - t.n_events AS BIGINT) AS over_est
FROM top t JOIN est e USING (user_id)
ORDER BY n_events DESC, user_id
"""


# ---------------------------------------------------------------------------
# weighted_sample_docs: sequential-Poisson PPS sample of documents,
# weight = n_chars — longer documents proportionally more likely;
# membership is exact integer arithmetic, reproducible anywhere.
# ---------------------------------------------------------------------------
@_q("weighted_sample_docs")
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (weighted_sample(docs, "doc_id", "n_chars", k=200)
            .select("doc_id", "source", "n_chars",
                    F.col("_priority").alias("priority"))
            .orderBy("priority", "doc_id"))


ORACLE["weighted_sample_docs"] = """
SELECT doc_id, source, n_chars,
       (CAST('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 8)
             AS BIGINT) * 1000000) // n_chars AS priority
FROM documents
WHERE n_chars > 0
ORDER BY priority, doc_id LIMIT 200
"""

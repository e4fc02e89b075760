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

from ..core.localframe import local_frame

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


# ---------------------------------------------------------------------------
# shingle_novelty_docs: per-document novelty — fraction of a doc's
# distinct 3-shingles that first appear (by doc_id order) in that
# doc. The "is the corpus still adding information" growth curve.
# ---------------------------------------------------------------------------
@_q("shingle_novelty_docs")
def shingle_novelty_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import shingles
    docs = load_table(spark, sf_dir, "documents")
    sh = (docs.select("doc_id", F.explode(shingles(F.col("text"), 3))
                      .alias("_s")))
    firsts = sh.groupBy("_s").agg(F.min("doc_id").alias("_first"))
    per = (sh.join(firsts, "_s")
           .groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("n_shingles"),
                F.sum(F.when(F.col("_first") == F.col("doc_id"), 1)
                      .otherwise(0)).alias("n_novel")))
    return (per.join(docs.select("doc_id", "source"), "doc_id")
            .select("doc_id", "source", "n_shingles", "n_novel",
                    (F.round(F.col("n_novel").cast("double")
                             * F.lit(1_000_000.0)
                             / F.col("n_shingles").cast("double"))
                     / F.lit(1_000_000.0)).alias("novelty"))
            .orderBy("doc_id"))


ORACLE["shingle_novelty_docs"] = """
WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS t
             FROM documents),
sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
       FROM (SELECT doc_id, t,
                    unnest(generate_series(1, greatest(len(t)-2, 0))) AS i
             FROM tok)),
firsts AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY 1),
per AS (SELECT doc_id, count(*) AS n_sh,
               sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS n_novel
        FROM sh JOIN firsts USING (s) GROUP BY 1)
SELECT p.doc_id, d.source, CAST(n_sh AS BIGINT) AS n_shingles,
       CAST(n_novel AS BIGINT) AS n_novel,
       round(CAST(n_novel AS DOUBLE) * 1000000.0
             / CAST(n_sh AS DOUBLE)) / 1000000.0 AS novelty
FROM per p JOIN documents d ON p.doc_id = d.doc_id
ORDER BY p.doc_id
"""


# ---------------------------------------------------------------------------
# source_overlap_matrix: pairwise shingle overlap between sources —
# the cross-corpus contamination / redundancy audit before mixing.
# ---------------------------------------------------------------------------
@_q("source_overlap_matrix")
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import shingles
    docs = load_table(spark, sf_dir, "documents")
    ss = (docs.select("source", F.explode(shingles(F.col("text"), 3))
                      .alias("_s"))
          .distinct()
          .localCheckpoint(eager=True))
    totals = ss.groupBy("source").agg(F.count(F.lit(1)).alias("_n"))
    pairs = (ss.select(F.col("source").alias("source_a"), "_s")
             .join(ss.select(F.col("source").alias("source_b"), "_s"), "_s")
             .filter(F.col("source_a") < F.col("source_b"))
             .groupBy("source_a", "source_b")
             .agg(F.count(F.lit(1)).alias("n_common")))
    ta = totals.select(F.col("source").alias("source_a"),
                       F.col("_n").alias("n_a"))
    tb = totals.select(F.col("source").alias("source_b"),
                       F.col("_n").alias("n_b"))
    return (pairs.join(F.broadcast(ta), "source_a")
            .join(F.broadcast(tb), "source_b")
            .select("source_a", "source_b", "n_a", "n_b", "n_common",
                    (F.round(F.col("n_common").cast("double")
                             * F.lit(1_000_000.0)
                             / (F.col("n_a") + F.col("n_b")
                                - F.col("n_common")).cast("double"))
                     / F.lit(1_000_000.0)).alias("jaccard"))
            .orderBy("source_a", "source_b"))


ORACLE["source_overlap_matrix"] = """
WITH tok AS (SELECT source, regexp_extract_all(lower(text), '\\w+') AS t
             FROM documents),
ss AS (SELECT DISTINCT source, array_to_string(t[i:i+2], ' ') AS s
       FROM (SELECT source, t,
                    unnest(generate_series(1, greatest(len(t)-2, 0))) AS i
             FROM tok)),
tot AS (SELECT source, count(*) AS n FROM ss GROUP BY 1),
pairs AS (SELECT a.source AS source_a, b.source AS source_b,
                 count(*) AS n_common
          FROM ss a JOIN ss b ON a.s = b.s AND a.source < b.source
          GROUP BY 1, 2)
SELECT source_a, source_b,
       CAST(ta.n AS BIGINT) AS n_a, CAST(tb.n AS BIGINT) AS n_b,
       CAST(n_common AS BIGINT) AS n_common,
       round(CAST(n_common AS DOUBLE) * 1000000.0
             / CAST(ta.n + tb.n - n_common AS DOUBLE)) / 1000000.0
         AS jaccard
FROM pairs JOIN tot ta ON ta.source = source_a
           JOIN tot tb ON tb.source = source_b
ORDER BY source_a, source_b
"""


# ---------------------------------------------------------------------------
# budget_pack_selection: ship exactly <= 20k tokens of the
# best-scoring documents (hashing-trick classifier score), running
# total via the bucketed two-phase prefix sum — no global window.
# ---------------------------------------------------------------------------
_PACK_BUDGET = 20_000


@_q("budget_pack_selection")
def budget_pack_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import budget_pack, hashed_linear_scores
    docs = load_table(spark, sf_dir, "documents")
    scores = hashed_linear_scores(docs, "text", "doc_id", buckets=4096)
    return (budget_pack(scores, "doc_id", "score", "n_tokens",
                        budget=_PACK_BUDGET)
            .select("doc_id", "score", "n_tokens", "cum_tokens")
            .orderBy("cum_tokens"))


ORACLE["budget_pack_selection"] = """
WITH tok AS (SELECT doc_id,
                    unnest(regexp_extract_all(lower(text), '\\w+')) AS tk
             FROM documents),
w AS (SELECT doc_id,
             (CAST('0x' || substr(md5('11:' ||
                (CAST('0x' || substr(md5('7:' || tk), 1, 8) AS BIGINT) % 4096)
              ), 1, 8) AS BIGINT) % 2001) - 1000 AS wm
      FROM tok),
agg AS (SELECT doc_id, count(*) AS n_tokens, CAST(sum(wm) AS BIGINT) AS sw
        FROM w GROUP BY 1),
scored AS (SELECT doc_id,
                  round(CAST(sw AS DOUBLE) * 1000 / n_tokens)
                    / 1000000.0 AS score,
                  CAST(n_tokens AS BIGINT) AS n_tokens
           FROM agg),
run AS (SELECT doc_id, score, n_tokens,
               CAST(sum(n_tokens) OVER (ORDER BY score DESC, doc_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        FROM scored)
SELECT doc_id, score, n_tokens, cum_tokens
FROM run WHERE cum_tokens <= 20000
ORDER BY cum_tokens
"""


# ---------------------------------------------------------------------------
# centroid_label_confusion: nearest-centroid classification confusion
# matrix over the embeddings table — label-coherence audit.
# ---------------------------------------------------------------------------
@_q("centroid_label_confusion")
def centroid_label_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import nearest_centroid_confusion
    emb = load_table(spark, sf_dir, "embeddings")
    return (nearest_centroid_confusion(emb)
            .orderBy("label", "predicted"))


ORACLE["centroid_label_confusion"] = """
WITH e2 AS (SELECT vec_id, label,
                   list_transform(embedding::DOUBLE[],
                     x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS vi
            FROM embeddings),
dd AS (SELECT vec_id, label, i, vi[i] AS x
       FROM e2, unnest(generate_series(1, 64)) t(i)),
s AS (SELECT label, i, CAST(sum(x) AS BIGINT) AS s FROM dd GROUP BY 1, 2),
nc AS (SELECT label AS predicted, CAST(sum(s * s) AS BIGINT) AS nc2
       FROM s GROUP BY 1),
nv AS (SELECT vec_id, CAST(sum(x * x) AS BIGINT) AS nv2 FROM dd GROUP BY 1),
dot AS (SELECT dd.vec_id, s.label AS predicted,
               CAST(sum(dd.x * s.s) AS BIGINT) AS dot
        FROM dd JOIN s ON dd.i = s.i GROUP BY 1, 2),
scored AS (SELECT d.vec_id, d.predicted,
                  round(d.dot / (sqrt(CAST(nv.nv2 AS DOUBLE))
                                 * sqrt(CAST(nc.nc2 AS DOUBLE))), 6)
                    AS score
           FROM dot d JOIN nv USING (vec_id) JOIN nc USING (predicted)),
pred AS (SELECT vec_id, predicted FROM scored
         QUALIFY row_number() OVER (PARTITION BY vec_id
                                    ORDER BY score DESC, predicted) = 1)
SELECT e2.label, p.predicted, count(*) AS n_vecs
FROM pred p JOIN e2 USING (vec_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# bpe_train_merges: K-iteration BPE training (driver loop, one
# vocabulary-sized relational pass per merge) — the oracle unrolls
# the identical K rounds as a CTE chain.
# ---------------------------------------------------------------------------
_BPE_MERGES = 5


@_q("bpe_train_merges")
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_train
    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, "text", n_merges=_BPE_MERGES)
    return local_frame(
        spark, merges,
        "merge_rank bigint, left string, right string, "
        "pair_count bigint").orderBy("merge_rank")


def _bpe_oracle(n: int, final_select: str | None = None) -> str:
    sql = """WITH v0 AS MATERIALIZED (
  SELECT ' ' || array_to_string(str_split(word, ''), ' ') || ' </w> '
           AS symbols,
         n_word
  FROM (SELECT tk AS word, count(*) AS n_word
        FROM (SELECT unnest(regexp_extract_all(lower(text), '\\w+')) AS tk
              FROM documents) GROUP BY tk))"""
    for k in range(1, n + 1):
        sql += f""",
p{k} AS MATERIALIZED (SELECT a[i] AS l, a[i+1] AS r, CAST(sum(n_word) AS BIGINT) AS c
         FROM (SELECT str_split(trim(symbols), ' ') AS a, n_word
               FROM v{k-1}),
              unnest(generate_series(1, greatest(len(a)-1, 0))) t(i)
         GROUP BY 1, 2),
t{k} AS MATERIALIZED (SELECT l, r, c FROM p{k} ORDER BY c DESC, l, r LIMIT 1),
v{k} AS MATERIALIZED (SELECT replace(symbols,
           ' ' || (SELECT l FROM t{k}) || ' ' || (SELECT r FROM t{k}) || ' ',
           ' ' || (SELECT l FROM t{k}) || (SELECT r FROM t{k}) || ' ')
             AS symbols,
         n_word FROM v{k-1})"""
    if final_select is not None:
        return sql + "\n" + final_select
    sql += "\nSELECT * FROM (" + " UNION ALL ".join(
        f'SELECT CAST({k} AS BIGINT) AS merge_rank, l AS "left", '
        f'r AS "right", c AS pair_count FROM t{k}'
        for k in range(1, n + 1)) + ") ORDER BY merge_rank"
    return sql


ORACLE["bpe_train_merges"] = _bpe_oracle(_BPE_MERGES)


# ---------------------------------------------------------------------------
# bpe_vocab_tokens: the corpus's subword-token distribution after
# applying the learned merges — "what does the tokenizer produce".
# ---------------------------------------------------------------------------
@_q("bpe_vocab_tokens")
def bpe_vocab_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_vocab
    docs = load_table(spark, sf_dir, "documents")
    vocab = bpe_vocab(docs, "text", n_merges=_BPE_MERGES)
    toks = vocab.select(
        "n_word",
        F.explode(F.split(F.trim(F.col("symbols")), " ")).alias("token"))
    return (toks.groupBy("token")
            .agg(F.sum("n_word").alias("token_count"))
            .orderBy(F.desc("token_count"), "token")
            .limit(20))


ORACLE["bpe_vocab_tokens"] = _bpe_oracle(_BPE_MERGES, final_select=f"""
SELECT tok AS token, CAST(sum(n_word) AS BIGINT) AS token_count
FROM (SELECT unnest(str_split(trim(symbols), ' ')) AS tok, n_word
      FROM v{_BPE_MERGES})
GROUP BY 1 ORDER BY token_count DESC, token LIMIT 20
""")


# ---------------------------------------------------------------------------
# bpe_encode_stats: ENCODE the corpus with the trained tokenizer —
# per-source fertility (tokens/word) and compression (chars/token),
# the two numbers every tokenizer audit reports. Encoding a word is a
# lookup of its trained segmentation, so the corpus-side encode is a
# broadcast join of the word stream against the (word → n_tokens)
# table derived from the post-merge vocabulary; integer totals, one
# shuffle for the per-source aggregate.
# ---------------------------------------------------------------------------
@_q("bpe_encode_stats")
def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens
    from ..operators.bpe import bpe_vocab
    docs = load_table(spark, sf_dir, "documents")
    vocab = bpe_vocab(docs, "text", n_merges=_BPE_MERGES)
    seg = vocab.select(
        F.replace(F.replace(F.col("symbols"), F.lit(" "), F.lit("")),
                  F.lit("</w>"), F.lit("")).alias("word"),
        F.size(F.split(F.trim(F.col("symbols")), " ")).cast("long")
        .alias("n_tok"))
    words = docs.select("source",
                        F.explode(tokens(F.col("text"))).alias("word"))
    # the trained segmentation is vocabulary-sized (millions of rows ≈
    # ~100 MB at web scale) — broadcast it; the corpus-sized word
    # stream never shuffles on the join key
    j = words.join(F.broadcast(seg), "word").withColumn(
        "n_chars", F.length("word").cast("long"))
    return (j.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum("n_tok").alias("n_tokens"),
                 F.sum("n_chars").alias("n_chars"))
            .select("source", "n_words", "n_tokens", "n_chars",
                    (F.round(F.col("n_tokens").cast("double")
                             * F.lit(1_000_000.0)
                             / F.col("n_words").cast("double"))
                     / F.lit(1_000_000.0)).alias("tokens_per_word"),
                    (F.round(F.col("n_chars").cast("double")
                             * F.lit(1_000_000.0)
                             / F.col("n_tokens").cast("double"))
                     / F.lit(1_000_000.0)).alias("chars_per_token"))
            .orderBy("source"))


ORACLE["bpe_encode_stats"] = _bpe_oracle(_BPE_MERGES, final_select=f"""
, seg AS (SELECT replace(replace(symbols, ' ', ''), '</w>', '') AS word,
                 CAST(len(str_split(trim(symbols), ' ')) AS BIGINT) AS n_tok
          FROM v{_BPE_MERGES}),
dw AS (SELECT source, unnest(regexp_extract_all(lower(text), '\\w+')) AS word
       FROM documents),
j AS (SELECT dw.source, seg.n_tok,
             CAST(length(dw.word) AS BIGINT) AS n_chars
      FROM dw JOIN seg USING (word))
SELECT source, count(*) AS n_words,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       CAST(sum(n_chars) AS BIGINT) AS n_chars,
       round(CAST(CAST(sum(n_tok) AS BIGINT) AS DOUBLE) * 1000000.0
             / CAST(count(*) AS DOUBLE)) / 1000000.0 AS tokens_per_word,
       round(CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE) * 1000000.0
             / CAST(CAST(sum(n_tok) AS BIGINT) AS DOUBLE)) / 1000000.0
         AS chars_per_token
FROM j GROUP BY 1 ORDER BY 1
""")


# ---------------------------------------------------------------------------
# pca_top_component: top principal component of the embedding corpus
# (operators/pca.py — exact-integer scatter matrix, K-round integer
# power iteration). The oracle unrolls the identical K rounds over
# HUGEINT CTEs: same quantization, same A = n·G − s·sᵀ, same
# truncating rescale, same sign fix — so even this "iterative
# numerical" operator hash-matches an independent engine.
# ---------------------------------------------------------------------------
_PCA_DIM = 64
_PCA_ITERS = 8


@_q("pca_top_component")
def pca_top_component_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pca import pca_top_component
    emb = load_table(spark, sf_dir, "embeddings")
    return pca_top_component(spark, emb, "embedding", _PCA_DIM,
                             k_iters=_PCA_ITERS)


def _pca_oracle(dim: int, iters: int) -> str:
    sql = f"""WITH e2 AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
           x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS vi
  FROM embeddings),
dd AS MATERIALIZED (SELECT vec_id, i, vi[i] AS q
       FROM e2, unnest(generate_series(1, {dim})) t(i)),
g AS MATERIALIZED (SELECT a.i, b.i AS j,
       CAST(sum(a.q * b.q) AS HUGEINT) AS gij
     FROM dd a JOIN dd b USING (vec_id) GROUP BY 1, 2),
s AS MATERIALIZED (SELECT i, CAST(sum(q) AS HUGEINT) AS si
     FROM dd GROUP BY 1),
nn AS (SELECT count(*) AS n FROM e2),
a AS MATERIALIZED (SELECT g.i, g.j,
       CAST((SELECT n FROM nn) AS HUGEINT) * gij - sa.si * sb.si AS aij
     FROM g JOIN s sa ON g.i = sa.i JOIN s sb ON g.j = sb.i),
v0 AS (SELECT i, CAST(1000000 AS HUGEINT) AS x
       FROM unnest(generate_series(1, {dim})) t(i))"""
    prev = "v0"
    for k in range(1, iters + 1):
        sql += f""",
w{k} AS MATERIALIZED (SELECT a.i, CAST(sum(aij * {prev}.x) AS HUGEINT) AS w
      FROM a JOIN {prev} ON a.j = {prev}.i GROUP BY 1),
m{k} AS (SELECT max(abs(w)) AS wm FROM w{k}),
v{k} AS MATERIALIZED (SELECT i,
        CASE WHEN w >= 0 THEN (w * 1000000) // (SELECT wm FROM m{k})
             ELSE -(((0 - w) * 1000000) // (SELECT wm FROM m{k})) END AS x
      FROM w{k})"""
        prev = f"v{k}"
    sql += f""",
wf AS MATERIALIZED (SELECT a.i, CAST(sum(aij * {prev}.x) AS HUGEINT) AS w
     FROM a JOIN {prev} ON a.j = {prev}.i GROUP BY 1),
den AS (SELECT CAST(sum(x * x) AS HUGEINT) AS den FROM {prev}),
num AS (SELECT CAST(sum({prev}.x * wf.w) AS HUGEINT) AS num
        FROM {prev} JOIN wf ON {prev}.i = wf.i),
tr AS (SELECT CAST(sum(aij) AS HUGEINT) AS tr FROM a WHERE i = j),
sgn AS (SELECT CASE WHEN x >= 0 THEN 1.0 ELSE -1.0 END AS sg
        FROM {prev} ORDER BY abs(x) DESC, i LIMIT 1)
SELECT i - 1 AS dim,
       round(CAST(x AS DOUBLE) * (SELECT sg FROM sgn)
             / sqrt(CAST((SELECT den FROM den) AS DOUBLE)), 6) AS loading,
       round(CAST((SELECT num FROM num) AS DOUBLE)
             / (CAST((SELECT den FROM den) AS DOUBLE)
                * CAST((SELECT tr FROM tr) AS DOUBLE)), 8)
         AS explained_share
FROM {prev} ORDER BY dim"""
    return sql


ORACLE["pca_top_component"] = _pca_oracle(_PCA_DIM, _PCA_ITERS)


# ---------------------------------------------------------------------------
# kmeans_embedding_clusters: true Lloyd k-means (2 update rounds +
# final assignment) — operators/kmeans.py. The oracle unrolls the
# identical rounds: seeded init, exact HUGEINT dots, round-6 argmax
# with cluster-id ties, empty-cluster carryover.
# ---------------------------------------------------------------------------
_KM_K = 8
_KM_ITERS = 2


@_q("kmeans_embedding_clusters")
def kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.kmeans import kmeans_clusters
    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_clusters(spark, emb, "embedding", "vec_id",
                           k=_KM_K, iters=_KM_ITERS, dim=64)


def _kmeans_oracle(k: int, iters: int, dim: int = 64,
                   final_select: str | None = None) -> str:
    sql = f"""WITH e2 AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
           x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS vi
  FROM embeddings),
dd AS MATERIALIZED (SELECT vec_id, i, vi[i] AS x
       FROM e2, unnest(generate_series(1, {dim})) t(i)),
nv AS MATERIALIZED (SELECT vec_id, CAST(sum(x * x) AS BIGINT) AS nv2
      FROM dd GROUP BY 1),
seeds AS MATERIALIZED (
  SELECT vec_id AS cluster FROM e2
  ORDER BY CAST('0x' || substr(md5('0:' || CAST(vec_id AS VARCHAR)), 1, 8)
                AS BIGINT), vec_id
  LIMIT {k}),
c0 AS MATERIALIZED (SELECT s.cluster, dd.i, CAST(dd.x AS HUGEINT) AS s
      FROM seeds s JOIN dd ON dd.vec_id = s.cluster)"""
    prev = "c0"
    for t in range(1, iters + 2):  # iters updates + final assignment
        sql += f""",
nc{t} AS (SELECT cluster, CAST(sum(s * s) AS HUGEINT) AS nc2
          FROM {prev} GROUP BY 1),
sc{t} AS MATERIALIZED (
  SELECT dd.vec_id, c.cluster,
         round(CAST(CAST(sum(dd.x * c.s) AS HUGEINT) AS DOUBLE)
               / (sqrt(CAST(max(nv.nv2) AS DOUBLE))
                  * sqrt(CAST(max(nc{t}.nc2) AS DOUBLE))), 6) AS score
  FROM dd JOIN {prev} c ON dd.i = c.i
       JOIN nv ON nv.vec_id = dd.vec_id
       JOIN nc{t} ON nc{t}.cluster = c.cluster
  GROUP BY 1, 2),
a{t} AS MATERIALIZED (
  SELECT vec_id, cluster, score FROM sc{t}
  QUALIFY row_number() OVER (PARTITION BY vec_id
                             ORDER BY score DESC, cluster) = 1)"""
        if t <= iters:
            sql += f""",
u{t} AS MATERIALIZED (
  SELECT a.cluster, dd.i, CAST(sum(dd.x) AS HUGEINT) AS s
  FROM a{t} a JOIN dd ON dd.vec_id = a.vec_id
  GROUP BY 1, 2),
c{t} AS MATERIALIZED (
  SELECT * FROM u{t}
  UNION ALL
  SELECT * FROM {prev}
  WHERE cluster NOT IN (SELECT DISTINCT cluster FROM u{t}))"""
            prev = f"c{t}"
    last = f"a{iters + 1}"
    if final_select is not None:
        return sql + final_select.replace("{last}", last)
    sql += f"""
SELECT cluster, count(*) AS n_vecs,
       round(CAST(sum(CAST(score AS DECIMAL(9,6))) AS DOUBLE)
             / count(*), 6) AS avg_cos
FROM {last} GROUP BY 1 ORDER BY 1"""
    return sql


ORACLE["kmeans_embedding_clusters"] = _kmeans_oracle(_KM_K, _KM_ITERS)


# ---------------------------------------------------------------------------
# ann_truncation_recall: matryoshka-style dimensionality ablation —
# does the top-1 within-label neighbor found with only the first
# 8/16 dims agree with the full-64-dim answer? The retrieval-quality
# dial for "store truncated embeddings, re-rank with full ones".
# All dots/norms are exact integers (micro-unit quantization; every
# partial sum < 2^53 so even double accumulation is exact), scores
# round to 6 dp before the argmax, ties break on the neighbor id —
# bit-identical in both engines.
# ---------------------------------------------------------------------------
_TRUNC_CUTS = (8, 16, 64)


@_q("ann_truncation_recall")
def ann_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W
    from ..functions.vectors import micro_units
    emb = load_table(spark, sf_dir, "embeddings")
    vi = micro_units(F.col("embedding"))
    n2q = lambda s: F.aggregate(F.transform(s, lambda x: x * x),
                                F.lit(0).cast("long"),
                                lambda acc, x: acc + x)
    # norms precomputed ONCE per (vector, cut) — not re-folded per
    # candidate pair (the nearest_centroid_confusion precedent)
    norms = F.map_from_arrays(
        F.array(*[F.lit(c) for c in _TRUNC_CUTS]),
        F.array(*[n2q(F.slice(vi, 1, c)) for c in _TRUNC_CUTS]))
    q = (emb.select(F.col("vec_id").alias("vid"), "label",
                    vi.alias("q"), norms.alias("n2"))
         .localCheckpoint(eager=True))
    # recall evaluation needs exact ground truth per query — cost is
    # inherently queries × corpus, so bound the QUERY side (the
    # standard recall@k protocol): every 17th vector probes, the full
    # corpus answers. O(n·s/L), never all-pairs.
    a = q.filter(F.col("vid") % 17 == 0).alias("a")
    b = q.alias("b")
    cuts = F.explode(F.array(*[F.lit(c) for c in _TRUNC_CUTS])).alias("cut")
    pairs = (a.join(b, (F.col("a.label") == F.col("b.label"))
                    & (F.col("a.vid") != F.col("b.vid")))
             .select(F.col("a.vid").alias("va"), F.col("b.vid").alias("vb"),
                     F.col("a.q").alias("qa"), F.col("b.q").alias("qb"),
                     F.col("a.n2").alias("na"), F.col("b.n2").alias("nb"))
             .select("va", "vb", "qa", "qb", "na", "nb", cuts))
    sa = F.slice(F.col("qa"), 1, F.col("cut"))
    sb = F.slice(F.col("qb"), 1, F.col("cut"))
    dot = F.aggregate(F.zip_with(sa, sb, lambda x, y: x * y),
                      F.lit(0).cast("long"), lambda acc, x: acc + x)
    score = F.round(dot.cast("double")
                    / (F.sqrt(F.element_at(F.col("na"), F.col("cut"))
                              .cast("double"))
                       * F.sqrt(F.element_at(F.col("nb"), F.col("cut"))
                                .cast("double"))), 6)
    scored = pairs.select("va", "vb", "cut", score.alias("score"))
    win = W.partitionBy("va", "cut").orderBy(F.desc("score"), F.asc("vb"))
    top = (scored.withColumn("_rn", F.row_number().over(win))
           .filter(F.col("_rn") == 1).select("va", "cut", "vb"))
    truth = (top.filter(F.col("cut") == 64)
             .select("va", F.col("vb").alias("vb_full")))
    j = top.join(truth, "va")
    return (j.groupBy(F.col("cut").alias("trunc_dim"))
            .agg(F.count(F.lit(1)).alias("n_queries"),
                 (F.round(F.sum((F.col("vb") == F.col("vb_full"))
                                .cast("long")).cast("double")
                          * F.lit(1_000_000.0)
                          / F.count(F.lit(1)).cast("double"))
                  / F.lit(1_000_000.0)).alias("recall_at_1"))
            .orderBy("trunc_dim"))


ORACLE["ann_truncation_recall"] = """
WITH e2 AS MATERIALIZED (
  SELECT vec_id, label,
         list_transform(embedding::DOUBLE[],
           x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS vi
  FROM embeddings),
cuts AS (SELECT unnest([8, 16, 64]) AS cut),
sc AS MATERIALIZED (
  SELECT a.vec_id AS va, b.vec_id AS vb, c.cut,
         round(list_dot_product(a.vi[1:c.cut]::DOUBLE[],
                                b.vi[1:c.cut]::DOUBLE[])
               / (sqrt(list_dot_product(a.vi[1:c.cut]::DOUBLE[],
                                        a.vi[1:c.cut]::DOUBLE[]))
                  * sqrt(list_dot_product(b.vi[1:c.cut]::DOUBLE[],
                                          b.vi[1:c.cut]::DOUBLE[]))), 6)
           AS score
  FROM e2 a JOIN e2 b ON a.label = b.label AND a.vec_id <> b.vec_id
  CROSS JOIN cuts c
  WHERE a.vec_id % 17 = 0),
top AS MATERIALIZED (
  SELECT va, cut, vb FROM sc
  QUALIFY row_number() OVER (PARTITION BY va, cut
                             ORDER BY score DESC, vb) = 1),
truth AS (SELECT va, vb AS vb_full FROM top WHERE cut = 64)
SELECT t.cut AS trunc_dim, count(*) AS n_queries,
       round(CAST(sum(CASE WHEN t.vb = tr.vb_full THEN 1 ELSE 0 END)
                  AS DOUBLE) * 1000000.0 / CAST(count(*) AS DOUBLE))
         / 1000000.0 AS recall_at_1
FROM top t JOIN truth tr ON t.va = tr.va
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# bpe_roundtrip_check: tokenizer losslessness audit — decoding every
# trained segmentation (strip spaces + the </w> marker) must
# reconstruct its word exactly. The self-validating query every
# tokenizer deployment should ship: n_mismatch must be 0 and the
# oracle proves it from the same unrolled merge chain.
# ---------------------------------------------------------------------------
@_q("bpe_roundtrip_check")
def bpe_roundtrip_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_vocab, word_frequencies
    docs = load_table(spark, sf_dir, "documents")
    vocab = bpe_vocab(docs, "text", n_merges=_BPE_MERGES)
    decoded = vocab.select(
        F.replace(F.replace(F.col("symbols"), F.lit(" "), F.lit("")),
                  F.lit("</w>"), F.lit("")).alias("word"),
        F.size(F.split(F.trim(F.col("symbols")), " ")).cast("long")
        .alias("n_tok"), "n_word")
    words = word_frequencies(docs, "text").select(
        F.col("word").alias("orig"), "n_word")
    j = decoded.join(words, (F.col("word") == F.col("orig"))
                     & (decoded["n_word"] == words["n_word"]), "full_outer")
    return j.agg(
        F.coalesce(F.sum(F.when(F.col("word").isNotNull()
                                & F.col("orig").isNotNull(), 1)
                         .otherwise(0)), F.lit(0)).alias("n_roundtrip_ok"),
        F.coalesce(F.sum(F.when(F.col("word").isNull()
                                | F.col("orig").isNull(), 1)
                         .otherwise(0)), F.lit(0)).alias("n_mismatch"),
        F.coalesce(F.sum(F.when(F.col("word").isNotNull(),
                                F.col("n_tok")).otherwise(0)), F.lit(0))
        .alias("total_tokens"))


ORACLE["bpe_roundtrip_check"] = _bpe_oracle(_BPE_MERGES, final_select=f"""
, seg AS (SELECT replace(replace(symbols, ' ', ''), '</w>', '') AS word,
                 CAST(len(str_split(trim(symbols), ' ')) AS BIGINT) AS n_tok,
                 n_word
          FROM v{_BPE_MERGES}),
w AS (SELECT tk AS orig, count(*) AS n_word
      FROM (SELECT unnest(regexp_extract_all(lower(text), '\\w+')) AS tk
            FROM documents) GROUP BY tk),
j AS (SELECT seg.word, w.orig, seg.n_tok
      FROM seg FULL OUTER JOIN w
        ON seg.word = w.orig AND seg.n_word = w.n_word)
SELECT CAST(coalesce(sum(CASE WHEN word IS NOT NULL AND orig IS NOT NULL
                              THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_roundtrip_ok,
       CAST(coalesce(sum(CASE WHEN word IS NULL OR orig IS NULL
                              THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_mismatch,
       CAST(coalesce(sum(CASE WHEN word IS NOT NULL THEN n_tok
                              ELSE 0 END), 0) AS BIGINT) AS total_tokens
FROM j
""")


# ---------------------------------------------------------------------------
# ann_kmeans_ivf_topk: serve ANN from the TRAINED k-means index —
# the full "train the index, probe it" story: kmeans_model yields the
# assignment table + exact integer centroid sums; the query vector
# ranks centroids (driver-side on k×d ints — deterministic), probes
# the top-2 clusters, and exact cosine search runs over their members
# only. The oracle replays the identical Lloyd rounds, centroid
# probe, and member search.
# ---------------------------------------------------------------------------
@_q("ann_kmeans_ivf_topk")
def ann_kmeans_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math
    from ..operators.kmeans import kmeans_model
    from ..operators.multimodal import _round_away
    emb = load_table(spark, sf_dir, "embeddings")
    assign, cents = kmeans_model(spark, emb, "embedding", "vec_id",
                                 k=_KM_K, iters=_KM_ITERS, dim=64)
    assign = assign.localCheckpoint(eager=True)
    qrow = assign.orderBy("vid").limit(1).collect()[0]
    qv, qid = list(qrow["q"]), int(qrow["vid"])
    q2 = sum(x * x for x in qv)
    qnorm = math.sqrt(float(q2))

    def _cscore(cs: list[int]) -> float:
        dot = sum(a * b for a, b in zip(qv, cs))
        c2 = sum(c * c for c in cs)
        return _round_away(
            float(dot) / (qnorm * math.sqrt(float(c2))), 6)

    probe = [cid for cid, _ in
             sorted(cents.items(),
                    key=lambda kv: (-_cscore(kv[1]), kv[0]))[:2]]

    qlit = F.array(*[F.lit(int(x)).cast("long") for x in qv])
    dot = F.aggregate(F.zip_with(F.col("q"), qlit, lambda a, b: a * b),
                      F.lit(0).cast("long"), lambda acc, x: acc + x)
    score = F.round(dot.cast("double")
                    / (F.sqrt(F.col("nv2").cast("double"))
                       * F.lit(qnorm)), 6)
    return (assign.filter(F.col("cluster").isin([int(c) for c in probe])
                          & (F.col("vid") != qid))
            .select(F.col("vid").alias("vec_id"), "cluster",
                    score.alias("score"))
            .orderBy(F.desc("score"), "vec_id")
            .limit(10))


ORACLE["ann_kmeans_ivf_topk"] = _kmeans_oracle(_KM_K, _KM_ITERS,
                                               final_select=""",
q AS (SELECT vi AS qv, vec_id AS qid FROM e2
      WHERE vec_id = (SELECT min(vec_id) FROM e2)),
qn AS (SELECT CAST(sum(x * x) AS HUGEINT) AS q2
       FROM (SELECT unnest(qv) AS x FROM q)),
qe AS (SELECT i, qv[i] AS x
       FROM q, unnest(generate_series(1, 64)) t(i)),
cdot AS (SELECT c.cluster,
                CAST(sum(c.s * qe.x) AS HUGEINT) AS dot,
                CAST(sum(c.s * c.s) AS HUGEINT) AS cc2
         FROM c{iters} c JOIN qe ON qe.i = c.i GROUP BY 1),
crank AS (SELECT cluster,
                 round(CAST(dot AS DOUBLE)
                       / (sqrt(CAST((SELECT q2 FROM qn) AS DOUBLE))
                          * sqrt(CAST(cc2 AS DOUBLE))), 6) AS cscore
          FROM cdot),
probe AS (SELECT cluster FROM crank
          ORDER BY cscore DESC, cluster LIMIT 2),
sc AS (SELECT a.vec_id, a.cluster,
              round(CAST(CAST(sum(dd.x * qe.x) AS HUGEINT) AS DOUBLE)
                    / (sqrt(CAST(max(nv.nv2) AS DOUBLE))
                       * sqrt(CAST((SELECT q2 FROM qn) AS DOUBLE))), 6)
                AS score
       FROM {last} a
       JOIN dd ON dd.vec_id = a.vec_id
       JOIN qe ON qe.i = dd.i
       JOIN nv ON nv.vec_id = a.vec_id
       WHERE a.cluster IN (SELECT cluster FROM probe)
         AND a.vec_id <> (SELECT qid FROM q)
       GROUP BY 1, 2)
SELECT vec_id, cluster, score FROM sc
ORDER BY score DESC, vec_id LIMIT 10""".replace("{iters}",
                                                str(_KM_ITERS)))


# ---------------------------------------------------------------------------
# unigram_viterbi_stats: the SECOND tokenizer family (operators/
# unigram.py) — unigram-LM Viterbi segmentation of the length-capped
# word vocabulary against corpus-derived substring costs. The oracle
# unrolls the identical DP: 12 position rounds, each taking the
# (cost, ntoks)-lexicographic argmin over the incoming edges, on the
# same integer micro-nat cost table.
# ---------------------------------------------------------------------------

@_q("unigram_viterbi_stats")
def unigram_viterbi_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.unigram import viterbi_segment
    docs = load_table(spark, sf_dir, "documents")
    seg = viterbi_segment(docs, "text", min_count=2)
    # both 6-dp averages leave the integer domain through ONE 0-dp
    # round of an integer-over-integer quotient (fertility's
    # numerator is scaled to micro in the exact int64 domain; cost is
    # already micro-nats) — never round(x, 6) of an arbitrary double,
    # the engine-divergent class the r9 sf0.1 tier exposed
    return (seg.groupBy(F.col("ln").alias("word_len"))
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum("n_word").alias("n_occurrences"),
                 (F.round((F.sum(F.col("ntoks").cast("long")
                                 * F.col("n_word"))
                           * F.lit(1_000_000)).cast("double")
                          / F.sum("n_word").cast("double"))
                  / F.lit(1_000_000.0)).alias("fertility"),
                 (F.round(F.sum(F.col("cost") * F.col("n_word"))
                          .cast("double")
                          / F.sum("n_word").cast("double"))
                  / F.lit(1_000_000.0)).alias("avg_cost_nats"))
            .orderBy("word_len"))


def _unigram_oracle(max_word_len: int = 12, max_sub: int = 4,
                    min_count: int = 2) -> str:
    sql = f"""WITH wf AS MATERIALIZED (
  SELECT tk AS word, count(*) AS n_word
  FROM (SELECT unnest(regexp_extract_all(lower(text), '\\w+')) AS tk
        FROM documents) GROUP BY tk),
w12 AS MATERIALIZED (
  SELECT word, CAST(n_word AS BIGINT) AS n_word, length(word) AS ln
  FROM wf WHERE length(word) <= {max_word_len}),
grid AS MATERIALIZED (
  SELECT w.word, w.n_word, j.j, l.l,
         substr(w.word, CAST(j.j AS INT), CAST(l.l AS INT)) AS token
  FROM w12 w,
       unnest(generate_series(1, w.ln)) j(j),
       unnest(generate_series(1, least({max_sub}, w.ln - j.j + 1))) l(l)),
cnt AS MATERIALIZED (
  SELECT token, CAST(sum(n_word) AS BIGINT) AS cnt FROM grid GROUP BY token),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM cnt),
vocab AS MATERIALIZED (
  SELECT token,
         CAST(round(-ln(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE))
                    * 1000000.0, 0) AS BIGINT) AS cost
  FROM cnt, tot
  WHERE cnt >= {min_count} OR length(token) = 1),
edges AS MATERIALIZED (
  SELECT g.word, CAST(g.j - 1 AS INT) AS j, CAST(g.j - 1 + g.l AS INT) AS i,
         v.cost
  FROM grid g JOIN vocab v USING (token)),
a0 AS (SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS cost, 0 AS ntoks
       FROM w12)"""
    for k in range(1, max_word_len + 1):
        sql += f""",
d{k} AS MATERIALIZED (
  SELECT word, {k} AS pos, cost, ntoks FROM (
    SELECT e.word, d.cost + e.cost AS cost, d.ntoks + 1 AS ntoks,
           row_number() OVER (PARTITION BY e.word
                              ORDER BY d.cost + e.cost, d.ntoks + 1) AS rn
    FROM edges e JOIN a{k-1} d ON d.word = e.word AND d.pos = e.j
    WHERE e.i = {k}) WHERE rn = 1),
a{k} AS MATERIALIZED (SELECT * FROM a{k-1} UNION ALL SELECT * FROM d{k})"""
    sql += f""",
best AS (SELECT w.ln, w.n_word, d.cost, d.ntoks
         FROM w12 w JOIN a{max_word_len} d
           ON d.word = w.word AND d.pos = w.ln)
SELECT ln AS word_len,
       count(*) AS n_words,
       CAST(sum(n_word) AS BIGINT) AS n_occurrences,
       round(CAST(sum(CAST(ntoks AS BIGINT) * n_word) * 1000000 AS DOUBLE)
             / CAST(sum(n_word) AS DOUBLE)) / 1000000.0 AS fertility,
       round(CAST(sum(cost * n_word) AS DOUBLE)
             / CAST(sum(n_word) AS DOUBLE)) / 1000000.0 AS avg_cost_nats
FROM best GROUP BY ln ORDER BY ln"""
    return sql


ORACLE["unigram_viterbi_stats"] = _unigram_oracle()


@_q("unigram_encode_stats")
def unigram_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-tokenizer ENCODE audit, the per-source twin of
    bpe_encode_stats: the corpus word stream joins the Viterbi
    segmentation table (vocabulary-bounded broadcast) and each source
    reports its coverage and fertility — the numbers a tokenizer
    owner watches per data source before a training run."""
    from ..functions.text import tokens
    from ..operators.unigram import MAX_WORD_LEN, viterbi_segment
    docs = load_table(spark, sf_dir, "documents")
    seg = viterbi_segment(docs, "text", min_count=2)
    stream = docs.select("source",
                         F.explode(tokens(F.col("text"))).alias("word"))
    joined = stream.join(F.broadcast(seg.select("word", "ntoks", "cost")),
                         "word", "left")
    return (joined.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum(F.when(F.col("ntoks").isNull(), 1).otherwise(0))
                 .alias("n_oversize"),
                 F.sum(F.coalesce(F.col("ntoks").cast("long"), F.lit(0)))
                 .alias("n_tokens"),
                 # exact-integer micro trick on both averages (see
                 # unigram_viterbi_stats) — cost is micro-nats already
                 (F.round((F.sum(F.coalesce(F.col("ntoks").cast("long"),
                                            F.lit(0)))
                           * F.lit(1_000_000)).cast("double")
                          / F.sum(F.when(F.col("ntoks").isNull(), 0)
                                  .otherwise(1)).cast("double"))
                  / F.lit(1_000_000.0)).alias("fertility"),
                 (F.round(F.sum(F.coalesce(F.col("cost"), F.lit(0)))
                          .cast("double")
                          / F.sum(F.coalesce(F.col("ntoks").cast("long"),
                                             F.lit(0))).cast("double"))
                  / F.lit(1_000_000.0)).alias("avg_token_cost_nats"))
            .orderBy("source"))


ORACLE["unigram_encode_stats"] = _unigram_oracle() \
    .replace("""best AS (SELECT w.ln, w.n_word, d.cost, d.ntoks
         FROM w12 w JOIN a12 d
           ON d.word = w.word AND d.pos = w.ln)
SELECT ln AS word_len,
       count(*) AS n_words,
       CAST(sum(n_word) AS BIGINT) AS n_occurrences,
       round(CAST(sum(CAST(ntoks AS BIGINT) * n_word) * 1000000 AS DOUBLE)
             / CAST(sum(n_word) AS DOUBLE)) / 1000000.0 AS fertility,
       round(CAST(sum(cost * n_word) AS DOUBLE)
             / CAST(sum(n_word) AS DOUBLE)) / 1000000.0 AS avg_cost_nats
FROM best GROUP BY ln ORDER BY ln""",
             """seg AS (SELECT w.word, d.cost, d.ntoks
         FROM w12 w JOIN a12 d
           ON d.word = w.word AND d.pos = w.ln),
stream AS (SELECT source, unnest(regexp_extract_all(lower(text), '\\w+')) AS word
           FROM documents),
joined AS (SELECT s.source, g.cost, g.ntoks
           FROM stream s LEFT JOIN seg g USING (word))
SELECT source,
       count(*) AS n_words,
       CAST(sum(CASE WHEN ntoks IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oversize,
       CAST(sum(coalesce(CAST(ntoks AS BIGINT), 0)) AS BIGINT) AS n_tokens,
       round(CAST(sum(coalesce(CAST(ntoks AS BIGINT), 0)) * 1000000 AS DOUBLE)
             / CAST(sum(CASE WHEN ntoks IS NULL THEN 0 ELSE 1 END) AS DOUBLE))
         / 1000000.0 AS fertility,
       round(CAST(sum(coalesce(cost, 0)) AS DOUBLE)
             / CAST(sum(coalesce(CAST(ntoks AS BIGINT), 0)) AS DOUBLE))
         / 1000000.0 AS avg_token_cost_nats
FROM joined GROUP BY source ORDER BY source""")


# ---------------------------------------------------------------------------
# unigram_em_round_stats: one full EM iteration of the unigram
# trainer under the gate — E-step Viterbi paths (backpointer walk),
# M-step usage re-scoring, round-2 re-segmentation. The oracle
# unrolls ALL of it: 12 DP rounds with backpointers, a 12-step
# backward path walk, the usage re-count, and 12 more DP rounds on
# the re-scored vocabulary.
# ---------------------------------------------------------------------------

@_q("unigram_em_round_stats")
def unigram_em_round_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.unigram import (_viterbi_core, corpus_words,
                                     segmentation_cost_table,
                                     token_cost_table)
    docs = load_table(spark, sf_dir, "documents")
    words = corpus_words(docs, "text")
    seg0 = (_viterbi_core(words, token_cost_table(words, min_count=2))
            .localCheckpoint(eager=True))  # feeds M-step AND the join
    seg1 = _viterbi_core(words, segmentation_cost_table(seg0))
    j = (seg0.select("word", "ln", "n_word",
                     F.col("ntoks").alias("ntoks0"))
         .join(seg1.select("word", F.col("ntoks").alias("ntoks1"),
                           "cost"), "word"))
    return (j.groupBy(F.col("ln").alias("word_len"))
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum("n_word").alias("n_occurrences"),
                 (F.round((F.sum(F.col("ntoks0").cast("long")
                                 * F.col("n_word")) * F.lit(1_000_000))
                          .cast("double")
                          / F.sum("n_word").cast("double"))
                  / F.lit(1_000_000.0)).alias("fertility_r1"),
                 (F.round((F.sum(F.col("ntoks1").cast("long")
                                 * F.col("n_word")) * F.lit(1_000_000))
                          .cast("double")
                          / F.sum("n_word").cast("double"))
                  / F.lit(1_000_000.0)).alias("fertility_r2"),
                 (F.round(F.sum(F.col("cost") * F.col("n_word"))
                          .cast("double")
                          / F.sum("n_word").cast("double"))
                  / F.lit(1_000_000.0)).alias("avg_cost_nats_r2"))
            .orderBy("word_len"))


def _unigram_em_oracle(max_word_len: int = 12, max_sub: int = 4,
                       min_count: int = 2) -> str:
    sql = f"""WITH wf AS MATERIALIZED (
  SELECT tk AS word, count(*) AS n_word
  FROM (SELECT unnest(regexp_extract_all(lower(text), '\\w+')) AS tk
        FROM documents) GROUP BY tk),
w12 AS MATERIALIZED (
  SELECT word, CAST(n_word AS BIGINT) AS n_word, length(word) AS ln
  FROM wf WHERE length(word) <= {max_word_len}),
grid AS MATERIALIZED (
  SELECT w.word, w.n_word, j.j, l.l,
         substr(w.word, CAST(j.j AS INT), CAST(l.l AS INT)) AS token
  FROM w12 w,
       unnest(generate_series(1, w.ln)) j(j),
       unnest(generate_series(1, least({max_sub}, w.ln - j.j + 1))) l(l)),
cnt AS MATERIALIZED (
  SELECT token, CAST(sum(n_word) AS BIGINT) AS cnt FROM grid GROUP BY token),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM cnt),
vocab AS MATERIALIZED (
  SELECT token,
         CAST(round(-ln(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE))
                    * 1000000.0, 0) AS BIGINT) AS cost
  FROM cnt, tot
  WHERE cnt >= {min_count} OR length(token) = 1),
edges AS MATERIALIZED (
  SELECT g.word, CAST(g.j - 1 AS INT) AS j, CAST(g.j - 1 + g.l AS INT) AS i,
         v.cost
  FROM grid g JOIN vocab v USING (token)),
a0 AS (SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS cost, 0 AS ntoks,
              -1 AS bj
       FROM w12)"""
    # round-1 DP with backpointers
    for k in range(1, max_word_len + 1):
        sql += f""",
d{k} AS MATERIALIZED (
  SELECT word, {k} AS pos, cost, ntoks, bj FROM (
    SELECT e.word, d.cost + e.cost AS cost, d.ntoks + 1 AS ntoks,
           e.j AS bj,
           row_number() OVER (PARTITION BY e.word
                              ORDER BY d.cost + e.cost, d.ntoks + 1, e.j)
             AS rn
    FROM edges e JOIN a{k-1} d ON d.word = e.word AND d.pos = e.j
    WHERE e.i = {k}) WHERE rn = 1),
a{k} AS MATERIALIZED (SELECT * FROM a{k-1} UNION ALL SELECT * FROM d{k})"""
    # backward path walk: 12 hops, each consuming >= 1 character
    sql += f""",
p0 AS (SELECT word, ln AS pos FROM w12)"""
    for t in range(1, max_word_len + 1):
        sql += f""",
p{t} AS MATERIALIZED (
  SELECT p.word, d.bj AS pos,
         substr(p.word, CAST(d.bj + 1 AS INT), CAST(p.pos - d.bj AS INT))
           AS token
  FROM p{t-1} p JOIN a{max_word_len} d
    ON d.word = p.word AND d.pos = p.pos
  WHERE p.pos > 0)"""
    toks_union = " UNION ALL ".join(
        f"SELECT word, token FROM p{t}" for t in range(1, max_word_len + 1))
    # M-step re-scoring from path usage (no min_count, no singles
    # clause: every used token qualifies by construction)
    sql += f""",
toks AS MATERIALIZED ({toks_union}),
usage AS MATERIALIZED (
  SELECT t.token, CAST(sum(w.n_word) AS BIGINT) AS cnt
  FROM toks t JOIN w12 w ON w.word = t.word GROUP BY t.token),
tot2 AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM usage),
vocab2 AS MATERIALIZED (
  SELECT token,
         CAST(round(-ln(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE))
                    * 1000000.0, 0) AS BIGINT) AS cost
  FROM usage, tot2),
edges2 AS MATERIALIZED (
  SELECT g.word, CAST(g.j - 1 AS INT) AS j, CAST(g.j - 1 + g.l AS INT) AS i,
         v2.cost
  FROM grid g JOIN vocab2 v2 USING (token)),
b0 AS (SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS cost, 0 AS ntoks
       FROM w12)"""
    # round-2 DP on the re-scored vocabulary
    for k in range(1, max_word_len + 1):
        sql += f""",
e{k} AS MATERIALIZED (
  SELECT word, {k} AS pos, cost, ntoks FROM (
    SELECT g.word, d.cost + g.cost AS cost, d.ntoks + 1 AS ntoks,
           row_number() OVER (PARTITION BY g.word
                              ORDER BY d.cost + g.cost, d.ntoks + 1, g.j)
             AS rn
    FROM edges2 g JOIN b{k-1} d ON d.word = g.word AND d.pos = g.j
    WHERE g.i = {k}) WHERE rn = 1),
b{k} AS MATERIALIZED (SELECT * FROM b{k-1} UNION ALL SELECT * FROM e{k})"""
    sql += f""",
best1 AS (SELECT w.word, w.ln, w.n_word, d.ntoks AS ntoks0
          FROM w12 w JOIN a{max_word_len} d
            ON d.word = w.word AND d.pos = w.ln),
best2 AS (SELECT w.word, d.cost, d.ntoks AS ntoks1
          FROM w12 w JOIN b{max_word_len} d
            ON d.word = w.word AND d.pos = w.ln)
SELECT b1.ln AS word_len,
       count(*) AS n_words,
       CAST(sum(b1.n_word) AS BIGINT) AS n_occurrences,
       round(CAST(sum(CAST(b1.ntoks0 AS BIGINT) * b1.n_word) * 1000000
                  AS DOUBLE)
             / CAST(sum(b1.n_word) AS DOUBLE)) / 1000000.0
         AS fertility_r1,
       round(CAST(sum(CAST(b2.ntoks1 AS BIGINT) * b1.n_word) * 1000000
                  AS DOUBLE)
             / CAST(sum(b1.n_word) AS DOUBLE)) / 1000000.0
         AS fertility_r2,
       round(CAST(sum(b2.cost * b1.n_word) AS DOUBLE)
             / CAST(sum(b1.n_word) AS DOUBLE)) / 1000000.0
         AS avg_cost_nats_r2
FROM best1 b1 JOIN best2 b2 USING (word)
GROUP BY b1.ln ORDER BY word_len"""
    return sql


ORACLE["unigram_em_round_stats"] = _unigram_em_oracle()


# ---------------------------------------------------------------------------
# unigram_em_converged_stats: TWO full EM iterations of the unigram
# trainer WITH the explicit vocabulary-prune schedule
# (operators/unigram.prune_cost_table — SentencePiece's shrink toward
# a target size: keep the top-K multi-char tokens by likelihood
# contribution cnt*cost, always keep single chars, fallback-cost
# chars absent from usage). The oracle unrolls everything: 2 x
# (12-round backpointered DP + 12-hop path walk + usage re-count +
# rank-and-prune) + a final 12-round DP on the twice-pruned
# vocabulary. n_vocab_multi gates the prune itself.
# ---------------------------------------------------------------------------

_UEC_ROUNDS = 2
_UEC_KEEP = 512


@_q("unigram_em_converged_stats")
def unigram_em_converged_stats(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    from ..operators.unigram import (_viterbi_core, corpus_words,
                                     prune_cost_table,
                                     segmentation_cost_table,
                                     token_cost_table)
    docs = load_table(spark, sf_dir, "documents")
    words = corpus_words(docs, "text")
    vocab = token_cost_table(words, min_count=2)
    seg1 = _viterbi_core(words, vocab).localCheckpoint(eager=True)
    seg = seg1
    for _ in range(_UEC_ROUNDS):
        vocab = prune_cost_table(
            segmentation_cost_table(seg), words, keep_top=_UEC_KEEP)
        seg = _viterbi_core(words, vocab).localCheckpoint(eager=True)
    nv = (vocab.filter(F.length("token") > 1)
          .agg(F.count(F.lit(1)).alias("n_vocab_multi")))
    j = (seg1.select("word", "ln", "n_word",
                     F.col("ntoks").alias("ntoks0"))
         .join(seg.select("word", F.col("ntoks").alias("ntoksf"),
                          "cost"), "word"))
    return (j.groupBy(F.col("ln").alias("word_len"))
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum("n_word").alias("n_occurrences"),
                 (F.round((F.sum(F.col("ntoks0").cast("long")
                                 * F.col("n_word")) * F.lit(1_000_000))
                          .cast("double")
                          / F.sum("n_word").cast("double"))
                  / F.lit(1_000_000.0)).alias("fertility_r1"),
                 (F.round((F.sum(F.col("ntoksf").cast("long")
                                 * F.col("n_word")) * F.lit(1_000_000))
                          .cast("double")
                          / F.sum("n_word").cast("double"))
                  / F.lit(1_000_000.0)).alias("fertility_final"),
                 (F.round(F.sum(F.col("cost") * F.col("n_word"))
                          .cast("double")
                          / F.sum("n_word").cast("double"))
                  / F.lit(1_000_000.0)).alias("avg_cost_nats_final"))
            .crossJoin(F.broadcast(nv))
            .orderBy("word_len"))


def _unigram_converged_oracle(max_word_len: int = 12, max_sub: int = 4,
                              min_count: int = 2,
                              rounds: int = _UEC_ROUNDS,
                              keep_top: int = _UEC_KEEP) -> str:
    sql = f"""WITH wf AS MATERIALIZED (
  SELECT tk AS word, count(*) AS n_word
  FROM (SELECT unnest(regexp_extract_all(lower(text), '\\w+')) AS tk
        FROM documents) GROUP BY tk),
w12 AS MATERIALIZED (
  SELECT word, CAST(n_word AS BIGINT) AS n_word, length(word) AS ln
  FROM wf WHERE length(word) <= {max_word_len}),
grid AS MATERIALIZED (
  SELECT w.word, w.n_word, j.j, l.l,
         substr(w.word, CAST(j.j AS INT), CAST(l.l AS INT)) AS token
  FROM w12 w,
       unnest(generate_series(1, w.ln)) j(j),
       unnest(generate_series(1, least({max_sub}, w.ln - j.j + 1))) l(l)),
chars AS MATERIALIZED (SELECT DISTINCT token FROM grid WHERE l = 1),
cnt0 AS MATERIALIZED (
  SELECT token, CAST(sum(n_word) AS BIGINT) AS cnt FROM grid GROUP BY token),
tot0 AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM cnt0),
vocab1 AS MATERIALIZED (
  SELECT token, cnt,
         CAST(round(-ln(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE))
                    * 1000000.0, 0) AS BIGINT) AS cost
  FROM cnt0, tot0
  WHERE cnt >= {min_count} OR length(token) = 1)"""
    for r in range(1, rounds + 1):
        # backpointered DP round r on vocab{r}
        sql += f""",
r{r}edges AS MATERIALIZED (
  SELECT g.word, CAST(g.j - 1 AS INT) AS j, CAST(g.j - 1 + g.l AS INT) AS i,
         v.cost
  FROM grid g JOIN vocab{r} v USING (token)),
r{r}a0 AS (SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS cost, 0 AS ntoks,
                  -1 AS bj
           FROM w12)"""
        for k in range(1, max_word_len + 1):
            sql += f""",
r{r}d{k} AS MATERIALIZED (
  SELECT word, {k} AS pos, cost, ntoks, bj FROM (
    SELECT e.word, d.cost + e.cost AS cost, d.ntoks + 1 AS ntoks,
           e.j AS bj,
           row_number() OVER (PARTITION BY e.word
                              ORDER BY d.cost + e.cost, d.ntoks + 1, e.j)
             AS rn
    FROM r{r}edges e JOIN r{r}a{k-1} d ON d.word = e.word AND d.pos = e.j
    WHERE e.i = {k}) WHERE rn = 1),
r{r}a{k} AS MATERIALIZED (
  SELECT * FROM r{r}a{k-1} UNION ALL SELECT * FROM r{r}d{k})"""
        # backward path walk
        sql += f""",
r{r}p0 AS (SELECT word, ln AS pos FROM w12)"""
        for t in range(1, max_word_len + 1):
            sql += f""",
r{r}p{t} AS MATERIALIZED (
  SELECT p.word, d.bj AS pos,
         substr(p.word, CAST(d.bj + 1 AS INT), CAST(p.pos - d.bj AS INT))
           AS token
  FROM r{r}p{t-1} p JOIN r{r}a{max_word_len} d
    ON d.word = p.word AND d.pos = p.pos
  WHERE p.pos > 0)"""
        toks_union = " UNION ALL ".join(
            f"SELECT word, token FROM r{r}p{t}"
            for t in range(1, max_word_len + 1))
        # M-step usage re-scoring + the explicit prune
        sql += f""",
r{r}toks AS MATERIALIZED ({toks_union}),
r{r}usage AS MATERIALIZED (
  SELECT t.token, CAST(sum(w.n_word) AS BIGINT) AS cnt
  FROM r{r}toks t JOIN w12 w ON w.word = t.word GROUP BY t.token),
r{r}tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM r{r}usage),
r{r}scored AS MATERIALIZED (
  SELECT token, cnt,
         CAST(round(-ln(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE))
                    * 1000000.0, 0) AS BIGINT) AS cost
  FROM r{r}usage, r{r}tot),
r{r}fb AS (SELECT max(cost) + 1000000 AS fb FROM r{r}scored),
r{r}multi AS MATERIALIZED (
  SELECT token, cnt, cost,
         row_number() OVER (ORDER BY cnt * cost DESC, token) AS rk
  FROM r{r}scored WHERE length(token) > 1),
vocab{r + 1} AS MATERIALIZED (
  SELECT token, cnt, cost FROM r{r}multi WHERE rk <= {keep_top}
  UNION ALL
  SELECT c.token, CAST(coalesce(s.cnt, 0) AS BIGINT) AS cnt,
         coalesce(s.cost, fb.fb) AS cost
  FROM chars c
  LEFT JOIN (SELECT * FROM r{r}scored WHERE length(token) = 1) s
    USING (token), r{r}fb fb)"""
    # final DP on the twice-pruned vocabulary (no backpointers needed)
    fr = rounds + 1
    sql += f""",
fedges AS MATERIALIZED (
  SELECT g.word, CAST(g.j - 1 AS INT) AS j, CAST(g.j - 1 + g.l AS INT) AS i,
         v.cost
  FROM grid g JOIN vocab{fr} v USING (token)),
f0 AS (SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS cost, 0 AS ntoks
       FROM w12)"""
    for k in range(1, max_word_len + 1):
        sql += f""",
fd{k} AS MATERIALIZED (
  SELECT word, {k} AS pos, cost, ntoks FROM (
    SELECT e.word, d.cost + e.cost AS cost, d.ntoks + 1 AS ntoks,
           row_number() OVER (PARTITION BY e.word
                              ORDER BY d.cost + e.cost, d.ntoks + 1, e.j)
             AS rn
    FROM fedges e JOIN f{k-1} d ON d.word = e.word AND d.pos = e.j
    WHERE e.i = {k}) WHERE rn = 1),
f{k} AS MATERIALIZED (SELECT * FROM f{k-1} UNION ALL SELECT * FROM fd{k})"""
    sql += f""",
best1 AS (SELECT w.word, w.ln, w.n_word, d.ntoks AS ntoks0
          FROM w12 w JOIN r1a{max_word_len} d
            ON d.word = w.word AND d.pos = w.ln),
bestf AS (SELECT w.word, d.cost, d.ntoks AS ntoksf
          FROM w12 w JOIN f{max_word_len} d
            ON d.word = w.word AND d.pos = w.ln),
nv AS (SELECT CAST(count(*) AS BIGINT) AS n_vocab_multi
       FROM vocab{fr} WHERE length(token) > 1)
SELECT b1.ln AS word_len,
       count(*) AS n_words,
       CAST(sum(b1.n_word) AS BIGINT) AS n_occurrences,
       round(CAST(sum(CAST(b1.ntoks0 AS BIGINT) * b1.n_word) * 1000000
                  AS DOUBLE)
             / CAST(sum(b1.n_word) AS DOUBLE)) / 1000000.0
         AS fertility_r1,
       round(CAST(sum(CAST(bf.ntoksf AS BIGINT) * b1.n_word) * 1000000
                  AS DOUBLE)
             / CAST(sum(b1.n_word) AS DOUBLE)) / 1000000.0
         AS fertility_final,
       round(CAST(sum(bf.cost * b1.n_word) AS DOUBLE)
             / CAST(sum(b1.n_word) AS DOUBLE)) / 1000000.0
         AS avg_cost_nats_final,
       any_value(nv.n_vocab_multi) AS n_vocab_multi
FROM best1 b1 JOIN bestf bf USING (word) CROSS JOIN nv
GROUP BY b1.ln ORDER BY word_len"""
    return sql


ORACLE["unigram_em_converged_stats"] = _unigram_converged_oracle()

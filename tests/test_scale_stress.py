"""Scale-headroom stress tests: bigger-than-bench inputs with skew and
replication, asserting correctness (and implicitly, that the plans
hold up — these are the shapes that explode with a wrong join
strategy)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from luma_etl_data_platform_spark.operators.dedup import exact_dedup_groups
from luma_etl_data_platform_spark.operators.similarity import (
    cosine_topk, ivf_topk, signlsh_neardup_pairs,
)
from luma_etl_data_platform_spark.operators.skew import salted_join
from luma_etl_data_platform_spark.sources.tables import load_table
from tests.conftest import SF_CORRECT


def test_salted_join_correct_under_heavy_skew(spark):
    # 2M-row left side, 90% on one hot key — the classic straggler maker
    left = spark.range(2_000_000).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 42 ELSE id END AS k", "id AS lv")
    right = spark.range(5_000).selectExpr("id AS k", "id * 7 AS rv")
    t0 = time.perf_counter()
    n_salted = salted_join(left, right, "k", "inner", salt=16).count()
    t_salted = time.perf_counter() - t0
    n_plain = left.join(right, "k", "inner").count()
    assert n_salted == n_plain
    assert t_salted < 60


def test_exact_dedup_on_10x_replicated_corpus(spark):
    docs = load_table(spark, SF_CORRECT, "documents").select("doc_id", "text")
    replicated = docs
    for i in range(1, 10):
        replicated = replicated.unionByName(
            docs.select((F.col("doc_id") + i * 1_000_000).alias("doc_id"), "text"))
    n_docs = replicated.count()
    assert n_docs == 5000
    groups = exact_dedup_groups(replicated, "text", "doc_id")
    stats = groups.agg(F.count(F.lit(1)).alias("n_groups"),
                       F.sum("n_dups").alias("total"),
                       F.max("n_dups").alias("maxd")).collect()[0]
    assert stats["n_groups"] == 500          # one group per original doc
    assert stats["total"] == 5000
    assert stats["maxd"] == 10
    # representative = the lowest id — always from the original copy
    assert groups.filter(F.col("rep_id") >= 1_000_000).count() == 0


def test_ann_consistent_on_10x_corpus(spark):
    emb = load_table(spark, SF_CORRECT, "embeddings")
    big = emb
    for i in range(1, 10):
        big = big.unionByName(
            emb.select((F.col("vec_id") + i * 1_000_000).alias("vec_id"),
                       "embedding", "label"))
    assert big.count() == 5000
    q = emb.filter(F.col("vec_id") == 0)
    top = cosine_topk(big, q, k=30).collect()
    # vec 0 exists 10x (exact copies) → all ten replicas must lead with score 1.0
    leading = [r for r in top if r["score"] == 1.0]
    assert len(leading) == 10
    assert {r["vec_id"] % 1_000_000 for r in leading} == {0}
    # IVF probing every cluster equals brute force on the same corpus
    ivf = ivf_topk(big, q, k=30, nprobe=10).collect()
    assert [(r["vec_id"], r["score"]) for r in ivf] == \
           [(r["vec_id"], r["score"]) for r in top]


def test_signlsh_finds_all_exact_duplicate_pairs(spark):
    emb = load_table(spark, SF_CORRECT, "embeddings").limit(200)
    big = emb.unionByName(
        emb.select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label"))
    pairs = signlsh_neardup_pairs(big, threshold=0.999999).collect()
    # exact duplicates agree on every plane sign → collide in every
    # band → all 200 replica pairs MUST be found (no false negatives
    # at cos = 1), and verification keeps only true near-dups
    dup_pairs = {(r["id_a"], r["id_b"]) for r in pairs
                 if r["id_b"] - r["id_a"] == 1_000_000}
    assert len(dup_pairs) == 200
    assert all(r["score"] >= 0.999999 for r in pairs)


def test_pagerank_on_100k_edge_graph_is_stable(spark):
    """Preferential-attachment-ish random graph (hubs + long tail):
    10 integer-carriage iterations must complete, conserve rank mass
    approximately (floors only lose mass), and be bit-identical under
    repartitioning."""
    import random
    from luma_etl_data_platform_spark.operators.graph import pagerank
    rnd = random.Random(11)
    edges = list({(min(a, b), max(a, b))
                  for _ in range(100_000)
                  # skewed endpoint choice → hot hubs
                  for a in [rnd.randint(0, rnd.choice([50, 5000]))]
                  for b in [rnd.randint(0, 5000)] if a != b})
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    t0 = time.perf_counter()
    r1 = pagerank(df, iterations=10)
    rows = r1.collect()
    assert time.perf_counter() - t0 < 120
    total = sum(r["rank_scaled"] for r in rows)
    assert 0.5 * 1_000_000_000_000 < total <= 1_000_000_000_000
    r2 = sorted(tuple(r) for r in pagerank(df.repartition(29),
                                           iterations=10).collect())
    assert sorted(tuple(r) for r in rows) == r2


def test_kmv_estimates_on_2m_rows(spark):
    """2M rows, 4 groups with overlapping 25k-value spaces: per-group
    estimates must land within 4 sigma (RSE ≈ 1/sqrt(k-2)) of the
    truth and the merged union sketch must track the global distinct
    count (not the sum of the groups')."""
    from luma_etl_data_platform_spark.operators.sketches import (
        kmv_estimate, kmv_sketch, kmv_union)
    # group g (= id%4) sees v = (id%100000) + g*25000 where
    # id%100000 ≡ g (mod 4) → exactly 25 000 distinct v per group
    df = spark.range(2_000_000).selectExpr(
        "CAST(id % 4 AS STRING) AS g",
        "CAST(id % 100000 + (id % 4) * 25000 AS LONG) AS v")
    sk = kmv_sketch(df, "g", "v", k=256)
    est = {r["g"]: r["est_distinct"]
           for r in kmv_estimate(sk, "g", k=256).collect()}
    for g in est:
        assert abs(est[g] - 25_000) / 25_000 < 0.25
    uni = kmv_union(sk, group_expr=F.lit("all"), k=256)
    uest = kmv_estimate(uni, "g", k=256).collect()[0]["est_distinct"]
    # union of the 4 groups' value spaces = 175k distinct values
    truth = df.selectExpr("v").distinct().count()
    assert abs(uest - truth) / truth < 0.25

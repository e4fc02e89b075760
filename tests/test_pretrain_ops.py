"""Semantics tests for the round-3 pretraining-corpus operators
(registry parity vs DuckDB is covered by test_warehouse_queries.py's
sweep; these check operator-level invariants on hand-built inputs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from luma_etl_data_platform_spark.operators.curation import hashed_linear_scores
from luma_etl_data_platform_spark.operators.sketches import (
    kmv_pair_jaccard, kmv_sketch,
)
from luma_etl_data_platform_spark.operators.spans import duplicated_spans


def test_duplicated_spans_merges_maximal_run(spark):
    shared = " ".join(f"w{i}" for i in range(12))          # 12-token run
    df = spark.createDataFrame(
        [(1, "alpha beta " + shared + " gamma delta"),
         (2, shared + " unrelated tail tokens here now"),
         (3, "totally different words " * 5)],
        ["doc_id", "text"],
    )
    spans = {r["doc_id"]: r for r in
             duplicated_spans(df, "text", "doc_id", k=10).collect()}
    # doc 3 shares nothing >= 10 tokens
    assert set(spans) == {1, 2}
    # 12-token run => 3 windows (k=10) merged into ONE maximal span
    assert spans[1]["span_tokens"] == 12
    assert spans[2]["span_tokens"] == 12
    # positions: doc1's run starts at token 3, doc2's at token 1
    assert spans[1]["span_start"] == 3
    assert spans[2]["span_start"] == 1


def test_duplicated_spans_requires_cross_doc(spark):
    rep = " ".join(["x"] * 40)     # internal repetition only, one doc
    df = spark.createDataFrame([(1, rep), (2, "other words entirely")],
                               ["doc_id", "text"])
    # windows repeat WITHIN doc 1 but no other doc shares them...
    # except identical windows of 'x'*10 appear only in doc 1
    assert duplicated_spans(df, "text", "doc_id", k=10).count() == 0


def test_hashed_linear_scores_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "entirely different content words go here")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in
            hashed_linear_scores(df, "text", "doc_id").collect()}
    assert rows[1]["score"] == rows[2]["score"]          # pure function
    assert rows[1]["n_tokens"] == 9
    for r in rows.values():
        assert -1.0 <= r["score"] <= 1.0                 # mean of [-1,1]


def test_ccnet_buckets_deterministic_terciles(spark):
    """CCNet perplexity bucketing: reference-like docs land in head,
    gibberish in tail; buckets are value-thresholded (ties go low) so
    the assignment is identical under any partitioning; tercile sizes
    honor ceil(n/3) on the k-th-smallest thresholds."""
    from luma_etl_data_platform_spark.operators.ranking import (
        ccnet_perplexity_buckets,
    )
    ref_text = "the cat sat on the mat and the dog sat too"
    rows = [(i, ref_text, True) for i in range(1, 4)]          # reference
    rows += [(i, "the cat sat on the mat", False)
             for i in range(4, 7)]                             # ref-like
    rows += [(i, f"zxq{i} qqv{i} jjk{i} wmm{i}", False)
             for i in range(7, 10)]                            # gibberish
    df = spark.createDataFrame(rows, ["doc_id", "text", "is_ref"])
    got = {r["id"]: r for r in
           ccnet_perplexity_buckets(df, "is_ref").collect()}
    assert len(got) == 9
    # ref-like docs score strictly better (lower nll) than gibberish
    assert max(got[i]["nll_milli"] for i in range(1, 7)) < \
        min(got[i]["nll_milli"] for i in range(7, 10))
    assert all(got[i]["bucket"] == "tail" for i in range(7, 10))
    # reference-like docs fill head+middle; terciles are 3/3/3
    assert all(got[i]["bucket"] in ("head", "middle")
               for i in range(1, 7))
    from collections import Counter
    assert Counter(v["bucket"] for v in got.values()) == {
        "head": 3, "middle": 3, "tail": 3}
    # partitioning-independent: same assignment at 1 partition
    got1 = {r["id"]: r["bucket"] for r in
            ccnet_perplexity_buckets(
                df.coalesce(1), "is_ref").collect()}
    assert got1 == {k: v["bucket"] for k, v in got.items()}


def test_kmv_pair_jaccard_exact_when_under_k(spark):
    # groups small enough that the sketch IS the value set -> estimates
    # must equal the exact Jaccard / union
    rows = ([("a", v) for v in range(20)]
            + [("b", v) for v in range(10, 30)])          # |inter|=10 |union|=30
    df = spark.createDataFrame(rows, ["g", "v"])
    sk = kmv_sketch(df, "g", "v", k=64)
    out = kmv_pair_jaccard(sk, "g", k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert r["g_a"] == "a" and r["g_b"] == "b"
    assert r["est_union"] == 30.0
    assert r["n_both"] == 10
    assert abs(r["est_jaccard"] - 10 / 30) < 1e-6


def test_kmv_pair_jaccard_estimates_under_sketching(spark):
    # big overlap, k << n: estimate should land near the true value
    rows = ([("a", v) for v in range(1000)]
            + [("b", v) for v in range(500, 1500)])       # true J = 1/3
    df = spark.createDataFrame(rows, ["g", "v"])
    sk = kmv_sketch(df, "g", "v", k=128)
    r = kmv_pair_jaccard(sk, "g", k=128).collect()[0]
    assert r["n_union_sketch"] == 128
    assert 0.15 < r["est_jaccard"] < 0.55                 # RSE ~ 1/sqrt(k)
    assert 900 < r["est_union"] < 2300


def test_curation_funnel_monotone(spark):
    from luma_etl_data_platform_spark.plans.pretrain_ops import (
        curation_funnel_report,
    )
    rows = curation_funnel_report(spark, "/root/testdata/sf0.001").collect()
    assert [r["stage"] for r in rows] == [
        "00_ingest", "01_lang", "02_gopher", "03_template_dedup",
        "04_span_clean", "05_classifier"]
    docs = [r["n_docs"] for r in rows]
    toks = [r["n_tokens"] for r in rows]
    assert docs == sorted(docs, reverse=True)      # each stage only removes
    assert toks == sorted(toks, reverse=True)
    assert docs[0] > 0

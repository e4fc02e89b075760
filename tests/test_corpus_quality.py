"""Unit tests for the round-3 corpus-quality batch: repetition
profile, BPE pair counts, count-min sketch, weighted sampling."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from luma_etl_data_platform_spark.operators.bpe import (
    bpe_pair_counts, word_frequencies)
from luma_etl_data_platform_spark.operators.curation import repetition_profile
from luma_etl_data_platform_spark.operators.sampling import weighted_sample
from luma_etl_data_platform_spark.operators.sketches import (
    cms_estimate, cms_lanes)


def test_repetition_profile_hand_computed(spark):
    # "a b a b c" → bigrams: (a b)x2, (b a), (b c) → top2 = 2*2/5,
    # dup2 = 2*2/5; trigrams: all distinct → top3 = 3/5, dup3 = 0.
    df = spark.createDataFrame([Row(doc_id=1, text="a b a b c")])
    row = repetition_profile(df, "text", "doc_id", ns=(2, 3)).collect()[0]
    assert row["n_tokens"] == 5
    assert row["top2gram_frac"] == round(2 * 2 / 5, 6)
    assert row["dup2gram_frac"] == round(2 * 2 / 5, 6)
    assert row["top3gram_frac"] == round(1 * 3 / 5, 6)
    assert row["dup3gram_frac"] == 0.0


def test_repetition_profile_short_doc_has_null_trigram(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="x y")])
    row = repetition_profile(df, "text", "doc_id", ns=(2, 3)).collect()[0]
    assert row["top2gram_frac"] == round(2 / 2, 6)
    assert row["top3gram_frac"] is None  # no trigrams exist


def test_word_frequencies_collapse(spark):
    df = spark.createDataFrame([Row(text="the cat the dog"),
                                Row(text="the cat")])
    freq = {r["word"]: r["n_word"]
            for r in word_frequencies(df, "text").collect()}
    assert freq == {"the": 3, "cat": 2, "dog": 1}


def test_bpe_pair_counts_hand_computed(spark):
    # corpus: "ab ab b" → words: ab(x2), b(x1)
    # ab → (a,b) x2, (b,</w>) x2 ; b → (b,</w>) x1
    df = spark.createDataFrame([Row(text="ab ab b")])
    pairs = {(r["left"], r["right"]): r["pair_count"]
             for r in bpe_pair_counts(df, "text").collect()}
    assert pairs == {("a", "b"): 2, ("b", "</w>"): 3}


def test_cms_estimate_is_one_sided(spark):
    # CMS never underestimates: est >= exact for every key.
    rows = [Row(k=f"u{i % 7}") for i in range(200)]
    df = spark.createDataFrame(rows)
    lanes = cms_lanes(df, "k", depth=4, width=64)
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    est = cms_estimate(lanes, exact, "k", depth=4, width=64)
    joined = exact.join(est, "k").collect()
    assert len(joined) == 7
    for r in joined:
        assert r["cms_est"] >= r["n"]


def test_cms_lanes_bounded_size(spark):
    df = spark.createDataFrame([Row(k=str(i)) for i in range(500)])
    lanes = cms_lanes(df, "k", depth=3, width=16)
    assert lanes.count() <= 3 * 16
    # each lane row sums to the total input count
    per_row = lanes.groupBy("_row").agg(F.sum("_cnt").alias("s")).collect()
    assert {r["s"] for r in per_row} == {500}


def test_weighted_sample_exact_and_deterministic(spark):
    df = spark.createDataFrame(
        [Row(id=i, w=(i % 5) + 1) for i in range(100)])
    s1 = weighted_sample(df, "id", "w", k=10).select("id").collect()
    s2 = weighted_sample(df.repartition(7), "id", "w", k=10).select(
        "id").collect()
    assert [r["id"] for r in s1] == [r["id"] for r in s2]  # partition-stable
    assert len(s1) == 10


def test_weighted_sample_prefers_heavy_rows(spark):
    # weight 100 vs weight 1: the heavy half should dominate the
    # sample (priority = u/w, so heavy rows draw ~100x smaller keys).
    df = spark.createDataFrame(
        [Row(id=i, w=100 if i < 500 else 1) for i in range(1000)])
    got = weighted_sample(df, "id", "w", k=50).collect()
    heavy = sum(1 for r in got if r["w"] == 100)
    assert heavy >= 45


def test_weighted_sample_drops_nonpositive_weights(spark):
    df = spark.createDataFrame([Row(id=1, w=0), Row(id=2, w=-3),
                                Row(id=3, w=5)])
    got = weighted_sample(df, "id", "w", k=10).collect()
    assert [r["id"] for r in got] == [3]


def test_budget_pack_hand_computed(spark):
    # scores: a=3.0(10 tok), b=2.0(15), c=2.0(5), d=1.0(100)
    # order: a, b, c (score desc, id asc) → cum 10, 25, 30; budget 30
    # keeps a,b,c; d would push to 130 → dropped.
    from luma_etl_data_platform_spark.operators.curation import budget_pack
    df = spark.createDataFrame([
        Row(id="a", score=3.0, tok=10), Row(id="b", score=2.0, tok=15),
        Row(id="c", score=2.0, tok=5), Row(id="d", score=1.0, tok=100),
    ])
    got = {r["id"]: r["cum_tokens"]
           for r in budget_pack(df, "id", "score", "tok", 30).collect()}
    assert got == {"a": 10, "b": 25, "c": 30}


def test_budget_pack_quantized_never_overspends(spark):
    """score_decimals coarsens the bucket key (continuous-score
    escape hatch): at ANY quantization the selection stays within
    budget, stays deterministic under repartitioning, and coarser
    keys collapse the distinct-bucket set the serial window runs
    over."""
    import random
    from luma_etl_data_platform_spark.operators.curation import budget_pack
    rng = random.Random(8)
    rows = [Row(id=i, score=rng.uniform(0.0, 1.0), tok=1 + i % 13)
            for i in range(300)]
    df = spark.createDataFrame(rows)
    budget = 700
    for dec in (6, 3, 1, 0):
        got = budget_pack(df, "id", "score", "tok", budget,
                          score_decimals=dec)
        rows_out = got.collect()
        assert max(r["cum_tokens"] for r in rows_out) <= budget
        # repartition-stable at every quantization
        again = sorted(r["id"] for r in budget_pack(
            df.repartition(11), "id", "score", "tok", budget,
            score_decimals=dec).collect())
        assert again == sorted(r["id"] for r in rows_out)
    # coarser key → fewer distinct buckets for the serial window
    n6 = df.select(F.floor(F.col("score") * 1e6 + 0.5)).distinct().count()
    n1 = df.select(F.floor(F.col("score") * 10 + 0.5)).distinct().count()
    assert n1 < n6


def test_budget_pack_partition_stable(spark):
    from luma_etl_data_platform_spark.operators.curation import budget_pack
    rows = [Row(id=i, score=float(i % 7), tok=10) for i in range(100)]
    df = spark.createDataFrame(rows)
    a = sorted(r["id"] for r in budget_pack(df, "id", "score", "tok",
                                            300).collect())
    b = sorted(r["id"] for r in budget_pack(df.repartition(13), "id",
                                            "score", "tok", 300).collect())
    assert a == b and len(a) == 30


def test_nearest_centroid_perfect_separation(spark):
    # two well-separated clusters on axis-aligned unit vectors →
    # every vector classifies to its own label (diagonal confusion).
    from luma_etl_data_platform_spark.operators.similarity import (
        nearest_centroid_confusion)
    rows = []
    for i in range(10):
        rows.append(Row(vec_id=i, label=0,
                        embedding=[1.0, 0.01 * i, 0.0, 0.0]))
        rows.append(Row(vec_id=100 + i, label=1,
                        embedding=[0.0, 0.0, 1.0, 0.01 * i]))
    df = spark.createDataFrame(rows)
    got = {(r["label"], r["predicted"]): r["n_vecs"]
           for r in nearest_centroid_confusion(df).collect()}
    assert got == {(0, 0): 10, (1, 1): 10}


def test_bpe_train_toy_corpus(spark):
    # low x3, lower, lowest, new, newer → merges: (l,o)=5, (lo,w)=5,
    # (low,</w>)=3 (the three whole-word 'low's), then (e,r)=2.
    from luma_etl_data_platform_spark.operators.bpe import bpe_train
    df = spark.createDataFrame([Row(text="low low lower lowest"),
                                Row(text="low new newer")])
    got = [(m["left"], m["right"], m["pair_count"])
           for m in bpe_train(df, "text", 4)]
    assert got == [("l", "o", 5), ("lo", "w", 5),
                   ("low", "</w>", 3), ("e", "r", 2)]


def test_bpe_train_stops_when_fully_merged(spark):
    # single word: merges exhaust after len(word)+1 symbols collapse
    from luma_etl_data_platform_spark.operators.bpe import bpe_train
    df = spark.createDataFrame([Row(text="ab")])
    got = bpe_train(df, "text", 10)
    # 'a b </w>' → (a,b) then (ab,</w>) then nothing left
    assert [(m["left"], m["right"]) for m in got] == [
        ("a", "b"), ("ab", "</w>")]


def test_bpe_encode_stats_hand_computed(spark):
    # corpus 'aa ab' ×2 docs: merges learned on {aa:2, ab:2};
    # after 5 merges both words collapse to single tokens, so
    # fertility == 1 token per word in vocab terms is NOT guaranteed —
    # instead verify the invariants: every word maps to >= 1 token and
    # total chars equals the raw character mass of the word stream
    from pyspark.sql import functions as F
    from luma_etl_data_platform_spark.functions.text import tokens
    from luma_etl_data_platform_spark.operators.bpe import bpe_vocab
    docs = spark.createDataFrame(
        [(1, "aa ab", "s1"), (2, "aa ab", "s1")],
        "doc_id long, text string, source string")
    vocab = bpe_vocab(docs, "text", n_merges=5)
    seg = vocab.select(
        F.replace(F.replace(F.col("symbols"), F.lit(" "), F.lit("")),
                  F.lit("</w>"), F.lit("")).alias("word"),
        F.size(F.split(F.trim(F.col("symbols")), " ")).alias("n_tok"))
    rows = {r["word"]: r["n_tok"] for r in seg.collect()}
    assert set(rows) == {"aa", "ab"}
    assert all(v >= 1 for v in rows.values())
    words = docs.select(F.explode(tokens(F.col("text"))).alias("word"))
    total_chars = (words.join(seg, "word")
                   .agg(F.sum(F.length("word"))).collect()[0][0])
    assert total_chars == 8  # 2 docs x 2 words x 2 chars


def test_pca_two_point_direction(spark):
    # two points: component must align with their difference (0.5, 3)
    from luma_etl_data_platform_spark.operators.pca import pca_top_component
    df = spark.createDataFrame([([1.0, 2.0],), ([0.5, -1.0],)],
                               "embedding array<double>")
    rows = {r["dim"]: r for r in
            pca_top_component(spark, df, "embedding", 2).collect()}
    import math
    exp = (0.5 / math.hypot(0.5, 3.0), 3.0 / math.hypot(0.5, 3.0))
    assert abs(rows[0]["loading"] - exp[0]) < 1e-4
    assert abs(rows[1]["loading"] - exp[1]) < 1e-4
    # rank-1 scatter → the top component explains everything
    assert abs(rows[0]["explained_share"] - 1.0) < 1e-6


def test_pca_partitioning_invariant(spark):
    from luma_etl_data_platform_spark.operators.pca import pca_top_component
    import random
    rng = random.Random(7)
    data = [([rng.uniform(-1, 1) for _ in range(8)],) for _ in range(200)]
    df = spark.createDataFrame(data, "embedding array<double>")
    a = pca_top_component(spark, df.coalesce(1), "embedding", 8).collect()
    b = pca_top_component(spark, df.repartition(16), "embedding", 8).collect()
    assert a == b


def test_pca_sign_convention(spark):
    # flipping every vector must leave the component unchanged (sign
    # is fixed from the iterate, not the data orientation)
    from pyspark.sql import functions as F
    from luma_etl_data_platform_spark.operators.pca import pca_top_component
    df = spark.createDataFrame(
        [([1.0, 2.0, 0.25],), ([0.5, -1.0, 0.75],), ([0.1, 0.9, -0.3],)],
        "embedding array<double>")
    neg = df.select(F.transform("embedding", lambda x: -x).alias("embedding"))
    a = pca_top_component(spark, df, "embedding", 3).collect()
    b = pca_top_component(spark, neg, "embedding", 3).collect()
    la = [r["loading"] for r in a]
    lb = [r["loading"] for r in b]
    assert la == lb or la == [-x for x in lb]
    big = max(la, key=abs)
    assert big >= 0


def test_kmeans_separates_two_blobs(spark):
    from luma_etl_data_platform_spark.operators.kmeans import kmeans_clusters
    # two well-separated direction blobs in 4-d; k=2 must split 12/8
    rows = []
    for i in range(12):
        rows.append((i, [1.0, 0.9 + 0.01 * i, 0.0, 0.0]))
    for i in range(12, 20):
        rows.append((i, [0.0, 0.0, 1.0, 0.9 + 0.01 * i]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_clusters(spark, df, k=2, iters=2, dim=4).collect()
    assert sorted(r["n_vecs"] for r in out) == [8, 12]
    assert all(r["avg_cos"] > 0.99 for r in out)


def test_kmeans_partitioning_invariant(spark):
    from luma_etl_data_platform_spark.operators.kmeans import kmeans_clusters
    import random
    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = kmeans_clusters(spark, df.coalesce(1), k=4, iters=2, dim=6).collect()
    b = kmeans_clusters(spark, df.repartition(16), k=4, iters=2,
                        dim=6).collect()
    assert a == b


def test_truncation_recall_full_dim_is_exact(spark, duck_smoke):
    from luma_etl_data_platform_spark.plans import corpus_quality as CQ
    from tests.conftest import SF_SMOKE
    out = {r["trunc_dim"]: r for r in
           CQ.QUERIES["ann_truncation_recall"](spark, SF_SMOKE).collect()}
    # the full-dim cut is its own ground truth
    assert out[64]["recall_at_1"] == 1.0
    # truncation can only lose neighbors, never invent better ones
    assert out[8]["recall_at_1"] <= out[64]["recall_at_1"]

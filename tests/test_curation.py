"""Tests for corpus-curation operators: quality rules, stratified
sampling, domain mixing, sequence packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from luma_etl_data_platform_spark.operators import curation as C
from luma_etl_data_platform_spark.functions import text as X
from luma_etl_data_platform_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_gopher_rules_flag_known_docs(spark):
    df = spark.createDataFrame(
        [
            # long enough, normal shape, has stopwords, low repetition
            (1, "the quick brown fox jumps over a lazy dog and then "
                "runs far away to the old green hill in clear morning light"),
            (2, "spam spam spam spam spam spam spam spam spam spam "
                "spam spam spam spam spam spam spam spam spam spam spam"),
            (3, "too short"),
        ],
        "id long, text string",
    )
    flags = C.gopher_rule_flags(F.col("text"))
    rows = {r["id"]: r for r in
            df.select("id", *[v.alias(k) for k, v in flags.items()]).collect()}
    assert rows[1]["pass_wc"] and rows[1]["pass_stop"] and rows[1]["pass_rep"]
    assert not rows[2]["pass_rep"]        # pure repetition
    assert not rows[3]["pass_wc"]         # below the token floor


def test_stratified_flag_deterministic_and_rate_shaped(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    keep = C.stratified_sample_flag(
        F.col("lang"), F.col("doc_id"), {"en": 50}, default_pct=0)
    s1 = docs.filter(keep).select("doc_id", "lang")
    s2 = docs.repartition(7).filter(keep).select("doc_id", "lang")
    # reproducible across partitioning
    assert sorted(r["doc_id"] for r in s1.collect()) == \
           sorted(r["doc_id"] for r in s2.collect())
    # default 0% excludes every non-en stratum entirely
    assert s1.filter(F.col("lang") != "en").count() == 0
    n_en = docs.filter(F.col("lang") == "en").count()
    if n_en >= 20:
        frac = s1.count() / n_en
        assert 0.25 < frac < 0.75


def test_domain_mix_weights_sum_property(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    w = C.domain_mix_weights(docs, "source", X.token_count(F.col("text")))
    rows = w.collect()
    # shares sum to 1; weight is inverse-proportional to share
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-3
    n_dom = len(rows)
    for r in rows:
        expected = (1.0 / n_dom) / (r["domain_tokens"] /
                                    sum(x["domain_tokens"] for x in rows))
        assert abs(r["mix_weight"] - expected) < 1e-4


def test_pack_sequences_conserves_docs_and_tokens(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    ntok = X.token_count(F.col("text"))
    packed = C.pack_sequences(docs, "doc_id", ntok, ctx_len=256, n_buckets=8)
    totals = packed.agg(F.sum("n_docs").alias("d"),
                        F.sum("chunk_tokens").alias("t")).collect()[0]
    src = docs.agg(F.count(F.lit(1)).alias("d"),
                   F.sum(ntok).alias("t")).collect()[0]
    assert totals["d"] == src["d"] and totals["t"] == src["t"]
    # chunk indices within each bucket form a contiguous 0..max range
    per_bucket = (packed.groupBy("bucket")
                  .agg(F.min("chunk").alias("lo"), F.max("chunk").alias("hi"),
                       F.count(F.lit(1)).alias("n")).collect())
    for r in per_bucket:
        assert r["lo"] == 0 and r["n"] == r["hi"] + 1
    # invariant to input partitioning
    p2 = C.pack_sequences(docs.repartition(11), "doc_id", ntok,
                          ctx_len=256, n_buckets=8)
    assert sorted(map(tuple, packed.collect())) == sorted(map(tuple, p2.collect()))

"""Tests for deterministic sampling/split/trim operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from luma_etl_data_platform_spark.operators.sampling import (
    deterministic_sample, quantile_trim, train_test_split,
)
from luma_etl_data_platform_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_split_is_disjoint_exhaustive_reproducible(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    tr1, te1 = train_test_split(docs, "doc_id", 0.2)
    tr2, te2 = train_test_split(docs, "doc_id", 0.2)
    n = docs.count()
    assert tr1.count() + te1.count() == n
    assert tr1.join(te1, "doc_id", "inner").count() == 0
    # reproducible across invocations AND repartitioning
    assert te1.select("doc_id").orderBy("doc_id").collect() == \
           te2.repartition(7).select("doc_id").orderBy("doc_id").collect()
    # roughly the requested fraction
    assert 0.1 < te1.count() / n < 0.3


def test_deterministic_sample_subset_semantics(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    s10 = deterministic_sample(docs, "doc_id", 0.10)
    s20 = deterministic_sample(docs, "doc_id", 0.20)
    # nested fractions: the 10% sample is contained in the 20% sample
    assert s10.join(s20, "doc_id", "left_anti").count() == 0
    assert s10.count() <= s20.count()


def test_quantile_trim_bounds(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    trimmed = quantile_trim(ev, "event_type", "value", 0.1, 0.9)
    assert 0 < trimmed.count() < ev.count()
    # every surviving value sits within its group's trim bounds
    joined = (trimmed.groupBy("event_type")
              .agg(F.min("value").alias("lo"), F.max("value").alias("hi")))
    orig = (ev.groupBy("event_type")
            .agg(F.expr("percentile(value, 0.1)").alias("qlo"),
                 F.expr("percentile(value, 0.9)").alias("qhi")))
    for r in joined.join(orig, "event_type").collect():
        assert r["lo"] >= r["qlo"] - 1e-9 and r["hi"] <= r["qhi"] + 1e-9

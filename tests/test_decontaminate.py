"""Train/test decontamination and PII redaction operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from luma_etl_data_platform_spark.functions.cleansing import redact_pii
from luma_etl_data_platform_spark.operators.decontaminate import (
    contamination_report, decontaminate,
)


def _corpora(spark):
    train = spark.createDataFrame([
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "a completely different training document about spark"),
        (3, "quick brown fox appears here too with more text"),
    ], ["doc_id", "text"])
    test = spark.createDataFrame([
        (100, "benchmark asks about the quick brown fox story"),
    ], ["doc_id", "text"])
    return train, test


def test_decontaminate_removes_overlapping_docs(spark):
    train, test = _corpora(spark)
    # docs 1 and 3 share the 3-gram "quick brown fox" with the test set
    clean = decontaminate(train, test)
    assert [r["doc_id"] for r in clean.collect()] == [2]


def test_contamination_report_counts_shared_shingles(spark):
    train, test = _corpora(spark)
    rep = {r["doc_id"]: r["n_shared_shingles"]
           for r in contamination_report(train, test).collect()}
    assert set(rep) == {1, 3}
    # doc 1 shares "the quick brown" + "quick brown fox"; doc 3 only
    # "quick brown fox" (its next words diverge from the test doc)
    assert rep[1] == 2
    assert rep[3] == 1


def test_decontaminate_min_shared_threshold(spark):
    train, test = _corpora(spark)
    clean = decontaminate(train, test, min_shared=2)
    assert sorted(r["doc_id"] for r in clean.collect()) == [2, 3]


def test_decontaminate_empty_test_keeps_all(spark):
    train, _ = _corpora(spark)
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert decontaminate(train, empty).count() == train.count()


def test_containment_catches_quoted_subdocument(spark):
    """A short doc quoted inside a long one: Jaccard stays below 0.5
    (union dominated by the long doc) but containment is 1.0."""
    from luma_etl_data_platform_spark.operators.dedup import (
        ngram_containment_pairs, ngram_jaccard_pairs,
    )
    short = "alpha beta gamma delta epsilon"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, short), (2, f"{filler} {short} {filler}")], ["doc_id", "text"])
    jac = ngram_jaccard_pairs(df, "text", "doc_id", threshold=0.5).collect()
    assert jac == []  # symmetric metric misses it
    cont = ngram_containment_pairs(df, "text", "doc_id", threshold=0.8).collect()
    assert [(r["id_a"], r["id_b"], r["containment"]) for r in cont] == [(1, 2, 1.0)]


def test_repetition_ratio_flags_boilerplate(spark):
    from luma_etl_data_platform_spark.functions.text import repetition_ratio
    df = spark.createDataFrame([
        (1, "spam phrase again " * 20),          # one 3-gram cycle repeated
        (2, " ".join(f"unique{i}" for i in range(60))),
        (3, "too short"),
    ], ["doc_id", "text"])
    got = {r["doc_id"]: r["rep"] for r in
           df.select("doc_id",
                     repetition_ratio(F.col("text")).alias("rep")).collect()}
    assert got[1] > 0.9
    assert got[2] == 0.0
    assert got[3] == 0.0
    df = spark.createDataFrame([
        (1, "mail a.b+c@x-corp.io, ssn 123-45-6789, call 555-123-4567 now"),
        (2, "clean text with number 12345 and date 2024-01-01"),
    ], ["id", "t"])
    out = {r["id"]: r["red"] for r in
           df.select("id", redact_pii(F.col("t")).alias("red")).collect()}
    assert out[1] == "mail [EMAIL], ssn [SSN], call [PHONE] now"
    assert out[2] == "clean text with number 12345 and date 2024-01-01"

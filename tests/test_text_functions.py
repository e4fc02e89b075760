"""Unit tests for the text-analysis column library edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from luma_etl_data_platform_spark.functions import text as X


def _one(spark, text, expr):
    return spark.createDataFrame([(text,)], ["t"]).select(
        expr(F.col("t")).alias("v")).collect()[0]["v"]


def test_lang_id_markers_and_ties(spark):
    assert _one(spark, "the cat and the dog", X.lang_id) == "en"
    assert _one(spark, "el perro y la casa que", X.lang_id) == "es"
    assert _one(spark, "le chien et la maison", X.lang_id) == "fr"
    # tie between es and fr ('la', 'de', 'que' shared) → es (alphabetical)
    assert _one(spark, "la de que", X.lang_id) == "es"
    assert _one(spark, "zzz qqq www", X.lang_id) == "und"
    assert _one(spark, "", X.lang_id) == "und"


def test_quality_score_bounds_and_monotonicity(spark):
    short = _one(spark, "word", X.quality_score)
    longer = _one(spark, "the " * 60 + "meaningful words here", X.quality_score)
    assert 0.0 <= short <= 1.0 and 0.0 <= longer <= 1.0
    assert longer > short


def test_shingles_edges(spark):
    assert _one(spark, "a b", lambda c: X.shingles(c, 3)) == []
    assert _one(spark, "a b c", lambda c: X.shingles(c, 3)) == ["a b c"]
    got = _one(spark, "a b c d", lambda c: X.shingles(c, 3))
    assert got == ["a b c", "b c d"]
    # repeated shingles dedupe
    got2 = _one(spark, "x y x y x y x y", lambda c: X.shingles(c, 2))
    assert sorted(got2) == ["x y", "y x"]


def test_fingerprint_normalization_invariance(spark):
    a = _one(spark, "The  CAT sat!", X.fingerprint)
    b = _one(spark, "the cat SAT", X.fingerprint)
    c = _one(spark, "the dog sat", X.fingerprint)
    assert a == b and a != c


def test_portable_hash_seed_sensitivity(spark):
    h0 = _one(spark, "abc", lambda c: X.portable_hash32(c, 0))
    h1 = _one(spark, "abc", lambda c: X.portable_hash32(c, 1))
    assert h0 != h1
    assert 0 <= h0 < 2 ** 32 and 0 <= h1 < 2 ** 32


def test_token_count_and_stopword_ratio(spark):
    assert _one(spark, "one two three", X.token_count) == 3
    assert _one(spark, "", X.token_count) == 0
    r = _one(spark, "the a of and xyz", X.stopword_ratio)
    assert abs(r - 0.8) < 1e-9
    assert _one(spark, "", X.stopword_ratio) == 0.0

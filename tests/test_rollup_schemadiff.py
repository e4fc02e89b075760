"""Tests for continuous rollup maintenance and schema reconciliation."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from luma_etl_data_platform_spark.operators.validate import (
    apply_expected_schema, schema_diff,
)
from luma_etl_data_platform_spark.sources.tables import load_table
from luma_etl_data_platform_spark.streaming.rollup import continuous_rollup
from tests.conftest import SF_SMOKE


def test_continuous_rollup_converges_to_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    load_table(spark, SF_SMOKE, "events").write.parquet(src)
    schema = spark.read.parquet(src).schema
    rollup = str(tmp_path / "rollup")

    # two passes with fresh checkpoints: second replay must NOT double
    # counts? It WILL re-add (rollup merge is additive per batch), so
    # run once and compare; idempotence is the ledger layer's job.
    stream = spark.readStream.schema(schema).parquet(src)
    q = continuous_rollup(stream, rollup, str(tmp_path / "ck"))
    q.awaitTermination(120)

    got = {(r["bucket_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 2))
           for r in spark.read.parquet(rollup).collect()}
    batch = (spark.read.parquet(src)
             .groupBy(F.date_trunc("hour", "ts").alias("b"), "event_type")
             .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s")))
    want = {(r["b"], r["event_type"]): (r["n"], r["s"]) for r in batch.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 0.01


def test_freshness_check(spark):
    import datetime as dt
    from luma_etl_data_platform_spark.operators.validate import check_freshness
    ev = load_table(spark, SF_SMOKE, "events")
    # max ts in the data is 2024-01-30T23:26; a "now" one hour later passes
    now = dt.datetime(2024, 1, 31, 0, 0)
    assert check_freshness(ev, "ts", max_age_seconds=7200, now=now).ok
    assert not check_freshness(ev, "ts", max_age_seconds=600, now=now).ok
    empty = ev.filter("user_id < 0")
    res = check_freshness(empty, "ts", 60, now=now)
    assert not res.ok and res.max_ts is None


def test_schema_diff_and_apply(spark):
    df = spark.createDataFrame(
        [("1", "x", 5)], ["a", "unknown_col", "b"])
    expected = T.StructType([
        T.StructField("a", T.LongType()),          # type mismatch (string→long)
        T.StructField("b", T.LongType()),          # exact
        T.StructField("missing_col", T.StringType()),
    ])
    diff = schema_diff(df, expected)
    assert diff.missing_from_data == ["missing_col"]
    assert diff.unknown_in_data == ["unknown_col"]
    assert diff.type_mismatches == {"a": ("string", "bigint")}
    assert not diff.clean

    fixed = apply_expected_schema(df, expected)
    assert [f.name for f in fixed.schema.fields] == ["a", "b", "missing_col"]
    row = fixed.collect()[0]
    assert row["a"] == 1 and row["b"] == 5 and row["missing_col"] is None
    assert schema_diff(fixed, expected).clean

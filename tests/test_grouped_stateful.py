"""Tests for grouped-map applyInPandas and stateful streaming."""

from __future__ import annotations

from pyspark.sql import functions as F

from luma_etl_data_platform_spark.operators.grouped import minmax_scale
from luma_etl_data_platform_spark.sources.tables import load_table
from luma_etl_data_platform_spark.streaming.stateful import running_user_totals
from tests.conftest import SF_SMOKE


def test_minmax_scale_per_group(spark):
    df = spark.createDataFrame(
        [("a", 10), ("a", 20), ("a", 30), ("b", 5), ("b", 5)],
        ["g", "v"],
    )
    rows = {(r["g"], r["v"]): r["scaled"] for r in minmax_scale(df, "g", "v").collect()}
    assert rows[("a", 10)] == 0.0 and rows[("a", 20)] == 0.5 and rows[("a", 30)] == 1.0
    assert rows[("b", 5)] == 0.0   # zero span → 0


def test_mapinarrow_token_count_matches_jvm_path(spark):
    from luma_etl_data_platform_spark.functions.text import token_count
    from luma_etl_data_platform_spark.operators.grouped import token_count_arrow
    docs = load_table(spark, SF_SMOKE, "documents")
    arrow = {r["doc_id"]: r["n_tokens"]
             for r in token_count_arrow(docs, "text", "doc_id").collect()}
    jvm = {r["doc_id"]: r["n"]
           for r in docs.select("doc_id", token_count(F.col("text")).alias("n")).collect()}
    assert arrow == jvm


def test_running_user_totals_matches_batch(spark, tmp_path):
    src_dir = str(tmp_path / "ev")
    load_table(spark, SF_SMOKE, "events").write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = (running_user_totals(stream).writeStream
         .format("memory").queryName("running_totals")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(180)
    # last emitted row per user == final batch totals
    out = spark.sql("""
        SELECT user_id, n_events, total_value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY n_events DESC) AS rk
          FROM running_totals) WHERE rk = 1
    """)
    got = {r["user_id"]: (r["n_events"], r["total_value"]) for r in out.collect()}
    batch = (spark.read.parquet(src_dir).groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.sum("value"), 2).alias("t")))
    want = {r["user_id"]: (r["n"], r["t"]) for r in batch.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 0.05   # rounding at emit time

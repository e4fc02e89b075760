"""Stream-stream join and streaming dedup tests, each checked against
its batch twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from luma_etl_data_platform_spark.sources.tables import load_table
from luma_etl_data_platform_spark.streaming import (
    stream_stream_interval_join, streaming_dedupe,
)
from tests.conftest import SF_SMOKE


def _events_dir(spark, tmp_path, name, transform=None):
    df = load_table(spark, SF_SMOKE, "events")
    if transform is not None:
        df = transform(df)
    path = str(tmp_path / name)
    df.write.parquet(path)
    return path


def _drain(spark, sdf, qname, mode="append"):
    q = (sdf.writeStream.format("memory").queryName(qname)
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.table(qname)


def test_stream_stream_join_matches_batch(spark, tmp_path):
    purchases_dir = _events_dir(spark, tmp_path, "p",
                                lambda d: d.filter(F.col("event_type") == "purchase"))
    clicks_dir = _events_dir(spark, tmp_path, "c",
                             lambda d: d.filter(F.col("event_type") == "click"))
    pschema = spark.read.parquet(purchases_dir).schema
    cschema = spark.read.parquet(clicks_dir).schema
    lp = spark.readStream.schema(pschema).parquet(purchases_dir)
    rc = spark.readStream.schema(cschema).parquet(clicks_dir)
    out = _drain(spark, stream_stream_interval_join(lp, rc), "ssj")

    pb = spark.read.parquet(purchases_dir).alias("l")
    cb = spark.read.parquet(clicks_dir).alias("r")
    batch = pb.join(cb, (F.col("l.user_id") == F.col("r.user_id"))
                    & (F.col("r.ts") >= F.col("l.ts") - F.expr("INTERVAL 1 HOUR"))
                    & (F.col("r.ts") <= F.col("l.ts")))
    got = {(r["l_event_id"], r["r_event_id"]) for r in out.collect()}
    want = {(r[0], r[1]) for r in batch.select(F.col("l.event_id"), F.col("r.event_id")).collect()}
    assert got == want
    assert len(got) > 0


def test_streaming_dedupe_drops_replays(spark, tmp_path):
    base = load_table(spark, SF_SMOKE, "events").limit(200)
    dup_dir = str(tmp_path / "dup")
    base.write.parquet(dup_dir)
    base.write.mode("append").parquet(dup_dir)   # exact replay → duplicates
    schema = spark.read.parquet(dup_dir).schema
    assert spark.read.parquet(dup_dir).count() == 400
    stream = spark.readStream.schema(schema).parquet(dup_dir)
    out = _drain(spark, streaming_dedupe(stream, ["event_id"]), "sdedup")
    assert out.count() == 200
    assert out.select("event_id").distinct().count() == 200

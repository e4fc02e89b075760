"""Layout tests: partition pruning and range-layout file statistics."""

from __future__ import annotations

import contextlib
import io
import os

from pyspark.sql import functions as F

from luma_etl_data_platform_spark.operators.layout import (
    write_partitioned, write_range_layout,
)
from luma_etl_data_platform_spark.sources.tables import load_table
from luma_etl_data_platform_spark.plans.transform import upsert
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partition_pruning_hits_partition_filters(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "dt", F.date_format("ts", "yyyy-MM-dd"))
    out = str(tmp_path / "by_day")
    write_partitioned(ev, out, ["dt"])
    days = [d for d in os.listdir(out) if d.startswith("dt=")]
    assert len(days) > 5
    pruned = spark.read.parquet(out).filter(F.col("dt") == days[0].split("=")[1])
    plan = _plan(pruned)
    assert "PartitionFilters" in plan and "dt" in plan
    n_one_day = pruned.count()
    assert 0 < n_one_day < ev.count()


def test_range_layout_narrow_file_stats(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "ranged")
    write_range_layout(ev, out, "user_id", n_files=8)
    import duckdb
    con = duckdb.connect()
    stats = con.execute(
        f"SELECT file_name, CAST(stats_min AS BIGINT) mn, CAST(stats_max AS BIGINT) mx "
        f"FROM parquet_metadata('{out}/*.parquet') WHERE path_in_schema = 'user_id'"
    ).fetchall()
    assert len(stats) >= 4
    # ranges are narrow and mostly non-overlapping after range layout
    spans = sorted((mn, mx) for _, mn, mx in stats)
    overlaps = sum(1 for (a, b), (c, d) in zip(spans, spans[1:]) if c < b)
    assert overlaps <= 1   # boundary rows may share a value


def test_salted_agg_sum_matches_plain(spark):
    from luma_etl_data_platform_spark.operators.skew import salted_agg_sum
    df = spark.range(200_000).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 1 ELSE id END AS k", "id AS v")
    got = {r["k"]: r["sum_v"] for r in salted_agg_sum(df, "k", "v").collect()}
    want = {r["k"]: r["s"] for r in
            df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    assert got == want


def test_morton_key_interleaves_and_zorder_narrows_both_dims(spark, tmp_path):
    from luma_etl_data_platform_spark.operators.layout import (
        morton_key, write_zorder_layout,
    )
    # bit-interleave sanity: (x=0b11, y=0b00) -> 0b0101 = 5
    row = spark.range(1).select(
        morton_key(F.lit(3), F.lit(0), bits=4).alias("z1"),
        morton_key(F.lit(0), F.lit(3), bits=4).alias("z2"),
        morton_key(F.lit(3), F.lit(3), bits=4).alias("z3")).collect()[0]
    assert (row["z1"], row["z2"], row["z3"]) == (5, 10, 15)

    # synthetic 2-D data with real cardinality in both dimensions
    df = spark.range(100_000).selectExpr(
        "CAST(id % 1000 AS INT) AS uid",
        "CAST((id * 7) % 1000 AS INT) AS eid")
    out = str(tmp_path / "zordered")
    write_zorder_layout(df, out, "uid", "eid", n_files=16, bits=10)
    import duckdb
    con = duckdb.connect()
    glo = con.execute(
        f"SELECT min(uid), max(uid) FROM '{out}/*.parquet'").fetchone()
    stats = con.execute(
        f"SELECT CAST(stats_min AS BIGINT), CAST(stats_max AS BIGINT) "
        f"FROM parquet_metadata('{out}/*.parquet') WHERE path_in_schema = 'uid'"
    ).fetchall()
    spans = [mx - mn for mn, mx in stats]
    assert len(spans) >= 8
    # z-order clusters both dims: median file covers a fraction of the
    # global uid range (a random layout would cover ~all of it)
    assert sorted(spans)[len(spans) // 2] <= (glo[1] - glo[0]) * 0.6


def test_upsert_dispatches_to_parquet_without_delta(spark, tmp_path):
    path = str(tmp_path / "tgt")
    base = spark.createDataFrame([(1, "a")], ["k", "v"])
    upsert(spark, path, base, ["k"])
    upd = spark.createDataFrame([(1, "A"), (2, "b")], ["k", "v"])
    upsert(spark, path, upd, ["k"])
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {1: "A", 2: "b"}


def test_compact_small_files_unpartitioned(spark, tmp_path):
    from luma_etl_data_platform_spark.operators.layout import (
        compact_small_files, data_file_stats,
    )
    out = str(tmp_path / "fragmented")
    orders = load_table(spark, SF_SMOKE, "orders")
    orders.repartition(20).write.parquet(out)
    before_rows = sorted(r["o_orderkey"] for r in
                         spark.read.parquet(out).select("o_orderkey").collect())
    n_before, total = data_file_stats(spark, out)
    assert n_before == 20
    report = compact_small_files(spark, out, target_file_bytes=total * 2)
    assert report["partitions_compacted"] == 1
    assert report["files_after"] == 1
    # data survives the swap bit-for-bit
    after_rows = sorted(r["o_orderkey"] for r in
                        spark.read.parquet(out).select("o_orderkey").collect())
    assert after_rows == before_rows
    # idempotent: a second pass finds nothing to do
    report2 = compact_small_files(spark, out, target_file_bytes=total * 2)
    assert report2["partitions_compacted"] == 0


def test_compact_small_files_partitioned_touches_only_fragmented(spark, tmp_path):
    from luma_etl_data_platform_spark.operators.layout import (
        compact_small_files, data_file_stats,
    )
    out = str(tmp_path / "by_prio")
    orders = load_table(spark, SF_SMOKE, "orders")
    # one coarse partition (1 file each) ...
    (orders.filter(F.col("o_orderpriority") != "1-URGENT")
     .coalesce(1).write.partitionBy("o_orderpriority").parquet(out))
    # ... and one fragmented partition (12 files)
    (orders.filter(F.col("o_orderpriority") == "1-URGENT")
     .repartition(12).write.mode("append")
     .partitionBy("o_orderpriority").parquet(out))
    n_rows = orders.count()
    report = compact_small_files(spark, out, target_file_bytes=1 << 30,
                                 partition_depth=1)
    assert report["partitions_seen"] == 5
    assert report["partitions_compacted"] == 1      # only the fragmented one
    n_urgent, _ = data_file_stats(spark, out + "/o_orderpriority=1-URGENT")
    assert n_urgent == 1
    assert spark.read.parquet(out).count() == n_rows

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


def test_upsert_dispatches_to_parquet_without_delta(spark, tmp_path):
    path = str(tmp_path / "tgt")
    base = spark.createDataFrame([(1, "a")], ["k", "v"])
    upsert(spark, path, base, ["k"])
    upd = spark.createDataFrame([(1, "A"), (2, "b")], ["k", "v"])
    upsert(spark, path, upd, ["k"])
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {1: "A", 2: "b"}

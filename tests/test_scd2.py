"""SCD Type-2 history maintenance tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from luma_etl_data_platform_spark.plans.scd import OPEN_TS, scd2_apply


def _rows(spark, path):
    return {(r["k"], r["v"], str(r["valid_from"])[:10], str(r["valid_to"])[:10],
             r["is_current"])
            for r in spark.read.parquet(path).collect()}


def test_scd2_insert_change_keep(spark, tmp_path):
    path = str(tmp_path / "dim")
    t1 = dt.datetime(2024, 1, 1)
    t2 = dt.datetime(2024, 2, 1)

    scd2_apply(spark, path,
               spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"]),
               "k", ["v"], t1)
    assert _rows(spark, path) == {
        ("a", 1, "2024-01-01", "9999-12-31", True),
        ("b", 2, "2024-01-01", "9999-12-31", True)}

    # a changes, b unchanged, c new
    scd2_apply(spark, path,
               spark.createDataFrame([("a", 10), ("b", 2), ("c", 3)], ["k", "v"]),
               "k", ["v"], t2)
    assert _rows(spark, path) == {
        ("a", 1, "2024-01-01", "2024-02-01", False),   # closed
        ("a", 10, "2024-02-01", "9999-12-31", True),   # new version
        ("b", 2, "2024-01-01", "9999-12-31", True),    # untouched
        ("c", 3, "2024-02-01", "9999-12-31", True)}    # inserted


def test_scd2_close_missing_full_mirror(spark, tmp_path):
    path = str(tmp_path / "dim2")
    t1, t2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 3, 1)
    scd2_apply(spark, path,
               spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"]),
               "k", ["v"], t1)
    scd2_apply(spark, path,
               spark.createDataFrame([("a", 1)], ["k", "v"]),
               "k", ["v"], t2, close_missing=True)
    rows = _rows(spark, path)
    assert ("b", 2, "2024-01-01", "2024-03-01", False) in rows  # closed out
    assert ("a", 1, "2024-01-01", "9999-12-31", True) in rows   # untouched


def test_scd2_null_attribute_transitions(spark, tmp_path):
    path = str(tmp_path / "dim3")
    t1, t2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 2, 1)
    scd2_apply(spark, path,
               spark.createDataFrame([("a", None)], "k string, v string"),
               "k", ["v"], t1)
    # null -> value is a change (eqNullSafe comparison)
    scd2_apply(spark, path,
               spark.createDataFrame([("a", "x")], "k string, v string"),
               "k", ["v"], t2)
    cur = spark.read.parquet(path).filter(F.col("is_current")).collect()
    assert len(cur) == 1 and cur[0]["v"] == "x"
    closed = spark.read.parquet(path).filter(~F.col("is_current")).collect()
    assert len(closed) == 1 and closed[0]["v"] is None

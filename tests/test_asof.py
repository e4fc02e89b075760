"""Unit tests for the union+window as-of join operator."""

from __future__ import annotations

import datetime as dt

from luma_etl_data_platform_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-10T12:00:00")),
         (1, _ts("2024-01-01T00:00:00")),   # before any right row
         (2, _ts("2024-01-05T00:00:00"))],
        ["k", "t"],
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-05T00:00:00"), "r1"),
         (1, _ts("2024-01-10T12:00:00"), "r2"),   # equal time → matches (<=)
         (2, _ts("2024-01-06T00:00:00"), "r3")],  # after left → no match
        ["k", "rt", "payload"],
    )
    out = {(r["k"], r["t"]): r["payload"]
           for r in asof_join(left, right, "k", "t", "rt").collect()}
    assert out[(1, _ts("2024-01-10T12:00:00"))] == "r2"
    assert out[(1, _ts("2024-01-01T00:00:00"))] is None
    assert out[(2, _ts("2024-01-05T00:00:00"))] is None


def test_asof_tiebreak_picks_greatest(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-02T00:00:00"))], ["k", "t"])
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"), 7),
         (1, _ts("2024-01-01T00:00:00"), 9),
         (1, _ts("2024-01-01T00:00:00"), 8)],
        ["k", "rt", "oid"],
    )
    out = asof_join(left, right, "k", "t", "rt",
                    right_cols=["oid"], tiebreak="oid").collect()
    assert out[0]["oid"] == 9


def test_asof_keeps_all_left_rows(spark):
    left = spark.range(100).selectExpr("id % 7 as k", "timestamp'2024-01-01' + make_interval(0,0,0,0,0,0,id) as t", "id")
    right = spark.createDataFrame([(0, _ts("2024-01-01T00:00:30"), "x")], ["k", "rt", "p"])
    assert asof_join(left, right, "k", "t", "rt").count() == 100

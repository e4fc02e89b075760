"""SCD Type-2 history maintenance tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from luma_etl_data_platform_spark.plans.scd import OPEN_TS, scd2_apply
from tests.conftest import SF_SMOKE


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


def test_scd2_query_oracle_parity(spark, duck_smoke):
    from luma_etl_data_platform_spark.plans import scd as S
    from tests.parity import assert_matches
    sdf = S.scd2_customer_history(spark, SF_SMOKE)
    assert_matches(sdf, duck_smoke.execute(
        S.ORACLE["scd2_customer_history"]).fetchdf(), "scd2_customer_history")


def test_scd2_merge_three_fates(spark):
    """New key inserted; changed key closed + re-inserted; unchanged
    key kept — all from one merge call."""
    import datetime as dt
    from luma_etl_data_platform_spark.plans.scd import scd2_merge
    from pyspark.sql import functions as F
    cur = spark.createDataFrame(
        [(1, "a", dt.datetime(2024, 1, 1), dt.datetime(9999, 12, 31), True),
         (2, "b", dt.datetime(2024, 1, 1), dt.datetime(9999, 12, 31), True)],
        "k long, v string, valid_from timestamp, valid_to timestamp, "
        "is_current boolean")
    src = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "c")], "k long, v string")
    out = scd2_merge(cur, None, src, "k", ["v"], dt.datetime(2024, 6, 1))
    rows = {(r["k"], r["is_current"]): r for r in out.collect()}
    assert rows[(1, True)]["v"] == "a"                      # kept
    assert rows[(2, False)]["valid_to"] == dt.datetime(2024, 6, 1)  # closed
    assert rows[(2, True)]["v"] == "B"                      # re-inserted
    assert rows[(3, True)]["valid_from"] == dt.datetime(2024, 6, 1)  # new
    assert out.count() == 4

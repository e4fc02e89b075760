"""Tests for typed config and skew/bucketing operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from luma_etl_data_platform_spark.core.config import PipelineConfig, TableConfig
from luma_etl_data_platform_spark.operators.skew import bucketize, salted_join


def test_config_from_bc_table_map():
    cfg = PipelineConfig.from_json(
        {"FSM_GeneralLedgerTransactionDetail": "luma_dl_general_ledger_transaction_detail"})
    t = cfg.table("FSM_GeneralLedgerTransactionDetail")
    assert t.staging_table_name == "luma_dl_general_ledger_transaction_detail"
    assert t.warehouse_table_name == "luma_general_ledger_transaction_detail"
    assert not t.incremental


def test_config_from_rich_map_with_subject_areas():
    cfg = PipelineConfig.from_json(
        {"gl_detail": {
            "business_class_name": "FSM_GL",
            "staging_table_name": "luma_dl_gl",
            "incremental": True,
            "columns_to_load": ["A", "B"],
        }},
        {"general_ledger": ["gl_detail"]},
    )
    assert cfg.classes_for("general_ledger")[0].incremental
    assert cfg.table("gl_detail").columns_to_load == ("A", "B")


def test_salted_join_matches_plain_join(spark):
    # skewed left: 90% of rows share key 0
    left = spark.range(1000).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 0 ELSE id END AS k", "id AS lv")
    right = spark.range(200).selectExpr("id AS k", "id * 2 AS rv")
    plain = left.join(right, "k", "inner").select("k", "lv", "rv")
    salted = salted_join(left, right, "k", "inner", salt=4).select("k", "lv", "rv")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (99, "b")], ["k", "v"])
    right = spark.createDataFrame([(1, "r")], ["k", "rv"])
    rows = {r["k"]: r["rv"] for r in salted_join(left, right, "k", "left", salt=3).collect()}
    assert rows == {1: "r", 99: None}


def test_bucketize_join_has_no_shuffle(spark, tmp_path):
    for t in ("bkt_a", "bkt_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    a = spark.range(1000).selectExpr("id AS k", "id AS av")
    b = spark.range(1000).selectExpr("id AS k", "id * 3 AS bv")
    bucketize(a, "bkt_a", "k", buckets=8)
    bucketize(b, "bkt_b", "k", buckets=8)
    # force a non-broadcast join so the bucketing is what avoids the
    # exchange (tiny test tables would otherwise broadcast)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, (
            f"bucketed join still shuffles:\n{plan[:2000]}")
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for t in ("bkt_a", "bkt_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")

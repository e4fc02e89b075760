"""The streaming batch-twin queries (plans/streaming_twins.py) drive
the real streaming operators — continuous_rollup,
applyInPandasWithState running totals, ledger-idempotent ingest —
and must reproduce the plain batch aggregation exactly, regardless
of micro-batch boundaries."""

from __future__ import annotations

from tests.conftest import SF_SMOKE, make_duck
from tests.parity import assert_matches

from luma_etl_data_platform_spark.plans import streaming_twins as ST


def _check(spark, name):
    duck = make_duck(SF_SMOKE)
    sdf = ST.QUERIES[name](spark, SF_SMOKE)
    assert_matches(sdf, duck.execute(ST.ORACLE[name]).fetchdf(), name)


def test_stream_rollup_hourly_matches_batch(spark):
    _check(spark, "stream_rollup_hourly")


def test_stream_user_totals_matches_batch(spark):
    _check(spark, "stream_user_totals")


def test_stream_ingest_dedup_exactly_once_after_redelivery(spark):
    # the twin itself redelivers the entire input through a second
    # stream run: a ledger regression double-loads and hash-mismatches
    _check(spark, "stream_ingest_dedup")


def test_stream_hll_register_merge_is_batch_invariant(spark):
    # registers appended per micro-batch then max-merged must equal
    # the single-shot sketch of the full data — regardless of split
    from pyspark.sql import functions as F
    from luma_etl_data_platform_spark.operators.sketches import (
        hll_merge, hll_sketch)
    df = spark.createDataFrame(
        [("t", i % 700) for i in range(4000)], "g string, v long")
    full = hll_sketch(df, "g", "v")
    parts = [df.filter(F.col("v") % 3 == k) for k in range(3)]
    merged = hll_merge(*[hll_sketch(p, "g", "v") for p in parts],
                       group_col="g")
    assert sorted(full.collect()) == sorted(merged.collect())


def test_stream_wap_aborted_batches_leave_no_history(spark, tmp_path):
    # 2 staged batches: one clean (publishes), one dirty (aborts) —
    # table history holds exactly create + 1 publish
    from pyspark.sql import Row
    from luma_etl_data_platform_spark.sources import lakehouse as LH
    path = str(tmp_path / "wap_tbl")
    base = spark.createDataFrame([Row(k=0, v=1.0)])
    LH.create_table(spark, path, base.coalesce(1), ["k"])
    clean = spark.createDataFrame([Row(k=1, v=2.0)])
    dirty = spark.createDataFrame([Row(k=2, v=-1.0)])
    for batch in (clean, dirty):
        pending = LH.stage_append(spark, path, batch, ["k"])
        from pyspark.sql import functions as F
        if LH.read_staged(spark, path, pending).filter(
                F.col("v") < 0).count():
            LH.abort_staged(spark, path, pending)
        else:
            LH.publish_staged(spark, path, pending)
    assert LH.current_version(spark, path) == 2
    assert sorted(r["k"] for r in LH.read_table(spark, path).collect()) \
        == [0, 1]

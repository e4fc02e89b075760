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

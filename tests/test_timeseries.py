"""Unit tests for the resample/forward-fill operator."""

from __future__ import annotations

import datetime as dt

from luma_etl_data_platform_spark.operators.timeseries import resample_ffill


def _t(h):
    return dt.datetime(2024, 1, 1, h, 30)


def test_resample_fills_gaps_and_picks_last_in_bucket(spark):
    rows = [
        (1, _t(0), 10.0, 1),
        (1, dt.datetime(2024, 1, 1, 0, 45), 11.0, 2),   # later in same hour → wins
        (1, _t(3), 30.0, 3),                             # hours 1-2 are gaps
        (2, _t(5), 50.0, 4),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value", "event_id"])
    out = {(r["user_id"], r["bucket"].hour): (r["value_ffill"], r["observed"])
           for r in resample_ffill(df, "user_id", "ts", "value",
                                   tiebreak_col="event_id").collect()}
    assert out[(1, 0)] == (11.0, True)     # last observation in the bucket
    assert out[(1, 1)] == (11.0, False)    # forward-filled gap
    assert out[(1, 2)] == (11.0, False)
    assert out[(1, 3)] == (30.0, True)
    assert out[(2, 5)] == (50.0, True)
    assert len(out) == 5                   # user 2 grid is a single bucket

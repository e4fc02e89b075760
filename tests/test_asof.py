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


def test_asof_matches_pandas_merge_asof_randomized(spark):
    """Distributed as-of vs pandas merge_asof on seeded random data
    (unique right timestamps per key so both definitions coincide)."""
    import random

    import pandas as pd

    rng = random.Random(42)
    left_rows = [(rng.randint(1, 5), _ts("2024-01-01T00:00:00")
                  + dt.timedelta(minutes=rng.randint(0, 5000)), i)
                 for i in range(300)]
    seen = set()
    right_rows = []
    for j in range(150):
        k = rng.randint(1, 5)
        t = _ts("2024-01-01T00:00:00") + dt.timedelta(minutes=rng.randint(0, 5000))
        if (k, t) in seen:
            continue
        seen.add((k, t))
        right_rows.append((k, t, j))

    left = spark.createDataFrame(left_rows, ["k", "t", "lid"])
    right = spark.createDataFrame(right_rows, ["k", "rt", "rid"])
    got = {r["lid"]: r["rid"]
           for r in asof_join(left, right, "k", "t", "rt",
                              right_cols=["rid"]).collect()}

    lp = pd.DataFrame(left_rows, columns=["k", "t", "lid"]).sort_values("t")
    rp = pd.DataFrame(right_rows, columns=["k", "rt", "rid"]).sort_values("rt")
    merged = pd.merge_asof(lp, rp, left_on="t", right_on="rt",
                           by="k", direction="backward")
    want = {int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
            for r in merged.itertuples()}
    assert got == want


def test_asof_null_payload_not_backfilled_from_older_row(spark):
    """The matched right row wins ATOMICALLY: a NULL payload column in
    the most recent right row must stay NULL, not be backfilled from
    an older right row (the torn-row bug of per-column carry)."""
    left = spark.createDataFrame([(1, _ts("2024-01-10T00:00:00"))], ["k", "t"])
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"), "old_a", "old_b"),
         (1, _ts("2024-01-05T00:00:00"), None, "new_b")],
        ["k", "rt", "a", "b"],
    )
    row = asof_join(left, right, "k", "t", "rt").collect()[0]
    assert row["b"] == "new_b"
    assert row["a"] is None          # NOT "old_a"


def test_asof_keeps_all_left_rows(spark):
    left = spark.range(100).selectExpr("id % 7 as k", "timestamp'2024-01-01' + make_interval(0,0,0,0,0,0,id) as t", "id")
    right = spark.createDataFrame([(0, _ts("2024-01-01T00:00:30"), "x")], ["k", "rt", "p"])
    assert asof_join(left, right, "k", "t", "rt").count() == 100

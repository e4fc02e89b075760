"""Property tests for the hidden-partitioning twin discipline: the
driver-side probe derivation (`_derive_partition_probe`) must agree
with what executors actually WROTE (`_transform_column`) for every
value — a divergence in either direction silently prunes files that
contain matches. The Spark side is evaluated once per batch of
hypothesis-drawn values (one createDataFrame + collect), the Python
side per value."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from luma_etl_data_platform_spark.functions.text import portable_hash32_py
from luma_etl_data_platform_spark.sources import lakehouse as LH


def _spark_transform(spark, spec: str, values, dtype: str):
    sp = LH.parse_partition_spec(spec)
    df = spark.createDataFrame([(v,) for v in values],
                               f"{sp['source']} {dtype}")
    out = df.select(LH._transform_column(sp, df).alias("t"))
    return [r["t"] for r in out.collect()]


@settings(max_examples=1, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(min_value=-2**40, max_value=2**40),
                min_size=1, max_size=40, unique=True))
def test_bucket_probe_matches_spark_hash_ints(spark, vals):
    """bucket(N, long_col): the derived bucket for an int equality
    probe equals the value Spark wrote."""
    got = _spark_transform(spark, "bucket(16, u)", vals, "long")
    sp = LH.parse_partition_spec("bucket(16, u)")
    for v, g in zip(vals, got):
        assert LH._derive_partition_probe(sp, v, v) == (g, g)
        assert portable_hash32_py(v) % 16 == g


@settings(max_examples=1, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x24F),
    min_size=0, max_size=24), min_size=1, max_size=40, unique=True))
def test_bucket_probe_matches_spark_hash_strings(spark, vals):
    got = _spark_transform(spark, "bucket(8, s)", vals, "string")
    sp = LH.parse_partition_spec("bucket(8, s)")
    for v, g in zip(vals, got):
        assert LH._derive_partition_probe(sp, v, v) == (g, g)


@settings(max_examples=1, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(st.datetimes(
    min_value=dt.datetime(1975, 1, 2),
    max_value=dt.datetime(2200, 12, 30)).map(
        lambda d: d.replace(microsecond=0)),
    min_size=1, max_size=40, unique=True))
def test_date_probes_match_spark_format(spark, vals):
    """days/months/hours: the probe's strftime equals Spark's
    session-timezone date_format for naive datetimes (the session
    runs UTC; tz-aware probes are refused by design, covered in
    test_lakehouse_sizes)."""
    for spec, kind in [("days(ts)", "days"), ("months(ts)", "months"),
                       ("hours(ts)", "hours")]:
        got = _spark_transform(spark, spec, vals, "timestamp")
        sp = LH.parse_partition_spec(spec)
        for v, g in zip(vals, got):
            assert LH._derive_partition_probe(sp, v, v) == (g, g), (
                spec, v)


@settings(max_examples=1, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(min_value=-10**9, max_value=10**9),
                min_size=1, max_size=40, unique=True),
       st.integers(min_value=1, max_value=10_000))
def test_truncate_int_probe_matches_spark(spark, vals, width):
    got = _spark_transform(spark, f"truncate({width}, n)", vals, "long")
    sp = LH.parse_partition_spec(f"truncate({width}, n)")
    for v, g in zip(vals, got):
        lo, hi = LH._derive_partition_probe(sp, v, v)
        assert lo == hi == g, (v, width, g)


@settings(max_examples=1, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x24F),
    min_size=0, max_size=24), min_size=1, max_size=40, unique=True),
    st.integers(min_value=1, max_value=8))
def test_truncate_str_probe_matches_spark(spark, vals, width):
    got = _spark_transform(spark, f"truncate({width}, s)", vals,
                           "string")
    sp = LH.parse_partition_spec(f"truncate({width}, s)")
    for v, g in zip(vals, got):
        lo, hi = LH._derive_partition_probe(sp, v, v)
        assert lo == hi == g, (v, width, g)


def test_range_probe_monotonicity():
    """Monotone transforms derive (lo, hi) windows that bracket every
    in-range value's transform — the box-pruning soundness property."""
    sp = LH.parse_partition_spec("truncate(100, n)")
    lo, hi = LH._derive_partition_probe(sp, -250, 430)
    for v in range(-250, 431, 7):
        t = v - (v % 100)
        assert lo <= t <= hi
    spd = LH.parse_partition_spec("days(ts)")
    a, b = dt.datetime(2024, 2, 27, 5), dt.datetime(2024, 3, 2, 23)
    flo, fhi = LH._derive_partition_probe(spd, a, b)
    cur = a
    while cur <= b:
        assert flo <= cur.strftime("%Y-%m-%d") <= fhi
        cur += dt.timedelta(hours=11)


def test_bucket_range_probe_refused():
    """bucket derives ONLY from equality — a range probe has no
    bucket-window meaning (hash is not monotone)."""
    sp = LH.parse_partition_spec("bucket(16, u)")
    assert LH._derive_partition_probe(sp, 3, 9) is None
    with pytest.raises(TypeError):
        portable_hash32_py(3.5)


# -- change-feed ledger summary (round-7) -----------------------------

from hypothesis import given as _given  # noqa: E402


@settings(max_examples=1, deadline=None,
          suppress_health_check=list(HealthCheck))
@_given(st.sets(st.integers(min_value=1, max_value=40),
                min_size=0, max_size=25))
def test_ledger_summary_matches_reference(spark, tmp_path_factory,
                                          versions):
    """summary() == (largest w with every recorded version <= w
    present above the feed's min, versions above w) for arbitrary
    recorded sets — including gaps at the start, singletons, and the
    empty ledger."""
    from luma_etl_data_platform_spark.streaming.cdf import (
        ChangeFeedLedger)
    led = ChangeFeedLedger(
        spark, str(tmp_path_factory.mktemp("led") / "l"))
    for v in sorted(versions):
        led.record(v)
    wm, exc = led.summary()
    if not versions:
        assert (wm, exc) == (None, set())
        return
    mx = max(versions)
    holes = {v + 1 for v in versions} - versions
    first_hole = min((h for h in holes if h <= mx), default=None)
    want_wm = mx if first_hole is None else first_hole - 1
    assert wm == want_wm
    assert exc == {v for v in versions if v > want_wm}
    # and the full-set audit view agrees
    assert led.processed() == versions

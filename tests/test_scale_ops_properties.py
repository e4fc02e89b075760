"""Property-based tests for the scale-native operators: random inputs
vs brute-force Python references (the hypothesis layer the drift
registry already has, extended to interval merge and CDC apply)."""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# -- brute-force references -------------------------------------------------


def ref_islands(rows):
    """rows: (key, start, end) with start < end → sorted
    (key, island_start, island_end, n_intervals)."""
    by_k = defaultdict(list)
    for k, s, e in rows:
        by_k[k].append((s, e))
    out = []
    for k, ivs in by_k.items():
        ivs.sort()
        cur_s = cur_e = None
        n = 0
        for s, e in ivs:
            if cur_s is None or s > cur_e:
                if cur_s is not None:
                    out.append((k, cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
            else:
                cur_e = max(cur_e, e)
                n += 1
        out.append((k, cur_s, cur_e, n))
    return sorted(out)


def ref_cdc(rows):
    """rows: (key, payload, op, seq) → {key: payload} after apply
    (max (seq, op-rank, payload) wins; D removes)."""
    rank = {"D": 2, "U": 1, "I": 0}
    best = {}
    for k, p, op, seq in rows:
        cand = (seq, rank[op], p)
        if k not in best or cand > best[k][0]:
            best[k] = (cand, op, p)
    return {k: p for k, (_, op, p) in best.items() if op != "D"}


# -- strategies -------------------------------------------------------------

intervals = st.lists(
    st.tuples(st.integers(0, 3),                      # key
              st.integers(0, 50),                     # start
              st.integers(1, 30)),                    # length
    min_size=1, max_size=40,
).map(lambda xs: [(k, s, s + d) for k, s, d in xs])

cdc_logs = st.lists(
    st.tuples(st.integers(0, 5),                      # key
              st.sampled_from(["a", "b", "c", "d"]),  # payload
              st.sampled_from(["I", "U", "D"]),       # op
              st.integers(1, 6)),                     # seq
    min_size=1, max_size=40,
)


# -- properties -------------------------------------------------------------

@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(intervals)
def test_merge_intervals_matches_reference(spark, rows):
    from luma_etl_data_platform_spark.operators.timeseries import (
        merge_intervals)
    df = spark.createDataFrame(rows, "k long, s long, e long")
    got = sorted((r["k"], r["island_start"], r["island_end"],
                  r["n_intervals"])
                 for r in merge_intervals(df, "k", "s", "e").collect())
    assert got == ref_islands(rows)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(cdc_logs)
def test_apply_cdc_matches_reference(spark, rows):
    from luma_etl_data_platform_spark.operators.cdc import apply_cdc
    df = spark.createDataFrame(rows, "k long, payload string, op string,"
                                     " seq long")
    got = {r["k"]: r["payload"]
           for r in apply_cdc(df, ["k"], "seq").collect()}
    assert got == ref_cdc(rows)

"""Property-based tests for incremental-view maintenance and the
portable HLL sketch: for ANY random op-log / value multiset, the
incremental fold must equal the full recompute, and sketch merges
must behave like set union."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# op-log entries: (op, key, group, value-cents)
ops = st.lists(
    st.tuples(st.sampled_from(["I", "U", "D"]),
              st.integers(min_value=0, max_value=9),
              st.sampled_from(["g1", "g2", "g3"]),
              st.integers(min_value=-10**6, max_value=10**6)),
    min_size=1, max_size=25,
)


def _apply_log(log):
    """Reference semantics: replay the op-log into (key → (group, v))
    state and the equivalent change-feed rows."""
    state: dict[int, tuple[str, int]] = {}
    changes = []
    for op, k, g, v in log:
        if op == "I":
            if k in state:  # insert over existing key = update
                og, ov = state[k]
                changes.append(("update_preimage", og, ov))
                changes.append(("update_postimage", g, v))
            else:
                changes.append(("insert", g, v))
            state[k] = (g, v)
        elif op == "U":
            if k not in state:
                continue
            og, ov = state[k]
            changes.append(("update_preimage", og, ov))
            changes.append(("update_postimage", g, v))
            state[k] = (g, v)
        else:  # D
            if k not in state:
                continue
            og, ov = state[k]
            changes.append(("delete", og, ov))
            del state[k]
    return state, changes


@given(ops)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_ivm_fold_equals_recompute_for_any_oplog(spark, log):
    from luma_etl_data_platform_spark.operators.ivm import (
        aggregate_mv, apply_changes_to_mv)
    state, changes = _apply_log(log)
    sums = {"v": "decimal(18,2)"}
    empty = spark.createDataFrame([], "g string, v long")
    mv0 = aggregate_mv(empty, ["g"], sums)
    feed = spark.createDataFrame(
        [(c, g, v) for c, g, v in changes],
        "_change_type string, g string, v long")
    mv1 = apply_changes_to_mv(mv0, feed, ["g"], sums)
    final = spark.createDataFrame(
        [(g, v) for g, v in state.values()] or [("__none__", 0)],
        "g string, v long")
    if not state:
        final = final.filter(F.col("g") != "__none__")
    full = aggregate_mv(final, ["g"], sums)
    got = sorted((r["g"], r["n_rows"], str(r["sum_v"]))
                 for r in mv1.collect())
    want = sorted((r["g"], r["n_rows"], str(r["sum_v"]))
                  for r in full.collect())
    assert got == want


values = st.lists(st.integers(min_value=0, max_value=500),
                  min_size=1, max_size=120)


@given(values, values)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_hll_merge_is_set_union_for_any_multisets(spark, xs, ys):
    from luma_etl_data_platform_spark.operators.sketches import (
        hll_merge, hll_sketch)
    a = spark.createDataFrame([("a", x) for x in xs], "g string, v long")
    b = spark.createDataFrame([("b", y) for y in ys], "g string, v long")
    merged = hll_merge(hll_sketch(a, "g", "v"), hll_sketch(b, "g", "v"),
                       group_col="g", group_expr=F.lit("u"))
    direct = hll_sketch(
        a.unionByName(b).withColumn("g", F.lit("u")), "g", "v")
    assert sorted(merged.collect()) == sorted(direct.collect())

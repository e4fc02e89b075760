"""Drift guard for the in-repo mirror of the driver's comparator
(round-7 verdict item 6): ``tests/parity.py`` carries the only
strict-parity coverage for the ~180 registered queries the driver's
50-query sample never touches, so a refactor that silently WEAKENS it
(coercing int vs float, ignoring column names, tolerating row-count
drift) would hollow out the whole sweep without failing anything.
These tests feed the comparator KNOWN-mismatching pairs and assert it
FAILS, plus the known-equal shapes it must keep accepting."""

from __future__ import annotations

import pandas as pd
import pytest

from tests.parity import assert_matches, canonical_rows


class _FakeSparkDF:
    """Minimal stand-in exposing the one method assert_matches uses."""

    def __init__(self, pdf: pd.DataFrame):
        self._pdf = pdf

    def toPandas(self) -> pd.DataFrame:
        return self._pdf


def _spark(pdf):
    return _FakeSparkDF(pd.DataFrame(pdf))


def test_comparator_accepts_equal_ignoring_order():
    sp = _spark({"a": [2, 1], "b": ["y", "x"]})
    du = pd.DataFrame({"b": ["x", "y"], "a": [1, 2]})
    assert_matches(sp, du, "selftest-equal")


def test_comparator_rejects_int_vs_float():
    # the driver's hasher distinguishes dtypes: 4973 != 4973.0 —
    # DuckDB's HUGEINT→float64 promotion is exactly the mismatch the
    # strict lane exists to surface (4 round-1 bugs)
    sp = _spark({"a": [4973]})
    du = pd.DataFrame({"a": [4973.0]})
    with pytest.raises(AssertionError, match="value mismatch"):
        assert_matches(sp, du, "selftest-int-float")


def test_comparator_rejects_schema_rename():
    sp = _spark({"sum_qty": [10]})
    du = pd.DataFrame({"sum(l_quantity)": [10]})
    with pytest.raises(AssertionError, match="column mismatch"):
        assert_matches(sp, du, "selftest-rename")


def test_comparator_rejects_rowcount_drift():
    sp = _spark({"a": [1, 2, 3]})
    du = pd.DataFrame({"a": [1, 2]})
    with pytest.raises(AssertionError, match="row count"):
        assert_matches(sp, du, "selftest-rowcount")


def test_comparator_rejects_value_drift_same_shape():
    sp = _spark({"a": [1, 2], "b": ["x", "y"]})
    du = pd.DataFrame({"a": [1, 2], "b": ["x", "z"]})
    with pytest.raises(AssertionError, match="value mismatch"):
        assert_matches(sp, du, "selftest-value")


def test_comparator_row_order_shuffle_is_not_a_diff():
    # order-insensitivity is deliberate (driver sorts canonical rows);
    # a shuffle alone must NOT fail — only content drift does
    sp = _spark({"a": [3, 1, 2]})
    du = pd.DataFrame({"a": [2, 3, 1]})
    assert_matches(sp, du, "selftest-shuffle")


def test_canonical_rows_normalization_contract():
    pdf = pd.DataFrame({
        "f": [1.0000000001, float("nan")],
        "s": ["x", None],
    })
    rows = canonical_rows(pdf)
    # floats round at 9dp, NaN/None normalize to NULL, columns sort
    assert rows == sorted([("1.0", "x"), ("NULL", "NULL")])

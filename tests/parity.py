"""Order-insensitive result comparison between a Spark DataFrame and a
DuckDB oracle result — a local mirror of the driver's correctness gate
(sort columns by name → normalize values → order-insensitive compare).
"""

from __future__ import annotations

import datetime as _dt
import math

import pandas as pd


def _norm_cell(v) -> str:
    # STRICT: a float-valued 4973.0 must NOT equal an int 4973 — the
    # driver's hasher distinguishes result dtypes (DuckDB promotes
    # sum(BIGINT) to HUGEINT → float64 in .df()), so the local gate
    # must too.  Keeping them distinct caught 4 round-1 failures.
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(round(v, 9))
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        if pd.isna(v):
            return "NULL"
        return pd.Timestamp(v).isoformat()
    import numpy as np
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, np.generic):
        return _norm_cell(v.item())
    if pd.isna(v) if not isinstance(v, (list, tuple, dict)) else False:
        return "NULL"
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    out = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    out.sort()
    return out


def assert_matches(spark_df, duck_df: pd.DataFrame, name: str = "") -> None:
    sp = spark_df.toPandas()
    assert sorted(sp.columns) == sorted(duck_df.columns), (
        f"{name}: column mismatch spark={sorted(sp.columns)} oracle={sorted(duck_df.columns)}")
    a, b = canonical_rows(sp), canonical_rows(duck_df)
    assert len(a) == len(b), f"{name}: row count spark={len(a)} oracle={len(b)}"
    if a != b:
        diff_a = [r for r in a if r not in set(b)][:5]
        diff_b = [r for r in b if r not in set(a)][:5]
        raise AssertionError(
            f"{name}: value mismatch; spark-only={diff_a} oracle-only={diff_b}")

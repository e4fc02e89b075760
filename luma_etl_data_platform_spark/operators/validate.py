"""Validation/observability operators.

- ``reconcile_counts``: the reference's record-count reconciliation
  (utilities/utilities.py:69-82; wired as a post-extract decorator at
  datalakewrapper.py:197-210): sum of landed rows must equal the sum
  of source-declared instance counts.
- ``cast_profile``: the reference's per-column insert-failure RCA
  (lambda_function.py:246-276 re-inserts column-by-column to find the
  offender) re-expressed declaratively: for each target column, count
  values that fail ``try_cast`` to the target type — one pass, one
  aggregate, no per-column retry loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class ReconcileResult:
    actual: int
    expected: int

    @property
    def ok(self) -> bool:
        return self.actual == self.expected


def reconcile_counts(df: DataFrame, expected: int | DataFrame,
                     expected_col: str = "dl_instance_count") -> ReconcileResult:
    """Compare ``df``'s row count against an expected total (or the sum
    of ``expected_col`` in an object-properties DataFrame)."""
    actual = df.count()
    if isinstance(expected, DataFrame):
        row = expected.agg(F.sum(expected_col).alias("s")).collect()[0]
        expected_total = int(row["s"] or 0)
    else:
        expected_total = int(expected)
    return ReconcileResult(actual=actual, expected=expected_total)


@dataclass
class CastProfile:
    total_rows: int
    failures: dict[str, int] = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return not any(self.failures.values())


def cast_profile(df: DataFrame, target: T.StructType) -> CastProfile:
    """For every column in ``target`` present in ``df``, count non-null
    values that become null under ``try_cast`` to the target type —
    i.e. the rows that would have broken the reference's bulk insert.
    Single aggregate pass; scales as one scan regardless of column
    count."""
    aggs = []
    for fld in target.fields:
        if fld.name not in df.columns:
            continue
        src = F.col(fld.name)
        failed = src.isNotNull() & src.try_cast(fld.dataType).isNull()
        aggs.append(F.sum(failed.cast("int")).alias(fld.name))
    if not aggs:
        return CastProfile(total_rows=df.count())
    row = df.agg(F.count(F.lit(1)).alias("__n"), *aggs).collect()[0]
    d = row.asDict()
    n = d.pop("__n")
    return CastProfile(total_rows=n, failures={k: int(v or 0) for k, v in d.items()})

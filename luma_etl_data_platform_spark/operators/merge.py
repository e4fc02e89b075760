"""Union-of-schemas merge: the reference's "compile" step.

Reference (utilities/utilities.py:394-426 bc_merged_csv): per-version
frames are concatenated, projected to the resolved column set, and
columns are ordered alphabetically — outer-union semantics where a
column missing from a version is null.

Spark restatement: ``unionByName(allowMissingColumns=True)`` folded
over the versions. No shuffle — union is a narrow operation; the
projection prunes columns at each branch's scan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_of_schemas(dfs: list[DataFrame], columns: list[str] | None = None) -> DataFrame:
    """Outer-union a list of schema-version frames. ``columns``
    restricts the resolved set (the user include-list, reference:
    utilities/utilities.py:98-107)."""
    if not dfs:
        raise ValueError("union_of_schemas needs at least one DataFrame")
    merged = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)
    return ordered_projection(merged, columns)


def ordered_projection(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Project to ``columns`` (default: all) in alphabetical order
    (reference: utilities/utilities.py:416-419)."""
    cols = sorted(columns) if columns is not None else sorted(df.columns)
    return df.select(*cols)

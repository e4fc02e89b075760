"""Public query registry: name → (spark, sf_dir) → DataFrame, plus the
DuckDB oracle SQL for each SQL-expressible query.

``__spark_entry__.py`` re-exports these for the driver harness. Keys
are stable identifiers; every computed column is aliased identically
in the Spark plan and the oracle SQL (the driver's comparator sorts
columns by name before hashing values).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .plans import (
    cleansing_queries, corpus_analytics, corpus_quality, curation, extras,
    lakehouse_ops, pretrain_ops, scale_ops, scd, setops_udx, sql_api,
    streaming_twins, tpch_more, training_data, warehouse, windows,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = (warehouse, training_data, windows, extras, cleansing_queries,
            setops_udx, tpch_more, sql_api, streaming_twins, curation,
            corpus_analytics, scd, scale_ops, lakehouse_ops, pretrain_ops,
            corpus_quality)


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out

"""core/localframe: small driver-side frames as pure JVM literal
plans — the drop-in for Python-RDD createDataFrame on flag rows,
ledgers, and iterative codebook tables."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from pyspark.sql import types as T

from luma_etl_data_platform_spark.core.localframe import local_frame


def test_local_frame_types_and_nulls(spark):
    sch = ("a bigint, b string, c boolean, d double, e array<long>, "
           "f timestamp, g decimal(18,2), h date, i array<string>")
    rows = [
        (1, "x", True, 1.5, [1, 2], dt.datetime(2020, 1, 1, 3, 4, 5),
         Decimal("12.34"), dt.date(2020, 2, 2), ["p", "q"]),
        (None,) * 9,
    ]
    got = local_frame(spark, rows, sch)
    want = spark.createDataFrame(rows, sch)
    assert got.schema == want.schema
    assert got.collect() == want.collect()


def test_local_frame_no_python_workers(spark):
    """The whole point: the plan must be JVM-only — no ExistingRDD /
    Python-serialized scan anywhere."""
    import contextlib
    import io
    df = local_frame(spark, [(1, "a")], "k bigint, s string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "ExistingRDD" not in plan


def test_local_frame_dict_rows_and_empty(spark):
    sch = T.StructType([T.StructField("k", T.LongType()),
                        T.StructField("s", T.StringType())])
    got = local_frame(spark, [{"s": "a", "k": 7}, {"k": 8}], sch)
    assert [(r["k"], r["s"]) for r in got.collect()] == [(7, "a"),
                                                         (8, None)]
    empty = local_frame(spark, [], "k bigint, s string")
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["k", "s"]
    assert empty.schema["k"].dataType.simpleString() == "bigint"

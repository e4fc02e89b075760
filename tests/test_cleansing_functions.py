"""Edge-case unit tests for the cleansing column library."""

from __future__ import annotations

from pyspark.sql import functions as F

from luma_etl_data_platform_spark.functions import cleansing as C


def _one(spark, value, expr, typ="string"):
    return spark.createDataFrame([(value,)], f"v {typ}").select(
        expr(F.col("v")).alias("o")).collect()[0]["o"]


def test_repair_amount_edges(spark):
    assert _one(spark, "2024-01-15", C.repair_amount) == 0.0
    assert _one(spark, "2024-01-15T10:00:00", C.repair_amount) == 0.0   # prefix match
    assert _one(spark, "-12.5", C.repair_amount) == -12.5
    assert _one(spark, "1e3", C.repair_amount) == 1000.0
    assert _one(spark, "garbage", C.repair_amount) is None
    assert _one(spark, None, C.repair_amount) is None
    # looks date-ish but isn't a leading date → numeric parse fails → null
    assert _one(spark, "x2024-01-15", C.repair_amount) is None


def test_validate_uuid_case_and_shape(spark):
    good = "6F9619FF-8B86-D011-B42D-00C04FC964FF"
    assert _one(spark, good, C.validate_uuid) == good            # uppercase ok
    assert _one(spark, good.lower(), C.validate_uuid) == good.lower()
    assert _one(spark, good + "x", C.validate_uuid) == "N/A"      # trailing junk
    assert _one(spark, good.replace("-", ""), C.validate_uuid) == "N/A"
    assert _one(spark, None, C.validate_uuid) == "N/A"


def test_extract_keyed_value_edges(spark):
    f = C.extract_keyed_value
    assert _one(spark, "IDBudgetFundType=ABC", f) == "ABC"
    assert _one(spark, "x=1,IDBudgetFundType=A=B,y=2", f) == "B"   # last '=' wins
    assert _one(spark, "x=1,y=2", f) is None
    assert _one(spark, "", f) is None
    # first matching entry wins when repeated
    assert _one(spark, "IDBudgetFundType=A,IDBudgetFundType=B", f) == "A"


def test_clean_csv_value_multiline(spark):
    assert _one(spark, 'a"b\r\nc"d', C.clean_csv_value) == "abcd"
    assert _one(spark, "plain", C.clean_csv_value) == "plain"


def test_coerce_timestamp(spark):
    ok = _one(spark, "2024-03-05 10:00:00", C.coerce_timestamp)
    assert str(ok).startswith("2024-03-05 10:00")
    assert _one(spark, "not a date", C.coerce_timestamp) is None


def test_dedupe_names_collision_and_formatting():
    out = C.dedupe_names(["A.B", "A_B"])
    assert out == ["A_B", "A_B_dupe"]
    assert C.format_col_name("a.b.c") == "a_b_c"
    assert C.format_col_name("[x].[y]") == "x_y"


def test_escape_identifier_dialects():
    assert C.escape_identifier("col", "tsql") == "[col]"
    assert C.escape_identifier("col") == "`col`"
    assert C.escape_identifier("we`ird") == "`we``ird`"

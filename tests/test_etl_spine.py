"""Unit tests for the ETL spine: type mapper, schema registry,
cleansing functions, union merge, validation — the FIXTURES.md F1-F5
semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from luma_etl_data_platform_spark.functions import cleansing as C
from luma_etl_data_platform_spark.operators.merge import union_of_schemas
from luma_etl_data_platform_spark.operators.validate import cast_profile, reconcile_counts
from luma_etl_data_platform_spark.schema_registry import (
    SchemaRegistry, spark_type_for, sqlserver_type_for, struct_from_metadata,
)

# ---------------------------------------------------------------- types (F3)

F3 = {
    "PlainString": {"type": "string", "maxLength": 50},
    "NoLengthString": {"type": "string"},
    "HugeString": {"type": "string", "maxLength": 9000},
    "EnumString": {"type": "string", "enum": ["A", "B"]},
    "PostingDate": {"type": "string", "format": "date-time"},
    "BoolFlag": {"type": "boolean"},
    "LineNumber": {"type": "integer"},
    "TransactionAmount": {"type": "number"},
    "ActionParameters": {"type": "string", "maxLength": 1,
                         "description": "From table AsyncActionRequest..."},
}

EXPECTED_SQL = {
    "PlainString": "varchar(50)",
    "NoLengthString": "varchar(MAX)",
    "HugeString": "varchar(MAX)",
    "EnumString": "varchar(120)",
    "PostingDate": "datetime2",
    "BoolFlag": "varchar(5)",
    "LineNumber": "int",
    "TransactionAmount": "decimal(18,2)",
    "ActionParameters": "varchar(MAX)",
}

EXPECTED_SPARK = {
    "PlainString": T.StringType(),
    "PostingDate": T.TimestampType(),
    "BoolFlag": T.BooleanType(),
    "LineNumber": T.LongType(),
    "TransactionAmount": T.DecimalType(18, 2),
}


@pytest.mark.parametrize("name", sorted(F3))
def test_sqlserver_type_parity(name):
    assert sqlserver_type_for(name, F3[name]) == EXPECTED_SQL[name]


@pytest.mark.parametrize("name", sorted(EXPECTED_SPARK))
def test_spark_type(name):
    assert spark_type_for(F3[name]) == EXPECTED_SPARK[name]


def test_struct_from_metadata_include_list():
    st = struct_from_metadata(F3, columns=["BoolFlag", "LineNumber", "Nope"])
    assert [f.name for f in st.fields] == ["BoolFlag", "LineNumber"]


# ----------------------------------------------------------- registry (F4/F1)

def test_registry_versioning_deterministic():
    r = SchemaRegistry()
    m = r.register_batch([("b", "a"), ("a", "b", "c"), ("b", "a")])
    # canonical order: ('a','b') before ('a','b','c')
    assert m[("a", "b")] == 1 and m[("a", "b", "c")] == 2
    # same batch re-registered → same versions
    assert r.register_batch([("c", "b", "a")])[("a", "b", "c")] == 2
    rt = SchemaRegistry.from_json(r.to_json())
    assert rt.versions == r.versions


def test_tag_versions_drift(spark):
    rows = [
        Row(ColA="x", ColB="y", JournalCode=None),
        Row(ColA="x", ColB="y", JournalCode="J1"),
        Row(ColA=None, ColB="y", JournalCode=None),
    ]
    df = spark.createDataFrame(rows)
    reg = SchemaRegistry()
    tagged = reg.tag_versions(df)
    got = {(r["ColA"], r["ColB"], r["JournalCode"]): r["_schema_version"]
           for r in tagged.collect()}
    # key-sets: {ColA,ColB} → v1, {ColA,ColB,JournalCode} → v2, {ColB} → v3
    # (canonical sort: ColA,ColB < ColA,ColB,JournalCode < ColB)
    assert got[("x", "y", None)] == 1
    assert got[("x", "y", "J1")] == 2
    assert got[(None, "y", None)] == 3
    assert reg.versions[0] == ()


# ---------------------------------------------------------- cleansing (F1)

def test_format_and_dedupe_names():
    assert C.format_col_name("FinanceCodeBlock.AccountingUnit") == "FinanceCodeBlock_AccountingUnit"
    assert C.format_col_name("[Weird]\nName") == "Weird_Name"
    assert C.dedupe_names(["A.B", "A_B", "C"]) == ["A_B", "A_B_dupe", "C"]


def test_value_cleansers(spark):
    df = spark.createDataFrame(
        [("2024-01-15", "6f9619ff-8b86-d011-b42d-00c04fc964ff", 'he said "hi"\nok',
          "a=1,IDBudgetFundType=GF,b=2"),
         ("123.45", "garbage", "plain", "a=1,b=2")],
        ["amount", "uid", "txt", "blob"],
    )
    out = df.select(
        C.repair_amount(F.col("amount")).alias("amount"),
        C.validate_uuid(F.col("uid")).alias("uid"),
        C.clean_csv_value(F.col("txt")).alias("txt"),
        C.extract_keyed_value(F.col("blob")).alias("fund"),
    ).collect()
    assert out[0]["amount"] == 0.0 and out[1]["amount"] == 123.45
    assert out[0]["uid"].startswith("6f9619ff") and out[1]["uid"] == "N/A"
    assert out[0]["txt"] == "he said hiok"
    assert out[0]["fund"] == "GF" and out[1]["fund"] is None


def test_fill_sentinels(spark):
    schema = T.StructType([
        T.StructField("i", T.LongType()),
        T.StructField("f", T.DoubleType()),
        T.StructField("s", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    df = spark.createDataFrame([(None, None, None, None)], schema)
    row = C.fill_sentinels(df).collect()[0]
    assert row["i"] == -99 and row["f"] == -99.0 and row["s"] == ""
    assert str(row["ts"]).startswith("1900-01-01")


# ------------------------------------------------------------- merge (W1)

def test_union_of_schemas(spark):
    v1 = spark.createDataFrame([("a", 1)], ["ColA", "ColB"])
    v2 = spark.createDataFrame([("b", 2, "J")], ["ColA", "ColB", "JournalCode"])
    merged = union_of_schemas([v1, v2])
    assert merged.columns == ["ColA", "ColB", "JournalCode"]
    rows = {tuple(r) for r in merged.collect()}
    assert rows == {("a", 1, None), ("b", 2, "J")}


# ---------------------------------------------------------- validate (A2)

def test_reconcile_counts(spark):
    df = spark.range(10)
    props = spark.createDataFrame([(4,), (6,)], ["dl_instance_count"])
    assert reconcile_counts(df, props).ok
    assert not reconcile_counts(df, 11).ok


def test_cast_profile(spark):
    df = spark.createDataFrame(
        [("1", "2024-01-01"), ("x", "not-a-date"), (None, "2024-02-02")],
        ["n", "d"],
    )
    target = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("d", T.TimestampType()),
    ])
    prof = cast_profile(df, target)
    assert prof.total_rows == 3
    assert prof.failures == {"n": 1, "d": 1}
    assert not prof.ok


def test_corrupt_json_lines_quarantined(spark):
    """Malformed JSON-lines land in _corrupt_record instead of killing
    the ingest (the reference logs-and-skips failed payloads,
    datalakewrapper.py:286-297)."""
    from pyspark.sql import types as T
    lines = ['{"A": "ok", "N": 1}', "{not json at all", '{"A": "also ok", "N": 2}']
    schema = T.StructType([
        T.StructField("A", T.StringType()),
        T.StructField("N", T.LongType()),
        T.StructField("_corrupt_record", T.StringType()),
    ])
    df = spark.read.schema(schema).json(spark.sparkContext.parallelize(lines))
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 2
    assert bad.count() == 1
    assert "not json" in bad.collect()[0]["_corrupt_record"]


# ----------------------------------------------------- pipeline end-to-end

def test_pipeline_end_to_end(spark, tmp_path):
    from luma_etl_data_platform_spark import pipeline as P
    rows = [
        {"GLDetail.Id": "6f9619ff-8b86-d011-b42d-00c04fc964ff",
         "Amount": "100.00", "PostingDate": "2024-01-15T00:00:00"},
        {"GLDetail.Id": "bad", "Amount": "2024-01-15",
         "PostingDate": "2024-01-16T00:00:00", "JournalCode": "J1"},
    ]
    df = spark.read.json(spark.sparkContext.parallelize(
        [__import__("json").dumps(r) for r in rows]))
    reg = SchemaRegistry()
    tagged = P.ingest_records(df, reg)
    assert "_schema_version" in tagged.columns
    assert "GLDetail_Id" in tagged.columns
    out = str(tmp_path / "staged")
    P.stage(tagged, out, batch_id=1)
    merged = P.compile_merged(spark, out)
    assert merged.count() == 2
    data_cols = [c for c in merged.columns if not c.startswith("_")]
    assert data_cols == sorted(data_cols)
    cleansed = merged.select(
        C.validate_uuid(F.col("GLDetail_Id")).alias("id"),
        C.repair_amount(F.col("Amount")).alias("amount"),
    )
    got = {(r["id"][:4], r["amount"]) for r in cleansed.collect()}
    assert got == {("6f96", 100.0), ("N/A", 0.0)}


# ---------------------------------------------------------------------------
# Declarative expectation suite
# ---------------------------------------------------------------------------

def test_expectations_report_counts_and_null_handling(spark):
    from pyspark.sql import functions as F
    from luma_etl_data_platform_spark.operators.validate import (
        expectations_report)
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "c"), (4, "dd")],
        "k int, s string")
    rep = expectations_report(df, {
        "k_not_null": F.col("k").isNull(),
        "s_single_char": ~F.col("s").rlike("^.$") | F.col("s").isNull(),
    })
    got = {r["check_name"]: r["n_violations"] for r in rep.collect()}
    assert got == {"k_not_null": 1, "s_single_char": 2}


def test_expectations_report_empty_input_is_all_zero(spark):
    from pyspark.sql import functions as F
    from luma_etl_data_platform_spark.operators.validate import (
        expectations_report)
    df = spark.createDataFrame([], "k int")
    rep = expectations_report(df, {"k_not_null": F.col("k").isNull()})
    assert [r["n_violations"] for r in rep.collect()] == [0]


def test_enforce_expectations_routing_and_tags(spark):
    from pyspark.sql import functions as F
    from luma_etl_data_platform_spark.operators.validate import (
        enforce_expectations)
    df = spark.createDataFrame(
        [(1, "ok", 10.0), (2, None, 5.0), (3, "ok", -1.0), (4, None, -2.0)],
        "k int, s string, v double")
    clean, rejects = enforce_expectations(df, {
        "s_not_null": F.col("s").isNull(),
        "v_positive": ~(F.col("v") > 0.0) | F.col("v").isNull(),
    })
    assert [r["k"] for r in clean.orderBy("k").collect()] == [1]
    got = {r["k"]: r["_violations"] for r in rejects.collect()}
    assert got == {2: ["s_not_null"], 3: ["v_positive"],
                   4: ["s_not_null", "v_positive"]}

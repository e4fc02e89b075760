"""Full-system integration test: the reference's three-stage workflow
(Infor→S3→staging→warehouse, workflow.ps1:402-433) end-to-end on
Spark — REST-lake DataSource → drift-aware ingest → staged parquet →
warehouse transform SQL → count reconciliation + job tracking."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from luma_etl_data_platform_spark import orchestration as O
from luma_etl_data_platform_spark import pipeline as P
from luma_etl_data_platform_spark.operators.validate import reconcile_counts
from luma_etl_data_platform_spark.plans import transform as TR
from luma_etl_data_platform_spark.schema_registry import SchemaRegistry
from luma_etl_data_platform_spark.sources.rest_lake import (
    FakeLakeTransport, RestLakeDataSource, transport_option,
)

BC = "FSM_GeneralLedgerTotal"


@pytest.fixture()
def lake():
    recs = []
    for i in range(300):
        r = {"Account": f"A{i % 7}", "AccountingEntity": f"E{i % 3}",
             "FinanceCodeBlock.AccountingUnit": f"U{i % 5}",
             "NetTransactionAmount": f"{(i % 100) + 0.25}",
             "PostingDate": f"2024-01-{(i % 28) + 1:02d}T00:00:00"}
        if i % 4 == 0:
            r["JournalCode"] = f"J{i % 2}"       # drift: extra column
        if i % 50 == 0:
            r["NetTransactionAmount"] = "2024-01-15"   # the date-in-amount bug
        recs.append(r)
    return FakeLakeTransport(docs={BC: recs}, n_chunks=4, records_per_object=30)


def test_incremental_two_run_extraction(spark, tmp_path):
    """Run 1 extracts everything; the lake then grows; run 2 fetches
    ONLY the new objects (ledger-driven source-side exclusion) — the
    reference's incremental loop (set(all) − set(extracted))."""
    from luma_etl_data_platform_spark.sources.incremental import ProcessedIdLedger

    recs_v1 = [{"RecId": f"r{i}", "Amount": str(i)} for i in range(100)]
    lake = FakeLakeTransport(docs={BC: list(recs_v1)}, n_chunks=2,
                             records_per_object=25)
    spark.dataSource.register(RestLakeDataSource)
    ledger = ProcessedIdLedger(spark, str(tmp_path / "ledger"))

    def extract(excludes: str):
        return (spark.read.format("restlake")
                .schema("RecId string, Amount string")
                .option("business_class", BC)
                .option("transport_pickle", transport_option(lake))
                .option("exclude_ids", excludes)
                .load())

    def object_ids():
        return [o.dl_id
                for cf in lake.query_split(f"dl_document_name eq '{BC}'")
                for o in lake.list_objects(cf)]

    # run 1: full
    run1 = extract("")
    assert run1.count() == 100
    ids = spark.createDataFrame([(i,) for i in object_ids()], ["id"])
    ledger.record(ledger.not_processed(ids), batch_id=1)

    # lake grows by 50 records (2 new objects)
    lake.docs[BC].extend({"RecId": f"r{i}", "Amount": str(i)}
                         for i in range(100, 150))

    # run 2: exclude everything already processed
    ids2 = spark.createDataFrame([(i,) for i in object_ids()], ["id"])
    todo = [r["id"] for r in ledger.not_processed(ids2).collect()]
    assert len(todo) == 2                       # only the new objects
    run2 = extract(",".join(set(object_ids()) - set(todo)))
    got = {r["RecId"] for r in run2.collect()}
    assert got == {f"r{i}" for i in range(100, 150)}
    ledger.record(ledger.not_processed(ids2), batch_id=2)
    assert ledger.not_processed(ids2).count() == 0


def test_pipeline_feeds_scd2_history(spark, tmp_path):
    """Capstone: two extraction batches flow through ingest/cleanse
    into an SCD2 warehouse dimension — changed accounts get history
    rows, unchanged ones keep their original validity window."""
    import datetime as dt
    from luma_etl_data_platform_spark.plans.scd import scd2_apply

    def batch_df(rows):
        import json as J
        return spark.read.json(spark.sparkContext.parallelize(
            [J.dumps(r) for r in rows]))

    dim = str(tmp_path / "dim_account")
    b1 = [{"Account": f"A{i}", "Description": f"desc{i}", "Status": "open"}
          for i in range(20)]
    reg = SchemaRegistry()
    t1 = P.ingest_records(batch_df(b1), reg).drop("_schema_version")
    scd2_apply(spark, dim, t1, "Account", ["Description", "Status"],
               dt.datetime(2024, 1, 1))

    # batch 2: A0 closes, A1 renamed, A20 appears
    b2 = [{"Account": "A0", "Description": "desc0", "Status": "closed"},
          {"Account": "A1", "Description": "renamed", "Status": "open"},
          {"Account": "A20", "Description": "new", "Status": "open"}]
    t2 = P.ingest_records(batch_df(b2), reg).drop("_schema_version")
    scd2_apply(spark, dim, t2, "Account", ["Description", "Status"],
               dt.datetime(2024, 2, 1))

    hist = spark.read.parquet(dim)
    assert hist.count() == 20 + 1 + 2       # 20 originals + A20 + 2 new versions
    cur = hist.filter(F.col("is_current"))
    assert cur.count() == 21
    a0 = {(r["Status"], r["is_current"]) for r in hist.filter("Account = 'A0'").collect()}
    assert a0 == {("open", False), ("closed", True)}
    a5 = hist.filter("Account = 'A5'").collect()
    assert len(a5) == 1 and a5[0]["is_current"] and str(a5[0]["valid_from"]).startswith("2024-01")


def test_three_stage_pipeline(spark, lake, tmp_path):
    tracker = O.JobTracker(spark, str(tmp_path / "jobs"))

    def run_class(bc: str) -> None:
        # -- stage 1: extract (REST lake → DataFrame, drift-tagged) --
        spark.dataSource.register(RestLakeDataSource)
        raw = (spark.read.format("restlake")
               .schema("Account string, AccountingEntity string, "
                       "`FinanceCodeBlock.AccountingUnit` string, "
                       "NetTransactionAmount string, PostingDate string, "
                       "JournalCode string")
               .option("business_class", bc)
               .option("transport_pickle", transport_option(lake))
               .load())
        reg = SchemaRegistry()
        tagged = P.ingest_records(raw, reg)
        # -- stage 2: stage to partitioned parquet + cleanse + load --
        staged_path = str(tmp_path / "staged" / bc)
        P.stage(tagged, staged_path, batch_id=1700000000)
        merged = P.compile_merged(spark, staged_path)
        from luma_etl_data_platform_spark.functions.cleansing import repair_amount
        staging = merged.select(
            "Account", "AccountingEntity",
            F.col("FinanceCodeBlock_AccountingUnit").alias("AccountingUnit"),
            repair_amount(F.col("NetTransactionAmount")).alias("NetTransactionAmount"),
            F.col("PostingDate").try_cast("timestamp").alias("PostingDate"),
            "JournalCode",
        )
        staging.createOrReplaceTempView("staging_gl")
        # -- stage 3: warehouse transform (templated Spark SQL replacing
        #    the external stored procedure) --
        TR.run_script(spark, """
            DROP TABLE IF EXISTS {{warehouse}};
            CREATE TABLE {{warehouse}} USING parquet AS
            SELECT Account, AccountingEntity,
                   CAST(round(sum(CAST(NetTransactionAmount AS DECIMAL(18,2))), 2) AS DOUBLE)
                     AS total_amount,
                   count(*) AS n_rows
            FROM {{staging}}
            GROUP BY Account, AccountingEntity
        """, {"staging": "staging_gl", "warehouse": "wh_gl_totals"})
        # -- validation: count reconciliation (A2 semantics) --
        expected = spark.createDataFrame(
            [(o.dl_id, o.dl_instance_count)
             for cf in lake.query_split(f"dl_document_name eq '{bc}'")
             for o in lake.list_objects(cf)],
            ["dl_id", "dl_instance_count"])
        rc = reconcile_counts(merged, expected)
        assert rc.ok, f"reconciliation failed: {rc}"

    res = O.run_subject_area([BC], run_class, tracker=tracker)
    assert res.ok, res.failed

    wh = spark.table("wh_gl_totals")
    assert wh.count() == 7 * 3          # Account × AccountingEntity grid
    total = wh.agg(F.sum("n_rows")).collect()[0][0]
    assert total == 300
    # the date-valued amounts (every 50th record) became 0.00 — their
    # groups still count rows but contribute nothing
    a0e0 = wh.filter("Account = 'A0' AND AccountingEntity = 'E0'").collect()[0]
    assert a0e0["n_rows"] > 0
    jobs = tracker.read().collect()
    assert len(jobs) == 1 and jobs[0]["was_successful"]
    spark.sql("DROP TABLE IF EXISTS wh_gl_totals")

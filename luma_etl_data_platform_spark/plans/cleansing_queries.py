"""Cleansing operators exposed as oracle-verified queries.

The reference's cleansing steps (date-valued amount repair, UUID
validation, k=v blob extraction, null sentinels — SURVEY §2.2
P7/P8/P9/P14) run here against deterministically-derived messy columns
built from the orders table, so a DuckDB oracle can state the same
derivation + the same repair and match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleansing import (
    extract_keyed_value, repair_amount, validate_uuid,
)
from ..sources.tables import load_table

ORACLE: dict[str, str] = {}


def cleanse_mixed_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a messy staging shape from orders, then cleanse:

    - ``amount_raw``: every 10th order carries a date string instead of
      the amount (the reference's GL bug, utilities/utilities.py:591-596)
      → repaired to 0.00, others cast to double;
    - ``uid_raw``: every 7th order has a malformed id → 'N/A';
    - ``userfields``: k=v blob → extracted IDBudgetFundType value;
    - null sentinel: orders with priority 5-LOW get a NULL amount →
      filled with -99.0 (lambda_function.py:183-199 semantics).
    """
    orders = load_table(spark, sf_dir, "orders")
    uuid_like = F.concat(
        F.lpad(F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10) % 100000000, 8, "0"),
        F.lit("-0000-4000-8000-000000000000"))
    messy = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 10 == 0,
               F.date_format("o_orderdate", "yyyy-MM-dd"))
         .when(F.col("o_orderpriority") == "5-LOW", F.lit(None))
         .otherwise(F.col("o_totalprice").cast("string")).alias("amount_raw"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("not-a-uuid"))
         .otherwise(uuid_like).alias("uid_raw"),
        F.concat(F.lit("a=1,IDBudgetFundType=GF"),
                 F.when(F.col("o_orderkey") % 2 == 0, F.lit("2")).otherwise(F.lit("1")),
                 F.lit(",b=2")).alias("userfields"),
    )
    cleansed = messy.select(
        "o_orderkey",
        F.coalesce(F.round(repair_amount(F.col("amount_raw")), 2), F.lit(-99.0)).alias("amount"),
        validate_uuid(F.col("uid_raw")).alias("uid"),
        extract_keyed_value(F.col("userfields")).alias("fund_type"),
    )
    return cleansed


ORACLE["cleanse_mixed_orders"] = """
WITH messy AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 0 THEN strftime(o_orderdate, '%Y-%m-%d')
              WHEN o_orderpriority = '5-LOW' THEN NULL
              ELSE CAST(o_totalprice AS VARCHAR) END AS amount_raw,
         CASE WHEN o_orderkey % 7 = 0 THEN 'not-a-uuid'
              ELSE lpad(CAST(CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) AS BIGINT) % 100000000 AS VARCHAR), 8, '0')
                   || '-0000-4000-8000-000000000000' END AS uid_raw,
         'a=1,IDBudgetFundType=GF' || (CASE WHEN o_orderkey % 2 = 0 THEN '2' ELSE '1' END) || ',b=2' AS userfields
  FROM orders)
SELECT o_orderkey,
       coalesce(round(CASE WHEN regexp_matches(amount_raw, '^[0-9]{4}-[0-9]{2}-[0-9]{2}')
                           THEN 0.0 ELSE try_cast(amount_raw AS DOUBLE) END, 2),
                -99.0) AS amount,
       CASE WHEN regexp_matches(uid_raw,
              '^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$')
            THEN uid_raw ELSE 'N/A' END AS uid,
       CASE WHEN len(list_filter(string_split(userfields, ','), x -> contains(x, 'IDBudgetFundType'))) > 0
            THEN list_extract(string_split(list_extract(list_filter(string_split(userfields, ','), x -> contains(x, 'IDBudgetFundType')), 1), '='), -1)
       END AS fund_type
FROM messy
"""


# ---------------------------------------------------------------------------
# PII redaction: emails/SSNs/phones scrubbed from documents enriched
# with deterministic doc_id-derived PII (the corpus carries none of its
# own, so the synthesis makes every regex path fire on every row).
# ---------------------------------------------------------------------------
def pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.cleansing import pii_counts, redact_pii
    docs = load_table(spark, sf_dir, "documents")
    enriched = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" reach me at user"), F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" ssn 123-45-6789."),
        ).alias("t"))
    counts = pii_counts(F.col("t"))
    return enriched.select(
        "doc_id",
        counts["n_emails"].cast("long").alias("n_emails"),
        counts["n_ssns"].cast("long").alias("n_ssns"),
        counts["n_phones"].cast("long").alias("n_phones"),
        F.length(redact_pii(F.col("t"))).cast("long").alias("redacted_len"),
    )


def _pii_oracle() -> str:
    from ..functions.cleansing import (
        PII_EMAIL_RE, PII_PHONE_RE, PII_SSN_RE,
    )
    enrich = ("text || ' reach me at user' || doc_id || '@example.com or 555-'"
              " || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'"
              " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
              " || ' ssn 123-45-6789.'")
    redacted = ("regexp_replace(regexp_replace(regexp_replace(t, '"
                + PII_EMAIL_RE + "', '[EMAIL]', 'g'), '"
                + PII_SSN_RE + "', '[SSN]', 'g'), '"
                + PII_PHONE_RE + "', '[PHONE]', 'g')")
    return (
        "WITH p AS (SELECT doc_id, " + enrich + " AS t FROM documents)\n"
        "SELECT doc_id,\n"
        "  CAST(len(regexp_extract_all(t, '" + PII_EMAIL_RE + "')) AS BIGINT) AS n_emails,\n"
        "  CAST(len(regexp_extract_all(t, '" + PII_SSN_RE + "')) AS BIGINT) AS n_ssns,\n"
        "  CAST(len(regexp_extract_all(t, '" + PII_PHONE_RE + "')) AS BIGINT) AS n_phones,\n"
        "  CAST(length(" + redacted + ") AS BIGINT) AS redacted_len\n"
        "FROM p"
    )


ORACLE["pii_redaction_stats"] = _pii_oracle()


QUERIES = {
    "cleanse_mixed_orders": cleanse_mixed_orders,
    "pii_redaction_stats": pii_redaction_stats,
}

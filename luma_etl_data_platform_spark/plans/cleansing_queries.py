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

from ..core.localframe import local_frame

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


def expectations_orders_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate over orders: null / set-membership
    / range / regex / temporal-bounds expectations compile into ONE
    conditional-aggregate scan (operators/validate.expectations_report),
    plus a uniqueness check and a referential-integrity check against
    the customer dimension (broadcast anti-join — the dim is the small
    side). The price-cap expectation is deliberately tight so the fail
    path is exercised: the report carries real violation counts, not a
    wall of zeros. NULL-valued fields count as violations (null-safe
    predicates on both sides)."""
    from ..operators.validate import expectations_report
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    st, pr, dt, py = (F.col("o_orderstatus"), F.col("o_totalprice"),
                      F.col("o_orderdate"), F.col("o_orderpriority"))
    checks = {
        "orderkey_not_null": F.col("o_orderkey").isNull(),
        "status_in_set": ~st.isin("O", "F", "P") | st.isNull(),
        "price_positive": ~(pr > 0.0) | pr.isNull(),
        "price_under_300k": ~(pr < 300000.0) | pr.isNull(),
        "date_in_range": ~dt.between("1992-01-01", "1998-12-31")
                         | dt.isNull(),
        "priority_format": ~py.rlike("^[1-5]-[A-Z]") | py.isNull(),
    }
    base = expectations_report(orders, checks)
    uniq = (orders.agg((F.count("o_orderkey")
                        - F.countDistinct("o_orderkey"))
                       .alias("n_violations"))
            .select(F.lit("orderkey_unique").alias("check_name"),
                    "n_violations"))
    fk = (orders.join(F.broadcast(customer.select(
              F.col("c_custkey").alias("o_custkey"))),
              "o_custkey", "left_anti")
          .agg(F.count(F.lit(1)).alias("n_violations"))
          .select(F.lit("custkey_in_customer").alias("check_name"),
                  "n_violations"))
    return (base.unionByName(uniq).unionByName(fk)
            .withColumn("status", F.when(F.col("n_violations") == 0,
                                         F.lit("pass"))
                        .otherwise(F.lit("fail")))
            .orderBy("check_name"))


ORACLE["expectations_orders_report"] = """
WITH wide AS (
  SELECT
    CAST(coalesce(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END), 0)
      AS BIGINT) AS orderkey_not_null,
    CAST(coalesce(sum(CASE WHEN NOT o_orderstatus IN ('O','F','P')
                        OR o_orderstatus IS NULL THEN 1 ELSE 0 END), 0)
      AS BIGINT) AS status_in_set,
    CAST(coalesce(sum(CASE WHEN NOT (o_totalprice > 0.0)
                        OR o_totalprice IS NULL THEN 1 ELSE 0 END), 0)
      AS BIGINT) AS price_positive,
    CAST(coalesce(sum(CASE WHEN NOT (o_totalprice < 300000.0)
                        OR o_totalprice IS NULL THEN 1 ELSE 0 END), 0)
      AS BIGINT) AS price_under_300k,
    CAST(coalesce(sum(CASE WHEN NOT (o_orderdate BETWEEN '1992-01-01'
                                AND '1998-12-31')
                        OR o_orderdate IS NULL THEN 1 ELSE 0 END), 0)
      AS BIGINT) AS date_in_range,
    CAST(coalesce(sum(CASE WHEN NOT regexp_matches(o_orderpriority,
                                              '^[1-5]-[A-Z]')
                        OR o_orderpriority IS NULL THEN 1 ELSE 0 END), 0)
      AS BIGINT) AS priority_format
  FROM orders),
long AS (
  SELECT 'orderkey_not_null' AS check_name, orderkey_not_null
    AS n_violations FROM wide
  UNION ALL SELECT 'status_in_set', status_in_set FROM wide
  UNION ALL SELECT 'price_positive', price_positive FROM wide
  UNION ALL SELECT 'price_under_300k', price_under_300k FROM wide
  UNION ALL SELECT 'date_in_range', date_in_range FROM wide
  UNION ALL SELECT 'priority_format', priority_format FROM wide
  UNION ALL SELECT 'orderkey_unique',
    count(o_orderkey) - count(DISTINCT o_orderkey) FROM orders
  UNION ALL SELECT 'custkey_in_customer',
    (SELECT count(*) FROM orders o
     WHERE o.o_custkey NOT IN (SELECT c_custkey FROM customer)) )
SELECT check_name, n_violations,
       CASE WHEN n_violations = 0 THEN 'pass' ELSE 'fail' END AS status
FROM long ORDER BY check_name
"""


def constrained_load_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-enforced load: deterministically corrupt orders
    (status nulled for keys % 11 == 0, price negated for % 13 == 0),
    route rows through `operators/validate.enforce_expectations`
    (CHECK-constraint semantics with dead-letter routing), and report
    the accepted rollup next to per-rule reject counts — including
    rows rejected by BOTH rules (the `_violations` array keeps every
    failed rule, so dead-letter triage sees the full picture). The
    oracle replays corruption + routing relationally."""
    from ..operators.validate import enforce_expectations
    orders = load_table(spark, sf_dir, "orders")
    corrupted = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 11 == 0, F.lit(None))
        .otherwise(F.col("o_orderstatus")).alias("o_orderstatus"),
        F.when(F.col("o_orderkey") % 13 == 0, -F.col("o_totalprice"))
        .otherwise(F.col("o_totalprice")).alias("o_totalprice"))
    checks = {
        "status_not_null": F.col("o_orderstatus").isNull(),
        "price_positive": ~(F.col("o_totalprice") > 0.0)
                          | F.col("o_totalprice").isNull(),
    }
    clean, rejects = enforce_expectations(corrupted, checks)
    accepted = clean.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("decimal(38,6)"), 2).cast("double")
        .alias("total_price")).select(
        F.lit("accepted").alias("bucket"), "n_rows", "total_price")
    # left-join counts onto the full rule list so a rule with zero
    # rejects still reports a 0 row (the oracle emits every rule
    # unconditionally)
    rules = local_frame(spark, [(r,) for r in sorted(checks)],
                        "rule string")
    counts = (rejects.select(F.explode("_violations").alias("rule"))
              .groupBy("rule").agg(F.count(F.lit(1)).alias("_n")))
    rej = (rules.join(counts, "rule", "left")
           .select(F.concat(F.lit("rejected:"), F.col("rule"))
                   .alias("bucket"),
                   F.coalesce(F.col("_n"), F.lit(0)).alias("n_rows"),
                   F.lit(None).cast("double").alias("total_price")))
    return accepted.unionByName(rej).orderBy("bucket")


ORACLE["constrained_load_report"] = """
WITH c AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 11 = 0 THEN NULL
              ELSE o_orderstatus END AS o_orderstatus,
         CASE WHEN o_orderkey % 13 = 0 THEN -o_totalprice
              ELSE o_totalprice END AS o_totalprice
  FROM orders),
flags AS (
  SELECT *,
         (o_orderstatus IS NULL) AS v_status,
         (NOT (o_totalprice > 0.0) OR o_totalprice IS NULL) AS v_price
  FROM c)
SELECT 'accepted' AS bucket, count(*) AS n_rows,
       CAST(round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                       AS DECIMAL(38,6)), 2) AS DOUBLE) AS total_price
FROM flags WHERE NOT v_status AND NOT v_price
UNION ALL
SELECT 'rejected:price_positive', count(*), NULL
FROM flags WHERE v_price
UNION ALL
SELECT 'rejected:status_not_null', count(*), NULL
FROM flags WHERE v_status
ORDER BY bucket
"""


QUERIES = {
    "cleanse_mixed_orders": cleanse_mixed_orders,
    "pii_redaction_stats": pii_redaction_stats,
    "expectations_orders_report": expectations_orders_report,
    "constrained_load_report": constrained_load_report,
}


def k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit: k-anonymity of the (mktsegment, nationkey)
    quasi-identifier over customers — group-size census, rows at risk
    (equivalence class < k), and the generalization fallback (drop
    nationkey): the pre-release check a training-data pipeline runs
    before shipping user-derived tables. One groupBy per
    generalization level; k = 25."""
    cust = load_table(spark, sf_dir, "customer")
    k = 25

    def _level(cols: list[str], name: str) -> DataFrame:
        g = cust.groupBy(*cols).agg(F.count(F.lit(1)).alias("_n"))
        return g.agg(
            F.lit(name).alias("level"),
            F.count(F.lit(1)).alias("n_classes"),
            F.coalesce(F.sum((F.col("_n") < k).cast("long")), F.lit(0))
            .alias("n_small_classes"),
            F.coalesce(F.sum(F.when(F.col("_n") < k, F.col("_n"))
                             .otherwise(F.lit(0))), F.lit(0))
            .alias("n_rows_at_risk"),
            F.min("_n").alias("min_class_size"))

    return (_level(["c_mktsegment", "c_nationkey"], "segment+nation")
            .unionByName(_level(["c_mktsegment"], "segment"))
            .orderBy("level"))


ORACLE["k_anonymity_report"] = """
WITH g2 AS (SELECT c_mktsegment, c_nationkey, count(*) AS n
            FROM customer GROUP BY 1, 2),
g1 AS (SELECT c_mktsegment, count(*) AS n FROM customer GROUP BY 1)
SELECT 'segment' AS level, count(*) AS n_classes,
       CAST(coalesce(sum(CASE WHEN n < 25 THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_small_classes,
       CAST(coalesce(sum(CASE WHEN n < 25 THEN n ELSE 0 END), 0) AS BIGINT)
         AS n_rows_at_risk,
       min(n) AS min_class_size
FROM g1
UNION ALL
SELECT 'segment+nation', count(*),
       CAST(coalesce(sum(CASE WHEN n < 25 THEN 1 ELSE 0 END), 0) AS BIGINT),
       CAST(coalesce(sum(CASE WHEN n < 25 THEN n ELSE 0 END), 0) AS BIGINT),
       min(n)
FROM g2
ORDER BY level
"""


def dp_noisy_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy-STYLE noisy release: per-priority order
    counts + seeded Laplace noise (scale b = 1/ε, ε = 0.5). The noise
    is derived from the portable md5 hash of the group key — u
    uniform on (-1/2, 1/2), noise = -b·sign(u)·ln(1 − 2|u|) — so the
    release is reproducible and hash-checkable. A production DP
    deployment swaps the seeded hash for a CSPRNG (documented here:
    determinism and privacy are at odds; this query demonstrates the
    MECHANISM — sensitivity-1 count + Laplace — not a privacy
    guarantee)."""
    orders = load_table(spark, sf_dir, "orders")
    g = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("true_count"))
    h = F.conv(F.substring(F.md5(F.concat(F.lit("dp:"),
                                          F.col("o_orderpriority"))),
                           1, 8), 16, 10).cast("long")
    u = (h.cast("double") / F.lit(4294967296.0)) - F.lit(0.5)
    b = F.lit(2.0)  # 1/epsilon, epsilon = 0.5
    noise = (-b * F.signum(u)
             * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u)))
    return (g.select("o_orderpriority", "true_count",
                     F.round((F.col("true_count").cast("double") + noise),
                             4).alias("noisy_count"))
            .orderBy("o_orderpriority"))


ORACLE["dp_noisy_priority_counts"] = """
WITH g AS (SELECT o_orderpriority, count(*) AS true_count
           FROM orders GROUP BY 1),
n AS (SELECT o_orderpriority, true_count,
             (CAST(CAST('0x' || substr(md5('dp:' || o_orderpriority), 1, 8)
                        AS BIGINT) AS DOUBLE) / 4294967296.0) - 0.5 AS u
      FROM g)
SELECT o_orderpriority, true_count,
       round(CAST(true_count AS DOUBLE)
             + (-2.0 * sign(u) * ln(1.0 - 2.0 * abs(u))), 4)
         AS noisy_count
FROM n ORDER BY o_orderpriority
"""

QUERIES["k_anonymity_report"] = k_anonymity_report
QUERIES["dp_noisy_priority_counts"] = dp_noisy_priority_counts


def masked_customer_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column masking / pseudonymization for a data share: stable
    md5 pseudonyms for names (joinable across exports, not
    reversible without the salt), account balances generalized to
    1000-unit bands, direct identifiers dropped. The export-side
    complement of k_anonymity_report — portable md5 keeps even the
    pseudonyms hash-checkable. First 30 subjects by key."""
    cust = load_table(spark, sf_dir, "customer")
    pseud = F.substring(F.md5(F.concat(F.lit("pseud:"),
                                       F.col("c_name"))), 1, 12)
    band = (F.floor(F.col("c_acctbal") / 1000.0) * 1000).cast("long")
    return (cust.orderBy("c_custkey").limit(30)
            .select(F.col("c_custkey"),
                    pseud.alias("name_pseudonym"),
                    band.alias("acctbal_band"),
                    "c_mktsegment"))


ORACLE["masked_customer_export"] = """
SELECT c_custkey,
       substr(md5('pseud:' || c_name), 1, 12) AS name_pseudonym,
       CAST(floor(c_acctbal / 1000.0) * 1000 AS BIGINT) AS acctbal_band,
       c_mktsegment
FROM customer ORDER BY c_custkey LIMIT 30
"""

QUERIES["masked_customer_export"] = masked_customer_export

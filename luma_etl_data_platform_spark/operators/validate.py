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
class FreshnessResult:
    max_ts: object
    age_seconds: float
    max_age_seconds: float

    @property
    def ok(self) -> bool:
        return self.age_seconds <= self.max_age_seconds


def check_freshness(df: DataFrame, ts_col: str, max_age_seconds: float,
                    now=None) -> FreshnessResult:
    """Data-freshness gate: the newest event must be within
    ``max_age_seconds`` of ``now`` (injectable for tests/schedulers).
    The ops-side guard the reference approximated with its nightly
    cadence checks (run.ps1 schedule + log scanning).

    The age is computed INSIDE Spark (unix_timestamp difference):
    collecting max(ts) to the driver renders it in the driver's local
    timezone (TimestampType.fromInternal → datetime.fromtimestamp),
    so driver-side subtraction against a UTC "now" skews by the UTC
    offset on any non-UTC driver — enough to flip the verdict."""
    now_col = F.current_timestamp() if now is None else F.lit(now).cast("timestamp")
    row = (
        df.agg(F.max(ts_col).alias("m"))
        .select("m", (F.unix_timestamp(now_col)
                      - F.unix_timestamp(F.col("m"))).alias("age"))
        .collect()[0]
    )
    age = float("inf") if row["age"] is None else float(row["age"])
    return FreshnessResult(max_ts=row["m"], age_seconds=age,
                           max_age_seconds=max_age_seconds)


@dataclass
class SchemaDiff:
    missing_from_data: list[str]      # in expected, not in df (warned)
    unknown_in_data: list[str]        # in df, not expected (dropped by loader)
    type_mismatches: dict[str, tuple[str, str]]  # col -> (actual, expected)

    @property
    def clean(self) -> bool:
        return not (self.missing_from_data or self.unknown_in_data
                    or self.type_mismatches)


def schema_diff(df: DataFrame, expected: T.StructType) -> SchemaDiff:
    """The reference's load-time schema reconciliation as a first-class
    check (lambda_function.py:140-158: metadata-not-data columns are
    warned, data-not-metadata columns are dropped with a warning).
    Returns the diff; the caller decides to log/drop/fail."""
    actual = {f.name: f.dataType for f in df.schema.fields}
    exp = {f.name: f.dataType for f in expected.fields}
    missing = sorted(set(exp) - set(actual))
    unknown = sorted(set(actual) - set(exp))
    mismatched = {
        name: (actual[name].simpleString(), exp[name].simpleString())
        for name in set(actual) & set(exp)
        if actual[name] != exp[name]
    }
    return SchemaDiff(missing, unknown, mismatched)


def apply_expected_schema(df: DataFrame, expected: T.StructType) -> DataFrame:
    """Enforce the reconciliation policy: drop unknown columns, add
    missing ones as typed nulls, try_cast mismatches — the loader
    behavior, made explicit and lossless-logged via schema_diff."""
    diff = schema_diff(df, expected)
    cols = []
    for f in expected.fields:
        if f.name in diff.missing_from_data:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        elif f.name in diff.type_mismatches:
            cols.append(F.col(f.name).try_cast(f.dataType).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


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


def expectations_report(df: DataFrame, checks: dict[str, F.Column]) -> DataFrame:
    """Declarative expectation suite (the Great-Expectations shape the
    reference approximates with scattered runtime warnings —
    lambda_function.py:140-158, utilities/utilities.py:69-82):
    ``checks`` maps a check name to a VIOLATION predicate; the report
    is one row per check with its violation count.

    Plan shape: every check compiles to a conditional sum in a SINGLE
    aggregate over ONE scan — adding a check adds an expression, not a
    pass — then a driver-side ``stack`` unpivots the 1×N result. At
    100 TB this is the only affordable shape: N full-table validation
    queries collapse into one map-side-combinable scan."""
    if not checks:
        raise ValueError("expectations_report: no checks given")
    import re as _re
    bad = [n for n in checks if not _re.fullmatch(r"[A-Za-z0-9_]+", n)]
    if bad:
        # names are interpolated into a stack() selectExpr — restrict
        # to identifier characters rather than escape-quoting SQL
        raise ValueError(f"expectations_report: check names must be "
                         f"[A-Za-z0-9_]+; got {bad}")
    aggs = [F.coalesce(F.sum(c.cast("long")), F.lit(0)).alias(n)
            for n, c in checks.items()]
    wide = df.agg(*aggs)
    pairs = ", ".join(f"'{n}', `{n}`" for n in checks)
    return wide.selectExpr(
        f"stack({len(checks)}, {pairs}) AS (check_name, n_violations)")


def enforce_expectations(df: DataFrame,
                         checks: dict[str, F.Column]) -> tuple[DataFrame, DataFrame]:
    """Constraint ENFORCEMENT (the write-path counterpart of
    :func:`expectations_report`, i.e. Delta-style CHECK constraints
    with dead-letter routing instead of job failure): returns
    ``(clean, rejects)`` where ``rejects`` carries a sorted
    ``_violations`` array naming every failed rule.

    One narrow map computes all predicates once into a single array
    column; both outputs are filters over it — Spark evaluates the
    shared subexpression per row, no second scan, no shuffle. The
    reference's loader silently repaired or dropped bad values
    (lambda_function.py:183-199); this makes the routing explicit and
    auditable."""
    if not checks:
        raise ValueError("enforce_expectations: no checks given")
    names = sorted(checks)
    viol = F.array_compact(F.array(*[
        F.when(checks[n], F.lit(n)) for n in names]))
    tagged = df.withColumn("_violations", viol)
    clean = tagged.filter(F.size("_violations") == 0).drop("_violations")
    rejects = tagged.filter(F.size("_violations") > 0)
    return clean, rejects

"""As-of (time-travel) join — an operator Spark lacks natively.

``asof_join(left, right, ...)`` matches each left row to the most
recent right row with ``right_time <= left_time`` for the same key
(backward direction), like pandas ``merge_asof`` but distributed.

Implementation: the union+window technique, NOT a range join —
both sides are unioned with a side marker, sorted once within each
key partition by (time, side, tiebreak), and the right payload is
carried forward with ``last(..., ignorenulls=True)``. Cost is a
single shuffle on the key + one window sort: O((|L|+|R|) log) per
key, independent of how many right rows precede each left row (a
join+filter formulation would be O(|L|·|R|) per key).

Determinism: among right rows with equal time, the one with the
greatest tiebreak column wins (last in sort order).

Scale: one shuffle on the join key; skewed keys are bounded by the
window sort, and AQE skew handling applies to the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_time: str, right_time: str,
              right_cols: list[str] | None = None,
              tiebreak: str | None = None) -> DataFrame:
    """Backward as-of join: every ``left`` row + the payload columns of
    the latest ``right`` row with ``right[right_time] <= left[left_time]``
    and the same ``on`` key (nulls when none exists — left-join
    semantics).

    ``right_cols`` are the right payload columns to carry (default:
    all except key/time). ``tiebreak``: right column deciding ties at
    equal right_time (default ``right_time``).
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_time)]
    payload = list(dict.fromkeys(right_cols + [right_time]))
    tiebreak = tiebreak or right_time

    # The right payload travels as ONE struct so the matched row wins
    # or loses atomically: per-column last(ignorenulls) would backfill
    # a NULL payload column from an OLDER right row, producing a torn
    # row that silently diverges from pandas merge_asof semantics.
    rpay_type = (
        "struct<" + ",".join(
            f"{c}:{right.schema[c].dataType.simpleString()}" for c in payload) + ">")
    l_marked = left.select(
        F.col(on).alias("_k"), F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"), F.lit(None).cast(right.schema[tiebreak].dataType).alias("_tb"),
        F.lit(None).cast(rpay_type).alias("_rpay"),
        F.struct(*left.columns).alias("_lrow"),
    )
    r_marked = right.select(
        F.col(on).alias("_k"), F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"), F.col(tiebreak).alias("_tb"),
        F.struct(*[F.col(c).alias(c) for c in payload]).alias("_rpay"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields) + ">"
        ).alias("_lrow"),
    )
    unioned = r_marked.unionByName(l_marked)
    # right rows sort before left rows at equal time (<= semantics);
    # among right ties the greatest tiebreak lands last → wins.
    w = (W.partitionBy("_k")
         .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_tb").asc())
         .rowsBetween(W.unboundedPreceding, 0))
    carried = unioned.select(
        "_side", "_lrow",
        F.last("_rpay", ignorenulls=True).over(w).alias("_rpay"),
    )
    out_left = [F.col("_lrow")[c].alias(c) for c in left.columns]
    out_right = [F.col("_rpay")[c].alias(c) for c in payload]
    return carried.filter(F.col("_side") == 1).select(*out_left, *out_right)

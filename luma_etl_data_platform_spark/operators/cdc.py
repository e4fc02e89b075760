"""Change-data-capture (CDC) apply: collapse an insert/update/delete
operation stream into final table state.

The missing half of the merge family (reference scope: the platform's
MERGE column-list generator `db/columns/dbcolumngen.py:3-32` builds
T-SQL upserts but has no delete semantics and no op log; SCD2 in
`plans/scd.py` keeps history — this operator produces the *current
snapshot* from a Debezium/DMS-style op log).

Semantics: per key, the operation with the highest sequence value
wins; a winning ``D`` removes the key, a winning ``I``/``U`` keeps
that operation's payload.  Ties on the sequence are broken by op
precedence ``D > U > I`` (a delete at the same sequence as an update
is applied last, the conservative reading of an op-log flush).

Scale shape: one shuffle on the key, one rank-filter window (Spark's
WindowGroupLimit pushes the rn=1 filter map-side), then a cheap
filter — the same cost as latest-snapshot dedup regardless of how
many superseded ops the log carries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_OP_RANK = F.when(F.col("_op") == "D", 2).when(F.col("_op") == "U", 1) \
    .otherwise(0)


def apply_cdc(ops: DataFrame, key_cols: list[str], seq_col: str,
              op_col: str = "op") -> DataFrame:
    """Final state from an op log: latest (seq, op-precedence) row per
    key, deletes dropped.  Returns the payload columns (everything
    except the op column) of surviving rows.

    Fully deterministic even on degenerate logs: after (seq desc,
    op-precedence desc) the remaining payload columns break any
    residual tie (duplicate flushes carrying different payloads at
    the same sequence — normal in at-least-once op streams — would
    otherwise make row_number partition-order-dependent)."""
    tagged = ops.withColumn("_op", F.col(op_col))
    skip = set(key_cols) | {seq_col, op_col}
    payload_tiebreak = [F.col(c).desc_nulls_last()
                        for c in ops.columns if c not in skip]
    win = (W.partitionBy(*key_cols)
           .orderBy(F.col(seq_col).desc(), _OP_RANK.desc(),
                    *payload_tiebreak))
    latest = (tagged.withColumn("_rn", F.row_number().over(win))
              .filter(F.col("_rn") == 1)
              .filter(F.col("_op") != "D"))
    return latest.drop("_rn", "_op", op_col)

"""Incremental materialized-view maintenance (IVM) off a change feed.

The lakehouse layer exposes a Delta-style change-data-feed
(``sources/lakehouse.read_changes``: insert / delete /
update_preimage / update_postimage rows derived from the
copy-on-write file diff). This operator closes the loop: keep a
count+sums aggregate MV current by applying ONLY the change rows —
post-images and inserts add, pre-images and deletes subtract — instead
of recomputing over the full table.

Why this matters at 100 TB: a nightly merge typically touches a few
thousand keys; the change feed is proportional to the touched rows
(the COW reader already hash-compares carry-over rows out), so the MV
refresh costs O(changes) + a join against the MV — not a full-table
scan+shuffle. This is the standard IVM identity for distributive
aggregates (COUNT/SUM; AVG = SUM/COUNT at read time): the multiset
delta of the table equals inserts+postimages minus deletes+preimages.

Exactness: additive carriage must be in DECIMAL (callers pass the
decimal type per summed column) so the incremental path lands on the
bit-identical totals a full recompute produces — that equality is the
correctness gate for `lakehouse_incremental_mv`.

Reference scope: beyond-reference surface (the reference rebuilds
warehouse tables from scratch via stored procedures each night —
workflow.ps1:310-317); this is the Spark-era replacement for those
full rebuilds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: change-feed rows that ADD to the aggregate state
_ADDS = ("insert", "update_postimage")
#: change-feed rows that SUBTRACT from it
_SUBS = ("delete", "update_preimage")


def aggregate_mv(df: DataFrame, group_cols: list[str],
                 sum_cols: dict[str, str]) -> DataFrame:
    """Materialize the MV state from a full table snapshot:
    ``group_cols`` + ``n_rows`` + one exact-decimal ``sum_<col>`` per
    entry of ``sum_cols`` (col → decimal type for the additive
    carriage)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, dt in sum_cols.items():
        aggs.append(F.sum(F.col(c).cast(dt)).cast("decimal(38,6)")
                    .alias(f"sum_{c}"))
    return df.groupBy(*group_cols).agg(*aggs)


def apply_changes_to_mv(mv: DataFrame, changes: DataFrame,
                        group_cols: list[str],
                        sum_cols: dict[str, str]) -> DataFrame:
    """Fold one change-feed batch into an MV produced by
    :func:`aggregate_mv`.

    Plan shape: the change batch aggregates to one signed delta row
    per touched group (map-side combinable), then a single
    full-outer join against the MV — groups with no changes pass
    through untouched, new groups appear, groups whose count reaches
    zero drop out. Cost is O(|changes| + |touched groups|); the base
    table is never read."""
    sign = (F.when(F.col("_change_type").isin(*_ADDS), F.lit(1))
            .when(F.col("_change_type").isin(*_SUBS), F.lit(-1)))
    aggs = [F.sum(sign).alias("_dn")]
    for c, dt in sum_cols.items():
        aggs.append(F.sum(F.col(c).cast(dt) * sign.cast("decimal(2,0)"))
                    .cast("decimal(38,6)").alias(f"_d_{c}"))
    delta = changes.groupBy(*group_cols).agg(*aggs)

    zero = F.lit(0).cast("decimal(38,6)")
    joined = mv.join(delta, group_cols, "full_outer")
    out_cols = [F.col(g) for g in group_cols]
    out_cols.append((F.coalesce(F.col("n_rows"), F.lit(0))
                     + F.coalesce(F.col("_dn"), F.lit(0))).alias("n_rows"))
    for c in sum_cols:
        out_cols.append((F.coalesce(F.col(f"sum_{c}"), zero)
                         + F.coalesce(F.col(f"_d_{c}"), zero))
                        .cast("decimal(38,6)").alias(f"sum_{c}"))
    return joined.select(*out_cols).filter(F.col("n_rows") > 0)

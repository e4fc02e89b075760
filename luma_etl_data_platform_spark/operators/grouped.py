"""Grouped-map operators (applyInPandas): whole-group pandas
transforms where per-row Column expressions can't see group context.

``minmax_scale``: classic per-group feature normalization
(x - min) / (max - min). Min/max are exact, the division is a single
deterministic double op — so even through the pandas path the result
is engine-reproducible.

Scale: one shuffle on the group key; each group must fit in one
executor's memory as a pandas frame (the applyInPandas contract) —
fine for per-source/per-label groups, NOT for power-law keys; for
those use the Column-expression equivalent over window min/max.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from ..core.partitioning import spread


def minmax_scale(df: DataFrame, group_col: str, value_col: str,
                 out_col: str = "scaled") -> DataFrame:
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} double"

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        lo = pdf[value_col].min()
        hi = pdf[value_col].max()
        span = hi - lo
        if span == 0:
            pdf[out_col] = 0.0
        else:
            pdf[out_col] = ((pdf[value_col] - lo) / float(span)).round(6)
        return pdf

    return spread(df).groupBy(group_col).applyInPandas(scale, out_schema)


def clamped_running_sum(df: DataFrame, key_col: str, order_cols: list[str],
                        value_col: str, lo: float, hi: float) -> DataFrame:
    """Per-key running balance clamped to [lo, hi] at every step —
    the inventory/credit-ledger recurrence
    ``bal_i = clamp(bal_{i-1} + v_i)``.

    This is the canonical NON-windowable operator: the clamp makes
    the recurrence non-associative, so no frame spec or prefix-sum
    trick expresses it — it is exactly what grouped-map
    ``applyInPandas`` exists for.  Each key's history is processed
    sequentially inside one Arrow batch group; work distributes
    across keys (shuffle on the key), and the per-key sequential
    scan is the algorithmic lower bound for this recurrence.

    Determinism: the addition order is fixed by ``order_cols`` (must
    be a per-key unique ordering), and IEEE addition/min/max of the
    same operands in the same order is bit-identical in any engine —
    a recursive-CTE oracle reproduces it exactly.

    Returns (key, *order_cols, value, balance).
    """
    out_schema = ", ".join(
        [f"{key_col} {dict(df.dtypes)[key_col]}"]
        + [f"{c} {dict(df.dtypes)[c]}" for c in order_cols]
        + [f"{value_col} double", "balance double"])

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        bal = 0.0
        out = []
        for v in pdf[value_col].astype("float64"):
            bal = min(max(bal + v, lo), hi)
            out.append(bal)
        pdf = pdf[[key_col, *order_cols, value_col]].copy()
        pdf["balance"] = out
        return pdf

    return (spread(df).select(key_col, *order_cols, value_col)
            .groupBy(key_col).applyInPandas(run, out_schema))


def token_count_arrow(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Token counting via ``mapInArrow`` — the zero-copy RecordBatch
    UDF surface (vs pandas conversion in mapInPandas). Semantics
    identical to ``functions.text.token_count``; exists to exercise
    and document the Arrow-native path for compute-heavy Python
    stages where even the pandas conversion overhead matters."""
    import re

    import pyarrow as pa

    token_re = re.compile(r"\w+")

    def batches(it):
        for batch in it:
            ids = batch.column(id_col)
            texts = batch.column(text_col)
            counts = [len(token_re.findall(t.as_py().lower())) if t.is_valid else 0
                      for t in texts]
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(counts, type=pa.int32())],
                names=[id_col, "n_tokens"])

    return spread(df).select(id_col, text_col).mapInArrow(
        batches, f"{id_col} long, n_tokens int")

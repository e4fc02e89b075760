"""Market-basket co-occurrence mining (support / confidence / lift).

The classic association-rule first stage: which item pairs appear in
the same basket more often than independence predicts?  Used in the
training-data world for tag/domain co-occurrence audits and in the
warehouse world for the canonical retail question.

Scale design: candidate pairs are generated ONLY within a basket via
a self-equi-join on the basket key — work is Σ b_i², bounded by
basket size, never |items|².  ``min_pair_count`` prunes the pair list
before the two item-support joins (the Apriori downward-closure
shortcut: a pair seen twice can't beat a support floor of 3), so the
joined state is the frequent-pair set.  Basket count arrives as a
broadcast scalar.  All counts are exact integers; the three ratios
are rounded doubles of exact integer inputs, so any engine reproduces
them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_pair_stats(df: DataFrame, basket_col: str, item_col: str,
                      min_pair_count: int = 3) -> DataFrame:
    """Pair co-occurrence stats over (basket, item) rows.

    Returns (item_a, item_b, pair_baskets, support, confidence_a_b,
    lift) for pairs appearing in ≥ ``min_pair_count`` baskets:
    ``support = pair/N``, ``confidence_a_b = pair/baskets(a)``,
    ``lift = pair·N / (baskets(a)·baskets(b))``.
    """
    # eager localCheckpoint, not persist(): the (basket, item)
    # projection feeds four downstream branches, and checkpoint blocks
    # are released by the ContextCleaner once the result is GC'd —
    # persist() would pin cache for the session (CacheManager never
    # auto-frees), leaking across a long-lived driver.
    items = (df.select(F.col(basket_col).alias("_b"),
                       F.col(item_col).alias("_i"))
             .distinct().localCheckpoint(eager=True))
    n = items.select("_b").distinct().agg(
        F.count(F.lit(1)).alias("_n"))
    item_supp = items.groupBy("_i").agg(F.count(F.lit(1)).alias("_s"))

    a = items.select("_b", F.col("_i").alias("item_a"))
    b = items.select("_b", F.col("_i").alias("item_b"))
    pairs = (a.join(b, "_b")
             .filter(F.col("item_a") < F.col("item_b"))
             .groupBy("item_a", "item_b")
             .agg(F.count(F.lit(1)).alias("pair_baskets"))
             .filter(F.col("pair_baskets") >= min_pair_count))

    out = (pairs
           .join(item_supp.select(F.col("_i").alias("item_a"),
                                  F.col("_s").alias("_sa")), "item_a")
           .join(item_supp.select(F.col("_i").alias("item_b"),
                                  F.col("_s").alias("_sb")), "item_b")
           .crossJoin(F.broadcast(n)))
    p = F.col("pair_baskets").cast("double")
    # symmetric 6-dp emission (round(x*1e6)/1e6, mirrored in the
    # oracle): support/confidence/lift are int/int rationals that can
    # land exactly on 6-dp half-ways, where plain round(x, 6) is
    # engine-divergent (the r9 sf0.1-tier bug class)
    _M = F.lit(1_000_000.0)
    return out.select(
        "item_a", "item_b", "pair_baskets",
        (F.round(p / F.col("_n") * _M) / _M).alias("support"),
        (F.round(p / F.col("_sa") * _M) / _M).alias("confidence_a_b"),
        (F.round((p * F.col("_n")) / (F.col("_sa") * F.col("_sb")) * _M)
         / _M).alias("lift"))

"""Duplicate-cluster resolution: connected components over near-dup
pairs + representative selection — the "apply" step that turns pair
lists (from dedup.py) into a deduplicated corpus.

Connected components via iterative min-label propagation: each node
starts labeled with itself; every round each node takes the min label
among itself and its neighbors; converges in O(component diameter)
rounds. Near-dup clusters are shallow (diameter ≤ 3-4 in practice),
so this is 3-4 shuffles on the edge list — no GraphX/graphframes
dependency, pure DataFrame ops, and the driver loop only checks a
convergence count per round.

Scale: state is one (node, label) row per node; each round is one
join + one aggregate on the edge list. For adversarially deep chains,
cap rounds and fall back to doubling (label-of-label joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, max_iterations: int = 20,
                         id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; the
    component id is the minimum node id of the component."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    edges.persist()
    try:
        labels = (edges.select(F.col("src").alias("node")).distinct()
                  .withColumn("label", F.col("node")))
        for _ in range(max_iterations):
            neighbor_min = (
                edges.join(labels, edges.dst == labels.node)
                .groupBy("src").agg(F.min("label").alias("nbr_label"))
            )
            updated = (
                labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
                .select(
                    "node",
                    F.least(F.col("label"),
                            F.coalesce(F.col("nbr_label"), F.col("label"))).alias("label"),
                )
            )
            updated.persist()
            changed = (
                updated.alias("u").join(labels.alias("l"), "node")
                .filter(F.col("u.label") != F.col("l.label")).count()
            )
            labels.unpersist()
            labels = updated
            if changed == 0:
                break
        return labels.select(F.col("node"), F.col("label").alias("component"))
    finally:
        edges.unpersist()


def keep_representatives(df: DataFrame, pairs: DataFrame, id_col: str,
                         id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Deduplicated corpus: for every near-dup cluster keep only the
    representative (minimum id); rows not in any pair pass through."""
    comps = connected_components(pairs, id_a=id_a, id_b=id_b)
    drop = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col))
    return df.join(drop, id_col, "left_anti")

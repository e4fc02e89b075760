"""Duplicate-cluster resolution: connected components over near-dup
pairs + representative selection — the "apply" step that turns pair
lists (from dedup.py) into a deduplicated corpus.

Connected components via min-label propagation PLUS pointer jumping:
each round every node takes the min label among itself and its
neighbors (one join + aggregate on the edge list), then labels chase
one hop through the label table (label ← label(label)). The jump
halves the distance to each component's minimum every round, so even
an adversarial n-node path converges in O(log n) rounds — not the
O(n) of plain propagation. No GraphX/graphframes dependency, pure
DataFrame ops; the driver loop only checks a convergence count.

Scale: state is one (node, label) row per node. Iterative join-on-
join grows the logical plan linearly, so the label state is
localCheckpoint()ed every few rounds — without it, plan-depth blowup
(analysis time, stack depth) hits long before data size does.
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
        for it in range(max_iterations):
            neighbor_min = (
                edges.join(labels, edges.dst == labels.node)
                .groupBy("src").agg(F.min("label").alias("nbr_label"))
            )
            prop = (
                labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
                .select(
                    "node",
                    F.least(F.col("label"),
                            F.coalesce(F.col("nbr_label"), F.col("label"))).alias("label"),
                )
            )
            # pointer jump: label ← min(label, label(label)). Labels are
            # always node ids, so the lookup table is prop itself.
            hop = prop.select(F.col("node").alias("label"),
                              F.col("label").alias("_label2"))
            updated = (
                prop.join(hop, "label", "left")
                .select(
                    "node",
                    F.least(F.col("label"),
                            F.coalesce(F.col("_label2"), F.col("label"))).alias("label"),
                )
            )
            # sever lineage every 3 rounds: each round adds 3 joins to
            # the plan; unchecked, round 15+ spends more time in the
            # analyzer than in execution.
            checkpointed = (it + 1) % 3 == 0
            if checkpointed:
                updated = updated.localCheckpoint(eager=True)
            else:
                updated.persist()
            changed = (
                updated.alias("u").join(labels.alias("l"), "node")
                .filter(F.col("u.label") != F.col("l.label")).count()
            )
            # a localCheckpoint'd frame has no lineage to recompute
            # from — never unpersist one while still referenced; the
            # ContextCleaner reclaims it once the reference drops.
            if not getattr(labels, "_is_checkpoint", False):
                labels.unpersist()
            updated._is_checkpoint = checkpointed
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

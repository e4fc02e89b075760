"""Distributed graph analytics on edge-list DataFrames.

Companion to :mod:`.clustering` (connected components / pointer
jumping): this module covers the counting side — triangles and the
global clustering coefficient — over undirected edge lists such as the
near-duplicate pair graphs the dedup family emits.

Scale design (the part that matters at 100 TB):

Naive triangle counting joins the edge list with itself twice —
O(sum of deg(v)^2) wedges, quadratic in the hottest vertex.  The
standard fix (Schank & Wagner 2005; the MapReduce formulation is
Suri & Vassilvitskii's "Counting Triangles and the Curse of the Last
Reducer", WWW'11) orients every edge from the lower-degree endpoint to
the higher-degree endpoint (ties by vertex id).  Every triangle then
has exactly ONE wedge rooted at its lowest-degree vertex, and each
vertex's out-degree is bounded by O(sqrt(m)), so wedge generation is
O(m^(3/2)) total work regardless of skew — the hot-vertex join that
melts a 1000-executor cluster simply never materializes.

Plan shape: degree computation (one shuffle on vertex), two broadcast-
or shuffle-joins to attach degrees, a self-join of the oriented edge
list on the wedge root, and a semi-join back against oriented edges to
close wedges.  Everything is equi-join + groupBy — no driver loops, no
UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _degrees(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """(node, deg) from an undirected edge list (one row per pair)."""
    return (edges.select(F.col(src).alias("node"))
            .unionAll(edges.select(F.col(dst).alias("node")))
            .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))


def oriented_edges(edges: DataFrame, src: str = "id_a",
                   dst: str = "id_b") -> DataFrame:
    """Orient each undirected edge from its lower-(degree, id) endpoint
    ``u`` to the higher one ``v``; carries both endpoints' degrees so
    downstream comparisons reuse the total order.  Returns
    (u, v, du, dv)."""
    deg = _degrees(edges, src, dst)
    e = (edges
         .join(deg.withColumnRenamed("node", src)
               .withColumnRenamed("deg", "_da"), src)
         .join(deg.withColumnRenamed("node", dst)
               .withColumnRenamed("deg", "_db"), dst))
    a_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col(src) < F.col(dst)))
    return e.select(
        F.when(a_first, F.col(src)).otherwise(F.col(dst)).alias("u"),
        F.when(a_first, F.col(dst)).otherwise(F.col(src)).alias("v"),
        F.when(a_first, F.col("_da")).otherwise(F.col("_db")).alias("du"),
        F.when(a_first, F.col("_db")).otherwise(F.col("_da")).alias("dv"),
    )


def triangle_stats(edges: DataFrame, src: str = "id_a",
                   dst: str = "id_b") -> DataFrame:
    """One-row graph summary: node/edge/triangle counts and the global
    clustering coefficient ``3*triangles / wedges`` (wedges = open or
    closed paths of length 2 = Σ deg(v)·(deg(v)−1)/2).

    ``edges`` must hold one row per undirected pair (the dedup-pair
    contract: id_a < id_b, no duplicates).
    """
    deg = _degrees(edges, src, dst)
    # o is referenced three times (two wedge sides + closure); an
    # eager localCheckpoint computes the orientation (and whatever
    # expensive join produced the edges) exactly once, with blocks
    # freed by the ContextCleaner when the result dies
    o = oriented_edges(edges, src, dst).localCheckpoint(eager=True)

    # Wedges rooted at u: pairs of out-neighbors ordered by the same
    # (deg, id) total order, so the closing edge — if present — is
    # itself an oriented edge (v1 -> v2).
    a = o.select(F.col("u"), F.col("v").alias("v1"),
                 F.col("dv").alias("d1"))
    b = o.select(F.col("u"), F.col("v").alias("v2"),
                 F.col("dv").alias("d2"))
    wedges = a.join(b, "u").filter(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("v1") < F.col("v2"))))
    closed = wedges.join(
        o.select(F.col("u").alias("v1"), F.col("v").alias("v2")),
        ["v1", "v2"], "left_semi")

    tri = closed.agg(F.count(F.lit(1)).alias("n_triangles"))
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum(F.col("deg").cast("long")) / 2).cast("long").alias("n_edges"),
        F.sum((F.col("deg").cast("long") * (F.col("deg") - 1) / 2)
              .cast("long")).alias("n_wedges"))
    return (stats.crossJoin(F.broadcast(tri))
            .select("n_nodes", "n_edges", "n_triangles",
                    F.when(F.col("n_wedges") > 0,
                           F.round(F.lit(3.0) * F.col("n_triangles")
                                   / F.col("n_wedges")
                                   * F.lit(1_000_000.0))
                           / F.lit(1_000_000.0))
                    .otherwise(F.lit(0.0)).alias("clustering_coeff")))


_PR_SCALE = 1_000_000_000_000  # rank mass carried in pico-units


def pagerank(edges: DataFrame, src: str = "id_a", dst: str = "id_b",
             iterations: int = 10, checkpoint_every: int = 4) -> DataFrame:
    """PageRank over an undirected edge list (each edge walked both
    ways), damping 0.85, fixed iteration count — with **integer rank
    carriage** so the result is bit-identical at any partitioning AND
    reproducible by a SQL oracle:

    - ranks live in pico-units (BIGINT); initial rank =
      ``floor(SCALE / N)``;
    - one step: ``r'(v) = floor(3·SCALE / (20·N))
      + Σ_{u∈nbr(v)} floor((17.0·r(u)) / (20.0·deg(u)))`` — the
      damping factor 0.85 expressed as 17/20, every division floored
      at magnitudes (< 2^53) where IEEE double division is the same
      correctly-rounded value in every engine;
    - summation is BIGINT → order-independent.

    Scale design: the per-iteration plan is one equi-join of the
    directed adjacency (edges × 2) against the rank vector plus a
    groupBy on the destination — the standard message-passing shape
    (shuffle keyed on vertex). Like :func:`..clustering.
    connected_components`, lineage is cut with ``localCheckpoint``
    every few rounds so 10 iterations don't stack 10 join plans.
    Every vertex of an undirected graph has deg ≥ 1, so there are no
    dangling-mass corrections.

    Returns (node, rank_scaled) for all nodes.
    """
    deg = _degrees(edges, src, dst)
    directed = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
                .unionAll(edges.select(F.col(dst).alias("u"),
                                       F.col(src).alias("v"))))
    adj = directed.join(deg.withColumnRenamed("node", "u")
                        .withColumnRenamed("deg", "du"), "u")
    # eager localCheckpoint: reused by all 10 iterations, and the
    # blocks are ContextCleaner-freed after the result dies (persist
    # would pin cache for the whole session)
    adj = adj.localCheckpoint(eager=True)
    n = deg.agg(F.count(F.lit(1)).alias("_n"))

    ranks = (deg.crossJoin(F.broadcast(n))
             .select("node",
                     F.floor(F.lit(float(_PR_SCALE)) / F.col("_n"))
                     .cast("long").alias("rank_scaled")))
    tele = F.floor((F.lit(3.0) * F.lit(float(_PR_SCALE)))
                   / (F.lit(20.0) * F.col("_n"))).cast("long")
    for i in range(iterations):
        contrib = (adj.join(ranks.withColumnRenamed("node", "u"), "u")
                   .select("v",
                           F.floor((F.lit(17.0) * F.col("rank_scaled"))
                                   / (F.lit(20.0) * F.col("du")))
                           .cast("long").alias("_c")))
        ranks = (contrib.groupBy(F.col("v").alias("node"))
                 .agg(F.sum("_c").alias("_s"))
                 .crossJoin(F.broadcast(n))
                 .select("node", (tele + F.col("_s")).alias("rank_scaled")))
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def node_triangle_counts(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b") -> DataFrame:
    """Per-node triangle participation (node, n_triangles): each closed
    wedge credits all three corners once.  Same oriented-wedge plan as
    :func:`triangle_stats`, followed by an explode of the three corners
    and a count — the per-node signal used for spam/boilerplate hub
    detection in near-dup graphs."""
    o = oriented_edges(edges, src, dst).localCheckpoint(eager=True)
    a = o.select(F.col("u"), F.col("v").alias("v1"), F.col("dv").alias("d1"))
    b = o.select(F.col("u"), F.col("v").alias("v2"), F.col("dv").alias("d2"))
    wedges = a.join(b, "u").filter(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("v1") < F.col("v2"))))
    closed = wedges.join(
        o.select(F.col("u").alias("v1"), F.col("v").alias("v2")),
        ["v1", "v2"], "left_semi")
    corners = closed.select(
        F.explode(F.array("u", "v1", "v2")).alias("node"))
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles"))


def label_propagation(edges: DataFrame, rounds: int = 3,
                      id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Community detection by synchronous label propagation
    (Raghavan et al. 2007): labels start as node ids; each round every
    node adopts the most frequent label among its neighbors, ties →
    smallest label. Classic LPA breaks ties randomly and updates
    asynchronously; this variant is SYNCHRONOUS with a total tie
    order, so a fixed round count gives a deterministic, engine-
    replayable labeling (converged or not — same doctrine as the
    PageRank/power-iteration operators).

    Scale shape per round: one neighbor-label join (shuffle on node
    id), one (node, label) count, one per-node argmax window — all
    equi-joins, work O(m) per round, no hot-vertex blowup.
    ``localCheckpoint`` per round caps lineage like the
    connected-components loop.

    Returns (node, community)."""
    from pyspark.sql.window import Window as W
    both = (edges.select(F.col(id_a).alias("n"), F.col(id_b).alias("m"))
            .unionByName(edges.select(F.col(id_b).alias("n"),
                                      F.col(id_a).alias("m")))
            .distinct()
            .localCheckpoint(eager=True))
    labels = both.select("n").distinct().select(
        "n", F.col("n").alias("lbl"))
    for _ in range(rounds):
        nb = (both.join(labels.select(F.col("n").alias("m"), "lbl"), "m")
              .select("n", "lbl"))
        cnt = nb.groupBy("n", "lbl").agg(F.count(F.lit(1)).alias("c"))
        win = W.partitionBy("n").orderBy(F.desc("c"), F.asc("lbl"))
        labels = (cnt.withColumn("_rn", F.row_number().over(win))
                  .filter(F.col("_rn") == 1).select("n", "lbl")
                  .localCheckpoint(eager=True))
    return labels.select(F.col("n").alias("node"),
                         F.col("lbl").alias("community"))

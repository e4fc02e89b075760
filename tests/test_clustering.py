"""Connected-components and representative-selection tests."""

from __future__ import annotations

from luma_etl_data_platform_spark.operators.clustering import (
    connected_components, keep_representatives,
)


def test_components_chain_and_triangle(spark):
    # chain 1-2-3-4 (diameter 3) + triangle 10-11-12 + isolated pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["id_a", "id_b"])
    comps = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 4: 1,
                     10: 10, 11: 10, 12: 10,
                     20: 20, 21: 20}


def test_keep_representatives_drops_non_reps(spark):
    df = spark.createDataFrame([(i, f"doc{i}") for i in [1, 2, 3, 4, 10, 50]],
                               ["doc_id", "text"])
    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["id_a", "id_b"])
    kept = sorted(r["doc_id"] for r in keep_representatives(df, pairs, "doc_id").collect())
    # cluster {1,2,3,4} → keep 1; 10 and 50 untouched
    assert kept == [1, 10, 50]


def test_components_deep_path_graph(spark):
    # 1000-node path: plain min-label propagation needs ~999 rounds;
    # pointer jumping converges in O(log n) — and localCheckpoint
    # keeps the iterative plan from blowing up in the analyzer.
    n = 1000
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)],
                                  ["id_a", "id_b"])
    comps = connected_components(pairs, max_iterations=20)
    rows = comps.collect()
    assert len(rows) == n
    assert {r["component"] for r in rows} == {0}


def test_components_two_deep_chains_stay_separate(spark):
    # two disjoint 100-node chains: labels must not bleed across
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(99)]
        + [(1000 + i, 1001 + i) for i in range(99)],
        ["id_a", "id_b"])
    comps = {r["node"]: r["component"]
             for r in connected_components(pairs, max_iterations=20).collect()}
    assert all(comps[i] == 0 for i in range(100))
    assert all(comps[1000 + i] == 1000 for i in range(100))


def test_components_empty_pairs(spark):
    from pyspark.sql import types as T
    pairs = spark.createDataFrame([], T.StructType([
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType())]))
    assert connected_components(pairs).count() == 0


def test_entity_resolution_golden_record_shape(spark):
    # chain a~b~c + isolated d: one entity of 3 with canonical name
    # from the min id, one singleton
    from luma_etl_data_platform_spark.operators.clustering import (
        connected_components)
    from luma_etl_data_platform_spark.operators.fuzzy import fuzzy_pairs
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [(1, "widget alpha"), (2, "widget alphb"), (3, "widget alphc"),
         (4, "gadget omega")],
        "p_partkey long, p_name string")
    pairs = fuzzy_pairs(df, "p_name", "p_partkey", max_distance=2,
                        prefix_len=4)
    comps = connected_components(pairs)
    labeled = (df.join(comps, df["p_partkey"] == comps["node"], "left")
               .select("p_partkey", "p_name",
                       F.coalesce("component", "p_partkey")
                       .alias("entity_id")))
    got = {r["entity_id"]: r["n"] for r in
           labeled.groupBy("entity_id").agg(F.count("*").alias("n")).collect()}
    assert got == {1: 3, 4: 1}

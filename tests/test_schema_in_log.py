"""Schema-in-log (round-9 verdict item 1): the logical schema is
commit-log METADATA (Delta metaData-action parity). Pins the user
contract: evolved columns visible by DEFAULT (no merge_schema flag),
time travel shows the schema of its era, RESTORE restores it, the
declared schema supersedes footer sampling on event-free reads, and
legacy logs (no `schema` field) keep the old file-derived behavior.

Plus the round's second item: `read_table(where={...})` unified
structured pruned reads (ranges + equalities through the
stat/partition/Bloom lanes) and the specialist readers reimplemented
on that one path.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from luma_etl_data_platform_spark.sources import lakehouse as LH


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def _strip_schema_field(path: str) -> None:
    """Turn a table into a LEGACY log in place: remove the `schema`
    declaration from every commit doc (what logs written before this
    round look like)."""
    log = os.path.join(path, "_log")
    for name in os.listdir(log):
        if not name.endswith(".json") or name.startswith("."):
            continue
        p = os.path.join(log, name)
        with open(p) as fh:
            doc = json.load(fh)
        doc.pop("schema", None)
        with open(p, "w") as fh:
            json.dump(doc, fh)
        # the local Hadoop FS keeps .crc sidecars; the rewritten
        # bytes no longer match — drop them or reads fail checksum
        crc = os.path.join(log, f".{name}.crc")
        if os.path.exists(crc):
            os.remove(crc)


def test_declared_schema_recorded_and_read(spark, tmp_path):
    path = str(tmp_path / "t")
    LH.create_table(spark, path,
                    _mk(spark, [(1, 1.0), (2, 2.0)], ["k", "v"]), ["k"])
    sch = LH.table_schema(spark, path)
    assert sch is not None and sch.names == ["k", "v"]
    assert LH.read_table(spark, path).columns == ["k", "v"]
    assert LH.describe_table(spark, path)["schema"] == {
        "k": "bigint", "v": "double"}


def test_append_evolution_visible_by_default(spark, tmp_path):
    """Mixed-vintage read WITHOUT merge_schema shows the appended
    column — pre-evolution files yield typed NULL (the r8 verdict's
    'my MERGE added a column but SELECT * doesn't show it' surprise,
    closed)."""
    path = str(tmp_path / "t")
    LH.create_table(spark, path, _mk(spark, [(1, 1.0)], ["k", "v"]), ["k"])
    LH.append_table(spark, path,
                    _mk(spark, [(2, 2.0, "x")], ["k", "v", "tag"]))
    got = LH.read_table(spark, path)
    assert got.columns == ["k", "v", "tag"]
    rows = {r["k"]: r["tag"] for r in got.collect()}
    assert rows == {1: None, 2: "x"}
    # the declaration is sticky: a later append WITHOUT the column
    # still reads the full logical schema
    LH.append_table(spark, path, _mk(spark, [(3, 3.0)], ["k", "v"]))
    assert LH.read_table(spark, path).columns == ["k", "v", "tag"]


def test_merge_evolution_visible_by_default(spark, tmp_path):
    path = str(tmp_path / "t")
    LH.create_table(spark, path,
                    _mk(spark, [(1, 1.0), (2, 2.0)], ["k", "v"]), ["k"])
    src = _mk(spark, [(2, 9.0, "s2"), (3, 3.0, "s3")], ["k", "v", "seg"])
    LH.merge_into(spark, path, src, ["k"], schema_evolution=True)
    got = LH.read_table(spark, path)
    assert got.columns == ["k", "v", "seg"]
    assert {r["k"]: r["seg"] for r in got.collect()} == {
        1: None, 2: "s2", 3: "s3"}
    # MOR variant records the widened schema too
    path2 = str(tmp_path / "t2")
    LH.create_table(spark, path2, _mk(spark, [(1, 1.0)], ["k", "v"]), ["k"])
    LH.merge_into(spark, path2, src, ["k"], mode="mor",
                  schema_evolution=True)
    assert LH.read_table(spark, path2).columns == ["k", "v", "seg"]


def test_time_travel_shows_era_schema(spark, tmp_path):
    path = str(tmp_path / "t")
    LH.create_table(spark, path, _mk(spark, [(1, 1.0)], ["k", "v"]), ["k"])
    LH.append_table(spark, path,
                    _mk(spark, [(2, 2.0, "x")], ["k", "v", "tag"]))
    assert LH.read_table(spark, path, version=1).columns == ["k", "v"]
    assert LH.read_table(spark, path, version=2).columns == ["k", "v", "tag"]
    # RESTORE restores the declared schema with the data
    LH.restore_table(spark, path, version=1)
    assert LH.read_table(spark, path).columns == ["k", "v"]
    assert LH.table_schema(spark, path).names == ["k", "v"]


def test_restore_across_rename_restores_data(spark, tmp_path):
    """RESTORE across a RENAME/DROP COLUMN restates the target's
    schema_events too — a post-target rename left replaying would
    remap the restored files' physical names and the schema alignment
    would NULL the column (silent data loss; round-9 self-review).
    After restore, the pre-rename name reads its original values."""
    path = str(tmp_path / "t")
    LH.create_table(spark, path,
                    _mk(spark, [(1, 1.0), (2, 2.0)], ["k", "v"]), ["k"])
    LH.rename_column(spark, path, "v", "val")
    assert LH.read_table(spark, path).columns == ["k", "val"]
    LH.restore_table(spark, path, version=1)
    got = LH.read_table(spark, path)
    assert got.columns == ["k", "v"]
    assert {r["k"]: r["v"] for r in got.collect()} == {1: 1.0, 2: 2.0}
    # same for DROP: restored column carries its original values
    path2 = str(tmp_path / "t2")
    LH.create_table(spark, path2,
                    _mk(spark, [(1, 1.0, "a")], ["k", "v", "tag"]), ["k"])
    LH.drop_column(spark, path2, "tag")
    LH.restore_table(spark, path2, version=1)
    got2 = LH.read_table(spark, path2)
    assert got2.columns == ["k", "v", "tag"]
    assert got2.collect()[0]["tag"] == "a"


def test_rename_drop_update_declared_schema(spark, tmp_path):
    """RENAME/DROP COLUMN read their column lists from the log schema
    (zero data probes) and restate the declaration; event replay +
    declared-schema alignment agree across vintages."""
    path = str(tmp_path / "t")
    LH.create_table(spark, path,
                    _mk(spark, [(1, 1.0, "a")], ["k", "v", "extra"]),
                    ["k"])
    LH.rename_column(spark, path, "v", "val")
    assert LH.table_schema(spark, path).names == ["k", "val", "extra"]
    got = LH.read_table(spark, path)
    assert got.columns == ["k", "val", "extra"]
    assert got.collect()[0]["val"] == 1.0
    LH.drop_column(spark, path, "extra")
    assert LH.table_schema(spark, path).names == ["k", "val"]
    assert LH.read_table(spark, path).columns == ["k", "val"]
    # post-event write migrates files; mixed vintages still align
    LH.append_table(spark, path, _mk(spark, [(2, 2.0)], ["k", "val"]))
    rows = {r["k"]: r["val"] for r in LH.read_table(spark, path).collect()}
    assert rows == {1: 1.0, 2: 2.0}


def test_compact_preserves_evolved_column(spark, tmp_path):
    """OPTIMIZE over a mixed-vintage candidate set reads under the
    DECLARED schema — the evolved column's data survives the rewrite
    (a footer-sampled read could silently drop it)."""
    path = str(tmp_path / "t")
    LH.create_table(spark, path,
                    _mk(spark, [(1, 1.0)], ["k", "v"]).coalesce(1), ["k"])
    LH.append_table(spark, path,
                    _mk(spark, [(2, 2.0, "x")],
                        ["k", "v", "tag"]).coalesce(1))
    st = LH.compact(spark, path, target_rows=100)
    assert st["n_files_compacted"] == 2
    got = LH.read_table(spark, path)
    assert {r["k"]: r["tag"] for r in got.collect()} == {1: None, 2: "x"}


def test_legacy_log_keeps_file_derived_behavior(spark, tmp_path):
    """A log WITHOUT the schema field (pre-round-9) reads exactly as
    before: footer-derived schema, merge_schema=True surfaces
    appended columns."""
    path = str(tmp_path / "t")
    LH.create_table(spark, path, _mk(spark, [(1, 1.0)], ["k", "v"]), ["k"])
    LH.append_table(spark, path,
                    _mk(spark, [(2, 2.0, "x")], ["k", "v", "tag"]))
    _strip_schema_field(path)
    assert LH.table_schema(spark, path) is None
    got = LH.read_table(spark, path, merge_schema=True)
    assert set(got.columns) == {"k", "v", "tag"}
    assert LH.describe_table(spark, path)["schema"] is None
    # merge_schema propagates through the where= pruned path too
    got = LH.read_table(spark, path, merge_schema=True,
                        where={"k": (1, 2)})
    assert set(got.columns) == {"k", "v", "tag"}
    assert {r["k"]: r["tag"] for r in got.collect()} == {1: None, 2: "x"}


def test_where_reads_prune_and_match(spark, tmp_path):
    """read_table(where=...) — ranges, equalities, and both mixed —
    open only stat/Bloom-surviving files and return exactly the
    filtered rows; empty candidate sets return an empty frame with
    the logical schema."""
    path = str(tmp_path / "t")
    df = (spark.range(100)
          .select(F.col("id").alias("k"),
                  (F.col("id") % 7).alias("b"),
                  (F.col("id") * 1.5).alias("v"))
          .repartitionByRange(5, "k"))
    LH.create_table(spark, path, df, ["k"], bloom_cols=["b"])
    full = LH.read_table(spark, path)
    # range
    got = LH.read_table(spark, path, where={"k": (10, 19)})
    assert sorted(r["k"] for r in got.collect()) == list(range(10, 20))
    # equality + range mixed
    got = LH.read_table(spark, path, where={"k": (0, 49), "b": 3})
    want = sorted(r["k"] for r in
                  full.filter((F.col("k") <= 49)
                              & (F.col("b") == 3)).collect())
    assert sorted(r["k"] for r in got.collect()) == want
    # pruning actually drops files on the range-clustered key
    cands = LH.pruned_candidate_files(spark, path, {"k": (10, 19)})
    assert 0 < len(cands) < LH.describe_table(spark, path)["n_files"]
    # empty candidates: empty frame, logical schema intact
    got = LH.read_table(spark, path, where={"k": (1000, 2000)})
    assert got.columns == ["k", "b", "v"] and got.count() == 0
    # version pinning
    LH.delete_where(spark, path, {"k": (10, 14)})
    assert LH.read_table(spark, path, version=1,
                         where={"k": (10, 19)}).count() == 10
    assert LH.read_table(spark, path, where={"k": (10, 19)}).count() == 5


def test_specialist_readers_are_where_wrappers(spark, tmp_path):
    path = str(tmp_path / "t")
    df = (spark.range(50)
          .select(F.col("id").alias("k"), (F.col("id") % 5).alias("b")))
    LH.create_table(spark, path, df.repartitionByRange(4, "k"), ["k"],
                    bloom_cols=["b"])
    a = LH.read_table_pruned(spark, path, "k", 5, 9)
    b = LH.read_table(spark, path, where={"k": (5, 9)})
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    c = LH.read_table_point_lookup(spark, path, {"k": 7})
    assert [r["k"] for r in c.collect()] == [7]
    with pytest.raises(ValueError):
        LH.read_table_pruned_multi(spark, path, {"k": 7})
    with pytest.raises(ValueError):
        LH.read_table_point_lookup(spark, path, {"k": (5, 9)})
    # None is never expressible as a dict predicate (col == NULL is
    # SQL-never-true): refuse loudly instead of matching nothing
    with pytest.raises(ValueError, match="None"):
        LH.read_table(spark, path, where={"k": None})
    with pytest.raises(ValueError, match="None"):
        LH.delete_where(spark, path, {"k": (None, 5)})


def test_structured_dml_candidates_pin_to_base_version(spark, tmp_path):
    """ADVICE r8 (medium): the structured-DML candidate set derives
    INSIDE the pinned-version body, not before it. Structural pin:
    _structured_condition returns the parsed spec (version-free);
    _recon_candidates takes the explicit base version; and a
    dict-predicate delete still sees rows from files appended
    IMMEDIATELY before the call (the old pre-derivation would too —
    the race needs a concurrent writer — so the structural asserts
    carry the regression)."""
    cond, spec = LH._structured_condition(spark, str(tmp_path / "x"),
                                          {"k": (1, 5), "b": 2})
    assert spec == ({"k": (1, 5)}, {"b": 2})
    path = str(tmp_path / "t")
    LH.create_table(spark, path,
                    _mk(spark, [(1, 1)], ["k", "b"]).coalesce(1), ["k"])
    LH.append_table(spark, path,
                    _mk(spark, [(4, 2)], ["k", "b"]).coalesce(1))
    cands = LH._recon_candidates(spark, path, spec,
                                 LH.current_version(spark, path))
    assert len(cands) == 2  # both files intersect the spec
    st = LH.delete_where(spark, path, {"k": (1, 5), "b": 2})
    assert st["n_rows_changed"] == 1
    assert [r["k"] for r in LH.read_table(spark, path).collect()] == [1]

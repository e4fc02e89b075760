"""Tests for the warehouse transform templates, MERGE emulation,
orchestration, and multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from luma_etl_data_platform_spark import orchestration as O
from luma_etl_data_platform_spark.operators import multimodal as MM
from luma_etl_data_platform_spark.plans import transform as TR


# ------------------------------------------------------------ templates

def test_render_template():
    out = TR.render_template(
        "INSERT OVERWRITE {{warehouse}} SELECT * FROM {{ staging }}",
        {"warehouse": "wh.t", "staging": "st.t"})
    assert out == "INSERT OVERWRITE wh.t SELECT * FROM st.t"
    with pytest.raises(KeyError):
        TR.render_template("{{missing}}", {})


def test_split_and_run_script(spark):
    dfs = TR.run_script(spark, """
        DROP TABLE IF EXISTS {{t}};
        CREATE TABLE {{t}} USING parquet AS SELECT 1 AS a;
        SELECT a FROM {{t}}
    """, {"t": "tmp_script_t"})
    assert dfs[-1].collect()[0]["a"] == 1
    spark.sql("DROP TABLE IF EXISTS tmp_script_t")


def test_merge_sql_text():
    sql = TR.merge_sql("wh.gl", "stage.gl", ["k", "a", "b"], ["k"])
    assert "ON tgt.k = src.k" in sql
    assert "UPDATE SET tgt.a = src.a, tgt.b = src.b" in sql
    assert "INSERT (k, a, b) VALUES (src.k, src.a, src.b)" in sql


def test_merge_upsert_parquet(spark, tmp_path):
    path = str(tmp_path / "tgt")
    base = spark.createDataFrame([(1, "old1"), (2, "old2")], ["k", "v"])
    TR.merge_upsert_parquet(spark, path, base, ["k"])
    upd = spark.createDataFrame([(2, "new2"), (3, "new3")], ["k", "v"])
    TR.merge_upsert_parquet(spark, path, upd, ["k"])
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {1: "old1", 2: "new2", 3: "new3"}


def test_merge_upsert_partitioned_rewrites_only_touched(spark, tmp_path):
    """With partition_cols, an upsert touching one partition must leave
    every other partition's FILES untouched (rename swap, not full
    rewrite) — the sub-linear-in-target-size property that matters at
    100 TB."""
    import glob
    import os

    path = str(tmp_path / "tgt")
    base = spark.createDataFrame(
        [(1, "p1", "old1"), (2, "p1", "old2"), (3, "p2", "keep3"),
         (4, "p2", "keep4"), (5, "p3", "keep5")], ["k", "p", "v"])
    TR.merge_upsert_parquet(spark, path, base, ["k"], partition_cols=["p"])

    def files(part):
        return {(f, os.stat(f).st_mtime_ns)
                for f in glob.glob(f"{path}/p={part}/*.parquet")}

    p2_before, p3_before = files("p2"), files("p3")
    upd = spark.createDataFrame([(2, "p1", "new2"), (6, "p1", "new6")],
                                ["k", "p", "v"])
    TR.merge_upsert_parquet(spark, path, upd, ["k"], partition_cols=["p"])

    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {1: "old1", 2: "new2", 3: "keep3", 4: "keep4",
                   5: "keep5", 6: "new6"}
    # untouched partitions: identical files, identical mtimes
    assert files("p2") == p2_before
    assert files("p3") == p3_before


def test_merge_upsert_partitioned_new_partition(spark, tmp_path):
    """Source rows in a partition the target doesn't have yet must
    create it (rename into place, no pre-existing dir to swap)."""
    path = str(tmp_path / "tgt")
    base = spark.createDataFrame([(1, "p1", "a")], ["k", "p", "v"])
    TR.merge_upsert_parquet(spark, path, base, ["k"], partition_cols=["p"])
    upd = spark.createDataFrame([(2, "p9", "b")], ["k", "p", "v"])
    TR.merge_upsert_parquet(spark, path, upd, ["k"], partition_cols=["p"])
    got = {r["k"]: (r["p"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("p1", "a"), 2: ("p9", "b")}


# --------------------------------------------------------- orchestration

def test_run_subject_area_isolation(spark, tmp_path):
    tracker = O.JobTracker(spark, str(tmp_path / "jobs"))
    alerts = []

    def stage(bc):
        if bc == "bad":
            raise ValueError("boom")

    res = O.run_subject_area(["a", "bad", "c"], stage, tracker=tracker,
                             alert_fn=alerts.append)
    assert res.succeeded == ["a", "c"]
    assert set(res.failed) == {"bad"} and "boom" in res.failed["bad"]
    assert not res.ok
    rows = tracker.read().collect()
    assert {(r["business_class"], r["was_successful"]) for r in rows} == {
        ("a", True), ("bad", False), ("c", True)}
    assert any("bad failed" in a for a in alerts)


def test_plan_metrics_reports_operator_rows(spark):
    from luma_etl_data_platform_spark.plans.warehouse import q1_pricing_summary
    from tests.conftest import SF_SMOKE
    df = q1_pricing_summary(spark, SF_SMOKE)
    df.collect()
    nodes = O.plan_metrics(df)
    aggs = [n for n in nodes if n["node"] == "HashAggregate"
            and n["metrics"].get("numOutputRows")]
    assert len(aggs) >= 2            # partial + final
    final_rows = min(n["metrics"]["numOutputRows"] for n in aggs)
    assert final_rows == 6           # 6 output groups at sf0.001
    scans = [n for n in nodes if "Scan" in n["node"]]
    assert scans


def test_summarize_logs(spark):
    lines = ["start", "LOAD DURATION: 12.5", "LOAD DURATION: 7.5",
             "table load failed: x", "done"]
    df = spark.createDataFrame([(l,) for l in lines], ["value"])
    row = O.summarize_logs(df).collect()[0]
    assert row["n_duration_lines"] == 2
    assert row["total_duration_s"] == 20.0
    assert row["max_duration_s"] == 12.5
    assert row["n_failures"] == 1


# ------------------------------------------------------------ multimodal

def test_multimodal_decode_batch_shape(spark):
    df = spark.createDataFrame([(1, "hello world"), (2, "x" * 1000)],
                               ["doc_id", "text"])
    media = MM.attach_demo_binary(df)
    assert dict(media.dtypes)["content"] == "binary"
    meta = MM.decode_image_meta(media).collect()
    by_id = {r["doc_id"]: r for r in meta}
    assert by_id[2]["n_bytes"] == 1000
    assert 1 <= by_id[1]["width"] <= 1920 and 1 <= by_id[1]["height"] <= 1080
    # determinism
    meta2 = MM.decode_image_meta(media).collect()
    assert sorted(map(tuple, meta)) == sorted(map(tuple, meta2))


def test_multimodal_frames_cover_blob(spark):
    df = spark.createDataFrame([(1, "abcdefghij")], ["doc_id", "text"])
    frames = MM.sample_frames(MM.attach_demo_binary(df), n_frames=4).collect()
    assert [r["frame_idx"] for r in sorted(frames, key=lambda r: r["frame_idx"])] == [0, 1, 2, 3]
    joined = b"".join(bytes(r["frame_bytes"]) for r in sorted(frames, key=lambda r: r["frame_idx"]))
    assert joined == b"abcdefghij"


def test_resize_requires_pil():
    import luma_etl_data_platform_spark.operators.multimodal as m
    if not m._HAVE_PIL:
        with pytest.raises(NotImplementedError):
            m.resize_images(None, 10, 10)


def test_resize_raw_gray_known_bitmap(spark):
    # 4x4 bitmap with values 0..15 → 2x2 nearest-neighbor picks
    # rows [0,2] x cols [0,2]: pixels (0, 2, 8, 10)
    blob = bytes(range(16))
    df = spark.createDataFrame([(1, blob)], "doc_id long, content binary")
    r = MM.resize_raw_gray(df, 4, 4, 2, 2).collect()[0]
    assert bytes(r["pixels"]) == bytes([0, 2, 8, 10])
    assert r["pixel_sum"] == 20
    assert (r["out_w"], r["out_h"]) == (2, 2)


def test_resize_raw_gray_pads_short_blobs(spark):
    # 3-byte blob zero-padded into a 4x4 frame: sampled pixels are
    # (0, 2, 0, 0)
    df = spark.createDataFrame([(1, bytes([5, 6, 2]))],
                               "doc_id long, content binary")
    r = MM.resize_raw_gray(df, 4, 4, 2, 2).collect()[0]
    assert bytes(r["pixels"]) == bytes([5, 2, 0, 0])
    assert r["pixel_sum"] == 7


def test_winnow_fingerprints_shared_run_guarantee(spark):
    """Two docs sharing a run of >= k+w-1 tokens must share at least
    one winnowing fingerprint; a doc with disjoint vocabulary must
    share none."""
    from luma_etl_data_platform_spark.functions.text import winnow_fingerprints
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens = k+w-1
    df = spark.createDataFrame([
        (1, f"intro words {shared} tail one"),
        (2, f"other prefix {shared} different ending"),
        (3, "completely unrelated vocabulary nothing matches here at all ok"),
    ], ["doc_id", "text"])
    fps = winnow_fingerprints(df, "text", "doc_id", k=5, w=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[1] & by_doc.get(3, set()))
    assert not (by_doc[2] & by_doc.get(3, set()))


def test_audio_features_known_values(spark):
    # "ab" = bytes 97, 98 → centered -31, -30: no sign change,
    # mean -30.5, rms sqrt((961+900)/2)
    df = spark.createDataFrame([(1, "ab"), (2, "")], ["doc_id", "text"])
    rows = MM.extract_audio_features(MM.attach_demo_binary(df)).collect()
    assert len(rows) == 1  # empty blob emits no row
    r = rows[0]
    assert (r["doc_id"], r["n_samples"], r["n_sign_changes"]) == (1, 2, 0)
    assert r["mean_amp"] == -30.5
    assert abs(r["rms"] - 30.5041) < 1e-9


def test_audio_features_sign_changes(spark):
    # chr(100)=d (neg after centering), chr(200) (pos), chr(100) → 2 changes
    text = chr(100) + chr(200) + chr(100)
    df = spark.createDataFrame([(7, text)], ["doc_id", "text"])
    # NB: utf-8 encodes chr(200) as TWO bytes (0xC3 0x88 — both ≥128),
    # so centered signs are -, +, +, - → 2 sign changes
    r = MM.extract_audio_features(MM.attach_demo_binary(df)).collect()[0]
    assert r["n_samples"] == 4
    assert r["n_sign_changes"] == 2


# ---------------------------------------------------------------------------
# backfill
# ---------------------------------------------------------------------------

def test_backfill_skips_done_isolates_failures_and_stops_early():
    from luma_etl_data_platform_spark.orchestration import backfill
    ran = []

    def run_partition(p):
        if p in ("d3", "d5", "d6"):
            raise RuntimeError(f"boom {p}")
        ran.append(p)

    res = backfill([f"d{i}" for i in range(1, 8)],
                   run_partition,
                   is_done=lambda p: p == "d2",
                   max_failures=2)
    assert res.partitions_skipped == ["d2"]
    assert ran == ["d1", "d4"]
    assert set(res.failures) == {"d3", "d5"}     # stopped after 2 failures
    assert not res.ok


def test_backfill_is_idempotent_with_done_check(tmp_path):
    from luma_etl_data_platform_spark.orchestration import backfill
    done = set()

    def run_partition(p):
        done.add(p)

    first = backfill(["a", "b"], run_partition, is_done=lambda p: p in done)
    again = backfill(["a", "b"], run_partition, is_done=lambda p: p in done)
    assert first.partitions_run == ["a", "b"]
    assert again.partitions_run == [] and again.partitions_skipped == ["a", "b"]

"""Persisted-IVF-index serving probe at a 10^3-file index.

The serving claim (SCALING.md round 10) is structural — opened/live =
nprobe/lists decided driver-side from the commit log — but was only
measured at 398 files. This probe builds the index at 10^3+ live
files (sf0.1 embeddings replicated with shifted vec_ids, the
``scale_replicate.py`` trick — nothing synthesized beyond the test
data), then measures:

- prune-decision wall time for a 2-list probe, on BOTH metadata
  lanes: the driver-side JSON loop and, after
  ``expire_snapshots(checkpoint_format="parquet")``, the Spark lane
  over the parquet checkpoint's add-action table;
- opened/live file ratio (audited via input_file_name against the
  candidate set);
- pruned-read vs full-scan wall time;
- the round-11 maintenance ops at this file count: the log-only
  ``index_skew_audit`` wall time, and a ``rebalance_lists`` round on
  a deliberately skewed copy (one hot list holding a full replica of
  the corpus), recording how many files the rebalance rewrote vs
  carried.

Usage: python scripts/ivf_scale_probe.py [replicas] [files_per_list]
Results go to SCALING.md (round-11 section).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    files_per_list = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    from pyspark.sql import functions as F

    from luma_etl_data_platform_spark.core.session import get_spark
    from luma_etl_data_platform_spark.operators import ivf_index as IVF
    from luma_etl_data_platform_spark.sources import lakehouse as LH

    spark = get_spark(app_name="ivf-scale-probe")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n0 = emb.count()
    reps = F.broadcast(spark.range(replicas).select(
        F.col("id").alias("_rep")))
    corpus = (emb.crossJoin(reps)
              .select((F.col("vec_id") + F.col("_rep") * n0)
                      .alias("vec_id"),
                      "embedding", F.col("label").alias("list_id"))
              .repartition(files_per_list)
              .localCheckpoint(eager=True))
    n_rows = corpus.count()

    tmp = tempfile.mkdtemp(prefix="luma_ivf_probe_")
    path = f"{tmp}/idx"
    t0 = time.perf_counter()
    LH.create_table(spark, path, corpus, ["vec_id"],
                    partition_by=["list_id"])
    build_s = time.perf_counter() - t0
    n_live = LH.describe_table(spark, path)["n_files"]
    print(f"index: {n_rows} rows, {n_live} live files "
          f"({build_s:.1f}s build)")

    probe = [0, 1]  # two fixed lists: ratio is what matters

    def measure(label: str) -> None:
        t0 = time.perf_counter()
        cands: set[str] = set()
        for lid in probe:
            cands.update(LH.pruned_candidate_files(
                spark, path, None, eq={"list_id": lid}))
        decide_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        got = LH.read_table(spark, path, where={"list_id": probe[0]}) \
            .unionByName(LH.read_table(spark, path,
                                       where={"list_id": probe[1]}))
        hit = {r[0].rsplit("/", 1)[-1] for r in
               got.select(F.input_file_name()).distinct().collect()}
        read_s = time.perf_counter() - t0
        assert hit <= {p.rsplit("/", 1)[-1] for p in cands}
        t0 = time.perf_counter()
        LH.read_table(spark, path).count()
        full_s = time.perf_counter() - t0
        print(f"[{label}] prune decision {decide_s:.3f}s; opened "
              f"{len(cands)}/{n_live} files "
              f"({len(cands) / n_live:.3f}); pruned read {read_s:.2f}s"
              f" vs full scan {full_s:.2f}s")

    measure("json-log lane")
    LH.expire_snapshots(spark, path, keep_last=1,
                        checkpoint_format="parquet")
    measure("parquet-checkpoint lane")

    t0 = time.perf_counter()
    audit = IVF.index_skew_audit(spark, path)
    print(f"skew audit at {n_live} files: {time.perf_counter() - t0:.3f}s "
          f"(ratio {audit['skew_ratio']:.2f}, zero data reads)")

    # skewed copy: one extra replica appended entirely into list 0
    hot = (emb.select((F.col("vec_id") + replicas * n0).alias("vec_id"),
                      "embedding", F.lit(0).alias("list_id"))
           .repartition(max(files_per_list // 4, 1)))
    LH.append_table(spark, path, hot)
    audit_b = IVF.index_skew_audit(spark, path)
    files_b = LH.describe_table(spark, path)["n_files"]
    t0 = time.perf_counter()
    rep = IVF.rebalance_lists(spark, path, skew_threshold=1.5,
                              max_rounds=4)
    reb_s = time.perf_counter() - t0
    audit_a = IVF.index_skew_audit(spark, path)
    files_a = LH.describe_table(spark, path)["n_files"]
    hot_files = audit_b["files_by_list"][0]
    print(f"rebalance at {files_b} files: skew "
          f"{audit_b['skew_ratio']:.2f} -> {audit_a['skew_ratio']:.2f} "
          f"in {rep['rounds']} round(s), {reb_s:.1f}s; split lists "
          f"{rep['split_lists']} held {hot_files} of {files_b} files "
          f"(the other {files_b - hot_files} carried by reference); "
          f"{files_a} live after")

    import shutil
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

"""SF>=1 scaling tier (round-12, verdict item 5): time a query set at
a LARGER scale factor under two core counts, with canaries, so
parallelism claims get measured evidence — at sf0.1 every headline
query is fixed-cost dominated and 8v32 ratios sit at ~1, which proves
nothing either way.

Usage:
  python scripts/scale_replicate.py /root/repo/.scale_sf1 10   # once
  SPARK_GRAFT_CPUS=32 python scripts/scaling_tier.py [sf_dir] [q ...]
  SPARK_GRAFT_CPUS=8  python scripts/scaling_tier.py [sf_dir] [q ...]

Prints one JSON line: {"cpus": N, "sf_dir": ..., "canary": {...},
"queries": {name: best_sec}}. Compare the per-query ratios between
the two runs (ideal 8->32 speedup is 4x; shuffle-bound queries land
lower — guide §2.2).

Default query set: the shuffle-heavy dedup family (the 100-TB risk
shape), one wide-agg TPC-H query, and the PQ serving path this round
rewrote to be shuffle-free (expected to scale with cores now that no
exchange precedes the top-k).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "dedup_ngram_pairs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "q1_pricing_summary",
    "part_type_share",
    "ann_pq_topk",
    "events_hourly",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale_sf1"
    names = sys.argv[2:] or DEFAULT

    from luma_etl_data_platform_spark import api
    from luma_etl_data_platform_spark.core.session import get_spark

    # The replicated SF1 tables are a few tens of MB per file, so at
    # the default 128 MB split size every scan is 1-2 tasks and BOTH
    # core counts are input-split-bound (first run measured ratios
    # ~1.3 for that reason — the splits, not the plans, were the
    # ceiling). A 100-TB input has ~10^5 splits; emulate "far more
    # splits than cores" so the tier measures the PLANS' parallelism.
    split = os.environ.get("SPARK_GRAFT_SCAN_SPLIT_BYTES", str(2 << 20))
    spark = get_spark(app_name="scaling-tier", extra_conf={
        "spark.sql.files.maxPartitionBytes": split,
        "spark.sql.files.openCostInBytes": str(256 << 10),
    })
    queries = api.all_queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def canary():
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            spark.range(100_000_000).selectExpr("sum(id)").collect()
            best = min(best, time.perf_counter() - t0)
        return round(best, 4)

    force(queries[names[0]](spark, sf_dir))  # warm-up, not timed
    c0 = canary()
    out = {}
    for name in names:
        if name not in queries:
            continue
        spark.sparkContext.setJobDescription(f"scaling-tier: {name}")
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            force(queries[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)
    c1 = canary()
    print(json.dumps({
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "sf_dir": sf_dir,
        "canary": {"fixed_job_start": c0, "fixed_job_end": c1},
        "queries": out,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is forced through the noop sink (full computation, no
driver-side materialization cost), after a small JVM warm-up so the
numbers measure the plans, not classloading.
"""

from __future__ import annotations

import json
import os
import re
import time

from luma_etl_data_platform_spark import api
from luma_etl_data_platform_spark.core.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "top3_orders_per_customer",
    "revenue_rollup",
    "order_priority_count",
    "part_type_share",
    "events_hourly",
    "dedup_ngram_pairs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "text_quality_stats",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    spark = get_spark(app_name="luma-bench")

    queries = api.all_queries()
    names = [n for n in HEADLINE if n in queries]

    # Warm-up: JVM/codegen/parquet-footer caches, not measured.
    _force(queries[names[0]](spark, sf_dir))

    # best-of-2 per query: one line of defense against scheduler noise
    # on a shared host (standard practice; plans/caches are identical
    # between repeats so this measures the engine, not the jitter)
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _force(queries[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()

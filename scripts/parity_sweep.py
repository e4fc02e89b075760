"""Full-strictness parity sweep at an arbitrary SF — a local stand-in
for the driver's CORRECTNESS gate (which runs at sf0.01).

Usage:  python scripts/parity_sweep.py [sf_dir] [query_name ...]
(optional query names restrict the sweep to that subset)

Runs every registered query against its DuckDB oracle with the STRICT
comparator from tests/parity.py (float 4973.0 != int 4973) and prints
one line per query plus a summary.  Exit code 1 if anything fails.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    from luma_etl_data_platform_spark import api
    from tests.parity import assert_matches

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions",
                os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    duck = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            duck.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = api.all_queries()
    oracles = api.all_oracles()
    if ONLY:
        unknown = ONLY - set(queries)
        if unknown:
            print(f"unknown queries: {sorted(unknown)}")
            return 1
        queries = {k: v for k, v in queries.items() if k in ONLY}
    fails: list[str] = []
    for name in sorted(queries):
        t0 = time.perf_counter()
        try:
            sdf = queries[name](spark, SF_DIR)
            if name in oracles:
                odf = duck.execute(oracles[name]).fetchdf()
                assert_matches(sdf, odf, name)
                status = "pass"
            else:
                n = sdf.count()
                status = f"rows-only ({n})"
        except Exception as exc:  # noqa: BLE001 — report-and-continue sweep
            status = f"FAIL: {str(exc)[:200]}"
            fails.append(name)
        print(f"{name:40s} {time.perf_counter() - t0:6.2f}s  {status}", flush=True)

    print(f"\n{len(queries) - len(fails)}/{len(queries)} ok; failures: {fails}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())

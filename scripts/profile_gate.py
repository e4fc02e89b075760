"""Attribute a scenario gate's wall time to the operator calls inside.

Usage: python scripts/profile_gate.py <query> [query ...]

Wraps every public function of sources.lakehouse, operators.ivf_index
and streaming.cdf with a timer, runs each named query once through the
noop sink (the bench's timed action), and prints per-function call
count + cumulative seconds sorted by cost. Nested calls are counted at
every level (inner times are included in their caller's), so read the
top-level gate entries first.
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STATS: dict[str, list[float]] = defaultdict(lambda: [0, 0.0])
DEPTH = [0]


def _wrap_module(mod) -> None:
    import types
    for name in dir(mod):
        if name.startswith("__"):
            continue
        fn = getattr(mod, name)
        if not isinstance(fn, types.FunctionType):
            continue
        if getattr(fn, "__module__", None) != mod.__name__:
            continue

        def mk(f, label):
            def wrapper(*a, **k):
                t0 = time.perf_counter()
                DEPTH[0] += 1
                try:
                    return f(*a, **k)
                finally:
                    DEPTH[0] -= 1
                    dt = time.perf_counter() - t0
                    s = STATS[label]
                    s[0] += 1
                    s[1] += dt
            wrapper.__module__ = mod.__name__
            return wrapper

        setattr(mod, name, mk(fn, f"{mod.__name__.rsplit('.', 1)[-1]}.{name}"))


def main() -> int:
    names = sys.argv[1:]
    from luma_etl_data_platform_spark import api
    from luma_etl_data_platform_spark.core.session import get_spark
    from luma_etl_data_platform_spark.operators import ivf_index
    from luma_etl_data_platform_spark.sources import lakehouse
    from luma_etl_data_platform_spark.sources import lakehouse_meta
    from luma_etl_data_platform_spark.streaming import cdf as cdf_mod

    for m in (lakehouse, lakehouse_meta, ivf_index, cdf_mod):
        _wrap_module(m)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="gate-profile")
    queries = api.all_queries()
    reps = int(os.environ.get("PROFILE_REPS", "2"))
    for name in names:
        for rep in range(reps):
            STATS.clear()
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            t_build = time.perf_counter() - t0
            df.write.format("noop").mode("overwrite").save()
            t_total = time.perf_counter() - t0
            print(f"\n=== {name} rep{rep}: build {t_build:.2f}s, "
                  f"total {t_total:.2f}s ===")
            for label, (cnt, tot) in sorted(STATS.items(),
                                            key=lambda kv: -kv[1][1])[:25]:
                print(f"  {label:55s} n={int(cnt):4d}  {tot:8.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

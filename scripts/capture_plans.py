"""Capture .explain("formatted") for the bench-visible queries.

Usage: python scripts/capture_plans.py <outdir> [suffix] [query ...]

Writes <outdir>/<query>_<suffix>.txt (suffix defaults to "before")
for every HEADLINE + EXTRA query in bench.py, or for the explicit
query list if given. Uses the same session factory as the bench so
the plans match what the bench measures.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r11"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = sys.argv[3:]

    import bench
    from luma_etl_data_platform_spark import api
    from luma_etl_data_platform_spark.core.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="plan-capture")
    queries = api.all_queries()
    names = only or (bench.HEADLINE + bench.EXTRA)
    for name in names:
        if name not in queries:
            print(f"SKIP {name} (not registered)")
            continue
        try:
            import contextlib
            import io
            df = queries[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 - record the failure
            plan = f"ERROR building plan: {exc!r}\n"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
